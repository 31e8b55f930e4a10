"""Unit pins for round-4 helper machinery: the shared 3x3 adjugate
solve, the BH critical-value table, and the HMM parameter SQL."""

import duckdb

from hbase_to_mongo_export_spark.queries import (
    _BH_CRIT,
    _HMM_E,
    _hmm_emission_sql,
    _solve3,
)


class TestSolve3:
    def test_solves_known_symmetric_system(self):
        # A = [[4,1,2],[1,3,0],[2,0,5]], g = [4,5,6] -> solve with DuckDB
        # using the exact SQL fragments the engine ships
        s = _solve3("m", "g")
        con = duckdb.connect()
        row = con.execute(
            f"""
            WITH m AS (SELECT
              CAST(4 AS DOUBLE) AS m11, CAST(1 AS DOUBLE) AS m12,
              CAST(2 AS DOUBLE) AS m13, CAST(3 AS DOUBLE) AS m22,
              CAST(0 AS DOUBLE) AS m23, CAST(5 AS DOUBLE) AS m33,
              CAST(4 AS DOUBLE) AS g1, CAST(5 AS DOUBLE) AS g2,
              CAST(6 AS DOUBLE) AS g3)
            SELECT {s["d1"]}, {s["d2"]}, {s["d3"]} FROM m
            """
        ).fetchone()
        d1, d2, d3 = row
        # verify A·d = g to float tolerance
        assert abs(4 * d1 + 1 * d2 + 2 * d3 - 4) < 1e-9
        assert abs(1 * d1 + 3 * d2 + 0 * d3 - 5) < 1e-9
        assert abs(2 * d1 + 0 * d2 + 5 * d3 - 6) < 1e-9

    def test_identity_system(self):
        s = _solve3("m", "g")
        con = duckdb.connect()
        row = con.execute(
            f"""
            WITH m AS (SELECT
              CAST(1 AS DOUBLE) AS m11, CAST(0 AS DOUBLE) AS m12,
              CAST(0 AS DOUBLE) AS m13, CAST(1 AS DOUBLE) AS m22,
              CAST(0 AS DOUBLE) AS m23, CAST(1 AS DOUBLE) AS m33,
              CAST(7 AS DOUBLE) AS g1, CAST(8 AS DOUBLE) AS g2,
              CAST(9 AS DOUBLE) AS g3)
            SELECT {s["d1"]}, {s["d2"]}, {s["d3"]} FROM m
            """
        ).fetchone()
        assert row == (7.0, 8.0, 9.0)


class TestBHCriticalValues:
    def test_monotone_decreasing(self):
        assert all(a > b for a, b in zip(_BH_CRIT, _BH_CRIT[1:]))

    def test_endpoints(self):
        # last boundary is the plain one-sided 5% z; first is Bonferroni-ish
        assert abs(_BH_CRIT[-1] - 1.644854) < 1e-6
        assert _BH_CRIT[0] > 2.8


class TestHMMParams:
    def test_emissions_cover_all_event_types_and_sum_to_one(self):
        assert set(_HMM_E) == {"view", "click", "purchase", "signup", "error"}
        for state in (0, 1):
            assert abs(sum(p[state] for p in _HMM_E.values()) - 1.0) < 1e-12

    def test_emission_sql_mentions_every_type(self):
        sql = _hmm_emission_sql("event_type", 0)
        for t in _HMM_E:
            assert f"'{t}'" in sql
