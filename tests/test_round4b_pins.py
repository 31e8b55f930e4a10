"""Unit pins for the round-4b query constants: the Poisson(1)
inverse-CDF thresholds baked into poisson_bootstrap_ci, the pinned
trig literals in dft_dow_harmonics, and the Croston fold semantics
(seed-from-first-gap) replayed in pure Python against DuckDB."""

import math
import re

import duckdb

from hbase_to_mongo_export_spark import queries as registry


class TestPoissonBootstrapThresholds:
    def test_thresholds_are_floor_of_poisson1_cdf_times_1e6(self):
        sql = registry.oracle_sql()["poisson_bootstrap_ci"]
        found = [int(x) for x in re.findall(r"m >= (\d+)", sql)]
        assert len(found) == 7
        cdf, term = 0.0, math.exp(-1.0)
        expected = []
        for k in range(7):
            cdf += term
            expected.append(math.floor(cdf * 1_000_000))
            term /= k + 1
        assert found == expected

    def test_weights_sum_to_about_one_per_row(self):
        # E[Poisson(1)] = 1: the mean weight over a fine grid of the
        # uniform draw must be ~1 (discretization error only).
        sql = registry.oracle_sql()["poisson_bootstrap_ci"]
        ts = [int(x) for x in re.findall(r"m >= (\d+)", sql)]
        mean_w = sum(
            sum(1 for t in ts if m >= t) for m in range(0, 1_000_000, 97)
        ) / len(range(0, 1_000_000, 97))
        assert abs(mean_w - 1.0) < 5e-3


class TestDFTLiterals:
    def test_cos_sin_literals_match_math(self):
        sql = registry.oracle_sql()["dft_dow_harmonics"]
        lists = re.findall(r"\[([-0-9.e+, ]+)\]", sql)
        # keep the six 7-element coefficient lists (cos k=1..3 then sin,
        # in CASE order); the [1, 2, 3] harmonics list is skipped
        parsed = [
            [float(v) for v in chunk.split(",")]
            for chunk in lists
            if chunk.count(",") == 6
        ]
        assert len(parsed) == 6
        cos_lists, sin_lists = parsed[:3], parsed[3:6]
        for k in (1, 2, 3):
            want_c = [round(math.cos(2 * math.pi * k * d / 7), 15) for d in range(7)]
            want_s = [round(math.sin(2 * math.pi * k * d / 7), 15) for d in range(7)]
            assert cos_lists[k - 1] == want_c, f"cos k={k}"
            assert sin_lists[k - 1] == want_s, f"sin k={k}"

    def test_literals_parse_as_double_not_decimal(self):
        # e-notation forces DOUBLE in DuckDB; a DECIMAL intermediate
        # would round-trip differently for this value
        v = duckdb.connect().execute(
            "SELECT 6.234898018587340e-01"
        ).fetchone()[0]
        assert isinstance(v, float)
        assert v == 0.623489801858734


class TestCrostonFold:
    def test_duckdb_fold_matches_python_replay(self):
        # series: (size, gap) events; first gap is the SEED for the
        # interval smoother, not smoothed into a zero init
        evs = [(4.0, 0.0), (6.0, 3.0), (2.0, 5.0), (8.0, 2.0)]
        z, p, seen = evs[0][0], 0.0, 0.0
        for x, g in evs[1:]:
            z = (z + x) * 0.5
            p = g if seen == 0.0 else (p + g) * 0.5
            seen = 1.0
        lits = ", ".join(f"[{x}::DOUBLE, {g}::DOUBLE, 0::DOUBLE]" for x, g in evs)
        got = duckdb.connect().execute(
            f"""
            SELECT list_reduce([{lits}], (a, b) ->
              [(a[1] + b[1]) * 5e-1,
               CASE WHEN a[3] = CAST(0 AS DOUBLE) THEN b[2]
                    ELSE (a[2] + b[2]) * 5e-1 END,
               CAST(1 AS DOUBLE)])
            """
        ).fetchone()[0]
        assert got[0] == z and got[1] == p

    def test_single_event_yields_seed_state(self):
        got = duckdb.connect().execute(
            """
            SELECT list_reduce([[5::DOUBLE, 0::DOUBLE, 0::DOUBLE]],
              (a, b) -> [(a[1] + b[1]) * 5e-1,
                         CASE WHEN a[3] = CAST(0 AS DOUBLE) THEN b[2]
                              ELSE (a[2] + b[2]) * 5e-1 END,
                         CAST(1 AS DOUBLE)])
            """
        ).fetchone()[0]
        assert got == [5.0, 0.0, 0.0]
