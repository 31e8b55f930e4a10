"""Unit pins for the round-4c additions: pure-Python replays of the
statistical recursions (Kalman, Holt-Winters, Erlang-B, Cox Newton,
Page-Hinkley, bandit replay) and closed forms (Kruskal-Wallis, Fleiss
kappa, Theil decomposition, PACF, matrix profile, Bass OLS) checked
against the registered DuckDB oracles on sf0.001 — these validate the
MATH is what the docstrings claim, independently of the Spark<->DuckDB
agreement the oracle gate already enforces."""

import math
import os

import duckdb
import numpy as np
import pytest

from hbase_to_mongo_export_spark import queries as registry

SF_DIR = os.environ.get("SPARK_GRAFT_PIN_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def oracle_row(duck, name):
    res = duck.execute(registry.oracle_sql()[name])
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert len(rows) == 1, name
    return dict(zip(cols, rows[0]))


def daily_series(duck, sql):
    return [r[0] for r in duck.execute(sql).fetchall()]


class TestKalmanPin:
    def test_recursion_replay(self, duck):
        xs = daily_series(
            duck,
            """SELECT CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                      AS DOUBLE) AS x
               FROM orders GROUP BY CAST(o_orderdate AS DATE)
               ORDER BY CAST(o_orderdate AS DATE)""",
        )
        q, r = 1e6, 1e8
        level, p, se = xs[0], r, 0.0
        for x in xs[1:]:
            pp = p + q
            k = pp / (pp + r)
            se += (x - level) * (x - level)
            level = level + k * (x - level)
            p = (1 - k) * pp
        got = oracle_row(duck, "kalman_local_level_filter")
        assert got["n_days"] == len(xs)
        assert got["filtered_level"] == pytest.approx(level, abs=1e-3)
        assert got["state_variance"] == pytest.approx(p, abs=1e-4)
        assert got["innovation_rmse"] == pytest.approx(
            math.sqrt(se / (len(xs) - 1)), abs=1e-3
        )


class TestHoltWintersPin:
    def test_recursion_replay(self, duck):
        xs = daily_series(
            duck,
            """SELECT CAST(COUNT(*) AS DOUBLE) FROM orders
               GROUP BY CAST(o_orderdate AS DATE)
               ORDER BY CAST(o_orderdate AS DATE)""",
        )
        m0 = sum(xs[:7]) / 7.0
        lvl, b = m0, 0.0
        s = [x - m0 for x in xs[:7]]
        for n, x in enumerate(xs[7:], start=7):
            pos = n % 7
            lnew = 0.5 * (x - s[pos]) + 0.5 * (lvl + b)
            b = 0.25 * (lnew - lvl) + 0.75 * b
            s[pos] = 0.25 * (x - lnew) + 0.75 * s[pos]
            lvl = lnew
        got = oracle_row(duck, "holt_winters_additive")
        assert got["n_days"] == len(xs)
        assert got["level"] == pytest.approx(lvl, abs=1e-5)
        assert got["trend"] == pytest.approx(b, abs=1e-5)
        assert got["forecast_next"] == pytest.approx(
            lvl + b + s[len(xs) % 7], abs=1e-5
        )


class TestErlangBPin:
    def test_recurrence_matches_closed_form(self, duck):
        n, secs = duck.execute(
            "SELECT COUNT(*), DATE_DIFF('second', MIN(ts), MAX(ts)) "
            "FROM events"
        ).fetchone()
        a = (n / (secs / 3600.0)) * 0.1
        # closed form: B_k = (a^k/k!) / sum_j a^j/j!
        def closed(k):
            terms = [a**j / math.factorial(j) for j in range(k + 1)]
            return terms[-1] / sum(terms)

        got = oracle_row(duck, "erlang_b_blocking")
        # outputs are ROUND(.,6) — compare at rounding granularity
        assert got["offered_load_erlangs"] == pytest.approx(a, abs=1e-5)
        assert got["blocking_5_servers"] == pytest.approx(closed(5), abs=1e-6)
        assert got["blocking_10_servers"] == pytest.approx(
            closed(10), abs=1e-6
        )
        assert got["blocking_20_servers"] == pytest.approx(
            closed(20), abs=1e-6
        )
        # monotone decreasing in k, and kopt is the first k below 1%
        assert got["blocking_20_servers"] <= got["blocking_10_servers"]
        ks = [k for k in range(1, 21) if closed(k) < 0.01]
        assert got["min_servers_below_1pct"] == (ks[0] if ks else 0)


class TestKruskalWallisPin:
    def test_matches_rank_replay(self, duck):
        rows = duck.execute(
            "SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem"
        ).fetchall()
        vals = sorted(v for _, v in rows)
        # average rank per value
        import collections

        cnt = collections.Counter(v for _, v in rows)
        avg_rank, start = {}, 1
        for v in sorted(cnt):
            c = cnt[v]
            avg_rank[v] = start + (c - 1) / 2.0
            start += c
        groups = collections.defaultdict(list)
        for g, v in rows:
            groups[g].append(avg_rank[v])
        n = len(rows)
        h = 12.0 / (n * (n + 1)) * sum(
            (sum(r) ** 2) / len(r) for r in groups.values()
        ) - 3.0 * (n + 1)
        ties = sum(c**3 - c for c in cnt.values())
        c_tie = 1.0 - ties / (n**3 - n)
        got = oracle_row(duck, "kruskal_wallis_h")
        assert got["n_total"] == n
        assert got["n_groups"] == len(groups)
        assert got["h_stat"] == pytest.approx(h, abs=1e-4)
        assert got["h_tie_adjusted"] == pytest.approx(h / c_tie, abs=1e-4)


class TestFleissKappaPin:
    def test_matches_replay(self, duck):
        rows = duck.execute(
            """SELECT l_orderkey, l_returnflag FROM lineitem
               WHERE l_orderkey IN (
                 SELECT l_orderkey FROM lineitem
                 GROUP BY 1 HAVING COUNT(*) = 4)"""
        ).fetchall()
        import collections

        items = collections.defaultdict(collections.Counter)
        for ok, flag in rows:
            items[ok][flag] += 1
        n_items = len(items)
        pbar = sum(
            sum(v * v for v in c.values()) - 4 for c in items.values()
        ) / (12.0 * n_items)
        cat = collections.Counter()
        for c in items.values():
            cat.update(c)
        pe = sum((cj / (4.0 * n_items)) ** 2 for cj in cat.values())
        got = oracle_row(duck, "fleiss_kappa_returnflag")
        assert got["n_items"] == n_items
        assert got["observed_agreement"] == pytest.approx(pbar, abs=1e-5)
        assert got["fleiss_kappa"] == pytest.approx(
            (pbar - pe) / (1 - pe), abs=1e-5
        )


class TestTheilPin:
    def test_decomposition_identity_and_value(self, duck):
        rows = duck.execute(
            """SELECT r.r_name,
                      CAST(ROUND(SUM(CAST(o.o_totalprice
                        AS DECIMAL(18,2))), 2) AS DOUBLE)
               FROM orders o
               JOIN customer c ON c.c_custkey = o.o_custkey
               JOIN nation n ON n.n_nationkey = c.c_nationkey
               JOIN region r ON r.r_regionkey = n.n_regionkey
               GROUP BY r.r_name, o.o_custkey"""
        ).fetchall()
        xs = np.array([x for _, x in rows])
        n, tot = len(xs), xs.sum()
        t_total = float(np.sum((xs / tot) * np.log(xs * n / tot)))
        got = oracle_row(duck, "theil_inequality_decomposition")
        assert got["n_customers"] == n
        assert got["theil_total"] == pytest.approx(t_total, abs=1e-4)
        # decomposition identity T = B + W
        assert got["theil_total"] == pytest.approx(
            got["theil_between"] + got["theil_within"], abs=1e-5
        )
        assert got["theil_between"] >= 0


class TestPacfPin:
    def test_durbin_levinson_replay(self, duck):
        xs = np.array(
            daily_series(
                duck,
                """SELECT COUNT(*) FROM orders
                   GROUP BY CAST(o_orderdate AS DATE)
                   ORDER BY CAST(o_orderdate AS DATE)""",
            ),
            dtype=float,
        )
        n, m = len(xs), xs.mean()
        c = xs - m
        gam = [float(np.dot(c[: n - k], c[k:]) / n) for k in range(6)]
        r = [g / gam[0] for g in gam]
        # Durbin-Levinson
        phi = {1: {1: r[1]}}
        v = 1 - r[1] ** 2
        pacf = [r[1]]
        for k in range(2, 6):
            num = r[k] - sum(phi[k - 1][j] * r[k - j] for j in range(1, k))
            fkk = num / v
            phi[k] = {k: fkk}
            for j in range(1, k):
                phi[k][j] = phi[k - 1][j] - fkk * phi[k - 1][k - j]
            v *= 1 - fkk**2
            pacf.append(fkk)
        got = oracle_row(duck, "pacf_durbin_levinson")
        assert got["n_days"] == n
        for k in range(1, 6):
            assert got[f"acf_{k}"] == pytest.approx(r[k], abs=1e-5), k
            assert got[f"pacf_{k}"] == pytest.approx(
                pacf[k - 1], abs=1e-5
            ), k


class TestMatrixProfilePin:
    def test_bruteforce_motif_discord(self, duck):
        rows = dict(
            duck.execute(
                """SELECT CAST(o_orderdate AS DATE), COUNT(*)
                   FROM orders
                   WHERE CAST(o_orderdate AS DATE) BETWEEN
                         DATE '1995-01-01' AND DATE '1995-12-31'
                   GROUP BY 1"""
            ).fetchall()
        )
        import datetime

        d0 = datetime.date(1995, 1, 1)
        xs = np.array(
            [rows.get(d0 + datetime.timedelta(days=i), 0) for i in range(365)],
            dtype=float,
        )
        m = 7
        wins = np.lib.stride_tricks.sliding_window_view(xs, m)
        mu = wins.mean(axis=1)
        sd = wins.std(axis=1)
        valid = sd > 0
        best = (np.inf, None)
        nn = {}
        for i in range(len(wins)):
            if not valid[i]:
                continue
            for j in range(i + 4, len(wins)):
                if not valid[j]:
                    continue
                a = (wins[i] - mu[i]) / sd[i]
                b = (wins[j] - mu[j]) / sd[j]
                dist = float(np.sqrt(max(0.0, ((a - b) ** 2).sum())))
                if dist < best[0] - 1e-12:
                    best = (dist, (i, j))
                nn[i] = min(nn.get(i, np.inf), dist)
                nn[j] = min(nn.get(j, np.inf), dist)
        got = oracle_row(duck, "matrix_profile_weekly_motif")
        assert got["motif_dist"] == pytest.approx(best[0], abs=1e-4)
        disc = max(nn.items(), key=lambda kv: (kv[1], -kv[0]))
        assert got["discord_nn_dist"] == pytest.approx(disc[1], abs=1e-4)


class TestCoxPin:
    def test_newton_replay(self, duck):
        rows = duck.execute(
            """SELECT CASE WHEN purch_d IS NOT NULL
                        THEN date_diff('day', first_d, purch_d)
                        ELSE date_diff('day', first_d, last_d) END,
                      CASE WHEN purch_d IS NOT NULL THEN 1 ELSE 0 END,
                      LN(CAST(1 + cnt AS DOUBLE))
               FROM (SELECT MIN(CAST(ts AS DATE)) AS first_d,
                            MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END) AS purch_d,
                            MAX(CAST(ts AS DATE)) AS last_d,
                            COUNT(*) AS cnt
                     FROM events GROUP BY user_id)"""
        ).fetchall()
        subj = sorted(rows, key=lambda r: -r[0])
        beta = 0.0
        for _ in range(3):
            import collections

            groups = collections.defaultdict(lambda: ([], []))
            for t, ev, z in subj:
                groups[t][0].append(z)
                if ev:
                    groups[t][1].append(z)
            s0 = s1 = s2 = u = info = 0.0
            for t in sorted(groups, reverse=True):
                zs, zev = groups[t]
                for z in zs:
                    e = math.exp(beta * z)
                    s0 += e
                    s1 += z * e
                    s2 += z * z * e
                d = len(zev)
                if d:
                    u += sum(zev) - d * (s1 / s0)
                    info += d * (s2 / s0 - (s1 / s0) ** 2)
            beta += u / info
        got = oracle_row(duck, "cox_proportional_hazards")
        assert got["n_subjects"] == len(subj)
        assert got["cox_beta"] == pytest.approx(beta, abs=1e-4)
        assert got["hazard_ratio"] == pytest.approx(
            math.exp(beta), abs=1e-3
        )


class TestBassPin:
    def test_ols_matches_numpy(self, duck):
        rows = duck.execute(
            """SELECT COUNT(*) FROM (
                 SELECT user_id, MIN(CAST(ts AS DATE)) AS aday
                 FROM events WHERE event_type = 'purchase'
                 GROUP BY user_id)
               GROUP BY aday ORDER BY aday"""
        ).fetchall()
        ns = np.array([r[0] for r in rows], dtype=float)
        nprev = np.concatenate([[0.0], np.cumsum(ns)[:-1]])
        X = np.column_stack([np.ones_like(nprev), nprev, nprev**2])
        b0, b1, b2 = np.linalg.lstsq(X, ns, rcond=None)[0]
        mm = (-b1 - math.sqrt(b1 * b1 - 4 * b2 * b0)) / (2 * b2)
        got = oracle_row(duck, "bass_diffusion_fit")
        # outputs are rounded (M at 2dp, p/q at 6dp)
        assert got["bass_market_size"] == pytest.approx(mm, abs=5e-3)
        assert got["bass_p"] == pytest.approx(b0 / mm, abs=1e-5)
        assert got["bass_q"] == pytest.approx(b1 + b0 / mm, abs=1e-5)


class TestPageHinkleyPin:
    def test_fold_replay(self, duck):
        xs = daily_series(
            duck,
            """SELECT CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               FROM orders GROUP BY CAST(o_orderdate AS DATE)
               ORDER BY CAST(o_orderdate AS DATE)""",
        )
        s = m = 0.0
        minm = 0.0
        for n, x in enumerate(xs, start=1):
            s += x
            m += x - s / n - 25.0
            minm = min(minm, m)
        got = oracle_row(duck, "page_hinkley_drift")
        assert got["n_days"] == len(xs)
        assert got["ph_stat"] == pytest.approx(m - minm, abs=1e-4)
        assert got["ph_min"] == pytest.approx(minm, abs=1e-4)


class TestBanditPin:
    def test_full_policy_replay(self, duck):
        rows = duck.execute(
            """WITH typ AS (
                 SELECT CAST(ts AS DATE) AS day, event_type,
                        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6)
                             AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS r
                 FROM events
                 WHERE event_type IN ('click', 'purchase', 'view')
                 GROUP BY 1, 2),
               days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
               SELECT d.day,
                      COALESCE(MAX(CASE WHEN t.event_type = 'click'
                               THEN t.r END), 0),
                      COALESCE(MAX(CASE WHEN t.event_type = 'purchase'
                               THEN t.r END), 0),
                      COALESCE(MAX(CASE WHEN t.event_type = 'view'
                               THEN t.r END), 0)
               FROM days d LEFT JOIN typ t ON d.day = t.day
               GROUP BY d.day ORDER BY d.day"""
        ).fetchall()
        n = [0, 0, 0]
        s = [0.0, 0.0, 0.0]
        tot = 0.0
        for i, (_, r1, r2, r3) in enumerate(rows, start=1):
            rs = (r1, r2, r3)
            if i <= 3:
                arm = i
            elif i % 7 == 0:
                arm = (i % 3) + 1
            elif s[0] / n[0] >= s[1] / n[1] and s[0] / n[0] >= s[2] / n[2]:
                arm = 1
            elif s[1] / n[1] >= s[2] / n[2]:
                arm = 2
            else:
                arm = 3
            n[arm - 1] += 1
            s[arm - 1] += rs[arm - 1]
            tot += rs[arm - 1]
        best = max(
            sum(r[1] for r in rows),
            sum(r[2] for r in rows),
            sum(r[3] for r in rows),
        )
        got = oracle_row(duck, "epsilon_greedy_bandit_replay")
        assert got["n_days"] == len(rows)
        assert [
            got["pulls_click"], got["pulls_purchase"], got["pulls_view"]
        ] == n
        assert got["policy_reward"] == pytest.approx(tot, abs=1e-5)
        assert got["best_fixed_reward"] == pytest.approx(best, abs=1e-5)
        assert got["regret"] == pytest.approx(best - tot, abs=1e-5)


class TestGoodTuringPin:
    def test_mass_and_monotonic_sanity(self, duck):
        got = oracle_row(duck, "good_turing_smoothing")
        assert 0 < got["p_unseen_mass"] < 1
        assert got["hapax_count"] <= got["vocab_size"]
        # Turing-smoothed singleton count is discounted below 1 for
        # Zipfian data (N2 < N1)
        if got["rstar_1"] is not None:
            assert got["rstar_1"] < 2.0


class TestWelchJtPin:
    def test_welch_matches_numpy(self, duck):
        a = np.array(
            daily_series(
                duck,
                "SELECT o_totalprice FROM orders "
                "WHERE o_orderpriority = '1-URGENT'",
            )
        )
        b = np.array(
            daily_series(
                duck,
                "SELECT o_totalprice FROM orders "
                "WHERE o_orderpriority = '5-LOW'",
            )
        )
        ea, eb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(ea + eb)
        df = (ea + eb) ** 2 / (
            ea**2 / (len(a) - 1) + eb**2 / (len(b) - 1)
        )
        got = oracle_row(duck, "welch_t_test_priority")
        assert got["welch_t"] == pytest.approx(t, abs=1e-3)
        assert got["welch_df"] == pytest.approx(df, rel=1e-4)
