"""k-anonymity / l-diversity audits vs DuckDB replays of the same
definitions over the same parquet, plus NULL-class and suppression-law
edges on a hand-built frame."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.privacy import (
    equivalence_classes,
    k_anonymity_report,
    risky_classes,
    suppress_small_classes,
)

QUASI = ["c_nationkey", "c_mktsegment"]
K, L = 10, 5


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


def test_report_matches_duckdb(spark, customer, sf_dir):
    got = k_anonymity_report(
        customer, QUASI, K, sensitive_cols=["c_acctbal"], l=L
    ).toPandas()
    want = duckdb.sql(
        f"""
        WITH classes AS (
          SELECT c_nationkey, c_mktsegment,
                 COUNT(*) AS class_size,
                 COUNT(DISTINCT c_acctbal) AS ldiv
          FROM read_parquet('{sf_dir}/customer.parquet')
          GROUP BY 1, 2
        )
        SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(MIN(class_size) AS BIGINT) AS min_class_size,
               CAST(SUM(CASE WHEN class_size < {K} THEN 1 ELSE 0 END) AS BIGINT)
                 AS classes_below_k,
               CAST(SUM(CASE WHEN class_size < {K} THEN class_size ELSE 0 END)
                 AS BIGINT) AS rows_below_k,
               CAST(MIN(ldiv) AS BIGINT) AS min_diversity_c_acctbal,
               CAST(SUM(CASE WHEN ldiv < {L} THEN 1 ELSE 0 END) AS BIGINT)
                 AS classes_below_l_c_acctbal
        FROM classes
        """
    ).df()
    got = got[want.columns].astype("int64")
    ok = got.equals(want.astype("int64"))
    record_opcheck("k_anonymity_report", len(want.columns), bool(ok))
    assert ok


def test_risky_and_suppress_agree_with_duckdb(spark, customer, sf_dir):
    risky = risky_classes(
        customer, QUASI, K, sensitive_cols=["c_acctbal"], l=L
    )
    want_risky = duckdb.sql(
        f"""
        SELECT c_nationkey, c_mktsegment
        FROM read_parquet('{sf_dir}/customer.parquet')
        GROUP BY 1, 2
        HAVING COUNT(*) < {K} OR COUNT(DISTINCT c_acctbal) < {L}
        """
    ).df()
    got_risky = {
        (r["c_nationkey"], r["c_mktsegment"]) for r in risky.collect()
    }
    assert got_risky == set(
        zip(want_risky["c_nationkey"], want_risky["c_mktsegment"])
    )

    kept = suppress_small_classes(
        customer, QUASI, K, sensitive_cols=["c_acctbal"], l=L
    )
    want_keys = duckdb.sql(
        f"""
        WITH bad AS (
          SELECT c_nationkey, c_mktsegment
          FROM read_parquet('{sf_dir}/customer.parquet')
          GROUP BY 1, 2
          HAVING COUNT(*) < {K} OR COUNT(DISTINCT c_acctbal) < {L}
        )
        SELECT c_custkey
        FROM read_parquet('{sf_dir}/customer.parquet')
        ANTI JOIN bad USING (c_nationkey, c_mktsegment)
        """
    ).df()["c_custkey"]
    got_keys = {r["c_custkey"] for r in kept.select("c_custkey").collect()}
    ok = got_keys == set(want_keys)
    record_opcheck("suppress_small_classes", len(want_keys), bool(ok))
    assert ok
    # suppression law: kept rows ∪ rows of risky classes == input
    assert kept.count() + customer.join(
        risky.select(*QUASI), QUASI, "left_semi"
    ).count() == customer.count()


def test_null_classes_and_schema(spark):
    df = spark.createDataFrame(
        [
            ("north", None, "flu"),
            ("north", None, "flu"),
            ("north", None, "tb"),
            ("south", 1980, "flu"),
            (None, None, "hiv"),
        ],
        "region string, birth_year int, dx string",
    )
    classes = {
        (r["region"], r["birth_year"]): (r["class_size"], r["distinct_dx"])
        for r in equivalence_classes(
            df, ["region", "birth_year"], ["dx"]
        ).collect()
    }
    # NULL quasi values form their own classes (ANSI GROUP BY)
    assert classes[("north", None)] == (3, 2)
    assert classes[(None, None)] == (1, 1)

    # the singleton (None, None) class must suppress; the NULL-keyed
    # compliant class must SURVIVE the null-safe semi join
    kept = suppress_small_classes(df, ["region", "birth_year"], 2)
    assert kept.count() == 3
    assert {r["region"] for r in kept.collect()} == {"north"}

    rep = k_anonymity_report(
        df, ["region", "birth_year"], 2, sensitive_cols=["dx"], l=2
    ).collect()[0]
    assert rep["min_class_size"] == 1
    assert rep["classes_below_k"] == 2
    assert rep["rows_below_k"] == 2
    assert rep["min_diversity_dx"] == 1
    assert rep["classes_below_l_dx"] == 2

    with pytest.raises(ValueError):
        k_anonymity_report(df, [], 2)
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["region"], 0)
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["region"], 2, l=0)


def test_suppress_plan_has_no_window(spark, customer):
    """The release step must go through the aggregated-class semi join,
    never a per-row window over the quasi key."""
    plan = (
        suppress_small_classes(customer, QUASI, K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_dp_release_counts_matches_python_replay(spark, sf_dir):
    """Exact replay of the bounded counts AND the seeded Laplace noise
    (md5 -> uniform -> inverse CDF), plus the epsilon dial law."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.privacy import dp_release_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eps, cap, seed = 1.0, 3, 7
    got = {
        r["event_type"]: (r["n_true_bounded"], r["n_released"])
        for r in dp_release_counts(
            ev, "event_type", epsilon=eps, user_col="user_id",
            max_contributions=cap, seed=seed,
        ).collect()
    }
    # python replay
    rows = ev.select("user_id", "event_type").collect()
    per = {}
    for r in rows:
        if r["user_id"] is None:
            continue
        per[(r["user_id"], r["event_type"])] = per.get(
            (r["user_id"], r["event_type"]), 0
        ) + 1
    want_true: dict = {}
    for (u, g), c in per.items():
        want_true[g] = want_true.get(g, 0) + min(c, cap)
    ok_rows = 0
    for g, (nt, nr) in got.items():
        assert nt == want_true[g], g
        hx = hashlib.md5(f"{seed}␟{g}".encode()).hexdigest()
        u = (int(hx[8:16], 16) + 0.5) / float(1 << 32)
        b = cap / eps
        lap = -b * math.copysign(1.0, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
        want_rel = max(0, round(nt + lap))
        assert nr == want_rel, g
        ok_rows += 1
    record_opcheck("dp_release_counts", ok_rows, True, oracle="python-reference")
    # epsilon dial: huge epsilon -> noise vanishes
    exact = {
        r["event_type"]: r["n_released"]
        for r in dp_release_counts(
            ev, "event_type", epsilon=1e9, user_col="user_id",
            max_contributions=cap, seed=seed,
        ).collect()
    }
    assert exact == {g: v for g, v in want_true.items()}


def test_dp_release_contracts(spark):
    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.privacy import dp_release_counts

    df = spark.createDataFrame(
        [(1, "a")] * 100 + [(2, "a"), (None, "a"), (3, "b")],
        "user_id long, g string",
    )
    out = {
        r["g"]: r["n_true_bounded"]
        for r in dp_release_counts(
            df, "g", epsilon=1.0, user_col="user_id", max_contributions=2
        ).collect()
    }
    # bot user contributes at most 2; NULL user excluded under user-DP
    assert out == {"a": 3, "b": 1}
    # event-level (no user_col): every row counts
    out2 = {
        r["g"]: r["n_true_bounded"]
        for r in dp_release_counts(df, "g", epsilon=1.0).collect()
    }
    assert out2 == {"a": 102, "b": 1}
    with pytest.raises(ValueError):
        dp_release_counts(df, "g", epsilon=0.0)
    with pytest.raises(ValueError):
        dp_release_counts(df, [], epsilon=1.0)
    with pytest.raises(ValueError):
        dp_release_counts(df, "g", epsilon=1.0, user_col="user_id",
                          max_contributions=0)
    # clamp law: tiny epsilon can go negative only when unclamped
    neg = dp_release_counts(
        df, "g", epsilon=1e-6, clamp_nonnegative=False
    ).collect()
    clamped = dp_release_counts(df, "g", epsilon=1e-6).collect()
    assert all(r["n_released"] >= 0 for r in clamped)
    assert any(r["n_released"] < 0 for r in neg) or all(
        r["n_released"] >= 0 for r in neg
    )


def test_dp_release_quantiles_matches_python_replay(spark, sf_dir):
    """Exact replay of the WHOLE quantile mechanism: clamp → bin →
    first-m-units user bounding → seeded Laplace per cell → clamp →
    CDF inversion at bin midpoints; plus the epsilon dial (huge ε →
    the noiseless histogram quantile) and the empty-signal NULL."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.privacy import dp_release_quantiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eps, cap, seed, lo, hi, nb = 1.0, 2, 11, 0.0, 100.0, 16
    probs = [0.5, 0.9]
    got = {
        (r["event_type"], r["p"]): (r["value_released"], r["n_released_total"])
        for r in dp_release_quantiles(
            ev, "value", probs, epsilon=eps, lo=lo, hi=hi, n_bins=nb,
            group_cols="event_type", user_col="user_id",
            max_contributions=cap, seed=seed,
        ).collect()
    }
    rows = ev.select("user_id", "event_type", "value").collect()
    w = (hi - lo) / nb
    per: dict = {}
    for r in rows:
        if r["user_id"] is None or r["value"] is None:
            continue
        v = min(max(float(r["value"]), lo), hi)
        b = min(int((v - lo) // w), nb - 1)
        per.setdefault((r["user_id"], r["event_type"]), {})
        per[(r["user_id"], r["event_type"])][b] = (
            per[(r["user_id"], r["event_type"])].get(b, 0) + 1
        )
    cells: dict = {}
    for (u, g), bins in per.items():
        left = cap
        for b in sorted(bins):
            k = min(bins[b], left)
            left -= k
            if k:
                cells.setdefault(g, {})
                cells[g][b] = cells[g].get(b, 0) + k
            if left <= 0:
                break
    want = {}
    for g, bins in cells.items():
        noisy = {}
        for b in range(nb):
            if b not in bins and True:
                # absent cells were never built -> no noise row
                continue
            hx = hashlib.md5(f"{seed}␟{g}␟{b}".encode()).hexdigest()
            u01 = (int(hx[8:16], 16) + 0.5) / float(1 << 32)
            lb = cap / eps
            lap = -lb * math.copysign(1.0, u01 - 0.5) * math.log(
                1 - 2 * abs(u01 - 0.5)
            )
            noisy[b] = max(0.0, round(bins[b] + lap))
        tot = sum(noisy.values())
        for p in probs:
            if tot <= 0:
                want[(g, p)] = (None, 0)
                continue
            cum = 0.0
            pick = None
            for b in sorted(noisy):
                cum += noisy[b]
                if pick is None and cum >= p * tot:
                    pick = b
            want[(g, p)] = (round(lo + (pick + 0.5) * w, 9), int(tot))
    assert got == want and len(want) >= 4
    record_opcheck(
        "dp_release_quantiles", len(want), True, oracle="python-reference"
    )
    # epsilon dial: huge epsilon -> exact bounded-histogram quantiles
    exact = {
        (r["event_type"], r["p"]): r["value_released"]
        for r in dp_release_quantiles(
            ev, "value", [0.5], epsilon=1e9, lo=lo, hi=hi, n_bins=nb,
            group_cols="event_type", user_col="user_id",
            max_contributions=cap, seed=seed,
        ).collect()
    }
    for g, bins in cells.items():
        tot = sum(bins.values())
        cum, pick = 0, None
        for b in sorted(bins):
            cum += bins[b]
            if pick is None and cum >= 0.5 * tot:
                pick = b
        assert exact[(g, 0.5)] == round(lo + (pick + 0.5) * w, 9)

    import pytest

    with pytest.raises(ValueError):
        dp_release_quantiles(ev, "value", [], 1.0, 0, 1)
    with pytest.raises(ValueError):
        dp_release_quantiles(ev, "value", [0.5], 1.0, 5, 5)
    with pytest.raises(ValueError):
        dp_release_quantiles(ev, "value", [1.5], 1.0, 0, 1)
