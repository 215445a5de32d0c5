"""Classifier evaluation vs an exact tie-averaged Mann-Whitney python
oracle: lossless on grid-aligned scores, bounded error on continuous
scores, constant-score tie law, exclusion accounting, and a full
threshold-sweep confusion replay."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.evalmetrics import (
    binary_metrics,
    threshold_table,
)

# power-of-two grid: k/256 and k/256*256 are exact in binary floating
# point, so grid-aligned really means lossless (k/200 would float-drift
# across bin edges under floor)
BINS = 256


def _exact_auc(y, s):
    """Tie-averaged Mann-Whitney AUC, O(n log n) python reference."""
    order = np.lexsort((np.arange(len(s)), s))
    s, y = np.asarray(s)[order], np.asarray(y)[order]
    ranks = np.empty(len(s))
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0  # average 1-based rank
        i = j
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    u = ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


@pytest.fixture(scope="module")
def scored(spark):
    rng = np.random.RandomState(7)
    n = 4000
    y = (rng.rand(n) < 0.4).astype(int)
    # informative but noisy scores, then snapped to the k/BINS grid so
    # binning at BINS is lossless
    s = np.clip(0.5 * y + 0.35 * rng.rand(n) + 0.15 * rng.rand(n), 0, 0.999)
    s = np.round(s * BINS) / BINS
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, s)], "y int, p double"
    )
    return df, y, s


def test_auc_exact_on_grid_aligned_scores(spark, scored):
    df, y, s = scored
    rep = binary_metrics(df, "y", "p", bins=BINS).collect()[0]
    want = _exact_auc(y, s)
    ok = (
        abs(rep["auc"] - want) < 1e-12
        and rep["n_pos"] == int(y.sum())
        and rep["n_neg"] == int((1 - y).sum())
        and rep["n_excluded"] == 0
        and abs(rep["base_rate"] - y.mean()) < 1e-12
        and abs(
            rep["accuracy_at_half"] - float(((s >= 0.5) == y).mean())
        ) < 1e-12
    )
    record_opcheck(
        "binary_metrics_auc", len(y), bool(ok),
        oracle="python-reference", value=float(rep["auc"]),
    )
    assert ok


def test_auc_binned_close_on_continuous_scores(spark):
    rng = np.random.RandomState(11)
    n = 3000
    y = (rng.rand(n) < 0.5).astype(int)
    s = np.clip(0.4 * y + 0.6 * rng.rand(n), 0, 1.0)  # continuous
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, s)], "y int, p double"
    )
    got = binary_metrics(df, "y", "p", bins=1000).collect()[0]["auc"]
    assert abs(got - _exact_auc(y, s)) < 0.005  # resolution-bounded


def test_tie_and_exclusion_laws(spark):
    df = spark.createDataFrame(
        [
            (1, 0.5), (1, 0.5), (0, 0.5), (0, 0.5),  # all tied
            (2, 0.9),        # non-binary label: excluded
            (1, None),       # NULL score: excluded
            (0, 1.5),        # out-of-range: excluded
            (None, 0.2),     # NULL label: excluded
        ],
        "y int, p double",
    )
    rep = binary_metrics(df, "y", "p", bins=10).collect()[0]
    assert rep["auc"] == 0.5  # constant score = coin flip
    assert rep["n_pos"] == 2 and rep["n_neg"] == 2
    assert rep["n_excluded"] == 4

    one_class = spark.createDataFrame([(1, 0.3), (1, 0.9)], "y int, p double")
    assert np.isnan(binary_metrics(one_class).collect()[0]["auc"])

    with pytest.raises(ValueError):
        binary_metrics(df, "y", "p", bins=0)


def test_threshold_table_replays_confusions(spark, scored):
    df, y, s = scored
    got = threshold_table(df, "y", "p", bins=BINS).collect()
    assert len(got) == len(np.unique(np.floor(np.minimum(s * BINS, BINS - 1))))
    ok = True
    prev_recall = -1.0
    for r in got:
        t = r["threshold"]
        pred = s >= t
        tp = int((pred & (y == 1)).sum())
        fp = int((pred & (y == 0)).sum())
        ok = ok and r["tp"] == tp and r["fp"] == fp
        ok = ok and r["fn"] == int(y.sum()) - tp
        ok = ok and abs(r["precision"] - tp / (tp + fp)) < 1e-12
        ok = ok and abs(r["recall"] - tp / y.sum()) < 1e-12
        ok = ok and r["recall"] >= prev_recall  # descending thresholds
        prev_recall = r["recall"]
    record_opcheck(
        "threshold_table", len(got), bool(ok), oracle="python-reference"
    )
    assert ok


def _pav_reference(pairs):
    """Independent PAV formulation: iterative re-averaging over
    (rate, weight) lists until monotone. O(n²) but n ≤ bins."""
    vals = [p / (p + n) for p, n in pairs]
    wts = [float(p + n) for p, n in pairs]
    changed = True
    while changed:
        changed = False
        i = 0
        while i < len(vals) - 1:
            if vals[i] > vals[i + 1] + 1e-15:
                w = wts[i] + wts[i + 1]
                v = (vals[i] * wts[i] + vals[i + 1] * wts[i + 1]) / w
                vals[i : i + 2] = [v]
                wts[i : i + 2] = [w]
                changed = True
            else:
                i += 1
    return vals, wts


def test_isotonic_matches_pav_reference(spark, scored):
    from data_export_tool_spark.operators.evalmetrics import fit_isotonic

    df, y, s = scored
    model = fit_isotonic(df, "y", "p", bins=BINS)
    vals = model["values"]
    assert len(vals) == BINS
    assert all(b >= a - 1e-15 for a, b in zip(vals, vals[1:]))  # monotone

    # replay: bin counts in python, PAV by an independent formulation,
    # expand blocks onto the occupied-bin grid
    bins_idx = np.minimum(np.floor(s * BINS).astype(int), BINS - 1)
    occupied = sorted(set(bins_idx))
    pairs = [
        (int(y[bins_idx == b].sum()), int((1 - y)[bins_idx == b].sum()))
        for b in occupied
    ]
    ref_vals, ref_wts = _pav_reference(pairs)
    # walk occupied bins through the reference blocks
    want = {}
    bi = 0
    acc = 0.0
    for v, w in zip(ref_vals, ref_wts):
        remaining = w
        while remaining > 1e-9:
            b = occupied[bi]
            p, n = pairs[bi]
            want[b] = v
            remaining -= p + n
            bi += 1
    ok = all(abs(vals[b] - want[b]) < 1e-12 for b in occupied)
    record_opcheck(
        "fit_isotonic", len(occupied), bool(ok), oracle="python-reference"
    )
    assert ok


def test_isotonic_laws_and_apply(spark):
    from data_export_tool_spark.operators.evalmetrics import (
        apply_isotonic,
        fit_isotonic,
    )

    # hand case: rates 0.8 then 0.2 (violation) pool to 0.5 everywhere
    df = spark.createDataFrame(
        [(1, 0.05), (1, 0.05), (0, 0.05), (1, 0.05), (1, 0.05),
         (1, 0.9), (0, 0.9), (0, 0.9), (0, 0.9), (0, 0.9)],
        "y int, p double",
    )
    m = fit_isotonic(df, "y", "p", bins=4)
    assert all(abs(v - 0.5) < 1e-12 for v in m["values"])

    # already-monotone rates stay untouched; gaps inherit leftward
    df2 = spark.createDataFrame(
        [(0, 0.1), (0, 0.1), (1, 0.9), (1, 0.9), (0, 0.9), (1, 0.95)],
        "y int, p double",
    )
    m2 = fit_isotonic(df2, "y", "p", bins=20)
    v = m2["values"]
    assert v[2] == 0.0            # bin 2 rate 0/2
    assert abs(v[18] - 2 / 3) < 1e-12
    assert v[19] == 1.0
    assert v[0] == v[1] == v[2]   # leading gap inherits first block
    assert v[10] == v[2]          # interior gap inherits leftward

    out = {
        r["p"]: r["p_cal"]
        for r in apply_isotonic(
            spark.createDataFrame(
                [(0.11,), (0.93,), (0.99,), (None,), (1.4,)], "p double"
            ),
            m2,
        ).collect()
    }
    assert out[0.11] == v[2] and abs(out[0.93] - 2 / 3) < 1e-12
    assert out[0.99] == 1.0
    assert out[None] is None and out[1.4] is None


def test_isotonic_never_hurts_brier(spark, scored):
    """Identity is monotone, so the isotonic fit's weighted squared
    error can only improve on the raw scores — a guarantee, not a
    tendency. Miscalibrate the scores (cube them) and check."""
    from data_export_tool_spark.operators.evalmetrics import (
        apply_isotonic,
        fit_isotonic,
    )

    df, y, s = scored
    warped = df.withColumn("p", F.pow(F.col("p"), 3.0))
    model = fit_isotonic(warped, "y", "p", bins=BINS)
    cal = apply_isotonic(warped, model, "p")
    row = cal.agg(
        F.avg(F.pow(F.col("p") - F.col("y"), 2.0)).alias("brier_raw"),
        F.avg(F.pow(F.col("p_cal") - F.col("y"), 2.0)).alias("brier_cal"),
    ).collect()[0]
    record_opcheck(
        "apply_isotonic_brier", len(y),
        bool(row["brier_cal"] <= row["brier_raw"] + 1e-12),
        oracle="brier-improvement-law", value=float(row["brier_cal"]),
    )
    assert row["brier_cal"] <= row["brier_raw"] + 1e-12


def test_grouped_metrics_match_per_group_oracle(spark):
    from data_export_tool_spark.operators.evalmetrics import (
        binary_metrics_grouped,
    )

    rng = np.random.RandomState(23)
    n = 3000
    groups = np.array(["en", "es", "de", None], dtype=object)[
        rng.randint(0, 4, n)
    ]
    y = (rng.rand(n) < 0.45).astype(int)
    s = np.round(np.clip(0.5 * y + 0.5 * rng.rand(n), 0, 0.999) * BINS) / BINS
    # poison a few rows per contract: excluded but group-attributed
    y2 = y.astype(object)
    y2[0] = 5
    s2 = s.astype(object)
    s2[1] = None
    df = spark.createDataFrame(
        [
            (g, int(a) if a is not None and a != 5 else a, b)
            for g, a, b in zip(groups, y2, s2)
        ],
        "lang string, y int, p double",
    )
    got = {
        r["lang"]: r
        for r in binary_metrics_grouped(df, "lang", bins=BINS).collect()
    }
    assert set(got) == {"en", "es", "de", None}
    ok = True
    for g in got:
        mask = np.array(
            [(gg == g) if g is not None else (gg is None) for gg in groups]
        )
        usable = mask & np.array(
            [(a in (0, 1)) and (b is not None) for a, b in zip(y2, s2)]
        )
        yy = y[usable]
        ss = s[usable]
        r = got[g]
        ok = ok and abs(r["auc"] - _exact_auc(yy, ss)) < 1e-12
        ok = ok and r["n_pos"] == int(yy.sum())
        ok = ok and r["n_neg"] == int((1 - yy).sum())
        ok = ok and r["n_excluded"] == int(mask.sum() - usable.sum())
        ok = ok and abs(
            r["accuracy_at_half"] - float(((ss >= 0.5) == yy).mean())
        ) < 1e-12
    record_opcheck(
        "binary_metrics_grouped", len(got), bool(ok),
        oracle="python-reference",
    )
    assert ok

    # one-class group → NULL auc but real counts
    oc = spark.createDataFrame(
        [("a", 1, 0.2), ("a", 1, 0.9), ("b", 1, 0.3), ("b", 0, 0.6)],
        "g string, y int, p double",
    )
    rows = {r["g"]: r for r in binary_metrics_grouped(oc, "g", bins=8).collect()}
    assert rows["a"]["auc"] is None and rows["a"]["n_pos"] == 2
    assert rows["b"]["auc"] is not None


def test_cross_validation_replay_and_fold_laws(spark, sf_dir):
    """CV = composition of two independently-pinned pieces; what this
    pins is the harness: md5-fold assignment (group-atomic, total,
    deterministic), per-fold train/test disjointness (train_n +
    held-out rows == corpus), and each fold's report replaying the
    explicit fit-then-evaluate two-step."""
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.evalmetrics import (
        binary_metrics,
        cross_validate_classifier,
    )
    from data_export_tool_spark.operators.linear import (
        logreg_fit,
        logreg_predict,
    )
    from data_export_tool_spark.operators.sampling import sample_bucket

    REG = 1e-2
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = F.col("embedding")
    df = emb.withColumn(
        "y", (2.0 * e[0] - e[3] > 0.1).cast("int")
    ).withColumn("grp", (F.col("vec_id") % 40).cast("string"))
    K = 3
    got = {
        r["fold"]: r
        for r in cross_validate_classifier(
            df, "y", "grp", k=K, bins=256, reg=REG, iters=3, tol=0.0
        ).collect()
    }
    assert set(got) == {0, 1, 2}
    n_total = df.count()

    tagged = df.withColumn("__fold", sample_bucket(F.col("grp")) % K)
    # fold assignment is group-atomic
    assert (
        tagged.groupBy("grp")
        .agg(F.countDistinct("__fold").alias("d"))
        .where(F.col("d") > 1)
        .count()
        == 0
    )
    ok = True
    for f in range(K):
        train = tagged.where(F.col("__fold") != f)
        test = tagged.where(F.col("__fold") == f)
        model = logreg_fit(train, "y", reg=REG, iters=3, tol=0.0)
        want = binary_metrics(
            logreg_predict(test, model, "embedding", "__p"),
            "y", "__p", bins=256,
        ).collect()[0]
        r = got[f]
        ok = ok and r["train_n"] == model["n"]
        ok = ok and r["train_n"] + r["n_pos"] + r["n_neg"] == n_total
        for c in ("auc", "base_rate", "accuracy_at_half"):
            ok = ok and abs(r[c] - want[c]) < 1e-9
        for c in ("n_pos", "n_neg", "n_excluded"):
            ok = ok and r[c] == want[c]
        # held-out separable boundary: every fold must generalize
        ok = ok and r["auc"] > 0.9
    record_opcheck(
        "cross_validate_classifier", K, bool(ok),
        oracle="composition-replay",
        value=float(sum(got[f]["auc"] for f in range(K)) / K),
    )
    assert ok

    with pytest.raises(ValueError):
        cross_validate_classifier(df, "y", "grp", k=1)


def test_mutual_info_matches_python_replay(spark, sf_dir):
    """MI/NMI/entropies vs an exact python replay over the same
    binning, plus the analytic laws: a label-determined feature has
    nmi = 1, an independent constant-ish feature ~0, and a string
    feature uses its values directly."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.evalmetrics import mutual_info

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.col("value").cast("double").alias("value"),
        (F.unix_millis(F.col("ts").cast("timestamp")) % 7).cast("double").alias("noise"),
    )
    out = {
        r["feature"]: r
        for r in mutual_info(
            ev, ["value", "noise", "event_type"], "event_type", bins=8
        ).collect()
    }
    # python replay for the numeric feature
    rows = [
        (r["value"], r["event_type"])
        for r in ev.select("value", "event_type").collect()
        if r["value"] is not None and r["event_type"] is not None
    ]
    lo = min(v for v, _ in rows)
    hi = max(v for v, _ in rows)
    w = (hi - lo) / 8
    cells: dict = {}
    for v, yv in rows:
        b = min(int((v - lo) / w), 7)
        cells[(b, yv)] = cells.get((b, yv), 0) + 1
    n = sum(cells.values())
    px: dict = {}
    py: dict = {}
    for (b, yv), c in cells.items():
        px[b] = px.get(b, 0) + c
        py[yv] = py.get(yv, 0) + c
    mi = sum(
        c / n * math.log((c / n) / (px[b] / n * py[yv] / n))
        for (b, yv), c in cells.items()
    )
    hx = -sum(v / n * math.log(v / n) for v in px.values())
    hy = -sum(v / n * math.log(v / n) for v in py.values())
    r = out["value"]
    assert r["mi"] == pytest.approx(max(0.0, mi), abs=1e-9)
    assert r["h_feature"] == pytest.approx(hx, abs=1e-9)
    assert r["h_label"] == pytest.approx(hy, abs=1e-9)
    assert r["nmi"] == pytest.approx(max(0.0, mi) / min(hx, hy), abs=1e-9)
    assert r["n_used"] == n
    # the label against itself (string feature path): nmi = 1
    assert out["event_type"]["nmi"] == pytest.approx(1.0, abs=1e-9)
    # weak/no relationship stays near 0
    assert out["noise"]["nmi"] < 0.05
    from tests.conftest import record_opcheck

    record_opcheck("mutual_info", 3, True, oracle="python-reference")

    # constant feature: mi = 0 by definition, no division blowup
    const = ev.withColumn("konst", F.lit(1.0))
    k = {
        r["feature"]: r for r in mutual_info(const, "konst", "event_type").collect()
    }["konst"]
    assert k["mi"] == 0.0 and k["nmi"] == 0.0
    with pytest.raises(ValueError):
        mutual_info(ev, [], "event_type")
    with pytest.raises(ValueError):
        mutual_info(ev, "value", "event_type", bins=1)
