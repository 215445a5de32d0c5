"""Property-based invariants (hypothesis) for the operators whose
contracts are algebraic laws rather than fixed examples. Example
counts are kept small — each example is a Spark job — but the
generators cover the edges (empties, NULLs, duplicates, unicode)
that fixed fixtures miss."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- URL canonicalization is idempotent -------------------------------------

_url = st.builds(
    lambda scheme, host, port, path, q, frag: (
        f"{scheme}://{host}{port}{path}{q}{frag}"
    ),
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.sampled_from(
        ["Example.com", "a.b.co.uk", "x.io", "WWW.Site.ORG", "127.0.0.1"]
    ),
    st.sampled_from(["", ":80", ":443", ":0080", ":8080"]),
    st.sampled_from(["", "/", "/Path/X", "/a/b/c"]),
    st.sampled_from(
        ["", "?q=1", "?utm_source=x", "?UTM_CAMPAIGN=y&q=2", "?a=1&b=2"]
    ),
    st.sampled_from(["", "#frag", "#x=1"]),
)


@SLOW
@given(st.lists(_url, min_size=1, max_size=8))
def test_normalize_url_idempotent(spark, urls):
    from data_export_tool_spark.functions.web import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(normalize_url(F.col("url")).alias("c"))
    twice = once.select(normalize_url(F.col("c")).alias("c"))
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]


# --- snapshot_diff / apply_diff round-trip ----------------------------------

_table = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 6)),
        st.one_of(st.none(), st.sampled_from(["a", "b", "ü", ""])),
    ),
    max_size=10,
)


@SLOW
@given(_table, _table)
def test_snapshot_diff_roundtrip_property(spark, old_rows, new_rows):
    from data_export_tool_spark.operators.upsert import apply_diff, snapshot_diff

    # snapshots must be key-unique on non-null keys (the operator's
    # documented precondition, like any MERGE target)
    def uniq(rows):
        seen, out = set(), []
        for k, v in rows:
            if k is None or k not in seen:
                out.append((k, v))
                seen.add(k)
        return out

    old = spark.createDataFrame(uniq(old_rows), "k long, v string")
    new = spark.createDataFrame(uniq(new_rows), "k long, v string")
    diff = snapshot_diff(old, new, ["k"])
    got = sorted(
        map(tuple, apply_diff(old, diff, ["k"]).collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1] or ""),
    )
    want = sorted(
        map(tuple, new.collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1] or ""),
    )
    assert got == want


# --- dedup_lines: the ban invariant -----------------------------------------


@SLOW
@given(
    st.lists(
        st.lists(
            st.sampled_from(
                [
                    "the repeated boilerplate line",
                    "another frequently repeated line",
                    "unique prose {} goes here",
                    "short",
                    "",
                ]
            ),
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 3),
)
def test_dedup_lines_ban_invariant(spark, docs, max_count):
    from data_export_tool_spark.operators.dedup import dedup_lines

    rows = [
        (i, "\n".join(line.format(i * 10 + j) for j, line in enumerate(doc)))
        for i, doc in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_lines(df, max_count=max_count, min_chars=10)

    # invariant 1: no eligible line survives anywhere if its corpus
    # count exceeded max_count
    surviving = [
        ln
        for r in out.collect()
        if r["text"]
        for ln in r["text"].split("\n")
    ]
    from collections import Counter

    original = Counter(
        ln.strip()
        for _, text in rows
        for ln in text.split("\n")
        if len(ln.strip()) >= 10
    )
    for ln in surviving:
        if len(ln.strip()) >= 10:
            assert original[ln.strip()] <= max_count, ln
    # invariant 2: surviving lines are a per-doc subsequence (order kept)
    out_by_id = {r["doc_id"]: r["text"] for r in out.collect()}
    for i, (_, text) in enumerate(rows):
        kept = out_by_id[i].split("\n") if out_by_id[i] else []
        it = iter(text.split("\n"))
        assert all(any(ln == cand for cand in it) for ln in kept), i


# --- stratified_sample_k size law -------------------------------------------


@SLOW
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", None]),
        st.integers(1, 40),
        min_size=1,
        max_size=4,
    ),
    st.integers(1, 12),
)
def test_stratified_sample_k_size_law(spark, strata, k):
    from data_export_tool_spark.operators.sampling import stratified_sample_k

    rows, nid = [], 0
    for s, n in strata.items():
        for _ in range(n):
            rows.append((nid, s))
            nid += 1
    df = spark.createDataFrame(rows, "id long, s string")
    out = stratified_sample_k(df, "id", "s", k)
    sizes = {
        r["s"]: r["n"]
        for r in out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {s: min(k, n) for s, n in strata.items()}


# --- grouped-MG composite-key encoding round-trips --------------------------

_hostile_group = st.one_of(
    st.none(),
    st.text(
        alphabet="\x1f\x10\x00\x01ab<>n " ,
        max_size=8,
    ),
)


@SLOW
@given(st.lists(_hostile_group, min_size=1, max_size=6, unique=True))
def test_mg_group_encoding_round_trips(spark, groups):
    """enc→dec is the identity for ANY group value — including values
    containing the separator, the escape char, or spellings of the old
    NULL sentinel — and encoded values never contain the separator, so
    the composite split can't mis-attribute a group."""
    from data_export_tool_spark.operators.sketch import (
        _G_SEP,
        _dec_group,
        _enc_group,
    )

    df = spark.createDataFrame([(g,) for g in groups], "g string")
    out = df.select(
        F.col("g"),
        _enc_group(F.col("g")).alias("e"),
        _dec_group(_enc_group(F.col("g"))).alias("d"),
    ).collect()
    for r in out:
        assert r["d"] == r["g"], (r["g"], r["e"], r["d"])
        assert _G_SEP not in r["e"]


def test_grouped_topk_hostile_group_values(spark):
    """Adversarial groups: one containing the separator, one literally
    matching the old sentinel spelling, one NULL — each must keep its
    own counts (ADVICE r4: the previous encoding merged or split
    them)."""
    from data_export_tool_spark.operators.sketch import grouped_topk_two_pass

    rows = (
        [("a\x1fb", "x")] * 5
        + [("a", "x")] * 3
        + [("\x01<null>", "x")] * 4
        + [(None, "x")] * 2
        + [("a\x1fb", "y")] * 1
    )
    df = spark.createDataFrame(rows, "g string, item string")
    got = {
        (r["g"], r["item"]): r["cnt"]
        for r in grouped_topk_two_pass(df, "item", 2, by="g", n_groups_hint=4).collect()
    }
    assert got == {
        ("a\x1fb", "x"): 5,
        ("a\x1fb", "y"): 1,
        ("a", "x"): 3,
        ("\x01<null>", "x"): 4,
        (None, "x"): 2,
    }


# --- chunking coverage/overlap law ------------------------------------------

@SLOW
@given(
    st.integers(min_value=1, max_value=120),
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=0, max_value=10),
)
def test_chunking_coverage_law(spark, n_tokens, chunk, overlap):
    from data_export_tool_spark.operators.chunking import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap)
        .orderBy("chunk_id")
        .collect()
    )
    # stitching chunks (dropping each successor's overlap) rebuilds the
    # document exactly — full coverage, no duplication, order kept
    joined: list[str] = []
    for r in rows:
        toks = r["chunk_text"].split()
        joined.extend(toks if not joined else toks[overlap:])
    assert joined == text.split()
    # every chunk except the last is full-size
    for r in rows[:-1]:
        assert r["n_tokens"] == chunk


# --- funnel fold vs direct reference on random event soups ------------------

_soup = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # user
        st.integers(min_value=0, max_value=40),  # ts offset seconds
        st.sampled_from(["view", "click", "purchase", "noise"]),
    ),
    min_size=0,
    max_size=30,
)


@SLOW
@given(_soup)
def test_funnel_fold_matches_reference_property(spark, rows):
    import datetime as dt

    from data_export_tool_spark.operators.funnel import funnel_steps

    steps = ["view", "click", "purchase"]
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (u, t0 + dt.timedelta(seconds=s), ty) for u, s, ty in rows
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string"
    ) if data else spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string"
    )
    got = {
        r["user_id"]: [
            r[f"ts_{i + 1}"] for i in range(3) if r[f"ts_{i + 1}"] is not None
        ]
        for r in funnel_steps(df, steps).collect()
    }
    # independent greedy reference
    idx = {s: i for i, s in enumerate(steps)}
    by_user: dict = {}
    for u, ts, ty in data:
        by_user.setdefault(u, []).append((ts, ty))
    want = {}
    for u, evs in by_user.items():
        done: list = []
        for ts, ty in sorted(evs, key=lambda e: (e[0], idx.get(e[1], 99))):
            if ty in idx and idx[ty] == len(done) and len(done) < 3 and (
                not done or ts > done[-1]
            ):
                done.append(ts)
        if any(t in idx for _, t in evs):
            want[u] = done
    assert got == want


# --- SCD-2 lifecycle vs a direct simulator ----------------------------------

_snapshots = st.lists(
    st.dictionaries(
        st.integers(min_value=1, max_value=5),  # keys
        st.sampled_from(["a", "b", "c"]),  # payload
        min_size=0,
        max_size=5,
    ),
    min_size=1,
    max_size=4,
)


@SLOW
@given(_snapshots)
def test_scd2_lifecycle_property(spark, snaps):
    """Applying an arbitrary snapshot sequence must produce exactly the
    version history a direct per-key simulation produces: one open
    version per live key, correct close timestamps, soft deletes, and
    re-births after deletion."""
    import datetime as dt

    from data_export_tool_spark.operators.upsert import scd2_apply, scd2_init

    times = [dt.datetime(2024, 1, 1 + i) for i in range(len(snaps))]
    mk = lambda snap: spark.createDataFrame(
        [(k, v) for k, v in snap.items()] or [], "k long, v string"
    )
    h = scd2_init(mk(snaps[0]), times[0])
    for snap, t in zip(snaps[1:], times[1:]):
        h = scd2_apply(h, mk(snap), ["k"], t)
    got = sorted(
        (r["k"], r["v"], str(r["valid_from"])[:10], str(r["valid_to"])[:10],
         r["is_current"])
        for r in h.collect()
    )

    # simulator: per key, track the open version; close on change/delete
    versions: list = []
    open_v: dict = {}
    for snap, t in zip(snaps, times):
        for k, (v, vf) in list(open_v.items()):
            if snap.get(k) != v:
                versions.append((k, v, vf, t, False))
                del open_v[k]
        for k, v in snap.items():
            if k not in open_v:
                open_v[k] = (v, t)
    for k, (v, vf) in open_v.items():
        versions.append((k, v, vf, None, True))
    want = sorted(
        (k, v, str(vf)[:10], str(vt)[:10], cur)
        for k, v, vf, vt, cur in versions
    )
    assert got == want


# --- group_split: total, group-atomic, python-replayable, shift law ---------

_fractions = st.dictionaries(
    st.sampled_from(["train", "valid", "test", "holdout"]),
    st.integers(min_value=1, max_value=20).map(lambda n: n / 40),
    min_size=1,
    max_size=4,
).filter(lambda d: sum(d.values()) <= 1.0)

_groups = st.lists(
    st.sampled_from(["a", "b", "dom-1", "dom-2", "Ünïcode", "", "x" * 40]),
    min_size=1,
    max_size=12,
)


def _py_split(group: str, fractions: dict) -> str:
    """Driver-side replay of group_split's md5 convention."""
    import hashlib

    bucket = int(hashlib.md5(str(group).encode()).hexdigest()[8:16], 16) % 1_000_000
    names = sorted(fractions)
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        if bucket < int(round(cum * 1_000_000)):
            return name
    return names[-1]


@SLOW
@given(fractions=_fractions, groups=_groups)
def test_group_split_total_atomic_and_replayable(spark, fractions, groups):
    from data_export_tool_spark.operators.sampling import group_split

    rows = [(i, g) for i, g in enumerate(groups)]
    df = spark.createDataFrame(rows, "id long, g string")
    out = {
        (r["id"], r["g"]): r["split"]
        for r in group_split(df, "g", fractions).collect()
    }
    assert len(out) == len(rows)  # total: every row assigned
    by_g: dict = {}
    for (_, g), s in out.items():
        by_g.setdefault(g, set()).add(s)
    assert all(len(v) == 1 for v in by_g.values())  # group-atomic
    for (i, g), s in out.items():
        assert s == _py_split(g, fractions), (g, fractions)


@SLOW
@given(fractions=_fractions, groups=_groups)
def test_group_split_growth_moves_groups_at_most_one_left(
    spark, fractions, groups
):
    """The documented re-tuning law: growing ONE split's fraction moves
    each group either nowhere or exactly one split EARLIER in
    sorted-name order; splits sorted before the grown one never change
    membership away from themselves."""
    from data_export_tool_spark.operators.sampling import group_split

    names = sorted(fractions)
    grown = names[0] if len(names) == 1 else names[len(names) // 2]
    total = sum(fractions.values())
    if total + 0.05 > 1.0:
        return  # no headroom to grow; property vacuous for this draw
    bigger = dict(fractions)
    bigger[grown] = bigger[grown] + 0.05

    df = spark.createDataFrame(
        [(i, g) for i, g in enumerate(groups)], "id long, g string"
    )
    before = {
        r["g"]: r["split"] for r in group_split(df, "g", fractions).collect()
    }
    after = {
        r["g"]: r["split"] for r in group_split(df, "g", bigger).collect()
    }
    for g, s_before in before.items():
        s_after = after[g]
        if s_after != s_before:
            ia, ib = names.index(s_after), names.index(s_before)
            assert ib - ia == 1, (g, s_before, s_after, fractions)


# --- fuzzy pairs == quadratic truth on hostile tiny strings ------------------


def _py_lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@SLOW
@given(
    names=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=4),
        min_size=1,
        max_size=8,
    ),
    d=st.sampled_from([1, 2]),
)
def test_fuzzy_pairs_match_python_quadratic(spark, names, d):
    """SymSpell blocking over a 2-letter alphabet (maximum variant
    collision pressure, empty strings included) == the quadratic
    python levenshtein truth, at d=1 and d=2."""
    from data_export_tool_spark.operators.fuzzy import fuzzy_dedup_pairs

    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy_dedup_pairs(df, max_distance=d).collect()
    }
    want = {
        (i, j): _py_lev(a, b)
        for i, a in rows
        for j, b in rows
        if i < j and _py_lev(a, b) <= d
    }
    assert got == want, (names, d)


# --- agg store merge law under random splits --------------------------------

_rows = st.lists(
    st.tuples(
        st.integers(0, 4),                               # group
        st.one_of(st.none(), st.floats(-100, 100)),      # value
        st.booleans(),                                   # goes to delta?
    ),
    min_size=1,
    max_size=20,
)


@SLOW
@given(_rows)
def test_agg_store_update_equals_recompute(spark, rows):
    """update(init(old), delta) == init(old ∪ delta) for every split of
    every frame — count/sum/min/max are algebraic, so equality is exact
    (modulo float sum order, pinned at 1e-9)."""
    from data_export_tool_spark.operators.aggstore import (
        agg_store_init,
        agg_store_read,
        agg_store_update,
    )

    aggs = {"v": ["sum", "min", "max", "avg"]}
    df = spark.createDataFrame(
        [(g, v) for g, v, _ in rows], "g int, v double"
    )
    old = spark.createDataFrame(
        [(g, v) for g, v, d in rows if not d] or [(999, None)],
        "g int, v double",
    )
    delta = spark.createDataFrame(
        [(g, v) for g, v, d in rows if d] or [(999, None)],
        "g int, v double",
    )
    keys = ["g"]
    got = {
        r["g"]: r
        for r in agg_store_read(
            agg_store_update(agg_store_init(old, keys, aggs), delta, keys, aggs),
            aggs,
        ).collect()
    }
    want = {
        r["g"]: r
        for r in agg_store_read(
            agg_store_init(old.unionByName(delta), keys, aggs), aggs
        ).collect()
    }
    assert set(got) == set(want)
    for g in want:
        for c in ("n_rows", "v_min", "v_max"):
            assert got[g][c] == want[g][c]
        for c in ("v_sum", "v_avg"):
            a, b = got[g][c], want[g][c]
            assert (a is None) == (b is None)
            if a is not None:
                assert abs(a - b) < 1e-9 * max(1.0, abs(b))


# --- isotonic calibration laws under random scored frames -------------------

_scored = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 15)),  # (label, score grid /16)
    min_size=2,
    max_size=40,
)


@SLOW
@given(_scored)
def test_isotonic_monotone_and_never_hurts_brier(spark, pairs):
    """For ANY scored frame: the fitted table is monotone, and the
    calibrated Brier never exceeds the raw Brier (identity is in the
    hypothesis class of the isotonic least-squares fit)."""
    from data_export_tool_spark.operators.evalmetrics import (
        apply_isotonic,
        fit_isotonic,
    )

    df = spark.createDataFrame(
        [(y, b / 16.0) for y, b in pairs], "y int, p double"
    )
    model = fit_isotonic(df, "y", "p", bins=16)
    v = model["values"]
    assert all(b >= a - 1e-15 for a, b in zip(v, v[1:]))
    row = apply_isotonic(df, model, "p").agg(
        F.avg(F.pow(F.col("p") - F.col("y"), 2.0)).alias("raw"),
        F.avg(F.pow(F.col("p_cal") - F.col("y"), 2.0)).alias("cal"),
    ).collect()[0]
    assert row["cal"] <= row["raw"] + 1e-12


# --- attribution credit conservation under random event streams -------------

_events = st.lists(
    st.tuples(
        st.integers(1, 3),                        # user
        st.integers(0, 20),                       # ts offset (hours)
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(_events, st.sampled_from(["last", "first", "linear", "position"]))
def test_attribution_credit_conservation(spark, events, model):
    """Every attributed conversion's weights sum to exactly 1 under
    every model and every event stream; unattributed conversions carry
    NULL weight; no touch is credited outside its window."""
    import datetime as dt

    from data_export_tool_spark.operators.attribution import (
        attribute_conversions,
    )

    t0 = dt.datetime(2024, 6, 1)
    df = spark.createDataFrame(
        [
            (u, t0 + dt.timedelta(hours=h), t)
            for u, h, t in events
        ],
        "user_id long, ts timestamp, event_type string",
    )
    out = attribute_conversions(
        df, "purchase", ["view", "click"], model=model, lookback="6 hours"
    ).collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault((r["user"], r["conv_ts"]), []).append(r)
    for (u, cts), rs in by_conv.items():
        if rs[0]["touch_ts"] is None:
            assert len(rs) == 1 and rs[0]["weight"] is None
            continue
        assert abs(sum(r["weight"] for r in rs) - 1.0) < 1e-9
        for r in rs:
            assert r["touch_ts"] <= cts
            assert (cts - r["touch_ts"]).total_seconds() < 6 * 3600
