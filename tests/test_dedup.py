"""Dedup operator tests: exact, MinHash-LSH, SimHash, n-gram Jaccard —
on planted near/exact duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck

from data_export_tool_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)

BASE = (
    "spark shuffles data between stages when a wide dependency requires "
    "repartitioning by key and the optimizer cannot elide the exchange"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE.replace("optimizer", "planner")),  # near dup of 1
        (4, "completely different text about cooking pasta with garlic and olive oil in rome"),
        (5, "Spark   shuffles, data between stages when a wide dependency requires "
            "repartitioning by key and the optimizer cannot elide the exchange!"),  # normalizes to dup of 1
        (6, "yet another unrelated document mentioning satellites orbit geometry and physics"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_groups(docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].dup_count == 3  # 1, 2, 5 normalize identically
    assert groups[0].keep_id == 1


def test_dedup_exact_keeps_one_representative(docs):
    kept = sorted(r.doc_id for r in dedup_exact(docs).collect())
    assert kept == [1, 3, 4, 6]


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(docs, num_hashes=16, bands=8).collect()
    }
    # exact dups always collide on every band
    assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs
    # near-dup should collide on at least one of 8 bands (2-row bands)
    assert (1, 3) in pairs
    # unrelated docs must not pair
    assert (4, 6) not in pairs


def test_ngram_jaccard_values(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(1, 3)] < 1.0
    assert (4, 6) not in pairs


def test_ngram_jaccard_with_candidate_restriction(spark, docs):
    cands = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2, candidates=cands).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 3)}


def test_simhash_separates_near_from_far(spark, docs):
    from data_export_tool_spark.operators.dedup import hamming64, simhash

    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    df = spark.createDataFrame(
        [(sigs[1], sigs[3]), (sigs[1], sigs[4])], "a long, b long"
    )
    near, far = [
        r.h for r in df.select(hamming64(F.col("a"), F.col("b")).alias("h")).collect()
    ]
    assert near < far
    assert near <= 16  # near-dup keeps most bits


def test_simhash_near_duplicates_pairs(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_near_duplicates(docs, max_hamming=16).collect()
    }
    assert (1, 2) in pairs and (1, 5) in pairs
    assert (4, 6) not in pairs


def test_dedup_two_phase_matches_window_semantics(docs):
    """dedup_exact_two_phase (pre-aggregated decision + join-back) must
    keep exactly the min-id row per fingerprint — same answer as the
    semi-join form, different (skew-safe) plan."""
    from data_export_tool_spark.operators.dedup import dedup_exact_two_phase

    kept = sorted(r.doc_id for r in dedup_exact_two_phase(docs).collect())
    assert kept == [1, 3, 4, 6]


def test_dedup_two_phase_hot_cluster(spark):
    """The 100 TB skew scenario in miniature: 10⁵ copies of ONE
    normalized text (a mega-duplicate cluster) plus a sprinkle of
    unique docs. The two-phase shape must (a) return the single keeper
    for the hot fingerprint and every unique doc, and (b) plan the
    decision as a map-side-combined aggregate — no Window over the
    fingerprint, which would serialize the hot cluster onto one task."""
    from data_export_tool_spark.operators.dedup import dedup_exact_two_phase

    n_hot = 100_000
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate page repeated everywhere").alias("text"),
    )
    uniq = spark.range(n_hot, n_hot + 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id")).alias("text"),
    )
    df = hot.unionByName(uniq)
    out = dedup_exact_two_phase(df)
    plan = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Window" not in plan, "dedup decision regressed to a window"
    assert "partial_min" in plan, "decision aggregate lost map-side combine"
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [0] + list(range(n_hot, n_hot + 50))


def test_incremental_dedup_against_store(spark):
    """Cross-snapshot dedup: docs whose (normalized) content was seen
    in a previous snapshot drop; new content survives; the rolled-
    forward store covers both snapshots."""
    from data_export_tool_spark.operators.dedup import (
        dedup_against,
        fingerprint_store,
    )

    snap1 = spark.createDataFrame(
        [(1, "the cat sat"), (2, "something else entirely")],
        "doc_id long, text string",
    )
    store = fingerprint_store(snap1)
    snap2 = spark.createDataFrame(
        [
            (10, "The cat   sat!"),  # normalizes to snap1 doc 1 → drop
            (11, "completely new text"),
            (12, "something else entirely"),  # exact repeat → drop
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in dedup_against(snap2, store).collect())
    assert kept == [11]
    # roll the store forward: union of both snapshots' fingerprints
    rolled = store.unionByName(fingerprint_store(snap2)).distinct()
    assert rolled.count() == 3  # cat-sat, something-else, new-text
    none_left = dedup_against(snap2, rolled).count()
    assert none_left == 0


def test_null_text_rows_dedup_as_one_cluster(spark):
    # GROUP BY semantics: NULL texts are one cluster in every SQL
    # engine, but a plain equi-join on the nullable fingerprint never
    # matches NULL — the two-phase join-back form silently kept every
    # NULL-text row until the key became null-safe. All three forms
    # must agree: one survivor (min id) from the NULL cluster.
    from data_export_tool_spark.operators.dedup import (
        dedup_against,
        dedup_exact,
        dedup_exact_two_phase,
        fingerprint_store,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "a a"), (4, "a a"), (5, "b")],
        "doc_id long, text string",
    )
    expect = [1, 3, 5]
    assert sorted(r.doc_id for r in dedup_exact(df).collect()) == expect
    assert sorted(r.doc_id for r in dedup_exact_two_phase(df).collect()) == expect
    # incremental: a later snapshot's NULL-text row is a repeat too
    store = fingerprint_store(df)
    snap2 = spark.createDataFrame(
        [(6, None), (7, "a a"), (8, "new")], "doc_id long, text string"
    )
    assert sorted(r.doc_id for r in dedup_against(snap2, store).collect()) == [8]


# ---------------------------------------------------------------------------
# corpus-wide line-level dedup (dedup_lines)
# ---------------------------------------------------------------------------


def test_dedup_lines_semantics(spark):
    from data_export_tool_spark.operators.dedup import dedup_lines

    boiler = "accept all cookies to continue"
    rows = [
        (1, f"{boiler}\nunique prose of doc one\nok"),
        (2, f"{boiler}\nanother document body here"),
        (3, f"{boiler}\nthird text entirely different"),
        (4, None),
        (5, "short\nok\n-"),  # only sub-min lines -> untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in dedup_lines(df).collect()}

    # the boilerplate line (3 occurrences > max_count=1) is dropped
    assert got[1]["text"] == "unique prose of doc one\nok"
    assert got[1]["n_lines"] == 3 and got[1]["n_lines_removed"] == 1
    assert got[2]["text"] == "another document body here"
    assert got[3]["text"] == "third text entirely different"
    # NULL passes through
    assert got[4]["text"] is None
    # short lines exempt even though 'ok'/'short' repeat nowhere
    assert got[5]["text"] == "short\nok\n-"
    assert got[5]["n_lines_removed"] == 0


def test_dedup_lines_order_and_max_count(spark):
    from data_export_tool_spark.operators.dedup import dedup_lines

    dup = "this exact line appears twice only"
    df = spark.createDataFrame(
        [
            (1, f"alpha first line of text\n{dup}\nomega last line of text"),
            (2, f"{dup}\nsomething else entirely here"),
        ],
        "doc_id long, text string",
    )
    # max_count=2 tolerates the pair
    tolerant = {r["doc_id"]: r["text"] for r in dedup_lines(df, max_count=2).collect()}
    assert tolerant[1] == f"alpha first line of text\n{dup}\nomega last line of text"
    # max_count=1 drops it, preserving surrounding order
    strict = {r["doc_id"]: r["text"] for r in dedup_lines(df, max_count=1).collect()}
    assert strict[1] == "alpha first line of text\nomega last line of text"
    assert strict[2] == "something else entirely here"


def test_dedup_lines_matches_duckdb(spark, sf_dir):
    import duckdb

    from data_export_tool_spark.operators.dedup import dedup_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in dedup_lines(docs, max_count=1, min_chars=10).collect()
    }
    want = {
        k: (t, n)
        for k, t, n in duckdb.sql(
            f"""
    WITH lines AS (
      SELECT doc_id, u.pair.pos AS pos, u.pair.line AS line,
             trim(u.pair.line) AS t
      FROM (SELECT doc_id, string_split(text, chr(10)) AS parts
            FROM read_parquet('{sf_dir}/documents.parquet')),
           unnest(list_transform(parts, (x, i) -> struct_pack(line := x, pos := i))) AS u(pair)
    ),
    banned AS (
      SELECT t FROM lines WHERE length(t) >= 10 GROUP BY t HAVING count(*) > 1
    ),
    marked AS (
      SELECT l.*, (length(l.t) >= 10 AND b.t IS NOT NULL) AS dropped
      FROM lines l LEFT JOIN banned b ON l.t = b.t
    )
    SELECT doc_id,
           coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (NOT dropped), '') AS text,
           CAST(count(*) FILTER (dropped) AS BIGINT) AS n_removed
    FROM marked GROUP BY doc_id
    """
        ).fetchall()
    }
    nulls = {r["doc_id"] for r in docs.where(F.col("text").isNull()).collect()}
    ok = set(got) == set(want) | nulls and all(
        got[k] == v for k, v in want.items()
    )
    record_opcheck("dedup_lines", len(want), ok)
    assert set(got) == set(want) | nulls
    for k, v in want.items():
        assert got[k] == v, k


def test_near_dedup_against_store_python_replay(spark):
    """Incremental NEAR-dup vs a full python replay of the entire
    algorithm (md5 MinHash signatures, banding, candidate rule, and
    Jaccard over the portable 64-bit shingle hashes) on an ASCII
    fixture — the oracle implements the same public recipe end to end,
    so band-miss behavior is replayed too, not idealized."""
    import hashlib
    import re

    from data_export_tool_spark.operators.dedup import (
        near_dedup_against,
        near_dup_store,
    )
    from tests.conftest import record_opcheck

    store_rows = [
        (1, "the cat sat on the mat and purred all day long"),
        (2, "quick brown fox jumps over the lazy dog tonight"),
        (3, "completely unrelated stored document about spark plans"),
    ]
    new_rows = [
        (10, "the cat sat on the mat and purred all day"),   # near-dup of 1
        (11, "quick brown fox jumps over the lazy dog tonight"),  # exact 2
        (12, "a genuinely fresh document with novel content"),
        (13, "the cat sat on the mat"),  # shares some shingles, low jaccard
    ]
    store_df = spark.createDataFrame(store_rows, "doc_id long, text string")
    new_df = spark.createDataFrame(new_rows, "doc_id long, text string")
    bands_t, sh_t = near_dup_store(store_df)
    got = sorted(
        r["doc_id"]
        for r in near_dedup_against(
            new_df, bands_t, sh_t, threshold=0.5
        ).collect()
    )

    # ---- python replay ----
    def norm(s):
        s = re.sub(r"[^A-Za-z0-9\s]", " ", s.lower())
        return re.sub(r"\s+", " ", s).strip()

    def shingle(s, n=3):
        toks = norm(s).split(" ")
        return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))}

    def sig(shs, k=16):
        return [
            min(hashlib.md5(f"{seed}|{sh}".encode()).hexdigest() for sh in shs)
            for seed in range(k)
        ]

    def band_keys(sg, bands=4):
        rp = len(sg) // bands
        return {
            (b, "|".join(sg[b * rp : (b + 1) * rp])) for b in range(bands)
        }

    def h64(sh):
        hx = hashlib.md5(sh.encode()).hexdigest()
        v = (int(hx[:8], 16) << 32) | int(hx[8:16], 16)
        return v - (1 << 64) if v >= (1 << 63) else v

    store = {
        i: (band_keys(sig(shingle(t))), {h64(x) for x in shingle(t)})
        for i, t in store_rows
    }
    survivors = []
    for i, t in new_rows:
        bk, hs = band_keys(sig(shingle(t))), {h64(x) for x in shingle(t)}
        dropped = False
        for _, (obk, ohs) in store.items():
            if bk & obk:
                j = len(hs & ohs) / len(hs | ohs)
                if j >= 0.5:
                    dropped = True
                    break
        if not dropped:
            survivors.append(i)
    want = sorted(survivors)

    record_opcheck(
        "near_dedup_against", len(new_rows), got == want,
        oracle="python-full-replay",
    )
    assert got == want
    # the fixture's intent: the re-crawl and the exact copy drop, the
    # fresh doc and the low-overlap doc survive
    assert got == [12, 13]


def test_group_minhash_jaccard_replay_and_bounds(spark):
    """Segment similarity matrix: the per-group signature must equal
    the python md5 replay over the group's shingle-set UNION exactly
    (elementwise-min = union signature), so the pairwise estimates
    are deterministic; estimates must bracket the exact Jaccard
    within the k-hash binomial error."""
    import hashlib
    import math
    import re as _re

    from data_export_tool_spark.operators.dedup import group_minhash_jaccard

    shared = ["the quick brown fox jumps over the lazy dog again and again",
              "large scale data pipelines need exact deduplication tiers"]
    only_a = ["alpha beta gamma delta epsilon zeta eta theta iota kappa"]
    only_b = ["one two three four five six seven eight nine ten eleven"]
    only_c = ["completely different vocabulary in this tiny segment here"]
    rows = (
        [("A", t) for t in shared + only_a]
        + [("B", t) for t in shared + only_b]
        + [("C", t) for t in only_c]
    )
    df = spark.createDataFrame(rows, "grp string, text string")
    k = 64
    got = {
        (r["group_a"], r["group_b"]): r["jaccard_est"]
        for r in group_minhash_jaccard(
            df, "grp", num_hashes=k
        ).collect()
    }

    def norm(s):
        s = _re.sub(r"[^A-Za-z0-9\s]", " ", s.lower())
        return _re.sub(r"\s+", " ", s).strip()

    def shingles(texts, n=3):
        out = set()
        for s in texts:
            toks = norm(s).split(" ")
            out |= {
                " ".join(toks[i : i + n])
                for i in range(max(len(toks) - n + 1, 1))
            }
        return out

    def sig(shs):
        return [
            min(hashlib.md5(f"{seed}|{sh}".encode()).hexdigest() for sh in shs)
            for seed in range(k)
        ]

    sets = {
        "A": shingles(shared + only_a),
        "B": shingles(shared + only_b),
        "C": shingles(only_c),
    }
    ok = True
    for (a, b), est in got.items():
        want_est = sum(
            1 for x, y in zip(sig(sets[a]), sig(sets[b])) if x == y
        ) / k
        ok = ok and abs(est - want_est) < 1e-12  # bit-exact replay
        exact = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        se = math.sqrt(max(exact * (1 - exact), 0.25 / k) / k)
        ok = ok and abs(est - exact) <= 4 * se + 1e-9
    assert got[("A", "C")] == 0.0 and got[("B", "C")] == 0.0
    assert got[("A", "B")] > 0.2
    # identical segments estimate exactly 1
    dup = spark.createDataFrame(
        [("X", shared[0]), ("Y", shared[0])], "grp string, text string"
    )
    one = group_minhash_jaccard(dup, "grp", num_hashes=16).collect()[0]
    ok = ok and one["jaccard_est"] == 1.0
    record_opcheck(
        "group_minhash_jaccard", len(got) + 1, ok,
        oracle="python-reference", value=round(got[("A", "B")], 6),
    )
    assert ok


def test_set_similarity_join_exact_vs_quadratic_truth(spark):
    """PPJoin-style exact Jaccard join: output must equal the
    quadratic all-pairs python truth EXACTLY (prefix filtering is
    lossless — the no-false-negative contract is the operator's whole
    reason to exist next to the MinHash tier), and the plan must not
    go cartesian."""
    import re as _re

    from data_export_tool_spark.operators.dedup import set_similarity_join

    base = "the quick brown fox jumps over the lazy dog"
    texts = {
        1: base,
        2: base + " tonight",                       # high overlap
        3: base.replace("quick", "slow"),           # high overlap
        4: "completely different words here again now",
        5: "completely different words here again today",
        6: base,                                    # exact duplicate of 1
        7: "",                                      # empty: never pairs
        8: None,                                    # NULL: never pairs
        9: "one two three four five six seven eight",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    t = 0.5
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_similarity_join(df, t).collect()
    }

    def norm_words(s):
        s = _re.sub(r"[^A-Za-z0-9\s]", " ", (s or "").lower())
        return set(w for w in _re.sub(r"\s+", " ", s).strip().split(" ") if w)

    sets = {k: norm_words(v) for k, v in texts.items()}
    want = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sets[a] or not sets[b]:
                continue
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= t:
                want[(a, b)] = round(j, 6)
    ok = got == want and (1, 6) in got and got[(1, 6)] == 1.0
    plan = (
        set_similarity_join(df, t)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ok = ok and "CartesianProduct" not in plan
    record_opcheck(
        "set_similarity_join", len(want), ok, oracle="python-reference"
    )
    assert ok, (got, want)


def test_set_similarity_join_threshold_sweep(spark, sf_dir):
    """On real documents: raising the threshold can only shrink the
    pair set (monotonicity), every reported jaccard respects its
    threshold, and t=1.0 returns exactly the distinct-shingle-set
    duplicates."""
    from data_export_tool_spark.operators.dedup import set_similarity_join

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    lo = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_similarity_join(docs, 0.4, shingle_n=2).collect()
    }
    hi = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_similarity_join(docs, 0.7, shingle_n=2).collect()
    }
    assert set(hi) == {k for k, j in lo.items() if j >= 0.7}
    assert all(j >= 0.4 for j in lo.values())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        set_similarity_join(docs, 0.0)


def test_set_similarity_join_cross_exact_vs_quadratic_truth(spark):
    """Cross-corpus (R×S) exact Jaccard join against the quadratic
    python truth — including a left row matching multiple right rows
    (it is a join, not a dedup) and the no-self-pairing-needed cross
    semantics."""
    import re as _re

    from data_export_tool_spark.operators.dedup import (
        set_similarity_join_cross,
    )

    lefts = {
        1: "acme corporation limited new york office",
        2: "globex incorporated springfield head office",
        3: "totally unrelated text about gardening tips",
        4: None,
    }
    rights = {
        10: "acme corporation ltd new york office",       # ≈ left 1
        11: "acme corporation limited new york office",   # == left 1
        12: "globex inc springfield head office",         # ≈ left 2
        13: "random other registry entry altogether",
        14: "",
    }
    l_df = spark.createDataFrame(list(lefts.items()), "doc_id long, text string")
    r_df = spark.createDataFrame(list(rights.items()), "doc_id long, text string")
    t = 0.5
    got = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in set_similarity_join_cross(l_df, r_df, t).collect()
    }

    def nw(s):
        s = _re.sub(r"[^A-Za-z0-9\s]", " ", (s or "").lower())
        return set(
            w for w in _re.sub(r"\s+", " ", s).strip().split(" ") if w
        )

    ls = {k: nw(v) for k, v in lefts.items()}
    rs = {k: nw(v) for k, v in rights.items()}
    want = {}
    for a, sa in ls.items():
        for b, sb in rs.items():
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= t:
                want[(a, b)] = round(j, 6)
    ok = got == want
    ok = ok and got.get((1, 11)) == 1.0 and (1, 10) in got and (2, 12) in got
    # left 1 matched multiple right rows — join semantics
    ok = ok and len([1 for (a, _) in got if a == 1]) >= 2
    record_opcheck(
        "set_similarity_join_cross", len(want), ok,
        oracle="python-reference",
    )
    assert ok, (got, want)


def test_minhash_search_values_and_recall(spark, sf_dir):
    """Search against the persisted store: every emitted jaccard must
    equal the exact python word-shingle jaccard of that (query, doc)
    pair; an exact copy of a stored doc must be found at rank 1 with
    jaccard 1.0 (exact copies share all bands — never missed); ranks
    are jaccard-desc with id tiebreak."""
    from data_export_tool_spark.operators.dedup import (
        minhash_search,
        near_dup_store,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    bands_df, shingles_df = near_dup_store(docs)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    probe_ids = sorted(texts)[:3]
    queries = spark.createDataFrame(
        [(i, texts[d]) for i, d in enumerate(probe_ids)],
        "query_id long, text string",
    )
    out = minhash_search(queries, bands_df, shingles_df, k=5).collect()

    import re

    def shingles(t, n=3):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        return {" ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))}

    n_checked = 0
    byq: dict = {}
    for r in out:
        byq.setdefault(r["query_id"], []).append(r)
        qt = texts[probe_ids[r["query_id"]]]
        ct = texts[r["doc_id"]]
        a, b = shingles(qt), shingles(ct)
        want_j = len(a & b) / len(a | b) if a | b else 0.0
        assert r["jaccard"] == pytest.approx(want_j, abs=1e-9), (
            r["query_id"], r["doc_id"])
        assert r["n_shared"] == len(a & b)
        n_checked += 1
    for qid, rows in byq.items():
        rows.sort(key=lambda r: r["rank"])
        # rank 1 is the stored original: jaccard 1.0
        assert rows[0]["doc_id"] == probe_ids[qid]
        assert rows[0]["jaccard"] == pytest.approx(1.0)
        keys = [(-r["jaccard"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)
    record_opcheck("minhash_search", n_checked, True, oracle="python-reference")
