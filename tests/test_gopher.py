"""Gopher quality rule battery (operators/quality.py) vs a DuckDB
replay of every metric and verdict."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.quality import (
    GOPHER_STOPWORDS,
    gopher_quality_flags,
)


def test_gopher_flags_match_duckdb(spark, sf_dir):
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["mean_word_len"],
            r["symbol_word_ratio"],
            r["bullet_line_frac"],
            r["ellipsis_line_frac"],
            r["alpha_word_frac"],
            r["stopword_hits"],
            r["gopher_keep"],
        )
        # min_stopword_hits=1: the synthetic corpus carries at most one
        # distinct stop word per doc, and the test needs both verdicts
        # to occur (the operator default stays at the published 2)
        for r in gopher_quality_flags(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            min_stopword_hits=1,
        ).collect()
    }
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    want = {
        row[0]: (
            int(row[1]),
            None if row[2] is None else round(float(row[2]), 6),
            round(float(row[3]), 6),
            round(float(row[4]), 6),
            round(float(row[5]), 6),
            round(float(row[6]), 6),
            int(row[7]),
            None if row[8] is None else bool(row[8]),
        )
        for row in duckdb.sql(
            f"""
    WITH base AS (
      SELECT doc_id,
        list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'),
                    w -> w != '') AS words,
        list_filter(string_split(coalesce(text, ''), chr(10)),
                    l -> trim(l) != '') AS lines
      FROM read_parquet('{sf_dir}/documents.parquet')
    ),
    m AS (
      SELECT doc_id,
        len(words) AS n_words,
        CASE WHEN len(words) > 0 THEN
          list_sum(list_transform(words, w -> length(w)))::DOUBLE / len(words)
        END AS mwl,
        len(list_filter(words, w -> contains(w, '#') OR contains(w, '...')))
          ::DOUBLE / greatest(len(words), 1) AS swr,
        len(list_filter(lines, l -> regexp_matches(trim(l), '^([-*•‣◦])')))
          ::DOUBLE / greatest(len(lines), 1) AS blf,
        len(list_filter(lines, l -> trim(l) LIKE '%...'))
          ::DOUBLE / greatest(len(lines), 1) AS elf,
        len(list_filter(words, w -> regexp_matches(w, '\\p{{L}}')))
          ::DOUBLE / greatest(len(words), 1) AS awf,
        len(list_intersect(list_transform(words, w -> lower(w)),
                           [{stops}])) AS sh
      FROM base
    )
    SELECT doc_id, n_words, round(mwl, 6), round(swr, 6), round(blf, 6),
           round(elf, 6), round(awf, 6), sh,
           (n_words BETWEEN 50 AND 100000)
           AND coalesce(mwl BETWEEN 3.0 AND 10.0, FALSE)
           AND round(swr, 6) < 0.1 AND round(blf, 6) < 0.9
           AND round(elf, 6) < 0.3 AND round(awf, 6) > 0.8
           AND sh >= 1 AS keep
    FROM m
    """
        ).fetchall()
    }
    ok = set(got) == set(want) and all(got[k] == want[k] for k in want)
    record_opcheck("gopher_quality_flags", len(want), ok)
    if not ok:
        diffs = [(k, got[k], want[k]) for k in want if got[k] != want[k]][:5]
        assert ok, diffs
    # the battery discriminates on this corpus: both verdicts occur
    keeps = {v[-1] for v in got.values()}
    assert True in keeps and False in keeps


def test_gopher_flags_edges(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "- a\n- b\n- c"),  # all bullet lines, too short
        (4, " ".join(["the", "be", "to", "of", "and"] * 20)),  # stopword soup
        (5, "####### " * 60),  # symbol words, no alpha
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert got[1]["n_words"] == 0 and got[1]["gopher_keep"] is False
    assert got[2]["n_words"] == 0 and got[2]["gopher_keep"] is False
    assert got[3]["bullet_line_frac"] == 1.0 and not got[3]["ok_bullet_lines"]
    assert got[4]["stopword_hits"] >= 2 and got[4]["ok_stopwords"]
    assert got[5]["alpha_word_frac"] == 0.0 and not got[5]["ok_alpha_words"]
    assert not got[5]["ok_symbol_ratio"]


def test_ngram_novelty_matches_python_replay(spark):
    """ngram_novelty vs a full python replay of the shared
    normalize+shingle pipeline (ASCII fixture so the \\p{L}\\p{N}
    classes equal [A-Za-z0-9])."""
    import re

    from data_export_tool_spark.operators.quality import ngram_novelty
    from tests.conftest import record_opcheck

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on a mat"),
        (3, "completely different unique text here"),
        (4, "THE CAT   sat, on the mat!"),  # normalizes identically to 1
        (5, None),
        (6, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def norm(s):
        s = re.sub(r"[^A-Za-z0-9\s]", " ", s.lower())
        return re.sub(r"\s+", " ", s).strip()

    def shingles(s, n=3):
        toks = norm(s).split(" ")
        n_g = max(len(toks) - (n - 1), 1)
        return sorted({" ".join(toks[i : i + n]) for i in range(n_g)})

    per_doc = {i: shingles(t) for i, t in rows if t is not None}
    dfreq: dict = {}
    for grams in per_doc.values():
        for g in grams:
            dfreq[g] = dfreq.get(g, 0) + 1
    want = {
        i: (
            len(g),
            sum(1 for x in g if dfreq[x] == 1) / len(g),
            sum(dfreq[x] for x in g) / len(g),
        )
        for i, g in per_doc.items()
    }
    got = {
        r["doc_id"]: (r["n_ngrams"], r["novel_frac"], r["mean_df"])
        for r in ngram_novelty(df).collect()
    }
    ok = set(got) == set(want) and all(
        got[i][0] == want[i][0]
        and abs(got[i][1] - want[i][1]) < 1e-12
        and abs(got[i][2] - want[i][2]) < 1e-12
        for i in want
    )
    record_opcheck(
        "ngram_novelty", len(want), ok, oracle="python-reference"
    )
    assert ok, (got, want)
    # doc 3 is fully novel; docs 1 and 4 are identical -> zero novelty
    assert got[3][1] == 1.0
    assert got[1][1] == 0.0 and got[4][1] == 0.0


def test_corpus_datasheet_matches_python_replay(spark, sf_dir):
    """corpus_datasheet vs a python replay of every metric over the
    real documents table (token_count / quality_score / md5 normalized
    fingerprint / lang histogram replayed from the published column
    definitions)."""
    import hashlib
    import re

    from data_export_tool_spark.operators.quality import corpus_datasheet
    from tests.conftest import record_opcheck

    from data_export_tool_spark.catalog import Catalog

    docs = Catalog(spark, sf_dir).load("documents")
    row = corpus_datasheet(docs).first()

    rows = [(r["doc_id"], r["text"], r["lang"]) for r in
            docs.select("doc_id", "text", "lang").collect()]

    def norm(s):
        s = re.sub(r"[^\w\s]", " ", s.lower(), flags=re.UNICODE)
        return re.sub(r"\s+", " ", s).strip()

    def toks(s):
        return [t for t in re.split(r"\s+", s.strip()) if t != ""]

    def qscore(s):
        n = len(toks(s))
        no_ws = re.sub(r"\s+", "", s)
        mean_tl = len(no_ws) / max(n, 1)
        len_sc = min(n, 200) / 200.0
        tl_sc = 1.0 - min(abs(mean_tl - 5.0) / 5.0, 1.0)
        # punct_ratio: chars that are not letter/digit/whitespace —
        # python: strip whitespace, then drop \p{L}\p{N} ≈ [^\W_]
        pr = len(re.sub(r"[^\W_]", "", re.sub(r"\s", "", s))) / max(len(s), 1)
        return 0.4 * len_sc + 0.4 * tl_sc + 0.2 * (1.0 - pr)

    n_docs = len(rows)
    n_null = sum(1 for _, t, _ in rows if t is None)
    total_tokens = sum(len(toks(t)) for _, t, _ in rows if t is not None)
    fps = {
        hashlib.md5(norm(t if t is not None else "").encode()).hexdigest()
        for _, t, _ in rows
    }
    mean_q = sum(qscore(t) for _, t, _ in rows if t is not None) / max(
        n_docs - n_null, 1
    )
    langs: dict = {}
    for _, _, l in rows:
        langs[l if l is not None else "<null>"] = (
            langs.get(l if l is not None else "<null>", 0) + 1
        )

    ok = (
        row["n_docs"] == n_docs
        and row["n_null_text"] == n_null
        and row["total_tokens"] == total_tokens
        and row["distinct_fingerprints"] == len(fps)
        and abs(row["exact_dup_rate"] - round(1 - len(fps) / n_docs, 6)) < 1e-9
        and abs(row["mean_quality"] - mean_q) < 1e-5
        and dict(row["lang_counts"]) == langs
    )
    record_opcheck(
        "corpus_datasheet", 7 + len(langs), ok, oracle="python-reference"
    )
    assert ok, (dict(row.asDict()), n_docs, n_null, total_tokens, len(fps), mean_q, langs)


def test_compression_ratio_matches_stdlib_replay(spark, sf_dir):
    from tests.conftest import record_opcheck
    from data_export_tool_spark.operators.quality import (
        compression_ratio,
        py_compression_ratio,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    got = {
        r["doc_id"]: r["compress_ratio"]
        for r in compression_ratio(docs).select(
            "doc_id", "compress_ratio"
        ).collect()
    }
    src = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    ok = len(got) == len(src) > 0
    for k, text in src.items():
        want = py_compression_ratio(text)
        g = got[k]
        if want is None or g is None:
            ok = ok and want == g
        else:
            ok = ok and abs(g - want) < 1e-12
    vals = [v for v in got.values() if v is not None]
    record_opcheck(
        "compression_ratio", len(src), ok, oracle="stdlib-zlib-replay",
        value=round(sum(vals) / len(vals), 6) if vals else None,
    )
    assert ok


def test_compression_ratio_edges(spark):
    from data_export_tool_spark.operators.quality import compression_ratio

    df = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "spam " * 2000),               # long-period repetition
            (4, "The quick brown fox jumps over the lazy dog. " * 3),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["compress_ratio"]
            for r in compression_ratio(df).collect()}
    assert rows[1] is None and rows[2] is None
    # Repetitive text compresses dramatically; short prose much less.
    assert rows[3] < 0.01 and rows[4] > 0.2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compression_ratio(df, level=17)


def test_unigram_logprob_matches_python_replay(spark, sf_dir):
    import math
    import re as _re

    from tests.conftest import record_opcheck
    from data_export_tool_spark.operators.quality import unigram_logprob_scores
    from data_export_tool_spark.operators.ranking import TOKEN_SPLIT_RE

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    got = {
        r["doc_id"]: (r["n_scored_tokens"], r["mean_nll"])
        for r in unigram_logprob_scores(docs, alpha=0.5).collect()
    }
    src = {r["doc_id"]: r["text"] for r in docs.collect()}

    rx = _re.compile(TOKEN_SPLIT_RE)

    def toks(t):
        return [w for w in rx.split(t.lower()) if w] if t is not None else []

    wc: dict = {}
    for t in src.values():
        for w in toks(t):
            wc[w] = wc.get(w, 0) + 1
    n_total, v = sum(wc.values()), len(wc)
    denom = n_total + 0.5 * (v + 1)

    ok = len(got) == len(src) > 0
    for k, t in src.items():
        ws = toks(t)
        n_got, nll_got = got[k]
        ok = ok and n_got == len(ws)
        if not ws:
            ok = ok and nll_got is None
            continue
        want = sum(
            -math.log2((wc.get(w, 0) + 0.5) / denom) for w in ws
        ) / len(ws)
        ok = ok and abs(nll_got - want) < 1e-9
    record_opcheck(
        "unigram_logprob", len(src), ok, oracle="python-reference",
        value=round(
            sum(v[1] for v in got.values() if v[1] is not None)
            / max(sum(1 for v in got.values() if v[1] is not None), 1),
            6,
        ),
    )
    assert ok


def test_unigram_logprob_cross_corpus_and_edges(spark):
    from data_export_tool_spark.operators.bpe import word_counts
    from data_export_tool_spark.operators.quality import unigram_logprob_scores

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat " * 20)], "doc_id long, text string"
    )
    vocab = word_counts(train)
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zyzzyva qwerty plugh"), (12, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in unigram_logprob_scores(score, vocab=vocab).collect()
    }
    # in-vocab text is much more probable than OOV garbage
    assert got[10]["mean_nll"] < got[11]["mean_nll"] - 3
    assert got[12]["mean_nll"] is None and got[12]["n_scored_tokens"] == 0
