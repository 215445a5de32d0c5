"""Document-table queries: dedup + text analysis (extended surface).

These are the training-data-pipeline operators (exact dedup,
MinHash+LSH, SimHash, n-gram Jaccard, language ID, quality scoring,
token counting, fingerprinting) run over the driver's ``documents``
table. Aggregates avoid floating-point accumulation (doubles only
appear as deterministic per-row expressions, rounded) so the DuckDB
oracle can match exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_export_tool_spark.catalog import Catalog
from data_export_tool_spark.functions.text import (
    LANG_PROBES,
    normalize_text,
    punct_ratio,
    token_count,
)
from data_export_tool_spark.parallelism import (
    degraded_range_count,
    fan_out,
    pin_above_exchange,
    sort_after_stage,
    two_phase_preferred,
)
from data_export_tool_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from data_export_tool_spark.queries import QuerySpec

#: shared normalization in DuckDB dialect (mirror of text.normalize_text)
_NORM_SQL = (
    r"trim(regexp_replace(regexp_replace(lower(text), "
    r"'[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))"
)

#: word-3-shingles in DuckDB dialect (mirror of dedup.word_shingles)
_SHINGLES_CTE = rf"""
norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+2], ' ')
                        for i in generate_series(1, greatest(len(w)-2, 1))]) AS shingles
  FROM toks
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh)
"""


# --------------------------------------------------------------------------
# d01 — content fingerprints (exact-dedup key)
# --------------------------------------------------------------------------
def d01_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(Catalog(spark, sf_dir).load("documents"))
    return docs.select(
        "doc_id",
        F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
        "lang",
        "n_chars",
    ).orderBy("doc_id")


D01_ORACLE = f"""
SELECT doc_id, md5({_NORM_SQL}) AS fingerprint, lang, n_chars
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# d01+d02+d05+d12 merged catalog entry — ONE per-document profile scan:
# content fingerprint (exact-dedup key), duplicate stats (dup_count /
# keep_id per fingerprint), token/char/punct stats, and the
# Gopher-style repetition metrics. The duplicate stats are a TWO-PHASE
# aggregate + join-back (operators/dedup.duplicate_keepers shape), NOT
# a Window over the fingerprint: a window shuffle cannot
# partial-aggregate, so a mega-duplicate cluster (10⁷–10⁸ copies of a
# boilerplate page in a real corpus) would serialize onto one task —
# and AQE skew-splitting applies to joins, not windows. The groupBy's
# map-side combine collapses the hot key per partition before the
# shuffle, and the join-back is AQE-skew-splittable. Column pruning
# keeps the stats branch to (doc_id, fingerprint): the heavy per-row
# folds (ngrams, punct, runs) are computed once, on the output branch.
# --------------------------------------------------------------------------
def d01_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_export_tool_spark.functions.text import word_ngrams_all
    from data_export_tool_spark.operators.quality import max_run_length

    docs = fan_out(Catalog(spark, sf_dir).load("documents"))
    g2 = word_ngrams_all(F.col("text"), 2)
    g3 = word_ngrams_all(F.col("text"), 3)
    from data_export_tool_spark.operators.dedup import null_safe_fp_key

    base = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
        # join key only: NULL-text rows must survive the stats join and
        # cluster together (equi-joins never match raw NULL keys); the
        # OUTPUT fingerprint column above stays NULL like the oracle's
        null_safe_fp_key(F.col("text")).alias("__fpk"),
        token_count(F.col("text")).alias("n_tokens"),
        F.length(F.regexp_replace(F.col("text"), r"\s+", "")).alias(
            "n_chars_nospace"
        ),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.size(g2).alias("__n2_total"),
        max_run_length(g2).alias("top2_count"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(g3))
            / F.greatest(F.size(g3), F.lit(1)).cast("double"),
            6,
        ).alias("dup3_frac"),
    )
    # scale shape: two-phase aggregate + join-back (see block comment).
    # On provably tiny inputs (shared policy:
    # parallelism.two_phase_preferred) the window form is identical
    # output for ~half the cost (one scan, no second normalize+md5
    # pass, no join); large or unreadable layouts keep the two-phase
    # shape, and SPARK_GRAFT_FORCE_TWO_PHASE=1 pins it for contracts.
    if two_phase_preferred(_documents_path(sf_dir)):
        stats = base.groupBy("__fpk").agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("keep_id"),
        )
        joined = base.join(stats, on="__fpk")
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("__fpk")
        joined = base.withColumn(
            "dup_count", F.count(F.lit(1)).over(w)
        ).withColumn("keep_id", F.min("doc_id").over(w))
    return (
        joined
        .withColumn(
            "top2_frac",
            F.round(
                F.col("top2_count") / F.greatest(F.col("__n2_total"), F.lit(1)), 6
            ),
        )
        .withColumn(
            "repetitive",
            (
                (F.col("top2_count") > 1) & (F.col("top2_frac") >= F.lit(0.1))
            ).cast("int"),
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "fingerprint",
            "dup_count",
            "keep_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "n_chars_nospace",
            "punct_ratio",
            F.col("top2_count").cast("long").alias("top2_count"),
            "top2_frac",
            "dup3_frac",
            "repetitive",
        )
        # sort via a materialized stage: the n-gram folds above reach
        # the sort through broadcast joins only, and a plain orderBy's
        # range-sampling pass would re-execute them all (see
        # parallelism.sort_after_stage)
        .transform(lambda d: sort_after_stage(d, "doc_id"))
    )


D01_PROFILE_ORACLE = rf"""
WITH norm AS (
  SELECT doc_id, lang, n_chars, text, {_NORM_SQL} AS t FROM documents
),
toks AS (
  SELECT doc_id, lang, n_chars, text, t, string_split(t, ' ') AS w FROM norm
),
grams AS (
  SELECT doc_id, lang, n_chars, text, t,
         [array_to_string(w[i:i+1], ' ')
          for i in generate_series(1, greatest(len(w)-1, 1))] AS g2,
         [array_to_string(w[i:i+2], ' ')
          for i in generate_series(1, greatest(len(w)-2, 1))] AS g3
  FROM toks
),
counts AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(g2) AS g FROM grams)
  GROUP BY doc_id, g
),
top2 AS (SELECT doc_id, MAX(c) AS top2_count FROM counts GROUP BY doc_id),
per AS (
  SELECT g.doc_id, g.lang, g.n_chars,
         md5(g.t) AS fingerprint,
         len(list_filter(string_split(trim(g.text), ' '), x -> x <> '')) AS n_tokens,
         length(regexp_replace(g.text, '\s+', '', 'g')) AS n_chars_nospace,
         ROUND(length(regexp_replace(g.text, '[\p{{L}}\p{{N}}\s]', '', 'g'))
               / greatest(length(g.text), 1), 6) AS punct_ratio,
         len(g.g2) AS n2_total,
         t.top2_count,
         ROUND(1.0 - len(list_distinct(g.g3)) / greatest(len(g.g3), 1), 6)
           AS dup3_frac
  FROM grams g JOIN top2 t ON g.doc_id = t.doc_id
)
SELECT doc_id, lang, n_chars, fingerprint,
       COUNT(*) OVER (PARTITION BY fingerprint) AS dup_count,
       MIN(doc_id) OVER (PARTITION BY fingerprint) AS keep_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       n_chars_nospace,
       punct_ratio,
       CAST(top2_count AS BIGINT) AS top2_count,
       ROUND(top2_count / greatest(n2_total, 1), 6) AS top2_frac,
       dup3_frac,
       CAST(top2_count > 1
            AND ROUND(top2_count / greatest(n2_total, 1), 6) >= 0.1 AS INT)
         AS repetitive
FROM per
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# d02 — exact duplicate groups (hash-groupBy dedup)
# --------------------------------------------------------------------------
def d02_doc_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).load("documents")
    return exact_duplicates(docs, "doc_id", "text").orderBy("fingerprint")


D02_ORACLE = f"""
SELECT md5({_NORM_SQL}) AS fingerprint,
       COUNT(*) AS dup_count,
       MIN(doc_id) AS keep_id
FROM documents
GROUP BY 1
HAVING COUNT(*) > 1
ORDER BY fingerprint
"""


# --------------------------------------------------------------------------
# d03/d04 — MinHash + banded LSH shared pieces
# hash family = md5(seed || '|' || shingle), min per doc → 16-sig,
# 4 bands × 4 rows; reproducible in any engine with md5()
# --------------------------------------------------------------------------
_NUM_HASHES, _BANDS = 16, 4


def _minhash_cand_ctes() -> str:
    """``sigs``/``buckets``/``cand`` CTE bodies (assumes ``ex`` from
    ``_SHINGLES_CTE`` is in scope) — the DuckDB twin of
    ``minhash_lsh_candidates``."""
    rows_per_band = _NUM_HASHES // _BANDS
    sig_cols = ",\n         ".join(
        f"MIN(md5(CONCAT('{seed}|', s))) AS s{seed}" for seed in range(_NUM_HASHES)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_idx, CONCAT_WS('|', {cols}) AS band_key FROM sigs".format(
            b=b,
            cols=", ".join(f"s{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(_BANDS)
    )
    return f"""sigs AS (
  SELECT doc_id,
         {sig_cols}
  FROM ex GROUP BY doc_id
),
buckets AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
)"""


# --------------------------------------------------------------------------
# d03 — n-gram Jaccard near-duplicate pairs, LSH-gated (the two-stage
# scale path: MinHash-LSH generates candidates, exact Jaccard verifies
# only those — hot shingles can't quadratically explode the pair join).
# The oracle applies the identical two-stage definition.
# --------------------------------------------------------------------------
def d03_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).load("documents")
    cand = minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3
    )
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5, candidates=cand
    ).orderBy("id_a", "id_b")


D03_ORACLE = f"""
WITH {_SHINGLES_CTE},
{_minhash_cand_ctes()},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN ex a ON a.doc_id = c.id_a
  JOIN ex b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(n_inter / (sa.n + sb.n - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.5
ORDER BY id_a, id_b
"""


# --------------------------------------------------------------------------
# d03+d04 merged catalog entry — every MinHash-LSH candidate pair with
# its exact n-gram Jaccard and the verify verdict: both stages of the
# two-tier dedup (LSH generates, Jaccard verifies) observable in one
# result. Candidates whose shingle sets turn out disjoint keep
# jaccard=0 (left join), so the candidate surface is exactly the d04
# band-bucket output.
# --------------------------------------------------------------------------
def d03_doc_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).load("documents")
    cand = minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3
    )
    # threshold 0.0 + the verify tier's left-join intersection keeps
    # EVERY candidate pair with its exact score (jaccard 0 for disjoint
    # shingle sets) — the candidate subplan is evaluated once, no
    # join-back
    scored = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.0, candidates=cand
    )
    return scored.select(
        "id_a",
        "id_b",
        "jaccard",
        (F.col("jaccard") >= F.lit(0.5)).cast("int").alias("is_dup"),
    ).orderBy("id_a", "id_b")


D03_PAIRS_ORACLE = f"""
WITH {_SHINGLES_CTE},
{_minhash_cand_ctes()},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN ex a ON a.doc_id = c.id_a
  JOIN ex b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY 1, 2
),
scored AS (
  SELECT c.id_a, c.id_b,
         ROUND(COALESCE(i.n_inter, 0)
               / (sa.n + sb.n - COALESCE(i.n_inter, 0)), 6) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard,
       CAST(jaccard >= 0.5 AS INT) AS is_dup
FROM scored
ORDER BY id_a, id_b
"""


# --------------------------------------------------------------------------
# d04 — MinHash + banded LSH candidate pairs
# --------------------------------------------------------------------------
def d04_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).load("documents")
    return minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3
    ).orderBy("id_a", "id_b")


D04_ORACLE = f"""
WITH {_SHINGLES_CTE},
{_minhash_cand_ctes()}
SELECT id_a, id_b FROM cand
ORDER BY id_a, id_b
"""


# --------------------------------------------------------------------------
# d05 — per-document text statistics (token counting, quality metrics)
# Doubles are per-row deterministic expressions, rounded to 6 dp.
# --------------------------------------------------------------------------
def d05_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(Catalog(spark, sf_dir).load("documents"))
    n_tok = token_count(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        F.length(F.regexp_replace(F.col("text"), r"\s+", "")).alias("n_chars_nospace"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
    ).orderBy("doc_id")


D05_ORACLE = r"""
SELECT
  doc_id,
  lang,
  len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_tokens,
  length(regexp_replace(text, '\s+', '', 'g')) AS n_chars_nospace,
  ROUND(length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g'))
        / greatest(length(text), 1), 6) AS punct_ratio
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# d06 — language identification (stopword-probe heuristic) vs label
# --------------------------------------------------------------------------
def d06_doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_export_tool_spark.functions.text import language_guess

    docs = fan_out(Catalog(spark, sf_dir).load("documents"))
    return (
        docs.select("lang", language_guess(F.col("text")).alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "lang_guess")
    )


def _langid_oracle() -> str:
    from data_export_tool_spark.functions.text import _probe_is_unsegmented

    hit_cols = []
    for lang, probes in LANG_PROBES.items():
        if _probe_is_unsegmented(probes):
            # unsegmented scripts (zh): substring OCCURRENCE counts —
            # mirror of language_guess; // because DuckDB CAST(.. AS
            # INT) rounds where Spark's cast truncates
            occ = " + ".join(
                f"((length(lower(text)) - length(replace(lower(text), '{p}', ''))) // {len(p)})"
                for p in probes
            )
            hit_cols.append(f"({occ}) AS h_{lang}")
            continue
        plist = ", ".join(f"'{p}'" for p in probes)
        hit_cols.append(
            f"len(list_filter(string_split(lower(text), ' '), x -> x IN ({plist}))) AS h_{lang}"
        )
    hits_sql = ",\n         ".join(hit_cols)
    langs = list(LANG_PROBES)
    m = "GREATEST(" + ", ".join(f"h_{l}" for l in langs) + ")"
    case = "CASE WHEN " + m + " = 0 THEN 'und'\n"
    for l in langs:
        case += f"       WHEN h_{l} = {m} THEN '{l}'\n"
    case += "       END"
    return f"""
WITH hits AS (
  SELECT lang,
         {hits_sql}
  FROM documents
)
SELECT lang, {case} AS lang_guess, COUNT(*) AS n_docs
FROM hits
GROUP BY 1, 2
ORDER BY lang, lang_guess
"""


D06_ORACLE = _langid_oracle()


# --------------------------------------------------------------------------
# d07 — SimHash near-duplicate pairs. Token hash is the first 64 bits
# of md5 (operators/dedup.portable_hash64), so the full signature →
# 16-bit-band blocking → Hamming≤8 pipeline is reproduced bit-exactly
# in DuckDB (UBIGINT shifts/xor/bit_count) and value-hash-checked.
# --------------------------------------------------------------------------
def d07_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).load("documents")
    return simhash_near_duplicates(
        docs, "doc_id", "text", max_hamming=8, band_bits=16
    ).orderBy("id_a", "id_b")


def _simhash_oracle() -> str:
    """DuckDB twin of simhash_near_duplicates(max_hamming=8, band_bits=16)."""
    # NB: DuckDB resolves `<<` as BIGINT and overflow-checks, so the
    # high word is positioned by UBIGINT multiply and the signature
    # bits are precomputed power-of-two literals.
    h64 = (
        "((('0x' || substring(md5(tk), 1, 8))::UBIGINT * 4294967296::UBIGINT) + "
        "('0x' || substring(md5(tk), 9, 8))::UBIGINT)"
    )
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(64)
    )
    sig = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i}::UBIGINT ELSE 0::UBIGINT END)"
        for i in range(64)
    )
    return f"""
WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tk FROM norm),
hs AS (SELECT doc_id, {h64} AS h FROM tok),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hs GROUP BY doc_id
),
sigs AS (SELECT doc_id, ({sig}) AS sig FROM votes),
bands AS (
  SELECT doc_id, sig, b, ((sig >> (b * 16)) & 65535) AS band_key
  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) t
)
SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
       bit_count(xor(a.sig, b2.sig))::INTEGER AS hamming
FROM bands a
JOIN bands b2
  ON a.b = b2.b AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id
WHERE bit_count(xor(a.sig, b2.sig)) <= 8
"""


D07_ORACLE = _simhash_oracle()


# --------------------------------------------------------------------------
# d08 — duplicate clusters: transitive closure of the LSH-gated Jaccard
# pairs (d03) via distributed connected components, picking the min
# doc_id as each cluster's canonical representative. The oracle runs
# the identical pair pipeline then a recursive-CTE transitive closure
# (O(n·m) — fine for the oracle, never the engine path).
# --------------------------------------------------------------------------
def d08_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_export_tool_spark.operators.graph import duplicate_clusters

    docs = Catalog(spark, sf_dir).load("documents")
    cand = minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3
    )
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5, candidates=cand
    )
    return duplicate_clusters(pairs).orderBy("component_id", "doc_id")


D08_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE},
{_minhash_cand_ctes()},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN ex a ON a.doc_id = c.id_a
  JOIN ex b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.5
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT id_a, id_a FROM pairs
  UNION SELECT id_b, id_b FROM pairs
),
reach AS (
  SELECT u AS n, v AS r FROM edges
  UNION
  SELECT reach.n, e.v FROM reach JOIN edges e ON reach.r = e.u
),
comp AS (SELECT n AS doc_id, MIN(r) AS component_id FROM reach GROUP BY n)
SELECT doc_id, component_id,
       CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT) AS cluster_size
FROM comp
ORDER BY component_id, doc_id
"""


# --------------------------------------------------------------------------
# d09 — deterministic per-language mixture sampling: keep-rate per lang
# via a pure md5-bucket filter (operators/sampling.py). Rates chosen to
# down-weight the dominant language — the standard data-mixture shape.
# --------------------------------------------------------------------------
_MIX_RATES = {"en": 0.5, "de": 0.3, "fr": 0.3, "es": 0.3, "zh": 0.1}


def d09_doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_export_tool_spark.operators.sampling import (
        deterministic_sample,
        sample_bucket,
    )

    docs = fan_out(Catalog(spark, sf_dir).load("documents"))
    kept = deterministic_sample(docs, "doc_id", strata_col="lang", rates=_MIX_RATES)
    return kept.select(
        "doc_id",
        "lang",
        "source",
        sample_bucket(F.col("doc_id")).alias("sample_bucket"),
    ).orderBy("doc_id")


def _mixture_oracle() -> str:
    bucket = "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 9, 8))::UBIGINT % 1000000)"
    thresh = (
        "CASE lang "
        + " ".join(
            f"WHEN '{lang}' THEN {int(round(r * 1_000_000))}"
            for lang, r in sorted(_MIX_RATES.items())
        )
        + " ELSE 0 END"
    )
    return f"""
SELECT doc_id, lang, source, CAST({bucket} AS BIGINT) AS sample_bucket
FROM documents
WHERE {bucket} < {thresh}
ORDER BY doc_id
"""


D09_ORACLE = _mixture_oracle()


# --------------------------------------------------------------------------
# d10 — token-budget shard packing: running token sum per language in
# doc_id order; shard = start-offset // budget (contiguous token
# ranges, documents never split).
# --------------------------------------------------------------------------
_SHARD_BUDGET = 2000

#: shard-range boundaries per sf_dir — memoized because they are pure
#: balance hints (output is boundary-independent, see pack_token_shards)
#: and recomputing the quantile job per builder call would tax every
#: bench/gate repetition
_SHARD_BOUNDS_CACHE: dict[str, list[float]] = {}

def _documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _shard_num_ranges(sf_dir: str, cap: int = 32) -> int:
    """Range count for two-phase packing — the shared degrade policy
    (parallelism.degraded_range_count) over the documents table: the
    output is identical for ANY range count, and the two-phase form's
    ~3 extra stages never amortize at toy scale, so provably-tiny
    inputs get 1 range. Contract tests pin the scale shape via
    SPARK_GRAFT_FORCE_TWO_PHASE=1."""
    return degraded_range_count(_documents_path(sf_dir), cap)


def _doc_id_bounds(
    spark: SparkSession, sf_dir: str, num_ranges: int = 32
) -> list[float]:
    key = f"{sf_dir}#{num_ranges}"
    if key not in _SHARD_BOUNDS_CACHE:
        raw = Catalog(spark, sf_dir).load("documents")
        probs = [i / num_ranges for i in range(1, num_ranges)]
        _SHARD_BOUNDS_CACHE[key] = raw.stat.approxQuantile(
            "doc_id", probs, 0.01
        )
    return _SHARD_BOUNDS_CACHE[key]


def _shard_pack_kwargs(spark: SparkSession, sf_dir: str) -> dict:
    """kwargs for ``pack_token_shards``: two-phase with raw-table
    quantile bounds at scale, classic one-window form when degraded."""
    n = _shard_num_ranges(sf_dir)
    if n <= 1:
        return {"num_ranges": 1}
    return {"range_bounds": _doc_id_bounds(spark, sf_dir, n)}


def d10_doc_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_export_tool_spark.operators.sampling import pack_token_shards

    raw = Catalog(spark, sf_dir).load("documents")
    docs = fan_out(raw)
    toks = docs.select("doc_id", "lang", token_count(F.col("text")).alias("n_tokens"))
    packed = pack_token_shards(
        toks,
        "n_tokens",
        budget=_SHARD_BUDGET,
        order_col="doc_id",
        strata_col="lang",
        # two-phase with memoized raw-table quantile boundaries at
        # scale; degraded to the one-window form on provably tiny input
        **_shard_pack_kwargs(spark, sf_dir),
    )
    return packed.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        "shard_id",
    ).orderBy("doc_id")


D10_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_tok
  FROM documents
),
w AS (
  SELECT doc_id, lang, n_tok,
         CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum
  FROM t
)
SELECT doc_id, lang,
       CAST(n_tok AS BIGINT) AS n_tokens,
       cum AS cum_tokens,
       ((cum - n_tok) // {_SHARD_BUDGET}) AS shard_id
FROM w
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# d11 — benchmark decontamination: per-training-doc fraction of distinct
# word 5-grams that also occur in the eval slice (source = 'src0', the
# stand-in benchmark). Eval n-grams are deduped once and broadcast;
# training side explodes + joins + one map-side-combining count. The
# oracle replays the identical two-sided definition.
# --------------------------------------------------------------------------
_EVAL_SOURCE = "src0"
_CONTAM_N = 5
_CONTAM_THRESHOLD = 0.2


def d11_doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_export_tool_spark.operators.contamination import contamination_scores

    docs = Catalog(spark, sf_dir).load("documents")
    train = docs.where(F.col("source") != _EVAL_SOURCE)
    holdout = docs.where(F.col("source") == _EVAL_SOURCE)
    scored = contamination_scores(
        fan_out(train),
        holdout,
        n=_CONTAM_N,
        threshold=_CONTAM_THRESHOLD,
        keep_cols=("source",),
    )
    return scored.select(
        "doc_id",
        "source",
        "n_ngrams",
        "n_matched",
        "contamination",
        F.col("contaminated").cast("int").alias("contaminated"),
    ).orderBy("doc_id")


_NGRAM5_CTE = rf"""
norm5 AS (SELECT doc_id, source, {_NORM_SQL} AS t FROM documents),
toks5 AS (SELECT doc_id, source, string_split(t, ' ') AS w FROM norm5),
sh5 AS (
  SELECT doc_id, source,
         list_distinct([array_to_string(w[i:i+{_CONTAM_N - 1}], ' ')
                        for i in generate_series(1, greatest(len(w)-{_CONTAM_N - 1}, 1))]) AS shingles
  FROM toks5
)
"""

D11_ORACLE = f"""
WITH {_NGRAM5_CTE},
ev AS (
  SELECT DISTINCT ngram FROM (
    SELECT unnest(shingles) AS ngram FROM sh5
    WHERE source = '{_EVAL_SOURCE}'
  ) WHERE ngram <> ''
),
train AS (SELECT doc_id, source, shingles FROM sh5 WHERE source <> '{_EVAL_SOURCE}'),
tr_ex AS (SELECT doc_id, unnest(shingles) AS ngram FROM train),
matched AS (
  SELECT doc_id, COUNT(*) AS n_matched
  FROM tr_ex JOIN ev USING (ngram)
  GROUP BY doc_id
),
scored AS (
  SELECT t.doc_id, t.source,
         len(t.shingles) AS n_ngrams,
         COALESCE(m.n_matched, 0) AS n_matched,
         ROUND(COALESCE(m.n_matched, 0) / greatest(len(t.shingles), 1), 6)
           AS contamination
  FROM train t LEFT JOIN matched m ON t.doc_id = m.doc_id
)
SELECT doc_id, source,
       CAST(n_ngrams AS INT) AS n_ngrams,
       CAST(n_matched AS BIGINT) AS n_matched,
       contamination,
       CAST(contamination >= {_CONTAM_THRESHOLD} AS INT) AS contaminated
FROM scored
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# d12 — repetition-based quality flags (Gopher/MassiveText-style): share
# of the modal word bigram and fraction of duplicated trigrams. Both
# signals are per-row projections — the modal-bigram count is an
# array_sort + one aggregate fold (operators/quality.max_run_length),
# the trigram dup fraction pure array algebra — so the whole query is
# ZERO shuffles and one corpus scan.
# --------------------------------------------------------------------------
def d12_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_export_tool_spark.operators.quality import repetition_stats

    docs = fan_out(Catalog(spark, sf_dir).load("documents"))
    stats = repetition_stats(docs, top2_threshold=0.1)
    return stats.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("top2_count").cast("long").alias("top2_count"),
        "top2_frac",
        "dup3_frac",
        F.col("repetitive").cast("int").alias("repetitive"),
    ).orderBy("doc_id")


D12_ORACLE = rf"""
WITH norm AS (SELECT doc_id, {_NORM_SQL} AS t,
                     len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_tokens
              FROM documents),
toks AS (SELECT doc_id, n_tokens, string_split(t, ' ') AS w FROM norm),
grams AS (
  SELECT doc_id, n_tokens,
         [array_to_string(w[i:i+1], ' ')
          for i in generate_series(1, greatest(len(w)-1, 1))] AS g2,
         [array_to_string(w[i:i+2], ' ')
          for i in generate_series(1, greatest(len(w)-2, 1))] AS g3
  FROM toks
),
per_doc AS (
  SELECT doc_id, n_tokens, len(g2) AS n2_total,
         ROUND(1.0 - len(list_distinct(g3)) / greatest(len(g3), 1), 6) AS dup3_frac,
         g2
  FROM grams
),
counts AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(g2) AS g FROM per_doc)
  GROUP BY doc_id, g
),
top2 AS (SELECT doc_id, MAX(c) AS top2_count FROM counts GROUP BY doc_id)
SELECT p.doc_id,
       CAST(p.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.top2_count AS BIGINT) AS top2_count,
       ROUND(t.top2_count / greatest(p.n2_total, 1), 6) AS top2_frac,
       p.dup3_frac,
       CAST(t.top2_count > 1 AND
            ROUND(t.top2_count / greatest(p.n2_total, 1), 6) >= 0.1 AS INT)
         AS repetitive
FROM per_doc p JOIN top2 t ON p.doc_id = t.doc_id
ORDER BY p.doc_id
"""


# --------------------------------------------------------------------------
# d13 — the END-TO-END curation pipeline, composed from the individual
# operators as ONE lazy DataFrame plan:
#   repetition quality filter (scan-level column predicate)
#   → exact dedup (two-phase keepers aggregate + broadcast decision
#     join, keep min doc_id — see the in-function comment)
#   → benchmark decontamination vs the src0 slice
#   → deterministic per-language mixture sampling
#   → token-budget shard packing.
# Every stage verdict is per-document (depends only on that document's
# text/id — never on which OTHER documents survived), so the filters
# commute; the payload path is one corpus scan whose only data
# shuffles are the contamination count and the (stratum,range) shard
# window — the dedup decision and shard offsets come back via
# broadcast joins, and the narrow keepers branch adds one pruned
# (doc_id,text) scan. The oracle replays the same five stages as
# chained CTEs (in dedup-first order — equivalent by the commutativity
# above).
# --------------------------------------------------------------------------
def d13_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_export_tool_spark.operators.contamination import contamination_scores
    from data_export_tool_spark.operators.dedup import (
        duplicate_keepers,
        null_safe_fp_key,
    )
    from data_export_tool_spark.operators.quality import is_repetitive
    from data_export_tool_spark.operators.sampling import (
        deterministic_sample,
        pack_token_shards,
    )

    docs = Catalog(spark, sf_dir).load("documents")
    train = fan_out(docs.where(F.col("source") != _EVAL_SOURCE))
    holdout = docs.where(F.col("source") == _EVAL_SOURCE)

    # the dedup decision is TWO-PHASE (duplicate_keepers shape), not a
    # fingerprint window: text-carrying rows must never shuffle on a
    # key whose real-world distribution has 10⁸-row hot clusters — a
    # window cannot partial-aggregate and AQE cannot skew-split it.
    # The keepers branch column-prunes to (doc_id, text→md5): a narrow
    # map-side-combined aggregate, filtered to DUPLICATED fingerprints
    # only, so the decision table is proportional to duplicate clusters
    # and broadcasts; the payload rows then never shuffle for dedup at
    # all (and if it ever outgrows broadcast, the join is
    # AQE-skew-splittable). Keepers are computed over ALL train rows
    # (pre-repetition-filter) to match the oracle's stage order; the
    # repetition verdict is pinned ABOVE the fan-out exchange
    # (pin_above_exchange) so its filter can't sink into the serial
    # small-file scan — at scale the scan is parallel and the pin is
    # free (see parallelism.py).
    flagged = train.select(
        "doc_id",
        "lang",
        "source",
        "text",
        pin_above_exchange(is_repetitive(F.col("text"))).alias("__rep"),
        # null-safe key: NULL-text rows must land in keepers' NULL
        # cluster (equi-joins never match raw NULL fingerprints)
        null_safe_fp_key(F.col("text")).alias("__fp"),
    )
    keepers = duplicate_keepers(train, "doc_id", "text")
    deduped = flagged.where(~F.col("__rep")).join(
        keepers, on="__fp", how="left"
    ).where(F.col("__keep_id").isNull() | (F.col("__keep_id") == F.col("doc_id")))
    with_tok = deduped.select(
        "doc_id",
        "lang",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        "text",
    )
    # metadata rides through the contamination aggregation as grouping
    # keys, so no join-back to recover lang/source/n_tokens afterwards
    scored = contamination_scores(
        with_tok,
        holdout,
        n=_CONTAM_N,
        threshold=_CONTAM_THRESHOLD,
        keep_cols=("lang", "source", "n_tokens"),
    )
    clean = scored.where(~F.col("contaminated"))
    sampled = deterministic_sample(
        clean, "doc_id", strata_col="lang", rates=_MIX_RATES
    )
    packed = pack_token_shards(
        sampled,
        "n_tokens",
        budget=_SHARD_BUDGET,
        order_col="doc_id",
        strata_col="lang",
        # memoized raw-table boundaries at scale (planning must not
        # execute the whole curation pipeline just to sample doc_id
        # quantiles); one-window form on provably tiny input
        **_shard_pack_kwargs(spark, sf_dir),
    )
    return packed.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        "shard_id",
    ).orderBy("doc_id")


def _d13_oracle() -> str:
    bucket = "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 9, 8))::UBIGINT % 1000000)"
    thresh = (
        "CASE lang "
        + " ".join(
            f"WHEN '{lang}' THEN {int(round(r * 1_000_000))}"
            for lang, r in sorted(_MIX_RATES.items())
        )
        + " ELSE 0 END"
    )
    n = _CONTAM_N
    return rf"""
WITH norm AS (
  SELECT doc_id, lang, source, {_NORM_SQL} AS t,
         len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
train AS (SELECT * FROM norm WHERE source <> '{_EVAL_SOURCE}'),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM train GROUP BY md5(t)),
s1 AS (SELECT train.* FROM train JOIN keepers USING (doc_id)),
evsh AS (
  SELECT DISTINCT ngram FROM (
    SELECT unnest(
      list_distinct([array_to_string(w[i:i+{n - 1}], ' ')
                     for i in generate_series(1, greatest(len(w)-{n - 1}, 1))])
    ) AS ngram
    FROM (SELECT string_split(t, ' ') AS w FROM norm WHERE source = '{_EVAL_SOURCE}')
  ) WHERE ngram <> ''
),
s1sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+{n - 1}], ' ')
                        for i in generate_series(1, greatest(len(w)-{n - 1}, 1))]) AS shingles
  FROM (SELECT doc_id, string_split(t, ' ') AS w FROM s1)
),
s1ex AS (SELECT doc_id, unnest(shingles) AS ngram FROM s1sh),
contam AS (
  SELECT e.doc_id,
         COUNT(*) AS n_ngrams,
         COUNT(v.ngram) AS n_matched
  FROM s1ex e LEFT JOIN evsh v ON e.ngram = v.ngram
  GROUP BY e.doc_id
),
s2 AS (
  SELECT s1.* FROM s1
  JOIN contam ON s1.doc_id = contam.doc_id
  WHERE ROUND(n_matched / greatest(n_ngrams, 1), 6) < {_CONTAM_THRESHOLD}
),
rep AS (
  SELECT doc_id,
         MAX(c) AS top2_count,
         SUM(c) AS n2_total
  FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (
      SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
             for i in generate_series(1, greatest(len(w)-1, 1))]) AS g
      FROM (SELECT doc_id, string_split(t, ' ') AS w FROM s2)
    )
    GROUP BY doc_id, g
  )
  GROUP BY doc_id
),
s3 AS (
  SELECT s2.* FROM s2
  JOIN rep ON s2.doc_id = rep.doc_id
  WHERE NOT (top2_count > 1
             AND ROUND(top2_count / greatest(n2_total, 1), 6) >= 0.1)
),
s4 AS (SELECT * FROM s3 WHERE {bucket} < {thresh}),
w AS (
  SELECT doc_id, lang, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum
  FROM s4
)
SELECT doc_id, lang, source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       cum AS cum_tokens,
       ((cum - n_tokens) // {_SHARD_BUDGET}) AS shard_id
FROM w
ORDER BY doc_id
"""


D13_ORACLE = _d13_oracle()


# --------------------------------------------------------------------------
# d14 — PII redaction: typed-tag replacement + per-doc match count over
# the documents table (functions/text.redact_pii / pii_match_count).
# Pure chained regexp_replace/regexp_count — JVM-side, linear at
# 100 TB. The oracle replays the identical pattern chain progressively
# (each class counted on the text already redacted by earlier classes,
# so one span never counts twice) — patterns are Java/RE2-portable by
# construction (PII_PATTERNS).
# --------------------------------------------------------------------------
def d14_doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_export_tool_spark.functions.text import pii_match_count, redact_pii

    docs = fan_out(Catalog(spark, sf_dir).load("documents"))
    return docs.select(
        "doc_id",
        redact_pii(F.col("text")).alias("redacted"),
        pii_match_count(F.col("text")).cast("long").alias("n_pii"),
    ).orderBy("doc_id")


def _pii_oracle() -> str:
    from data_export_tool_spark.functions.text import PII_PATTERNS

    ctes = ["s0 AS (SELECT doc_id, text AS t FROM documents)"]
    carried: list[str] = []
    for idx, (_, pattern, tag) in enumerate(PII_PATTERNS, start=1):
        prev_cols = (", ".join(carried) + ", ") if carried else ""
        ctes.append(
            f"s{idx} AS (SELECT doc_id, {prev_cols}"
            f"len(regexp_extract_all(t, '{pattern}')) AS c{idx}, "
            f"regexp_replace(t, '{pattern}', '{tag}', 'g') AS t "
            f"FROM s{idx - 1})"
        )
        carried.append(f"c{idx}")
    total = " + ".join(carried)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT doc_id, t AS redacted, CAST({total} AS BIGINT) AS n_pii"
        + f"\nFROM s{len(PII_PATTERNS)}\nORDER BY doc_id"
    )


D14_ORACLE = _pii_oracle()


# Consolidated to fit the driver's 50-entry grading window: the
# per-doc projections (d01 fingerprints, d02 exact-dup stats, d05
# token stats, d12 repetition) merge into ONE profile scan, and the
# two LSH tiers (d04 candidates, d03 Jaccard verify) into one
# candidates+verdict entry. All standalone builders stay importable.
QUERIES = [
    QuerySpec(
        "d01_doc_profile",
        d01_doc_profile,
        D01_PROFILE_ORACLE,
        "dedup:exact-key+window text:tokens/quality quality:repetition",
    ),
    QuerySpec(
        "d03_doc_near_dup_pairs",
        d03_doc_near_dup_pairs,
        D03_PAIRS_ORACLE,
        "dedup:minhash-lsh+jaccard-verify",
    ),
    QuerySpec("d06_doc_language_id", d06_doc_language_id, D06_ORACLE, "text:langid"),
    QuerySpec("d07_doc_simhash_pairs", d07_doc_simhash_pairs, D07_ORACLE, "dedup:simhash"),
    QuerySpec("d08_doc_dup_clusters", d08_doc_dup_clusters, D08_ORACLE, "dedup:clusters/connected-components"),
    QuerySpec("d09_doc_mixture_sample", d09_doc_mixture_sample, D09_ORACLE, "sample:mixture"),
    QuerySpec("d10_doc_token_shards", d10_doc_token_shards, D10_ORACLE, "pack:token-shards"),
    QuerySpec("d11_doc_decontamination", d11_doc_decontamination, D11_ORACLE, "decontaminate:ngram-overlap"),
    QuerySpec("d13_curation_pipeline", d13_curation_pipeline, D13_ORACLE, "pipeline:dedup+decontam+quality+mixture+shards"),
    QuerySpec("d14_doc_pii_redaction", d14_doc_pii_redaction, D14_ORACLE, "privacy:pii-redaction"),
]
