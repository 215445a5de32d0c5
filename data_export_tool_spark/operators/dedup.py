"""Document deduplication operators (extended large-scale surface).

Four tiers, each a pure DataFrame pipeline designed around one shuffle
per logical step so it scales to a 100 TB documents table:

- **exact**: fingerprint = md5/xxhash64 of normalized text; one
  hash-groupBy. (Map-side partial agg → single shuffle on a 16-byte
  key, not the document body.)
- **MinHash + LSH**: shingle → k min-hashes → band → bucket-join.
  Candidate generation never compares documents pairwise; only
  same-bucket pairs are verified with exact Jaccard.
- **SimHash**: 64-bit bit-majority signature; near-dups = small
  Hamming distance within LSH-style prefix buckets.
- **n-gram Jaccard**: exact similarity for candidate verification or
  small corpora (explode + equi-join on shingle, two shuffles).

MD5 (not xxhash) is used wherever an external SQL oracle must
reproduce values — md5 hex is identical across engines; min() over hex
strings is a valid uniform min-hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_export_tool_spark.functions.text import normalize_text
from data_export_tool_spark.parallelism import fan_out


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>) of normalized text
    — the set-semantics counterpart of ``text.word_ngrams_all`` (one
    shared n-gram builder; this just deduplicates). All JVM
    higher-order functions, no explode until the consumer needs one.
    """
    from data_export_tool_spark.functions.text import word_ngrams_all

    return F.array_distinct(word_ngrams_all(text, n))


def null_safe_fp_key(text: Column) -> Column:
    """Join-safe fingerprint key: md5 of normalized text, with NULL
    text mapped to a sentinel that cannot collide with a 32-hex md5
    digest. GROUP BY in every SQL engine clusters NULLs together, but
    an EQUI-JOIN on a nullable key never matches NULL — so any
    aggregate-then-join-back dedup shape must key on this, not the raw
    (nullable) fingerprint."""
    return F.coalesce(F.md5(normalize_text(text)), F.lit("<NULL_TEXT>"))


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of exact (normalized) duplicates: one row per duplicated
    fingerprint with the member count and the keeper (min id).

    Returns columns: ``fingerprint``, ``dup_count``, ``keep_id``.
    """
    return (
        fan_out(df)
        .select(
            F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one representative (min id) per normalized fingerprint."""
    w_keep = (
        fan_out(df)
        .select(
            F.col(id_col),
            F.md5(normalize_text(F.col(text_col))).alias("__fp"),
        )
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .drop("__fp")
    )
    return df.join(w_keep, on=id_col, how="left_semi")


def duplicate_keepers(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(``__fp``, ``__keep_id``) for every fingerprint that occurs MORE
    than once — the pre-aggregated dedup decision table.

    This is the skew-safe half of ``dedup_exact_two_phase``: the
    groupBy gets a map-side partial aggregate, so a mega-duplicate
    cluster (empty docs, boilerplate pages repeated 10⁷–10⁸× in a real
    corpus) collapses to one row per map partition BEFORE the shuffle —
    the hot fingerprint never lands as raw rows on a single task. The
    ``dup_count > 1`` filter keeps the table proportional to the number
    of duplicate CLUSTERS, not corpus size, so the decision join below
    usually broadcasts.

    ``__fp`` is null-safe: NULL-text rows form ONE cluster (matching
    GROUP BY semantics, where both MySQL and DuckDB treat NULLs as
    equal), via a sentinel that cannot collide with a 32-hex md5. A
    plain equi-join on a nullable key would never match the NULL
    cluster and silently keep every NULL-text row.
    """
    return (
        df.select(
            F.col(id_col),
            null_safe_fp_key(F.col(text_col)).alias("__fp"),
        )
        .groupBy("__fp")
        .agg(
            F.min(id_col).alias("__keep_id"),
            F.count(F.lit(1)).alias("__dc"),
        )
        .where(F.col("__dc") > 1)
        .select("__fp", "__keep_id")
    )


def dedup_exact_two_phase(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup via pre-aggregated decision + join-back — the
    100 TB-safe replacement for the former window form
    (``Window.partitionBy(fingerprint)``).

    Why not a window: a window shuffle cannot partial-aggregate, so the
    hottest fingerprint (a boilerplate page duplicated 10⁸×) serializes
    onto ONE task, with whatever payload columns the rows carry — and
    AQE skew-splitting applies to joins, not windows. Here the decision
    is ``duplicate_keepers`` (map-side combine absorbs the hot key; the
    result holds only duplicated fingerprints) LEFT-joined back: a row
    survives iff its fingerprint is unique (no match) or it is the
    cluster keeper. Joins DO get AQE skew handling, and when the
    duplicate-cluster table is small it broadcasts — the payload side
    then never shuffles at all. Same shape as the two-phase aggregate
    template in ``operators/skew.py``.
    """
    keepers = duplicate_keepers(df, id_col, text_col)
    return (
        df.withColumn("__fp", null_safe_fp_key(F.col(text_col)))
        .join(keepers, on="__fp", how="left")
        .where(
            F.col("__keep_id").isNull() | (F.col("__keep_id") == F.col(id_col))
        )
        .drop("__fp", "__keep_id")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, s0..s{k-1}) MinHash signature columns.

    Hash family: ``md5(seed || '|' || shingle)`` for seed in
    0..num_hashes-1; the per-seed signature is the lexicographic min of
    the hex digests over the document's shingle set — a standard
    min-wise hash, reproducible in any engine with md5().

    Plan shape: shingles are exploded ONCE and all k min-aggregates run
    in a single map-side-combining groupBy — one shuffle keyed on the
    doc id, k cheap string aggregates. (The tempting alternative —
    ``array_min(transform(shingles, md5))`` per seed — re-evaluates the
    whole normalize→tokenize→shingle pipeline k times per row.)
    """
    ex = fan_out(df).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{seed}|"), F.col("sh")))).alias(f"s{seed}")
        for seed in range(num_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def minhash_band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band_idx, band_key) LSH band membership — THE MinHash
    banding algebra, shared by the self-join candidate generator and
    the incremental store so bucket keys can never diverge between a
    stored corpus and a new snapshot."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    band_keys = F.array(
        *[
            F.concat_ws(
                "|",
                *[F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    return sigs.select(
        F.col(id_col), F.posexplode(band_keys).alias("band_idx", "band_key")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded LSH.

    num_hashes/bands rows per band; docs sharing *any* band bucket
    become a candidate pair. The plan is: signatures (narrow) →
    posexplode of band keys (xnum_hashes/band rows) → self-equi-join on
    (band_idx, band_key) — a hash join on a short string key, never on
    document text.
    """
    buckets = minhash_band_buckets(
        df, id_col, text_col, num_hashes, bands, shingle_n
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col(f"a.band_idx") == F.col("b.band_idx"),
                F.col(f"a.band_key") == F.col("b.band_key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with n-gram Jaccard ≥ threshold.

    When ``candidates`` (id_a, id_b) is given (e.g. from MinHash LSH),
    the intersection is computed ONLY for candidate pairs — the pair
    set is routed through the candidate list before any pairwise work,
    so hot shingles can't explode the join. This is the scale path:
    LSH generates, Jaccard verifies.

    Without candidates, exact computation via shingle explode +
    self-equi-join on the shingle — the classic inverted-index join.
    |pairs| is bounded by co-occurring shingles, not |docs|², but a
    shingle shared by m docs still contributes m² join rows: at corpus
    scale ALWAYS pass candidates (the bare join is the small-corpus /
    verification-oracle tier).
    """
    sh = fan_out(df).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    if candidates is not None:
        # candidate-gated intersection: |cand| × shingles-per-doc rows,
        # independent of shingle hotness. The b-side join is LEFT with
        # a match marker so candidate pairs with DISJOINT shingle sets
        # survive with n_inter=0 — the candidate subplan is consumed
        # exactly once (a threshold of 0.0 then returns every candidate
        # with its score, which is how d03's merged entry reports both
        # LSH stages without re-evaluating candidate generation)
        ca = candidates.select("id_a", "id_b")
        a_sh = sh.select(F.col(id_col).alias("id_a"), "sh")
        b_sh = sh.select(F.col(id_col).alias("id_b"), "sh").withColumn(
            "__m", F.lit(1)
        )
        inter = (
            ca.join(a_sh, "id_a")
            .join(b_sh, ["id_b", "sh"], "left")
            .groupBy("id_a", "id_b")
            .agg(F.count("__m").alias("n_inter"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        # (a size-ratio prune inside the join condition was measured
        # SLOWER here — the hash-join probe on the shingle key dominates
        # and the extra per-match predicate doesn't shrink it)
        inter = (
            a.join(
                b,
                on=[
                    F.col("a.sh") == F.col("b.sh"),
                    F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                ],
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def portable_hash64(c: Column) -> Column:
    """First 64 bits of md5 as a signed long — identical bit pattern in
    any engine with md5 (DuckDB: ``('0x'||substring(md5(x),1,8))::UBIGINT
    << 32 | ...``), so SimHash signatures are oracle-reproducible.
    Stays inside whole-stage codegen: md5 + the conv-free ascii fold
    (``functions.hashing.hex_fold``) + shift are all JVM expressions."""
    from data_export_tool_spark.functions.hashing import hex_fold

    hx = F.md5(c)
    hi = hex_fold(hx, 1, 8)
    lo = hex_fold(hx, 9, 8)
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash signature per document.

    Per token t: h = portable_hash64(t); signature bit i is the
    majority vote of bit i over the document's tokens.

    Plan shape: explode tokens once → one map-side-combining groupBy
    with 64 conditional-sum aggregates (pure codegen'd longs) →
    assemble the signature bitmask. One shuffle keyed on the doc id,
    carrying 64 small longs per group — the same shape as
    ``minhash_signatures``. (A per-row higher-order fold over a
    64-element vote array is ~100× slower: Catalyst evaluates HOF
    lambdas interpretively per element.)
    """
    toks = fan_out(df).select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", portable_hash64(F.col("tok")))
    # the 64 vote aggregates and the 64-way signature OR are built as
    # SQL strings (one JVM-side parse each) rather than 64×N Column
    # calls — the py4j round trips to construct that tree cost multiple
    # seconds per invocation, dwarfing the actual execution
    votes = toks.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(case when (shiftright(h, {i}) & 1) = 1"
                f" then 1 else -1 end) as v{i}"
            )
            for i in range(bits)
        ]
    )
    sig_sql = " | ".join(
        f"(case when v{i} > 0 then shiftleft(1L, {i}) else 0L end)"
        for i in range(bits)
    )
    return votes.select(F.col(id_col), F.expr(f"({sig_sql}) as simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    band_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share at least one of four
    16-bit signature bands (any pair within Hamming distance 3 must
    agree on ≥1 band; wider distances are caught probabilistically),
    then verified by exact Hamming ≤ max_hamming.
    """
    sigs = simhash(df, id_col, text_col)
    n_bands = 64 // band_bits
    bands = F.array(
        *[
            F.shiftright(F.col("simhash"), b * band_bits)
            .bitwiseAND(F.lit((1 << band_bits) - 1))
            .cast("long")
            for b in range(n_bands)
        ]
    )
    buckets = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(bands).alias("band_idx", "band_key"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_against(
    df: DataFrame,
    seen: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Incremental (cross-snapshot) exact dedup: drop rows whose
    normalized-content fingerprint already exists in ``seen`` — the
    fingerprint store written from previously-ingested snapshots.

    One anti-join on the 16-byte md5 key; the new snapshot never joins
    document bodies, and the store side is just the fingerprint column
    (use ``fingerprint_store`` to produce/extend it). This is the daily
    ingest shape at 100 TB: full-corpus re-dedup is a one-time batch
    job, incremental drops are an anti-join against the running store.

    Layout: persist the store bucketed AND sorted by the fingerprint
    column (``catalog.write_bucketed(store, name, "fingerprint",
    sort_col="fingerprint")``). Bucket metadata then serves both the
    store-side distinct and its side of the sort-merge anti-join with
    ZERO exchanges — only the (much smaller) daily snapshot shuffles
    (plan contract:
    ``test_incremental_dedup_bucketed_store_no_store_exchange``).
    """
    store = seen.select(F.col(fingerprint_col).alias("__fp")).distinct()
    return (
        df.withColumn("__fp", null_safe_fp_key(F.col(text_col)))
        .join(store, on="__fp", how="left_anti")
        .drop("__fp")
    )


def near_dup_store(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """The NEAR-dup analog of ``fingerprint_store``: the two persistable
    tables a running corpus needs so future snapshots can be
    near-deduplicated against it without ever re-reading its text —

    - ``bands``:    (id, band_idx, band_key) MinHash-LSH membership
      (the candidate index; same banding algebra as the batch tier);
    - ``shingles``: (id, sh64) the doc's distinct shingle set as
      portable 64-bit hashes (the verification payload — Jaccard over
      hashed shingles equals Jaccard over raw shingles up to 64-bit
      collisions, ~10⁻¹⁰ per co-occurring pair, documented).

    Sizing: bands is `bands` rows per doc; shingles is ~one row per
    corpus token — 8-byte keys, a fraction of the text it replaces.
    Union new snapshots' outputs with the previous tables to roll the
    store forward (after dropping the snapshot's own near-dups).
    Persist both bucketed by their first column for join locality.
    """
    b = minhash_band_buckets(
        df, id_col, text_col, num_hashes, bands, shingle_n
    )
    sh = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("__sh"),
    ).select(
        id_col, portable_hash64(F.col("__sh")).alias("sh64")
    ).distinct()
    return b, sh


def near_dedup_against(
    df: DataFrame,
    store_bands: DataFrame,
    store_shingles: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental cross-snapshot NEAR dedup: drop new rows whose
    n-gram Jaccard against ANY stored document reaches ``threshold``
    — the near-dup twin of ``dedup_against``'s exact tier, for the
    daily-ingest shape where yesterday's corpus must suppress today's
    boilerplate re-crawls, not just byte-identical repeats.

    Pipeline (all candidate-gated, nothing quadratic): the snapshot's
    band buckets equi-join the store's band index (short string keys,
    never text) → distinct (new, stored) candidates → Jaccard verified
    on the store's hashed shingle sets vs the snapshot's (computed
    once, same ``portable_hash64``) → new ids with any verified match
    anti-joined out. Standard LSH recall contract: a true near-dup
    sharing no band with its stored twin is missed — at near-dup
    thresholds the collision probability is ≈1 (the batch tier's
    documented contract, unchanged).

    Returns the snapshot's surviving rows with all original columns.
    In-snapshot duplicates are ``minhash_lsh_candidates``'s job first;
    this operator only consults the store.

    Store hygiene assumption (documented contract): the store is built
    from an ALREADY-DEDUPLICATED corpus — that is what a rolling
    survivors store is. A store carrying a B-member near-identical
    cluster would hand every matching new doc B candidates through
    their shared band bucket (the hot-bucket regime); dedup the corpus
    before ``near_dup_store``, as the pipeline ordering implies.
    """
    new_bands = minhash_band_buckets(
        df, id_col, text_col, num_hashes, bands, shingle_n
    )
    cand = (
        new_bands.select(F.col(id_col).alias("__new"), "band_idx", "band_key")
        .join(
            store_bands.select(
                F.col(store_bands.columns[0]).alias("__old"),
                "band_idx",
                "band_key",
            ),
            on=["band_idx", "band_key"],
        )
        .select("__new", "__old")
        .distinct()
    )
    new_sh = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("__s"),
    ).select(
        F.col(id_col).alias("__new"), portable_hash64(F.col("__s")).alias("sh64")
    ).distinct()
    old_sh = store_shingles.select(
        F.col(store_shingles.columns[0]).alias("__old"),
        F.col(store_shingles.columns[1]).alias("sh64"),
    )
    n_new = new_sh.groupBy("__new").agg(F.count(F.lit(1)).alias("__na"))
    n_old = old_sh.groupBy("__old").agg(F.count(F.lit(1)).alias("__nb"))
    inter = (
        cand.join(new_sh, on="__new")
        .join(old_sh.withColumn("__m", F.lit(1)), on=["__old", "sh64"], how="left")
        .groupBy("__new", "__old")
        .agg(F.count("__m").alias("__ni"))
    )
    dropped = (
        inter.join(n_new, on="__new")
        .join(n_old, on="__old")
        .where(
            F.col("__ni")
            / (F.col("__na") + F.col("__nb") - F.col("__ni"))
            >= threshold
        )
        .select(F.col("__new").alias(id_col))
        .distinct()
    )
    return df.join(dropped, on=id_col, how="left_anti")


def fingerprint_store(
    df: DataFrame, text_col: str = "text", fingerprint_col: str = "fingerprint"
) -> DataFrame:
    """Distinct normalized-content fingerprints of ``df`` — the
    persistable store ``dedup_against`` checks new snapshots against.
    Union with the previous store and write back to roll it forward.

    Keys are ``null_safe_fp_key`` values (NULL text → sentinel), so the
    store never carries a NULL key: the anti-join then drops repeat
    NULL-text rows like any other duplicate, and the bucketed layout
    (bucket column = this key) keeps its zero-exchange property — a
    coalesce wrapped around the key at JOIN time would discard the
    bucket metadata instead."""
    return df.select(
        null_safe_fp_key(F.col(text_col)).alias(fingerprint_col)
    ).distinct()


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_count: int = 1,
    min_chars: int = 10,
) -> DataFrame:
    """Corpus-wide LINE-level exact dedup (the RefinedWeb/CCNet-style
    sub-document pass): drop every line whose trimmed form occurs more
    than ``max_count`` times across the whole corpus — boilerplate
    (cookie banners, nav menus, license headers) repeats across
    millions of pages while real prose doesn't. Lines shorter than
    ``min_chars`` after trimming are exempt (blank lines, list
    bullets, code braces legitimately repeat).

    Returns one row per input row: ``id_col``, ``text_col`` (surviving
    lines re-joined with \\n, original order), ``n_lines`` and
    ``n_lines_removed``. NULL text passes through unchanged.

    Scale shape: posexplode the lines (narrow), ONE map-side-combined
    ``groupBy(line)`` over the >min_chars lines to find the duplicated
    ones (partial aggregation absorbs the boilerplate hot keys — the
    same two-phase argument as document-level exact dedup), join the
    (small: only lines breaching ``max_count``) blocklist back by line
    hash, and re-assemble per document with ``sort_array(collect_list
    (struct(pos, line)))``. Three shuffles total — line-count, line
    join, doc reassembly — each on scalar keys, never on full
    documents.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    ).withColumn("__t", F.trim(F.col("__line")))

    eligible = F.length(F.col("__t")) >= min_chars
    # hash the line for the count/join key: 8-byte keys through both
    # shuffles instead of full line text
    keyed = lines.withColumn("__h", F.xxhash64(F.col("__t")))

    # count and join on (hash, trimmed text), not the hash alone: at
    # 10^10+ distinct lines a 64-bit collision is reachable, and a
    # hash-only ban would delete an innocent colliding line (or merge
    # two lines' counts past max_count). The hash still leads the key
    # so the shuffle partitioner sees 8 bytes of entropy first, and
    # map-side combine reduces to distinct lines per partition either
    # way; the banned side stays small and broadcastable.
    banned = (
        keyed.where(eligible)
        .groupBy("__h", "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > max_count)
        .select("__h", "__t")
    )
    kept = keyed.join(
        banned.withColumn("__banned", F.lit(True)),
        on=["__h", "__t"],
        how="left",
    ).withColumn(
        "__drop", eligible & F.coalesce(F.col("__banned"), F.lit(False))
    )

    out = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("__drop").cast("long")).alias("n_lines_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__drop"),
                            F.struct(F.col("__pos"), F.col("__line")),
                        )
                    )
                ),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias(text_col),
    )
    # NULL text never exploded — reattach those rows unchanged
    nulls = df.where(F.col(text_col).isNull()).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_lines"),
        F.lit(0).cast("long").alias("n_lines_removed"),
        F.col(text_col),
    )
    return out.select(id_col, "n_lines", "n_lines_removed", text_col).unionByName(
        nulls
    )


def group_minhash_jaccard(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """Corpus-segment similarity matrix: estimated Jaccard overlap of
    the distinct-shingle sets between every pair of ``group_col``
    segments (languages, registered domains, snapshot sources …) —
    'which slices of the lake are near-copies of each other', the
    segment-level complement to the per-document dedup tiers.

    The trick that makes it one pass: a MinHash component is a MIN, so
    aggregating the per-shingle hash min per GROUP yields exactly the
    signature of the group's shingle-set UNION — elementwise min is
    the signature of a set union (Broder 1997). One explode + one
    map-side-combined groupBy over the corpus (the
    ``minhash_signatures`` hash family, so an external md5 replay is
    bit-exact); the pairwise estimate (matching components / k, std
    error ≈ √(J(1−J)/k)) runs on the collected G×k signature table —
    this is a segment PROFILE, so G is driver-bounded by contract
    (segments, not documents). Output: ``(group_a, group_b,
    jaccard_est)`` for each unordered pair, groups sorted, plus the
    per-group distinct-shingle signature width as ``n_hashes``."""
    from data_export_tool_spark.parallelism import fan_out

    ex = (
        fan_out(df)
        .where(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias("__g"),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
        )
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{seed}|"), F.col("sh")))).alias(f"s{seed}")
        for seed in range(num_hashes)
    ]
    rows = ex.groupBy("__g").agg(*aggs).collect()
    sigs = {
        r["__g"]: [r[f"s{i}"] for i in range(num_hashes)] for r in rows
    }
    groups = sorted(sigs)
    out = []
    for i, a in enumerate(groups):
        for b in groups[i + 1 :]:
            match = sum(
                1 for x, y in zip(sigs[a], sigs[b]) if x == y and x is not None
            )
            out.append((a, b, match / num_hashes, num_hashes))
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("group_a", T.StringType()),
            T.StructField("group_b", T.StringType()),
            T.StructField("jaccard_est", T.DoubleType()),
            T.StructField("n_hashes", T.IntegerType()),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)


def _sset_tokens(df: DataFrame, id_col: str, text_col: str, n: int):
    """(id, tok) exploded distinct-shingle frame, empty shingles (the
    NULL/blank phantom-gram) removed."""
    return (
        fan_out(df)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("tok"),
        )
        .where(F.length("tok") > 0)
    )


def _sset_ordered(ex: DataFrame, freq: DataFrame) -> DataFrame:
    """(id, toks, len) with tokens sorted by the SHARED global
    (frequency asc, token asc) order — rarest first."""
    return (
        ex.join(freq, "tok")
        .groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__f"), F.col("tok")))
            ).alias("__st")
        )
        .select(
            "__id",
            F.transform(F.col("__st"), lambda s: s["tok"]).alias("toks"),
            F.size("__st").alias("__len"),
        )
    )


def _sset_prefix(ordered: DataFrame, t: float) -> DataFrame:
    """Explode each row's (1−t)·len+1 rarest-token prefix."""
    prefix_len = F.col("__len") - F.ceil(F.lit(t) * F.col("__len")).cast(
        "int"
    ) + 1
    return ordered.select(
        "__id",
        "toks",
        "__len",
        F.explode(F.slice(F.col("toks"), 1, prefix_len)).alias("ptok"),
    )


def _sset_verify(cand: DataFrame, t: float, a: str, b: str) -> DataFrame:
    inter = F.size(F.array_intersect("__ta", "__tb"))
    union = F.col("__la") + F.col("__lb") - inter
    jac = inter / union
    return cand.where(jac >= t).select(
        a, b, F.round(jac, 6).alias("jaccard")
    )


def set_similarity_join(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 1,
) -> DataFrame:
    """EXACT Jaccard similarity self-join: every pair of documents
    whose distinct-shingle sets overlap with Jaccard ≥ ``threshold``
    — no LSH, therefore NO false negatives, the complement to the
    MinHash tier when the contract is "find every pair ≥ t", not
    "find most pairs cheaply". Prefix filtering (Chaudhuri et al.
    2006 / Bayardo et al. WWW'07, the PPJoin family): order each
    set's tokens globally by (frequency asc, token asc) and any two
    sets with J ≥ t MUST share a token within each other's first
    ``|s| − ⌈t·|s|⌉ + 1`` rarest tokens — so candidates join only on
    PREFIX tokens (the rare end of the vocabulary by construction,
    which is what keeps a hot stop-word from exploding the join),
    plus the standard length filter ``t·|a| ≤ |b|``.

    Shape: one explode+count pass for global token frequencies, one
    map-side-combined re-aggregation into frequency-sorted token
    arrays, a prefix explode bounded by ``(1−t)·|s|+1`` tokens per
    row, the candidate equi-join on the prefix token, and an exact
    ``array_intersect`` verify on the candidates only. Output:
    ``(id_a, id_b, jaccard)`` with ``id_a < id_b``, jaccard rounded
    to 6 places. Empty/NULL-token documents never pair (J undefined).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    t = float(threshold)
    ex = _sset_tokens(df, id_col, text_col, shingle_n)
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("__f"))
    pref = _sset_prefix(_sset_ordered(ex, freq), t)
    a = pref.select(
        F.col("__id").alias("id_a"),
        F.col("toks").alias("__ta"),
        F.col("__len").alias("__la"),
        "ptok",
    )
    b = pref.select(
        F.col("__id").alias("id_b"),
        F.col("toks").alias("__tb"),
        F.col("__len").alias("__lb"),
        "ptok",
    )
    cand = (
        a.join(b, "ptok")
        .where(F.col("id_a") < F.col("id_b"))
        # Jaccard length filter: t·max ≤ min is necessary for J ≥ t
        .where(
            F.least("__la", "__lb")
            >= F.ceil(F.lit(t) * F.greatest("__la", "__lb"))
        )
        .select("id_a", "id_b", "__ta", "__tb", "__la", "__lb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return _sset_verify(cand, t, "id_a", "id_b")


def set_similarity_join_cross(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 1,
) -> DataFrame:
    """The R×S form of ``set_similarity_join`` — exact Jaccard ≥ t
    pairs ACROSS two corpora (new crawl vs reference set, customer
    list vs registry: the entity-matching join), same lossless prefix
    filtering. The global (frequency asc, token asc) order is fitted
    on the UNION of both sides' token bags — prefix filtering is only
    sound under a total order SHARED by both relations. Output:
    ``(left_id, right_id, jaccard)``; a row id may repeat (it is a
    join, not a dedup). No false negatives, same phantom-gram and
    length-filter contracts as the self-join.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    t = float(threshold)
    ex_l = _sset_tokens(left, id_col, text_col, shingle_n)
    ex_r = _sset_tokens(right, id_col, text_col, shingle_n)
    freq = (
        ex_l.unionByName(ex_r)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    pref_l = _sset_prefix(_sset_ordered(ex_l, freq), t).select(
        F.col("__id").alias("left_id"),
        F.col("toks").alias("__ta"),
        F.col("__len").alias("__la"),
        "ptok",
    )
    pref_r = _sset_prefix(_sset_ordered(ex_r, freq), t).select(
        F.col("__id").alias("right_id"),
        F.col("toks").alias("__tb"),
        F.col("__len").alias("__lb"),
        "ptok",
    )
    cand = (
        pref_l.join(pref_r, "ptok")
        .where(
            F.least("__la", "__lb")
            >= F.ceil(F.lit(t) * F.greatest("__la", "__lb"))
        )
        .select("left_id", "right_id", "__ta", "__tb", "__la", "__lb")
        .dropDuplicates(["left_id", "right_id"])
    )
    return _sset_verify(cand, t, "left_id", "right_id")


def minhash_search(
    queries: DataFrame,
    store_bands: DataFrame,
    store_shingles: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Similarity SEARCH against the persisted near-dup store — "which
    stored documents resemble THIS text" (provenance lookups,
    contamination forensics, boilerplate attribution), reusing the
    exact store ``near_dup_store`` already maintains: the band index
    gates candidates, the hashed shingle sets verify.

    Plan: the (request-sized) query batch's band buckets equi-join the
    store's band index (short keys, never text) → distinct candidate
    pairs → intersection counted by joining the pair list with the
    query's shingle hashes then the store's (candidate-gated — rows
    bounded by Σ_pairs |query shingles|, hot shingles can't explode
    it) → Jaccard = |∩| / (nq + nc − |∩|) → per-query top-k rank
    window over the candidate-sized set. Standard LSH recall contract:
    a stored doc sharing no band with the query is not a candidate
    (collision probability ≈1 at near-dup similarity; exact copies
    share ALL bands, so they are never missed).

    Output: (query_id, rank, doc_id, jaccard, n_shared), jaccard desc,
    ties to the lower doc id.
    """
    qb = minhash_band_buckets(
        queries, query_id_col, text_col, num_hashes, bands, shingle_n
    ).select(F.col(query_id_col).alias("__q"), "band_idx", "band_key")
    cands = (
        qb.join(
            store_bands.select(
                F.col(store_bands.columns[0]).alias("__c"), "band_idx", "band_key"
            ),
            ["band_idx", "band_key"],
        )
        .select("__q", "__c")
        .distinct()
    )
    q_sh = (
        queries.select(
            F.col(query_id_col).alias("__q"),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("__s"),
        )
        .select("__q", portable_hash64(F.col("__s")).alias("sh64"))
        .distinct()
    )
    nq = q_sh.groupBy("__q").agg(F.count(F.lit(1)).alias("__nq"))
    sid_col = store_shingles.columns[0]
    c_sh = store_shingles.select(F.col(sid_col).alias("__c"), "sh64")
    nc = c_sh.groupBy("__c").agg(F.count(F.lit(1)).alias("__nc"))
    inter = (
        cands.join(q_sh, "__q")
        .join(c_sh, ["__c", "sh64"])
        .groupBy("__q", "__c")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    scored = (
        cands.join(inter, ["__q", "__c"], "left")
        .na.fill({"n_shared": 0})
        .join(nq, "__q")
        .join(nc, "__c")
        .select(
            F.col("__q").alias(query_id_col),
            F.col("__c").alias("doc_id"),
            "n_shared",
            (
                F.col("n_shared")
                / (F.col("__nq") + F.col("__nc") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("jaccard"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", "doc_id", F.round("jaccard", 9).alias("jaccard"), "n_shared")
    )


def containment_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 1,
) -> DataFrame:
    """EXACT containment join: every (left, right) pair with
    ``C(A ⊆ B) = |A∩B| / |A| ≥ threshold`` over distinct shingle
    sets — the ASYMMETRIC sibling of ``set_similarity_join_cross``.
    Jaccard punishes length mismatch, so quote detection, doc-in-doc
    (a paragraph lifted into a long page), and eval-prompt containment
    all need containment, not resemblance.

    Lossless pruning, asymmetric by necessity (PPJoin prefix logic
    adapted to containment):

    * LEFT prefix: if |A∩B| ≥ t·|A| then B must hit one of A's first
      ``⌊(1−t)·|A|⌋ + 1`` rarest tokens — so A explodes only that
      prefix (the rare end of the shared frequency order keeps hot
      stop-words from fanning out).
    * RIGHT side has NO lossless prefix (B may contain A while A's
      tokens sit anywhere in B's order), so B indexes ALL its tokens —
      the honest cost of the asymmetric semantics, and why the
      threshold applies to the SMALL side.
    * Length filter: ``|B| ≥ ⌈t·|A|⌉`` (B needs at least the required
      intersection size). No upper bound on |B| — by design.

    Output: ``(left_id, right_id, containment)`` (6 dp), distinct
    pairs. Empty-token documents never pair. The shared (frequency
    asc, token asc) order is fitted on the union of both sides
    (prefix filtering needs one total order).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    t = float(threshold)
    ex_l = _sset_tokens(left, id_col, text_col, shingle_n)
    ex_r = _sset_tokens(right, id_col, text_col, shingle_n)
    freq = (
        ex_l.unionByName(ex_r)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    ord_l = _sset_ordered(ex_l, freq)
    # containment prefix: floor((1−t)·|A|) + 1 rarest tokens of A
    pre_len = (
        F.col("__len")
        - F.ceil(F.lit(t) * F.col("__len")).cast("int")
        + 1
    )
    pref_l = ord_l.select(
        F.col("__id").alias("left_id"),
        F.col("toks").alias("__ta"),
        F.col("__len").alias("__la"),
        F.explode(F.slice(F.col("toks"), 1, pre_len)).alias("ptok"),
    )
    all_r = _sset_ordered(ex_r, freq).select(
        F.col("__id").alias("right_id"),
        F.col("toks").alias("__tb"),
        F.col("__len").alias("__lb"),
        F.explode(F.col("toks")).alias("ptok"),
    )
    cand = (
        pref_l.join(all_r, "ptok")
        .where(F.col("__lb") >= F.ceil(F.lit(t) * F.col("__la")))
        .select("left_id", "right_id", "__ta", "__tb", "__la")
        .dropDuplicates(["left_id", "right_id"])
    )
    cont = F.size(F.array_intersect("__ta", "__tb")) / F.col("__la")
    return cand.where(cont >= t).select(
        "left_id", "right_id", F.round(cont, 6).alias("containment")
    )


def containment_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 1,
) -> DataFrame:
    """Self-corpus form of :func:`containment_join`: DIRECTED pairs
    ``(left_id contained-in right_id)`` with C ≥ t and
    ``left_id != right_id`` (both directions can appear — containment
    is not symmetric; a ⊂ b does not imply b ⊂ a)."""
    out = containment_join(
        df, df, threshold, id_col=id_col, text_col=text_col,
        shingle_n=shingle_n,
    )
    return out.where(F.col("left_id") != F.col("right_id"))
