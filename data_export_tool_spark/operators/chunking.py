"""Document chunking for RAG / embedding pipelines.

Splitting a 100 TB corpus into overlapping fixed-token windows is the
standard pre-embedding step. Pure scan-side column algebra: tokenize,
build the window-start sequence, slice — the only row multiplication
is the final ``posexplode`` into chunks (bounded by document length),
and nothing shuffles at all. The whitespace tokenizer keeps the
operator oracle-replayable (DuckDB: string_split + array_slice);
chunk text re-joins tokens with single spaces, the usual lossy-but-
deterministic contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per chunk: ``(id_col, *keep_cols, chunk_id int,
    start_token int, n_tokens int, chunk_text)``.

    Windows start every ``chunk_tokens - overlap`` tokens; the last
    window may be shorter but every token is covered, and consecutive
    chunks share exactly ``overlap`` tokens (except a shorter tail).
    Documents with NULL text produce no chunks. Whitespace-token
    positions are 1-based (``start_token``), ``chunk_id`` is 0-based
    per document.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1: {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens: {overlap}"
        )
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    ntok = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(ntok - F.lit(overlap), F.lit(1)), F.lit(step)
    )
    base = df.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "start_token"),
    )
    piece = F.slice(F.col("__toks"), F.col("start_token"), chunk_tokens)
    return base.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.col("chunk_id").cast("int"),
        F.col("start_token").cast("int"),
        F.size(piece).cast("int").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
