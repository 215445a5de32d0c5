"""RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010).

The topic-tagging primitive a corpus pipeline wants before anything
embedding-shaped: per document, the content phrases that
characterize it — "support vector machine", "data export tool" —
scored without models or training. RAKE's insight: keywords rarely
contain stopwords, so CANDIDATE PHRASES are the maximal runs of
non-stopword tokens between stopword/punctuation delimiters, and a
word's score is ``deg(w)/freq(w)`` (degree counts co-occurrence
inside candidate phrases — words that appear in LONGER phrases score
higher); a phrase scores the sum of its word scores.

Spark-first shape — every stage relational, no Python in the path:

1. delimiter split (punctuation) → segment explode;
2. token explode with positions, stopword/short-token marking;
3. phrase runs = GAPS-AND-ISLANDS over non-stopword positions
   (``pos − row_number()`` per (doc, segment) — the X208 dense-rank
   run trick applied inside the tokenizer);
4. word stats at WORD grain (two map-side-combining groupBys:
   freq = appearances, deg = Σ phrase length over containing
   phrases), joined back to phrase words;
5. phrase score fold + per-doc top-k window.

The only per-key sort is the window over one document's tokens —
bounded by document length, the ``chunk_documents`` contract. Word
joins are word-grain (vocabulary-sized; AQE broadcasts when small).

Oracle: exact python RAKE replay with the identical delimiter,
stopword and scoring conventions (tests/test_keywords.py →
OPCHECK ``rake_keywords``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rake_keywords", "py_rake", "RAKE_STOPWORDS"]

#: compact English stoplist (function words + auxiliaries) — callers
#: pass their own for other languages/domains
RAKE_STOPWORDS: tuple[str, ...] = (
    "a", "about", "above", "after", "again", "all", "an", "and",
    "any", "are", "as", "at", "be", "because", "been", "before",
    "being", "below", "between", "both", "but", "by", "can", "could",
    "did", "do", "does", "doing", "down", "during", "each", "few",
    "for", "from", "further", "had", "has", "have", "having", "he",
    "her", "here", "hers", "him", "his", "how", "i", "if", "in",
    "into", "is", "it", "its", "just", "me", "more", "most", "my",
    "no", "nor", "not", "now", "of", "off", "on", "once", "only",
    "or", "other", "our", "out", "over", "own", "same", "she",
    "should", "so", "some", "such", "than", "that", "the", "their",
    "them", "then", "there", "these", "they", "this", "those",
    "through", "to", "too", "under", "until", "up", "very", "was",
    "we", "were", "what", "when", "where", "which", "while", "who",
    "whom", "why", "will", "with", "would", "you", "your",
)

_DELIMS = r"[.!?;:,\(\)\[\]\{\}\"'`/\\|\n\r\t]+"
_NONWORD = r"[^0-9a-z]+"


def py_rake_phrases(
    text: str,
    stopwords=RAKE_STOPWORDS,
    max_phrase_len: int = 4,
    min_token_chars: int = 1,
) -> list[tuple]:
    """Candidate-phrase extraction for one document — the exact
    delimiter/stopword conventions the operator distributes."""
    stops = set(stopwords)
    phrases = []
    for seg in re.split(_DELIMS, text.lower()):
        run: list[str] = []
        for tok in re.split(_NONWORD, seg):
            if (
                tok
                and len(tok) >= min_token_chars
                and tok not in stops
            ):
                run.append(tok)
            else:
                if run:
                    phrases.append(tuple(run))
                run = []
        if run:
            phrases.append(tuple(run))
    return [p for p in phrases if len(p) <= max_phrase_len]


def py_rake(
    text: str,
    stopwords=RAKE_STOPWORDS,
    max_phrase_len: int = 4,
    min_token_chars: int = 1,
) -> dict:
    """Reference single-document RAKE: ``{phrase: score}`` with
    DOCUMENT-LOCAL word stats (the classic form; the operator's
    corpus-global variant replays via :func:`py_rake_phrases`)."""
    phrases = py_rake_phrases(
        text, stopwords, max_phrase_len, min_token_chars
    )
    freq: dict = {}
    deg: dict = {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    out: dict = {}
    for p in phrases:
        s = sum(deg[w] / freq[w] for w in p)
        key = " ".join(p)
        out[key] = max(out.get(key, 0.0), s)  # phrase types, best score
    return out


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 10,
    stopwords=RAKE_STOPWORDS,
    max_phrase_len: int = 4,
    min_token_chars: int = 1,
) -> DataFrame:
    """Top-``top_k`` RAKE phrases per document: ``id_col, phrase,
    score, rank`` (rank by score desc, phrase asc — deterministic).
    Word statistics are CORPUS-GLOBAL (the standard batch-RAKE
    variant: deg/freq over all documents' candidate phrases), which
    is also what makes the word-grain aggregation scale."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if max_phrase_len < 1:
        raise ValueError(
            f"max_phrase_len must be >= 1, got {max_phrase_len}"
        )
    stops = F.array(*[F.lit(s) for s in sorted(set(stopwords))])
    segs = df.where(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), _DELIMS)
        ).alias("__seg", "__segtext"),
    )
    toks = segs.select(
        "__id",
        "__seg",
        F.posexplode(F.split(F.col("__segtext"), _NONWORD)).alias(
            "__pos", "__tok"
        ),
    ).withColumn(
        "__keep",
        (F.length("__tok") >= min_token_chars)
        & (F.length("__tok") > 0)
        & ~F.array_contains(stops, F.col("__tok")),
    )
    w = Window.partitionBy("__id", "__seg").orderBy("__pos")
    runs = (
        toks.where(F.col("__keep"))
        .withColumn("__run", F.col("__pos") - F.row_number().over(w))
    )
    phrases = (
        runs.groupBy("__id", "__seg", "__run")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__tok"))
            ).alias("__ordered")
        )
        .select(
            "__id",
            "__seg",
            "__run",
            F.transform(F.col("__ordered"), lambda s: s["__tok"]).alias(
                "__words"
            ),
        )
        .where(F.size("__words") <= max_phrase_len)
    )
    words = phrases.select(
        "__id",
        F.size("__words").alias("__plen"),
        F.concat_ws(" ", F.col("__words")).alias("__phrase"),
        F.explode("__words").alias("__w"),
    )
    stats = words.groupBy("__w").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum("__plen").alias("__deg"),
    )
    scored = (
        words.join(stats, "__w")
        .groupBy("__id", "__phrase")
        .agg(
            # Σ over every instance and word of deg(w)/freq(w); all
            # instances of one phrase text share a score (global
            # stats), so dividing by the instance count below
            # recovers the per-instance phrase score exactly
            F.sum(F.col("__deg") / F.col("__freq")).alias("__sumsc"),
        )
    )
    inst = (
        phrases.select(
            "__id",
            F.concat_ws(" ", F.col("__words")).alias("__phrase"),
        )
        .groupBy("__id", "__phrase")
        .agg(F.count(F.lit(1)).alias("__inst"))
    )
    per_doc = (
        scored.join(inst, ["__id", "__phrase"])
        .select(
            "__id",
            "__phrase",
            (F.col("__sumsc") / F.col("__inst")).alias("score"),
        )
    )
    rw = Window.partitionBy("__id").orderBy(
        F.col("score").desc(), F.col("__phrase").asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= top_k)
        .select(
            F.col("__id").alias(id_col),
            F.col("__phrase").alias("phrase"),
            "score",
            "rank",
        )
    )
