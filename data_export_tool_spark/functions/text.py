"""Text analysis column functions (extended large-scale surface).

Beyond reference parity, a training-data pipeline needs cheap per-doc
text analytics. Everything here is pure ``pyspark.sql.functions``
column algebra — JVM-side, codegen-friendly, no Python in the hot path
— so it scales linearly over a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword probes for the n-gram/stopword heuristic.
#: Real deployments would swap in fastText/cld3 via a Pandas UDF; the
#: heuristic keeps the whole path inside codegen.
LANG_PROBES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "es", "los"),
    "zh": ("的", "是", "了", "在", "和"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (array<string>). BPE-ish subword counting
    is ``token_count(..., bpe=True)``."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column, bpe: bool = False) -> Column:
    """Token count: whitespace tokens, or a BPE-ish proxy that also
    splits on letter/digit/punctuation boundaries (closer to how a
    subword tokenizer scales with punctuation-dense text). Empty and
    whitespace-only text counts 0 in BOTH modes (``split('', ..)``
    yields ``[""]``, which must not count as a token)."""
    if not bpe:
        return F.size(F.filter(tokens(text), lambda t: t != ""))
    # split on whitespace AND transitions between word chars and
    # non-word chars: count word-chunks + standalone punctuation runs.
    pieces = F.split(F.trim(text), r"(?<=\W)(?=\w)|(?<=\w)(?=\W)|\s+")
    return F.size(F.filter(pieces, lambda p: (F.trim(p) != "") & p.isNotNull()))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not letters/digits/whitespace.
    Unicode classes, not ASCII: an ASCII-only class would count every
    accented/Cyrillic/CJK letter as punctuation and quality_score
    would systematically downgrade non-English documents."""
    stripped = F.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    probes = list(LANG_PROBES[lang])
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(probes)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards mid-length docs, a
    sane mean token length, and low punctuation density.

    score = 0.4*len_score + 0.4*tok_len_score + 0.2*(1 - punct_ratio)
    with len_score  = min(n_tokens, 200)/200
         tok_len_sc = 1 - min(abs(mean_token_len - 5)/5, 1)
    """
    n_tok = token_count(text)
    mean_tok_len = F.length(F.regexp_replace(text, r"\s+", "")) / F.greatest(
        n_tok, F.lit(1)
    )
    len_score = F.least(n_tok, F.lit(200)) / F.lit(200.0)
    tok_len_score = F.lit(1.0) - F.least(
        F.abs(mean_tok_len - F.lit(5.0)) / F.lit(5.0), F.lit(1.0)
    )
    return (
        F.lit(0.4) * len_score
        + F.lit(0.4) * tok_len_score
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio(text))
    )


def _probe_is_unsegmented(probes: tuple[str, ...]) -> bool:
    """True when a language's probes are CJK-script (the text carries
    no whitespace word boundaries, so token equality can never hit)."""
    return any(ord(ch) >= 0x2E80 for p in probes for ch in p)


def language_guess(text: Column) -> Column:
    """Stopword-probe language ID over LANG_PROBES; 'und' if no probe
    hits. Ties break by probe order (en first) via strict >.

    Space-delimited languages count probe TOKENS; unsegmented scripts
    (zh) count probe substring OCCURRENCES — whitespace tokenization
    leaves Chinese sentences as single tokens, so an equality probe
    would never fire and zh text would always return 'und'."""
    lowered = F.lower(text)
    toks = tokens(lowered)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, probes in LANG_PROBES.items():
        if _probe_is_unsegmented(probes):
            hits = F.lit(0)
            for p in probes:
                occ = (
                    F.length(lowered) - F.length(F.replace(lowered, F.lit(p)))
                ) / F.lit(len(p))
                hits = hits + occ.cast("int")
        else:
            hits = F.size(F.filter(toks, lambda t: t.isin(list(probes))))
        is_better = hits > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, hits).otherwise(best_hits)
    return best_lang


def normalize_text(text: Column) -> Column:
    """Canonical form for dedup: lowercase, collapse whitespace, strip
    non-alphanumerics (keeps unicode letters)."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^\p{L}\p{N}\s]", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 64-bit content fingerprint of the normalized text
    (xxhash64 — one pass, JVM-side). Equal fingerprints == exact
    (normalized) duplicates; used as the exact-dedup key."""
    return F.xxhash64(normalize_text(text))


def doc_fingerprint_md5(text: Column) -> Column:
    """MD5 hex fingerprint of normalized text — used when an external
    oracle must reproduce the value (md5 is universal across engines)."""
    return F.md5(normalize_text(text))


def word_ngrams_all(text: Column, n: int = 2) -> Column:
    """ALL word n-grams of normalized text, duplicates preserved
    (array<string>) — the repetition-analysis counterpart of
    ``operators.dedup.word_shingles`` (which deduplicates for set
    semantics). Same JVM higher-order build, no explode here.

    Shape note (7× measured): the token array is threaded through as
    the OUTER transform's input rather than captured by the lambda —
    higher-order functions run interpreted, and a lambda that CAPTURES
    the ``split(regexp_replace(...))`` subtree re-evaluates the whole
    normalize+split pipeline once per n-gram (~tokens× regex passes
    per document); as a lambda VARIABLE the tokenization runs once per
    row."""
    toks = F.split(normalize_text(text), " ")
    return F.flatten(
        F.transform(
            F.array(toks),
            lambda tk: F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(tk) - F.lit(n - 1), F.lit(1)),
                ),
                lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
            ),
        )
    )


#: PII redaction patterns — literal-class regexes valid in BOTH Java
#: (Spark) and RE2-style engines (no backreferences, no lookbehind), so
#: an external SQL oracle can replay them verbatim.
#:
#: The phone class is a bounded heuristic with three alternatives —
#: international (+ prefix), parenthesized area code, and three
#: separator-joined groups of 3-4/3-4/2-6 digits. It deliberately does
#: NOT match bare digit runs (order ids, ISBNs, timestamps) or
#: date-shaped 4-2-2 strings; the residual false-positive surface is
#: separator-joined triples that happen to look phone-shaped (e.g.
#: "123-456-7890" as a part number), which is accepted and documented
#: rather than chasing locale-perfect phone grammar.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"\+\d[\d\- ()]{6,16}\d"
        r"|\(\d{2,4}\)[\- ]?\d{3,4}[\- ]?\d{2,6}"
        r"|\d{3,4}[\- ]\d{3,4}[\- ]\d{2,6}",
        "<PHONE>",
    ),
)


def redact_pii(text: Column) -> Column:
    """Replace emails / IPv4s / SSN-shaped tokens / phone-ish numbers
    with typed placeholder tags. Pure chained ``regexp_replace`` —
    JVM-side, codegen-friendly, linear over a 100 TB corpus. Pattern
    order matters (emails before phones so digits inside addresses
    aren't half-eaten, SSNs before the looser phone class);
    ``PII_PATTERNS`` is ordered accordingly."""
    out = text
    for _, pattern, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_match_count(text: Column) -> Column:
    """Total count of PII-pattern matches in ``text`` (all classes).
    Counts each class on the PROGRESSIVELY redacted text (same order
    as ``redact_pii``) so one span is never counted under two classes.
    One ``regexp_count`` + ``regexp_replace`` pass per pattern, fully
    JVM-side."""
    total = F.lit(0)
    cur = text
    for _, pattern, tag in PII_PATTERNS:
        total = total + F.regexp_count(cur, F.lit(pattern))
        cur = F.regexp_replace(cur, pattern, tag)
    return total


def nfkc_fold(text: Column, strip_accents: bool = True) -> Column:
    """Unicode NFKC normalization + casefold (+ optional accent strip)
    — the canonicalization pass multilingual dedup needs BEFORE
    fingerprinting: fullwidth forms (ＡＢＣ), ligatures (ﬁ), compatibility
    digits (①), precomposed-vs-combining accents, and case all collapse
    so byte-different renderings of the same text dedup together.

    The ONE text function that leaves codegen: the JVM has no Unicode
    normalizer in Spark SQL, so this is an Arrow-batched pandas UDF by
    necessity (the multimodal-decode policy: Python only where no
    built-in exists, and batched when it is). Everything downstream
    (fingerprints, n-grams, MinHash) stays column algebra over the
    folded output. NULL in → NULL out.

    ``strip_accents`` decomposes (NFD), drops combining marks (Mn),
    and recomposes (NFC) — café/café/CAFÉ all → cafe. Off by default
    for languages where diacritics are contrastive? No: ON by default,
    matching the dedup-canonicalization use; pass False for
    linguistically-faithful folding.
    """
    import pandas as pd  # noqa: F401 (typing only; resolved executor-side)

    do_strip = bool(strip_accents)

    @F.pandas_udf("string")
    def _fold(s):
        import unicodedata

        def one(x):
            if x is None:
                return None
            y = unicodedata.normalize("NFKC", x).casefold()
            if do_strip:
                y = unicodedata.normalize(
                    "NFC",
                    "".join(
                        c
                        for c in unicodedata.normalize("NFD", y)
                        if unicodedata.category(c) != "Mn"
                    ),
                )
            return y

        return s.map(one)

    return _fold(text)
