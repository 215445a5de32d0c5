"""URL canonicalization and domain analytics (extended surface).

Web-crawl corpora are keyed by URL, and URL-level exact dedup is the
first, cheapest dedup tier a training pipeline runs (before any
content hashing): the same page is typically fetched under dozens of
spellings — scheme/host case, default ports, fragments, tracking
parameters. Everything here is pure JVM column algebra
(``try_parse_url`` / regex / array ops; the ``try_`` form yields NULL
on malformed input instead of raising under ANSI mode) — zero
shuffles, zero Python in the hot path — so canonicalization rides
inside the scan projection at 100 TB.

Canonical form implemented (the uncontroversial subset of RFC 3986
§6 plus the de-facto tracking-param strip):

- scheme and host lowercased; userinfo dropped
- default ports dropped (``:80`` for http, ``:443`` for https);
  non-default ports kept
- fragment (``#...``) dropped
- tracking query parameters dropped (default set ``utm_*``,
  ``fbclid``, ``gclid``, ``msclkid``, ``igshid``, ``mc_eid`` —
  configurable per call; bare ``ref``/``ref_src`` are NOT stripped
  by default because they select content on many sites); remaining
  parameters kept IN ORDER (param reordering changes semantics for
  some sites, so we don't sort)
- empty path normalized to ``/``

``registered_domain`` groups hosts by their registrable domain using
the public-suffix *heuristic* (a literal set of the common two-level
suffixes like ``co.uk``); it is not a full Public Suffix List — the
PSL is a large external artifact, and the heuristic is the standard
dependency-free approximation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default query parameters stripped by ``normalize_url`` — pure
#: analytics campaign tags that never select content. Each entry is a
#: regex alternative matched case-insensitively against the parameter
#: NAME (marketing URLs are frequently hand-pasted as UTM_SOURCE=, and
#: a case-sensitive strip would leave two canonical spellings of the
#: same page). Deliberately EXCLUDES bare ``ref``/``ref_src``: those
#: are content-selecting on many sites (GitHub ``?ref=<branch>``), so
#: stripping them would merge distinct pages and ``url_dedup`` would
#: then drop real content — callers whose corpus uses them as pure
#: referrer tags pass a widened ``tracking_params`` explicitly.
DEFAULT_TRACKING_PARAMS = (
    "utm_[^=]*", "fbclid", "gclid", "msclkid", "igshid", "mc_eid",
)


def _tracking_re(tracking_params) -> str:
    return "^(?i)(" + "|".join(tracking_params) + ")="

# common second-level public suffixes; host "a.b.co.uk" → registered
# domain "b.co.uk" (3 labels) instead of "co.uk" (2)
_TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "org.mx", "gob.mx",
    "com.ar", "com.tr", "com.tw", "com.sg", "com.my", "com.hk",
    "co.za", "org.za", "co.kr", "or.kr", "co.nz", "net.nz", "org.nz",
    "com.co", "com.pe", "com.ve", "com.ua", "com.pl", "com.ru",
]


def url_host(url: Column) -> Column:
    """Lowercased hostname of ``url`` (no port, no userinfo); NULL for
    unparseable values."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def _port_suffix(url: Column) -> Column:
    """':port' to re-attach after the host: empty when absent or when
    it is the scheme's default."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    authority = F.try_parse_url(url, F.lit("AUTHORITY"))
    port_s = F.regexp_extract(F.coalesce(authority, F.lit("")), r":(\d+)$", 1)
    # compare and re-render NUMERICALLY: ':0080' is the default http
    # port and ':08080' must canonicalize to ':8080', or the same page
    # keeps two canonical spellings
    port = F.when(port_s == "", F.lit(None)).otherwise(port_s.cast("int"))
    is_default = (
        ((scheme == "http") & (port == 80))
        | ((scheme == "https") & (port == 443))
    )
    return F.when(
        port.isNull() | is_default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port.cast("string")))


def _clean_query(
    url: Column, tracking_params=DEFAULT_TRACKING_PARAMS
) -> Column:
    """'?k=v&...' with tracking parameters removed; empty string when
    nothing survives (or there was no query)."""
    q = F.try_parse_url(url, F.lit("QUERY"))
    pat = _tracking_re(tracking_params)
    kept = F.filter(
        F.split(F.coalesce(q, F.lit("")), "&"),
        lambda kv: (kv != "") & ~kv.rlike(pat),
    )
    joined = F.array_join(kept, "&")
    return F.when(joined == "", F.lit("")).otherwise(F.concat(F.lit("?"), joined))


def normalize_url(
    url: Column, tracking_params=DEFAULT_TRACKING_PARAMS
) -> Column:
    """Canonical URL per the module contract; NULL when the value has
    no parseable scheme+host. ``tracking_params`` is the strip list
    (regex alternatives over parameter names) — see
    ``DEFAULT_TRACKING_PARAMS`` for what the default covers and why
    ``ref`` is not in it."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = url_host(url)
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when(F.coalesce(path, F.lit("")) == "", F.lit("/")).otherwise(path)
    out = F.concat(
        scheme, F.lit("://"), host, _port_suffix(url), path,
        _clean_query(url, tracking_params),
    )
    return F.when(scheme.isNull() | host.isNull(), F.lit(None)).otherwise(out)


def registered_domain(host: Column) -> Column:
    """Registrable domain of a lowercase hostname: last two labels,
    or last three when the last two form a known two-level public
    suffix (heuristic; see module docstring). IP literals and
    single-label hosts pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return (
        F.when(host.isNull(), F.lit(None))
        .when(is_ip | (n <= 2), host)
        .when(last2.isin(_TWO_LEVEL_SUFFIXES), last3)
        .otherwise(last2)
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_params=DEFAULT_TRACKING_PARAMS,
) -> DataFrame:
    """URL-level exact dedup: keep one row per canonical URL (the
    minimum ``id_col``, so the choice is deterministic). Same
    two-phase de-skewed shape as content dedup
    (`operators/dedup.keep_first_exact`): a map-side-combinable
    ``groupBy(canonical).agg(min(id))`` joined back — a mega-cluster
    URL cannot serialize onto one task, and rows with an unparseable
    URL (canonical NULL) are all kept."""
    canon = df.withColumn(
        "__curl", normalize_url(F.col(url_col), tracking_params)
    )
    keepers = (
        canon.where(F.col("__curl").isNotNull())
        .groupBy("__curl")
        .agg(F.min(F.col(id_col)).alias("__keep_id"))
    )
    return (
        canon.join(keepers, "__curl", "left")
        .where(F.col("__keep_id").isNull() | (F.col(id_col) == F.col("__keep_id")))
        .drop("__curl", "__keep_id")
    )


def domain_stats(
    df: DataFrame, url_col: str = "url", weight_col: str | None = None
) -> DataFrame:
    """Per-registered-domain corpus profile: document count (and
    summed ``weight_col`` when given) — the aggregate a crawl-mix
    audit reads first. One partial-aggregable pass."""
    base = df.select(
        registered_domain(url_host(F.col(url_col))).alias("domain"),
        *( [F.col(weight_col)] if weight_col else [] ),
    ).where(F.col("domain").isNotNull())
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if weight_col:
        aggs.append(F.sum(weight_col).alias(f"sum_{weight_col}"))
    return base.groupBy("domain").agg(*aggs)


def filter_domains(
    df: DataFrame, blocklist: DataFrame | list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted. A literal
    list compiles to an ``isin`` predicate (pushed into the scan
    projection); a DataFrame blocklist (column ``domain``) runs as a
    broadcast LEFT ANTI join — blocklists are small by nature, and
    broadcasting keeps the corpus un-shuffled."""
    dom = registered_domain(url_host(F.col(url_col)))
    if isinstance(blocklist, list):
        return df.where(dom.isNull() | ~dom.isin(blocklist))
    return df.withColumn("__dom", dom).join(
        F.broadcast(blocklist.select(F.col("domain").alias("__dom"))),
        "__dom",
        "left_anti",
    ).drop("__dom")


def html_to_text(html: Column) -> Column:
    """Plain text from an HTML payload — the first transform of every
    web-corpus pipeline, as a chain of JVM ``regexp_replace`` calls
    (zero Python, rides in the scan projection):

    1. ``script``/``style``/``noscript``/HTML-comment blocks dropped
       wholesale (their text is never prose);
    2. block-level closers (``</p>``, ``</div>``, ``</li>``,
       ``</h_>``, ``</tr>``, ``<br>``) become newlines so paragraph
       structure survives for the line-level passes
       (``operators/dedup.dedup_lines``);
    3. remaining tags stripped;
    4. the common named/numeric entities decoded;
    5. whitespace normalized (runs of spaces/tabs → one space, ≥3
       newlines → paragraph break, lines trimmed).

    This is the dependency-free extraction tier: a real boilerplate
    classifier (readability/trafilatura-class) plugs in downstream,
    but at 100 TB this pass is what turns raw crawl bytes into the
    ``text`` column every other operator consumes. NULL in → NULL out.
    """
    t = F.regexp_replace(
        html, r"(?is)<(script|style|noscript)\b[^>]*>.*?</\1\s*>", " "
    )
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)<br\s*/?>|</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote)\s*>", "\n"
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    # entity decode order matters: ampersand forms (&amp; / &#38;) go
    # LAST, or '&amp;lt;' (the literal text '&lt;') would double-decode
    # into '<'. Unknown numeric refs are left INTACT — replacing them
    # with whitespace would silently delete content.
    for ent, rep in [
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&#60;", "<"),
        ("&gt;", ">"),
        ("&#62;", ">"),
        ("&quot;", '"'),
        ("&#34;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&amp;", "&"),
        ("&#38;", "&"),
    ]:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\x0b\f\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    # trim() strips spaces only; newlines at the edges need the regex
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def domain_quality_blocklist(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    max_fail_frac: float = 0.5,
) -> DataFrame:
    """Domain-level curation (the RefinedWeb-style escalation from
    per-document rules): roll the Gopher per-document verdicts up to
    registered domains and emit the domains whose corpus presence is
    both material (``n_docs >= min_docs``) and mostly junk
    (``fail_frac > max_fail_frac``) — feed the result straight into
    ``filter_domains``. A domain serving 90% rule-failing pages is
    evidence the remaining 10% are junk the rules missed; dropping at
    the domain grain is how the published web corpora act on that.

    Output: ``(domain, n_docs, fail_frac, mean_quality)`` for blocked
    domains only. ONE pass: the Gopher battery is a scan projection
    and the rollup a partial-aggregable groupBy on the domain key."""
    from data_export_tool_spark.operators.quality import gopher_quality_flags
    from data_export_tool_spark.functions.text import quality_score

    # the battery projects down to (id, metrics) — join the verdict
    # back on the id key to pair it with the row's URL (one id-keyed
    # hash join; the rollup after it is partial-aggregable)
    flagged = gopher_quality_flags(df, id_col=id_col, text_col=text_col).select(
        id_col, "gopher_keep"
    )
    rolled = (
        df.join(flagged, id_col)
        .select(
            registered_domain(url_host(F.col(url_col))).alias("domain"),
            (~F.col("gopher_keep")).cast("double").alias("__fail"),
            quality_score(F.col(text_col)).alias("__q"),
        )
        .where(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__fail"), 6).alias("fail_frac"),
            F.round(F.avg("__q"), 6).alias("mean_quality"),
        )
    )
    return rolled.where(
        (F.col("n_docs") >= min_docs)
        & (F.col("fail_frac") > max_fail_frac)
    )
