"""URL canonicalization / domain analytics (functions/web.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck

from data_export_tool_spark.functions import web as W


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(W.normalize_url(F.col("url")).alias("c")).collect()
    ]


CANON_CASES = [
    # scheme/host case, default port, fragment
    ("HTTP://WWW.Example.COM:80/Path/X#frag", "http://www.example.com/Path/X"),
    ("https://example.com:443/a", "https://example.com/a"),
    # non-default port kept
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # empty path -> /
    ("https://example.com", "https://example.com/"),
    # tracking params stripped, real params kept in order
    (
        "https://a.io/p?utm_source=x&q=1&fbclid=z&b=2&gclid=7",
        "https://a.io/p?q=1&b=2",
    ),
    ("https://a.io/p?utm_campaign=x", "https://a.io/p"),
    # content-selecting params survive the default strip: 'ref' is a
    # branch/anchor selector on many sites (GitHub '?ref=<branch>'),
    # so the default list leaves it alone
    ("https://a.io/p?ref=hn&keep=1", "https://a.io/p?ref=hn&keep=1"),
    # userinfo dropped
    ("http://user:pw@example.com/x", "http://example.com/x"),
    # already canonical -> unchanged
    ("https://sub.example.co.uk/deep/path?x=1", "https://sub.example.co.uk/deep/path?x=1"),
]


def test_normalize_url_battery(spark):
    got = _norm(spark, [u for u, _ in CANON_CASES])
    record_opcheck(
        "web_normalize_url", len(CANON_CASES),
        got == [want for _, want in CANON_CASES],
        oracle="literal-battery",
    )
    assert got == [want for _, want in CANON_CASES]


def test_normalize_url_widened_strip_list(spark):
    # a corpus whose 'ref' really is a referrer tag opts in explicitly
    df = spark.createDataFrame(
        [("https://a.io/p?ref=hn&keep=1",), ("https://a.io/p?utm_source=x",)],
        "url string",
    )
    wide = (*W.DEFAULT_TRACKING_PARAMS, "ref", "ref_src")
    got = [
        r["c"]
        for r in df.select(
            W.normalize_url(F.col("url"), tracking_params=wide).alias("c")
        ).collect()
    ]
    assert got == ["https://a.io/p?keep=1", "https://a.io/p"]


def test_normalize_url_unparseable_is_null(spark):
    got = _norm(spark, ["not a url", "", "ftp-ish"])
    # no scheme+host -> NULL (never a half-canonical string)
    assert got == [None, None, None]


def test_registered_domain(spark):
    cases = [
        ("www.example.com", "example.com"),
        ("a.b.example.co.uk", "example.co.uk"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("example.com", "example.com"),
        ("com", "com"),
        ("192.168.10.1", "192.168.10.1"),  # IP literal passes through
        ("deep.sub.domain.example.org", "example.org"),
        ("shop.example.com.au", "example.com.au"),
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [
        r["d"]
        for r in df.select(W.registered_domain(F.col("h")).alias("d")).collect()
    ]
    assert got == [want for _, want in cases]


def test_url_dedup_keeps_min_id_per_canonical(spark):
    rows = [
        (1, "HTTP://Example.com:80/a?utm_source=x"),
        (2, "http://example.com/a"),  # same canonical as 1 -> dropped (id 1 kept)
        (3, "http://example.com/b"),
        (4, "garbage"),  # unparseable -> kept
        (5, "not a url"),  # unparseable -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in W.url_dedup(df).collect())
    assert kept == [1, 3, 4, 5]


def test_url_dedup_two_phase_plan(spark):
    df = spark.createDataFrame([(1, "http://a.io/x")], "doc_id long, url string")
    plan = W.url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    # de-skewed shape: partial-aggregable min, no window over the url key
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_domain_stats(spark):
    rows = [
        (1, "http://a.example.com/1", 10),
        (2, "https://b.example.com/2", 20),
        (3, "http://other.org/x", 5),
        (4, "junk", 99),  # unparseable -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars int")
    got = {
        r["domain"]: (r["n_docs"], r["sum_n_chars"])
        for r in W.domain_stats(df, weight_col="n_chars").collect()
    }
    assert got == {"example.com": (2, 30), "other.org": (1, 5)}


def test_filter_domains_list_and_df(spark):
    rows = [
        (1, "http://spam.example.com/x"),
        (2, "http://ok.org/y"),
        (3, "bad url"),  # unparseable -> kept (list form)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(
        r["doc_id"] for r in W.filter_domains(df, ["example.com"]).collect()
    )
    assert kept == [2, 3]

    bl = spark.createDataFrame([("example.com",)], "domain string")
    out = W.filter_domains(df, bl)
    kept_df = sorted(r["doc_id"] for r in out.collect())
    # anti-join form drops NULL-domain rows' matches only; doc 3 has
    # NULL domain and a NULL join key never matches -> kept
    assert kept_df == [2, 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_normalization_is_scan_side(spark, sf_dir):
    # canonicalization over a parquet column stays inside the scan
    # projection: one scan, no exchange
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        docs.select(W.normalize_url(F.col("source")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_normalize_url_review_edges(spark):
    """Review findings: zero-padded default ports and uppercase
    tracking params must canonicalize identically to their lowercase /
    unpadded spellings."""
    cases = [
        ("http://example.com:0080/x", "http://example.com/x"),
        ("https://example.com:00443/x", "https://example.com/x"),
        ("http://example.com:08080/x", "http://example.com:8080/x"),
        ("https://a.io/p?UTM_SOURCE=x&q=1", "https://a.io/p?q=1"),
        ("https://a.io/p?FBCLID=z", "https://a.io/p"),
    ]
    got = _norm(spark, [u for u, _ in cases])
    assert got == [want for _, want in cases]


def test_html_to_text_battery(spark):
    cases = [
        # script/style dropped wholesale, tags stripped, entities decoded
        (
            "<html><head><style>.x{color:red}</style>"
            "<script>var a=1;</script></head>"
            "<body><h1>Title</h1><p>Hello &amp; welcome</p>"
            "<p>Second&nbsp;para</p></body></html>",
            "Title\nHello & welcome\nSecond para",
        ),
        # <br> and list items become line breaks; comments dropped
        (
            "<!-- nav --><ul><li>one</li><li>two</li></ul>line a<br>line b",
            "one\ntwo\n\nline a\nline b",  # </li> and </ul> both close blocks
        ),
        # entities
        ("a &lt;tag&gt; &quot;q&quot; &#39;s&#39;", "a <tag> \"q\" 's'"),
        # nested/mixed-case script with attributes
        (
            "<SCRIPT type='text/javascript'>if (a<b) {}</SCRIPT>kept",
            "kept",
        ),
        # plain text untouched
        ("no markup here", "no markup here"),
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [r["t"] for r in df.select(W.html_to_text(F.col("h")).alias("t")).collect()]
    assert got == [want for _, want in cases]


def test_html_to_text_is_scan_side(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        docs.select(W.html_to_text(F.col("text")).alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_html_entities_review_edges(spark):
    """Review findings: escaped entities must not double-decode, and
    numeric refs must decode (common) or survive (unknown), never
    vanish."""
    cases = [
        ("&amp;lt;b&amp;gt;", "&lt;b&gt;"),  # escaped markup stays text
        ("Tom &#38; Jerry", "Tom & Jerry"),
        ("a &#60;tag&#62; &#34;q&#34;", 'a <tag> "q"'),
        ("A&#66;C", "A&#66;C"),  # unknown ref left intact, not deleted
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [r["t"] for r in df.select(W.html_to_text(F.col("h")).alias("t")).collect()]
    assert got == [want for _, want in cases]


def test_domain_quality_blocklist_rollup_and_composition(spark):
    """Domain rollup of the (independently replay-pinned) Gopher
    verdicts: blocked set must replay exactly from the per-doc flags,
    and feeding it to filter_domains must drop exactly the blocked
    domains' rows."""
    from tests.conftest import record_opcheck
    from data_export_tool_spark.functions.web import (
        domain_quality_blocklist,
        filter_domains,
    )
    from data_export_tool_spark.operators.quality import gopher_quality_flags

    good = ("This is a perfectly ordinary paragraph of english text "
            "with plenty of common stop words that the rules accept "
            "because it has the usual shape of prose and the mean "
            "word length is entirely reasonable for this battery. ") * 3
    junk = "zz " * 60  # fails mean-word-length / stopword rules
    rows = []
    for i in range(6):  # junkfarm.com: 6 junk docs
        rows.append((i, f"https://junkfarm.com/p{i}", junk))
    for i in range(6, 12):  # goodsite.org: good docs
        rows.append((i, f"https://goodsite.org/a{i}", good))
    rows.append((12, "https://mixed.net/x", junk))  # below min_docs
    rows.append((13, None, junk))  # NULL url: never blocked
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")

    bl = domain_quality_blocklist(
        df, min_docs=3, max_fail_frac=0.5
    )
    blocked = {r["domain"]: (r["n_docs"], r["fail_frac"]) for r in bl.collect()}

    # replay from the per-doc verdicts (gopher flags themselves are
    # replay-pinned in test_gopher.py)
    flags = {
        r["doc_id"]: r["gopher_keep"]
        for r in gopher_quality_flags(df).select("doc_id", "gopher_keep").collect()
    }
    import collections

    per_dom = collections.defaultdict(list)
    dom_of = {}
    for i, url, _ in rows:
        if url is None:
            continue
        d = url.split("/")[2]
        d = ".".join(d.split(".")[-2:])
        per_dom[d].append(flags[i])
        dom_of[i] = d
    want = {
        d: (len(v), round(sum(1 for x in v if not x) / len(v), 6))
        for d, v in per_dom.items()
        if len(v) >= 3 and sum(1 for x in v if not x) / len(v) > 0.5
    }
    ok = blocked == want and "junkfarm.com" in blocked
    # composition: filter_domains drops exactly the blocked rows
    kept = {r["doc_id"] for r in filter_domains(df, bl.select("domain")).collect()}
    want_kept = {
        i for i, url, _ in rows
        if url is None or dom_of.get(i) not in blocked
    }
    ok = ok and kept == want_kept
    record_opcheck(
        "domain_quality_blocklist", len(rows), ok, oracle="python-reference"
    )
    assert ok
