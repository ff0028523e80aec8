"""CrawlQualityAnalyzer-parity reports over a hand-built pages table,
checked against straight-Python expectations (these reports have no
DuckDB view — the pages table is synthesized — so this is their
correctness gate alongside the rows-only contract queries)."""

from pyspark.sql import Row

from eaststorm_searchengine_spark.operators import analytics

PAGES = [
    # (url, html)
    ("http://a.com:80/x", "<html><title>Alpha</title><p>" + "t" * 100 + "</p></html>"),
    ("http://a.com:80/y", "<html><title>  </title><p>" + "t" * 200 + "</p></html>"),
    ("http://a.com:80/z", "<html><p>" + "t" * 100 + "</p></html>"),
    ("http://b.org:80/1", "<html><title>Beta</title><p>" + "t" * 300 + "</p></html>"),
    ("http://c.org:80/1", "<html><title>Gamma</title>" + "x" * 2048 + "</html>"),
]


def _pages(spark):
    return spark.createDataFrame(
        [Row(url=u, html=h.encode(), lang="en") for u, h in PAGES]
    )


def test_host_concentration(spark):
    got = [(r.host, r.pages) for r in analytics.host_concentration(_pages(spark)).collect()]
    assert got == [("a.com", 3), ("b.org", 1), ("c.org", 1)]


def test_tld_counts(spark):
    got = [(r.tld, r.pages) for r in analytics.tld_counts(_pages(spark)).collect()]
    assert got == [("com", 3), ("org", 2)]


def test_language_share(spark):
    got = [(r.lang, r.pages) for r in analytics.language_share(_pages(spark)).collect()]
    assert got == [("en", 5)]


def test_size_stats_and_histogram(spark):
    sizes = [len(h.encode()) for _, h in PAGES]
    st = analytics.size_stats(_pages(spark)).collect()[0]
    assert st.pages == 5 and st.min_bytes == min(sizes) and st.max_bytes == max(sizes)
    hist = {r.bucket_lo: r.pages for r in analytics.size_histogram(_pages(spark), bucket=1024).collect()}
    expect = {}
    for s in sizes:
        expect[s // 1024 * 1024] = expect.get(s // 1024 * 1024, 0) + 1
    assert hist == expect


def test_title_coverage(spark):
    cov = analytics.title_coverage(_pages(spark)).collect()[0]
    # blank-only title and missing title both don't count
    assert (cov.pages, cov.with_title) == (5, 3)
