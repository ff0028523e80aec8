"""Crawl-frontier simulation: BFS semantics vs an independent
pure-Python oracle on a hand-built mini-web, filter-chain behavior,
and termination."""

from eaststorm_searchengine_spark import textproc
from eaststorm_searchengine_spark.operators import crawl


def _page(url, hrefs):
    body = "".join(f'<a href="{h}">link</a>' for h in hrefs)
    return (url, f"<html><body><p>{'pad ' * 20}</p>{body}</body></html>")


MINI_WEB = [
    _page("http://a.com:80/", ["/one.html", "/two.html", "http://b.com/x.html"]),
    _page("http://a.com:80/one.html", ["/two.html", "/img/pic.jpg", "#frag"]),
    _page("http://a.com:80/two.html", ["https://zh.wikipedia.org/wiki/Nope", "/three.html"]),
    _page("http://a.com:80/three.html", ["mailto:x@y.z", "ftp://files/x", "/one.html"]),
    _page("http://b.com:80/x.html", ["http://c.com/never-fetched.html"]),
]


def _python_bfs_oracle(seeds, max_iters):
    """Independent BFS over MINI_WEB using the same textproc parity
    functions for extraction/normalization but its own loop logic."""
    web = {u: h for u, h in MINI_WEB}
    crawled = {}
    frontier = {textproc.normalize_seed(s) for s in seeds}
    for depth in range(max_iters):
        if not frontier:
            break
        for u in frontier:
            crawled[u] = depth
        nxt = set()
        for u in frontier:
            if u not in web:
                continue
            for href in textproc.extract_links(web[u]):
                a = textproc.normalize_url(u, href)
                if not a or not textproc.is_crawlable(a):
                    continue
                if textproc.filtered_by_ext(a) or textproc.is_non_english_wikipedia(a):
                    continue
                if a not in crawled:
                    nxt.add(a)
        frontier = nxt
    return sorted((u, d, u in web) for u, d in crawled.items())


def test_crawl_matches_python_bfs(spark):
    pages = spark.createDataFrame(MINI_WEB, "url string, html string")
    got = sorted(
        (r.url, r.depth, r.fetched)
        for r in crawl.crawl_frontier(pages, ["http://a.com/"], max_iters=6).collect()
    )
    want = _python_bfs_oracle(["http://a.com/"], 6)
    assert got == want
    # sanity on the shape: seeds at depth 0, dangling c.com attempt unfetched
    by_url = {u: (d, f) for u, d, f in got}
    assert by_url["http://a.com:80/"] == (0, True)
    assert by_url["http://c.com:80/never-fetched.html"][1] is False
    # filtered urls never crawled
    assert not any("wikipedia" in u or u.endswith(".jpg") for u in by_url)


def test_crawl_terminates_before_max_iters(spark):
    pages = spark.createDataFrame(MINI_WEB, "url string, html string")
    out = crawl.crawl_frontier(pages, ["http://a.com/"], max_iters=50).collect()
    assert 0 < len(out) < 20


def test_crawl_url_filter_seam(spark):
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(MINI_WEB, "url string, html string")
    out = crawl.crawl_frontier(
        pages, ["http://a.com/"], max_iters=6,
        url_filter=~F.col("url").contains("b.com"),
    ).collect()
    assert all("b.com" not in r.url for r in out if r.depth > 0)


def test_crawl_robots_gate(spark):
    """robots.txt disallow removes the subtree reached only through a
    disallowed path (the reference's pre-HEAD robots filter)."""
    pages = spark.createDataFrame(MINI_WEB, "url string, html string")
    robots = {"a.com": "User-agent: *\nDisallow: /two.html\n"}
    out = {
        r.url: r.depth
        for r in crawl.crawl_frontier(
            pages, ["http://a.com/"], max_iters=6, robots_map=robots
        ).collect()
    }
    assert "http://a.com:80/two.html" not in out
    # three.html is only linked from two.html -> unreachable now
    assert "http://a.com:80/three.html" not in out
    assert "http://a.com:80/one.html" in out


def test_crawl_robots_gates_seeds_too(spark):
    """A robots-disallowed SEED is never attempted (the reference
    checks every url pre-fetch, seeds included)."""
    pages = spark.createDataFrame(MINI_WEB, "url string, html string")
    out = crawl.crawl_frontier(
        pages, ["http://a.com/"], max_iters=4,
        robots_map={"a.com": "User-agent: *\nDisallow: /\n"},
    ).collect()
    assert all("a.com" not in r.url for r in out)


def test_fetch_join_broadcast_is_size_gated(spark):
    """VERDICT r02 #5: the frontier is broadcast into the fetch join
    only below the size threshold — a wide frontier gets a plain join
    (no broadcast hint in the logical plan; AQE decides at runtime)."""
    web = spark.createDataFrame(
        [(f"http://a.com:80/{i}.html", "<html></html>") for i in range(50)],
        "url string, html string",
    )
    frontier = web.select("url")
    hinted = crawl._fetch_join(web, frontier, frontier_rows=50, broadcast_threshold=100)
    plain = crawl._fetch_join(web, frontier, frontier_rows=50, broadcast_threshold=10)
    hinted_logical = hinted._jdf.queryExecution().optimizedPlan().toString()
    plain_logical = plain._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in hinted_logical
    assert "strategy=broadcast" not in plain_logical


def test_crawl_same_result_without_broadcast(spark):
    """The size gate is a physical-strategy choice only: forcing the
    plain-join path yields identical BFS output."""
    pages = spark.createDataFrame(MINI_WEB, "url string, html string")
    key = lambda df: sorted((r.url, r.depth, r.fetched) for r in df.collect())
    a = key(crawl.crawl_frontier(pages, ["http://a.com/"], max_iters=6))
    b = key(crawl.crawl_frontier(pages, ["http://a.com/"], max_iters=6,
                                 broadcast_threshold=0))
    assert a == b and len(a) > 0
