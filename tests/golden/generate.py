"""Generate golden parity files by running the REFERENCE engine
(jobs.jar via GoldenGen.java reflection harness) on a corpus of test
inputs: hand-crafted edge cases + the rebuild's synthetic pages.

Run from the repo root:  python tests/golden/generate.py
Outputs tests/golden/*.golden (committed; pytest diffs against them).
"""

from __future__ import annotations

import base64
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, ROOT)

REFBIN = os.path.join(HERE, "refbin")  # reference compiled on demand (not committed)


def ensure_refbin() -> None:
    """The shipped jobs.jar targets a newer JVM than the sandbox's
    Java 17, so compile the reference sources (read-only) into a local
    build dir instead."""
    if os.path.isdir(REFBIN) and os.path.exists(
        os.path.join(REFBIN, "cis5550", "jobs", "Indexer.class")
    ):
        return
    import glob

    sources = glob.glob("/root/reference/src/**/*.java", recursive=True)
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-d", REFBIN, "-nowarn", *sources],
        check=True,
    )


def b64(s: str) -> str:
    return base64.b64encode(s.encode("utf-8")).decode("ascii")


# --- edge-case HTML inputs (FIXTURES.md §4 tokenizer cases) -------------
EDGE_HTML = [
    "",
    "<html><body><p>short</p></body></html>",
    "<html><p>" + "a" * 40 + " word</p></html>",  # block just over/under 50
    "<html><p>" + "the quick brown fox jumps over the lazy dog " * 3 + "</p></html>",
    "<html><script>var x = 'noise tokens here';</script><p>"
    + "visible paragraph content that is long enough to be kept yes "
    + "</p><style>.c { color: red }</style></html>",
    "<html><div class='x'>nested <b>bold</b> and <i>italic</i> text inside a "
    "div block that exceeds fifty characters easily</div></html>",
    "<html><article>ARTICLE Mixed CASE TeXT with UPPER and lower case words "
    "exceeding the block threshold</article></html>",
    "<html><section>text with url https://example.com/path?q=1 embedded and "
    "more words to pass fifty chars</section></html>",
    "<html><p>unicode éè café naïve 中文 tokens and "
    "enough padding words to be kept around</p></html>",
    "<html><p>digits 123 mixed a1b2 pure 456789 and words " + "pad " * 10 + "</p></html>",
    "<html><p>" + ("superlongtoken" * 3) + " normal words here plus padding to "
    "exceed fifty characters</p></html>",  # >30-char token dropped
    "<html><p>entity &amp; test &lt;tag&gt; &nbsp; &quot;quoted&quot; plus "
    "padding words to exceed fifty characters</p></html>",
    "<html><p>nbsp separated words plus ordinary padding words to "
    "exceed the fifty character threshold</p></html>",  #   is NOT Java \s
    "<HTML><P>upper case tags with enough content to exceed the fifty "
    "character block threshold</P></HTML>",
    "<html><p>outer <p>inner nested paragraph that is quite long and "
    "interesting</p> tail</p></html>",
    "<html><div>first long-enough block of text right here padded well</div>"
    "<div>second long-enough block of text also padded well enough</div></html>",
    "no tags at all just bare text that is reasonably long for fallback",
    "<html><p>tiny</p><div>also small</div></html>",  # all blocks <=50 -> fallback
    "<html lang=\"en\"><title>Test &amp; Title</title><p>body content long "
    "enough to be extracted as a paragraph block here</p></html>",
    "<html><p>tab\tand\nnewline\rand\x0bvertical\x0cform separated words "
    "padded to exceed fifty characters</p></html>",
    "<html><p>trailing spaces and multiple   internal    spaces padded out "
    "to exceed the fifty char limit   </p></html>",
    "<html><p>HTTP://CAPS.example.com/PATH uppercase url plus padding words "
    "to exceed fifty characters</p></html>",
    "<html><p>http no scheme www.example.com bare host plus padding words to "
    "exceed fifty characters</p></html>",
    # astral chars: Java String.length() counts UTF-16 units (emoji = 2),
    # so these blocks sit on opposite sides of the 50/80 thresholds
    # depending on unit-vs-codepoint counting (ADVICE r01)
    "<html><p>" + "\U0001F600" * 20 + " ok words here</p></html>",
    "<html><p>" + "\U0001F680" * 25 + " thirty five ascii chars pad out xx</p></html>",
    "<html><p>mixed \U0001F63A emoji \U0001F409 inside a paragraph padded "
    "well past fifty characters either way</p></html>",
]

EDGE_TITLES = [
    "", "Simple Title", "Mixed CASE Title", "Title &amp; Entities &lt;here&gt;",
    "Title with 123 digits and a1b2 mixed", "  spaces  everywhere  ",
    "&nbsp;leading entity", "ALL CAPS TITLE", "hyphen-ated and under_scored",
    "unicode café 中文 title", "1start with digit", "x" * 40,
    "the " + "y" * 31 + " long token", "&unknownentity; kept?",
    # 150 codepoints but 210 UTF-16 units -> reference cuts at 197 units
    "t" * 90 + "\U0001F600" * 60,
]

EDGE_URLS = [
    "https://foo.com:443/articles/machine-learning-guide.html",
    "http://a.b.c:80/",
    "https://x.com:443/cgi/action/id/real-words-here",
    "https://x.com:443/img/images/photo.jpg",
    "https://x.com:443/UPPER/Case/PaTh",
    "https://x.com:443/a/bb/ccc",
    "https://x.com:443/with-digits-123/and-words",
    "not a url at all",
    "https://x.com:443",
    "mailto:someone@example.com",
    "https://x.com:443/" + "z" * 35 + "/ok",
]

EDGE_WIKI_URLS = [
    "https://en.wikipedia.org/wiki/Spark",
    "https://zh.wikipedia.org/wiki/Spark",
    "http://de.wikipedia.org:80/wiki/Funke",
    "https://www.wikipedia.org/",
    "https://commons.wikimedia.org/x",          # wikimedia, not wikipedia
    "https://notwikipedia.org.evil.com/page",   # contains neither
    "https://sub.en.wikipedia.org/page",        # lang code = 'sub'
    "https://EN.WIKIPEDIA.ORG/CAPS",
    "https://fr.m.wikipedia.org/wiki/Art",
    "not a url at all",
    "https://x.com:443",
    "",
]

ROBOTS_A = """# global rules
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2

User-agent: cis5550-crawler
Disallow: /cgi/
Allow: /cgi/open
Crawl-delay: 0.5
"""

ROBOTS_B = """User-agent: *
Disallow:
Crawl-delay: 1.4
Crawl-delay: 3
"""

ROBOTS_C = """User-agent: otherbot
Disallow: /
"""

ROBOTS_D = """orphan-directive: ignored
Disallow: /before-any-section/
USER-AGENT: CIS5550-CRAWLER
DISALLOW: /upper/   # trailing comment
allow: /upper/sub
"""

ROBOTS_E = ""

EDGE_ROBOTS = [
    (ROBOTS_A, "/private/secret"),
    (ROBOTS_A, "/private/ok/page"),
    (ROBOTS_A, "/cgi/script"),
    (ROBOTS_A, "/cgi/open/x"),
    (ROBOTS_A, "/anything"),
    (ROBOTS_B, "/private/whatever"),
    (ROBOTS_C, "/any"),
    (ROBOTS_C, ""),
    (ROBOTS_D, "/upper/page"),
    (ROBOTS_D, "/upper/sub/page"),
    (ROBOTS_D, "/before-any-section/x"),
    (ROBOTS_E, "/x"),
]

EDGE_ANCHORS = [
    "", "Click Here", "<b>Bold</b> anchor", "Read&nbsp;more", "1234",
    "a", "MIXED case Words 42", "multi\nline\nanchor",
]

EDGE_ALTS = [
    "mountain landscape photo", "logo", "a scenic VIEW of the 3 lakes",
    "  padded  alt  ", "icon-small", "profile picture of user",
]

EDGE_NORMALIZE = [
    # the reference's own TestNormalize cases (jobs/TestNormalize.java:6-22)
    ("https://foo.com:8000/bar/xyz.html", "http://elsewhere.com/abc.html"),
    ("https://foo.com:8000/bar/xyz.html", "/one/two.html"),
    ("https://foo.com:8000/bar/xyz.html", "../blubb/123.html"),
    ("https://foo.com:8000/bar/xyz.html", "#frag"),
    ("https://foo.com:8000/bar/xyz.html", "blah.html#test"),
    ("https://foo.com:8000/bar/xyz.html", "foo/blah.html"),
    ("https://foo.com:8000/bar/xyz.html", "#"),
    ("https://foo.com:8000/bar/foo/xyz.html", "blubb/123.html"),
    ("https://foo.com:8000/bar/foo/xyz.html", "../blubb/123.html"),
    ("https://foo.com:8000/bar/foo/xyz.html", "../../blubb/123.html"),
    ("https://foo.com:8000/bar/foo/xyz.html", "../../../blubb/123.html"),
    ("https://foo.com:8000/bar/foo/xyz.html", "../../../../blubb/123.html"),
    # extras: schemes, junk, ports
    ("https://foo.com:8000/bar/xyz.html", "javascript:void(0)"),
    ("https://foo.com:8000/bar/xyz.html", "mailto:a@b.c"),
    ("https://foo.com:8000/bar/xyz.html", "ftp://files.example.com/a"),
    ("https://foo.com:8000/bar/xyz.html", "//cdn.example.com/lib.js"),
    ("http://foo.com/bar/", "relative.html"),
    ("http://foo.com:80/bar/", "HTTPS://UPPER.COM/PATH"),
    ("https://foo.com/", "http://other.com:8080/x?q=1#frag"),
    ("https://foo.com/", ""),
    ("https://foo.com/a/b/c/", "./d.html"),
]


def synthetic_pages(n: int = 120) -> list[tuple[str, str]]:
    """(url, html) from the rebuild's deterministic corpus generator."""
    import duckdb

    from eaststorm_searchengine_spark import corpus

    rows = duckdb.sql(
        "select doc_id, text, lang from '/root/testdata/sf0.001/documents.parquet' "
        f"order by doc_id limit {n}"
    ).fetchall()
    out = []
    for doc_id, text, lang in rows:
        html = corpus.page_html(int(doc_id), text or "", lang or "", 500)
        out.append((corpus.page_url(int(doc_id)), html))
    return out


def run_mode(mode: str, input_lines: list[str], out_name: str) -> None:
    inp = os.path.join(HERE, f"_in_{mode}.txt")
    outp = os.path.join(HERE, out_name)
    with open(inp, "w") as f:
        f.write("\n".join(input_lines) + "\n")
    subprocess.run(
        ["java", "-cp", f"{HERE}:{REFBIN}", "GoldenGen", mode, inp, outp],
        check=True,
        cwd=HERE,
    )
    os.remove(inp)
    print(f"wrote {out_name}: {len(input_lines)} records")


def main() -> None:
    ensure_refbin()
    pages = synthetic_pages()
    htmls = EDGE_HTML + [h for _, h in pages]
    urls = EDGE_URLS + [u for u, _ in pages]

    # inputs are committed too, so pytest can replay them
    with open(os.path.join(HERE, "inputs_html.txt"), "w") as f:
        f.write("\n".join(b64(h) for h in htmls) + "\n")
    with open(os.path.join(HERE, "inputs_titles.txt"), "w") as f:
        f.write("\n".join(b64(t) for t in EDGE_TITLES) + "\n")
    with open(os.path.join(HERE, "inputs_robots.txt"), "w") as f:
        f.write("\n".join(b64(t) + "\t" + b64(pth) for t, pth in EDGE_ROBOTS) + "\n")
    with open(os.path.join(HERE, "inputs_wiki_urls.txt"), "w") as f:
        f.write("\n".join(b64(u) for u in EDGE_WIKI_URLS) + "\n")
    with open(os.path.join(HERE, "inputs_urls.txt"), "w") as f:
        f.write("\n".join(b64(u) for u in urls) + "\n")
    with open(os.path.join(HERE, "inputs_anchors.txt"), "w") as f:
        f.write("\n".join(b64(a) for a in EDGE_ANCHORS) + "\n")
    with open(os.path.join(HERE, "inputs_alts.txt"), "w") as f:
        f.write("\n".join(b64(a) for a in EDGE_ALTS) + "\n")
    with open(os.path.join(HERE, "inputs_normalize.txt"), "w") as f:
        f.write("\n".join(f"{b64(b)}\t{b64(h)}" for b, h in EDGE_NORMALIZE) + "\n")
    pr_inputs = [f"{b64(h)}\t{b64(u)}" for u, h in pages]
    with open(os.path.join(HERE, "inputs_pagerank.txt"), "w") as f:
        f.write("\n".join(pr_inputs) + "\n")

    run_mode("extract", [b64(h) for h in htmls], "extract.golden")
    run_mode("title_tokens", [b64(t) for t in EDGE_TITLES], "title_tokens.golden")
    run_mode("url_tokens", [b64(u) for u in urls], "url_tokens.golden")
    run_mode("anchor_tokens", [b64(a) for a in EDGE_ANCHORS], "anchor_tokens.golden")
    run_mode("alt_tokens", [b64(a) for a in EDGE_ALTS], "alt_tokens.golden")
    run_mode("extract_title", [b64(h) for h in htmls], "extract_title.golden")
    run_mode("extract_links", [b64(h) for h in htmls], "extract_links.golden")
    run_mode(
        "normalize",
        [f"{b64(b)}\t{b64(h)}" for b, h in EDGE_NORMALIZE],
        "normalize.golden",
    )
    run_mode("pagerank_links", pr_inputs, "pagerank_links.golden")
    run_mode("is_english", [b64(h) for h in htmls], "is_english.golden")
    run_mode("non_en_wiki", [b64(u) for u in EDGE_WIKI_URLS], "non_en_wiki.golden")
    run_mode(
        "robots",
        [b64(t) + "\t" + b64(pth) for t, pth in EDGE_ROBOTS],
        "robots.golden",
    )


if __name__ == "__main__":
    main()
