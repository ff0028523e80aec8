"""Byte-identical parity of the Python text pipeline vs the REFERENCE
engine's own output (goldens produced by tests/golden/generate.py,
which runs the reference's compiled Java — not a reimplementation).

This is the BASELINE.json per-row invariant: extracted text (and every
derived token stream) must match the reference byte-for-byte per input.
"""

import base64
import os

import pytest

from eaststorm_searchengine_spark import textproc

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
US = "\x1f"
NULL = "\x00"


def _lines(name):
    with open(os.path.join(GOLD, name)) as f:
        return [
            base64.b64decode(l.rstrip("\n")).decode("utf-8") for l in f.read().splitlines()
        ]


def _pairs(name):
    with open(os.path.join(GOLD, name)) as f:
        out = []
        for l in f.read().splitlines():
            a, b = l.split("\t")
            out.append(
                (base64.b64decode(a).decode("utf-8"), base64.b64decode(b).decode("utf-8"))
            )
        return out


HTMLS = _lines("inputs_html.txt")


def test_extract_text_and_tokens_byte_identical():
    golden = _lines("extract.golden")
    assert len(golden) == len(HTMLS)
    for html, g in zip(HTMLS, golden):
        parts = g.split(US)
        want_text, want_tokens = parts[0], parts[1:]
        assert textproc.extract_text(html) == want_text, f"text mismatch for {html[:80]!r}"
        assert textproc.extract_and_tokenize(html) == want_tokens


def test_title_tokens():
    titles = _lines("inputs_titles.txt")
    for t, g in zip(titles, _lines("title_tokens.golden")):
        want = g.split(US) if g else []
        assert textproc.clean_title_tokens(t) == want, repr(t)


def test_url_tokens():
    urls = _lines("inputs_urls.txt")
    for u, g in zip(urls, _lines("url_tokens.golden")):
        want = g.split(US) if g else []
        assert textproc.extract_tokens_from_url(u) == want, repr(u)


def test_anchor_tokens():
    anchors = _lines("inputs_anchors.txt")
    for a, g in zip(anchors, _lines("anchor_tokens.golden")):
        want = g.split(US) if g else []
        assert textproc.cleanup_anchor(a) == want, repr(a)


def test_alt_tokens():
    alts = _lines("inputs_alts.txt")
    for a, g in zip(alts, _lines("alt_tokens.golden")):
        want = g.split(US) if g else []
        assert textproc.cleanup_meaningful_alt(a.lower()) == want, repr(a)


def test_extract_title():
    for html, g in zip(HTMLS, _lines("extract_title.golden")):
        want = None if g == NULL else g
        assert textproc.extract_title(html) == want, repr(html[:80])


def test_extract_links():
    for html, g in zip(HTMLS, _lines("extract_links.golden")):
        want = g.split(US) if g else []
        assert textproc.extract_links(html) == want, repr(html[:80])


def test_normalize_url():
    for (base, href), g in zip(_pairs("inputs_normalize.txt"), _lines("normalize.golden")):
        want = None if g == NULL else g
        assert textproc.normalize_url(base, href) == want, f"{base} + {href}"


def test_pagerank_links():
    for (html, base), g in zip(_pairs("inputs_pagerank.txt"), _lines("pagerank_links.golden")):
        want = g.split(US) if g else []
        assert textproc.extract_links_for_pagerank(html, base) == want


def test_is_english():
    for html, g in zip(HTMLS, _lines("is_english.golden")):
        assert textproc.is_english_content(html) == (g == "true"), repr(html[:80])


def test_corpus_text_column_is_extractor_output():
    """The synthetic pages' golden text column == extract_text(html)."""
    import duckdb

    from eaststorm_searchengine_spark import corpus

    rows = duckdb.sql(
        "select doc_id, text, lang from '/root/testdata/sf0.001/documents.parquet' limit 50"
    ).fetchall()
    for doc_id, text, lang in rows:
        rec = corpus.page_record(int(doc_id), text or "", lang or "", 500)
        assert rec["text"] == textproc.extract_text(rec["html"].decode("utf-8"))


def test_is_non_english_wikipedia():
    wiki_urls = _lines("inputs_wiki_urls.txt")
    for url, g in zip(wiki_urls, _lines("non_en_wiki.golden")):
        assert textproc.is_non_english_wikipedia(url) == (g == "true"), repr(url)


def test_utf16_thresholds_astral():
    """Emoji count 2 UTF-16 units: a 34-codepoint / 54-unit block must
    be kept (>50 units), mirroring Java String.length()."""
    block = "\U0001F600" * 20 + " ok words here"
    assert len(block) == 34 and textproc.utf16_len(block) == 54
    html = f"<html><p>{block}</p></html>"
    # the block is kept, so the output is the normalized block (not the
    # whole-page fallback) — golden-checked too (inputs_html astral rows)
    assert "ok words here" in textproc.extract_text(html)


def test_title_cap_counts_utf16_units():
    t = "t" * 90 + "\U0001F600" * 60  # 150 codepoints, 210 UTF-16 units
    title = textproc.extract_title(f"<html><title>{t}</title></html>")
    assert title.endswith("...")
    assert textproc.utf16_len(title) == 200  # 197 units + "..."


def test_extract_host_rejects_illegal_hosts():
    assert textproc.extract_host("http://my_host.example.com/x") is None
    assert textproc.extract_host("http://ok-host.example.com/x") == "ok-host.example.com"


def test_extract_host_ipv6_literals():
    """URI.getHost() returns bracketed IPv6 literals (RFC 2732);
    ADVICE r02 #2: the reg-name rejection must not eat them."""
    assert textproc.extract_host("http://[::1]:8080/x") == "[::1]"
    assert textproc.extract_host("https://[2001:DB8::7]/p?q=1") == "[2001:db8::7]"
    assert textproc.extract_host("http://[not a host]/x") is None


def test_robots_crawl_delay_nonfinite():
    """Java Math.round semantics for hostile Crawl-delay values
    (ADVICE r02 #1): Infinity → Long.MAX_VALUE, NaN → 0, spellings
    Java's parseDouble rejects (bare 'inf', lowercase 'nan') ignored —
    and none of them may crash the parse."""
    from eaststorm_searchengine_spark import robots as R

    mk = lambda v: R.parse_robots(f"User-agent: *\nCrawl-delay: {v}\n")
    assert mk("Infinity").delay_ms == (1 << 63) - 1
    assert mk("-Infinity").delay_ms == -1  # max(-1, LONG_MIN) = -1
    assert mk("NaN").delay_ms == 0
    assert mk("inf").delay_ms == -1
    assert mk("nan").delay_ms == -1
    assert mk("1e999").delay_ms == (1 << 63) - 1  # finite-literal overflow
    assert mk("2.5").delay_ms == 2500
    # Java float-literal suffixes and hex floats (parseDouble accepts)
    assert mk("1.5f").delay_ms == 1500
    assert mk("2d").delay_ms == 2000
    assert mk("0x1.8p1").delay_ms == 3000
    assert mk("0x1.8p1f").delay_ms == 3000
    assert mk("0x1.8").delay_ms == -1   # Java requires the p exponent
    assert mk("1_000").delay_ms == -1   # PEP-515 underscores: Java rejects
    # suffixed special spellings: Java's suffix applies only to the
    # numeric production — parseDouble rejects these (and they must
    # not crash the parser)
    assert mk("NaNd").delay_ms == -1
    assert mk("NaNf").delay_ms == -1
    assert mk("Infinityd").delay_ms == -1
    assert mk("infd").delay_ms == -1
    # hex-literal overflow behaves like the decimal path: → Infinity
    assert mk("0x1p2000").delay_ms == (1 << 63) - 1
    assert mk("-0x1p2000").delay_ms == -1  # max(-1, LONG_MIN)


def test_robots_parse_and_allows():
    """robots.txt parse + allows() golden parity vs the reference's
    Crawler$Robots (reflection harness, 'robots' GoldenGen mode)."""
    from eaststorm_searchengine_spark import robots as R

    with open(os.path.join(GOLD, "inputs_robots.txt")) as f:
        inputs = []
        for line in f.read().splitlines():
            a, b = line.split("\t")
            inputs.append(
                (base64.b64decode(a).decode(), base64.b64decode(b).decode())
            )
    for (txt, path), g in zip(inputs, _lines("robots.golden")):
        want_allow, want_delay = g.split(",")
        r = R.parse_robots(txt)
        assert r.allows(path) == (want_allow == "true"), (txt[:60], path)
        assert r.delay_ms == int(want_delay), (txt[:60], path)


def test_politeness_arithmetic():
    """Per-host delay gate (Crawler.java:365-371)."""
    from eaststorm_searchengine_spark.robots import politeness_ready

    assert politeness_ready(10_000, 0, -1)          # never fetched
    assert not politeness_ready(10_000, 9_500, -1)  # default 1000ms gate
    assert politeness_ready(10_000, 9_000, -1)      # exactly at gate
    assert politeness_ready(10_000, 9_500, 500)     # robots delay overrides
    assert not politeness_ready(10_000, 9_800, 500)
    assert politeness_ready(10_000, 5_000, 3_000)
