"""Vectorized pandas UDFs — the only Python/JVM boundary in the engine.

Each UDF is a thin Arrow-batched wrapper over the pure-Python parity
functions in ``textproc`` (per BASELINE.json input_hint: "vectorized
pandas/Arrow UDFs (no per-row Python)").  Keeping the logic in
``textproc`` and only the batching here is what lets pytest verify the
byte-identical invariant against the very same code the cluster runs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from .. import textproc
from ..stemmer import porter_stem


def _as_str(s: pd.Series) -> pd.Series:
    """binary/str column → str (html arrives as BinaryType per input_hint)."""
    return s.map(
        lambda v: v.decode("utf-8", errors="replace") if isinstance(v, (bytes, bytearray)) else v
    )


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """HTML → normalized text (Indexer.java:83-127 semantics)."""
    return _as_str(html).map(textproc.extract_text)


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(text: pd.Series) -> pd.Series:
    """Normalized text → body tokens (Indexer.java:129-140)."""
    return text.map(textproc.tokenize)


@pandas_udf(ArrayType(StringType()))
def tokenize_stem_udf(text: pd.Series) -> pd.Series:
    """Body tokens + Porter stemming (north-star analyzer variant)."""
    return text.map(lambda t: [porter_stem(w) for w in textproc.tokenize(t)])


@pandas_udf(ArrayType(StringType()))
def extract_and_tokenize_udf(html: pd.Series) -> pd.Series:
    """Full returnCleanedupPage pipeline (Indexer.java:83-141)."""
    return _as_str(html).map(textproc.extract_and_tokenize)


@pandas_udf(StringType())
def extract_title_udf(html: pd.Series) -> pd.Series:
    """<title> extraction (Crawler.java:823-846)."""
    return _as_str(html).map(textproc.extract_title)


@pandas_udf(StringType())
def extract_title_nonblank_udf(html: pd.Series) -> pd.Series:
    """<title> extraction with the ranker's blank test: titles that are
    empty or all Java whitespace become NULL, so a downstream coalesce
    falls back to the url exactly like the reference's ``t.isBlank()``
    (SearchServer.java) — including Unicode separators F.trim misses."""

    def f(h):
        t = textproc.extract_title(h)
        return None if t is None or textproc.java_is_blank(t) else t

    return _as_str(html).map(f)


@pandas_udf(ArrayType(StringType()))
def title_tokens_udf(title: pd.Series) -> pd.Series:
    """Title tokens (TitleIndexer.java:82-103); unique per title
    handled downstream via array_distinct."""
    return title.map(textproc.clean_title_tokens)


@pandas_udf(ArrayType(StringType()))
def url_tokens_udf(url: pd.Series) -> pd.Series:
    """URL path tokens minus stoplist (URLIndexer.java:80-107)."""
    return url.map(textproc.extract_tokens_from_url)


@pandas_udf(ArrayType(StringType()))
def alt_tokens_udf(html: pd.Series) -> pd.Series:
    """<img alt> tokens minus stoplist (ImageAltSelfIndexer.java:44-125)."""
    return _as_str(html).map(textproc.extract_alt_tokens)


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    """Raw <a href> values (Crawler.java:848-861)."""
    return _as_str(html).map(textproc.extract_links)


@pandas_udf(ArrayType(StringType()))
def pagerank_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """PageRank link extraction+normalization, ≤500/page
    (PageRank.java:284-355)."""
    return pd.Series(
        [
            textproc.extract_links_for_pagerank(
                h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray)) else h, u
            )
            for h, u in zip(html, base_url)
        ]
    )


@pandas_udf(ArrayType(StringType()))
def pagerank_link_hosts_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """Fused link-extraction + target-host parse for the PageRank
    adjacency (PageRank.java:284-355 + :53-63): one Arrow pass emitting
    the deduped target-host list directly, instead of shipping full
    normalized URLs across the boundary and re-parsing them in a second
    UDF (the r4 two-pass shape that regressed the bench).  Host grammar
    is the same URI.getHost-parity ``extract_host`` the page's own host
    uses.  Output order: first-seen (downstream sorts)."""

    def f(h, u):
        if isinstance(h, (bytes, bytearray)):
            h = h.decode("utf-8", errors="replace")
        out: list[str] = []
        seen: set[str] = set()
        for link in textproc.extract_links_for_pagerank(h, u):
            hh = textproc.extract_host(link)
            if hh and hh not in seen:
                seen.add(hh)
                out.append(hh)
        return out

    return pd.Series([f(h, u) for h, u in zip(html, base_url)])


@pandas_udf(StringType())
def host_udf(url: pd.Series) -> pd.Series:
    """Lowercased host (SearchServer.java:160-163, PageRank.java:53-63)."""
    return url.map(textproc.extract_host)


@pandas_udf(StringType())
def normalize_url_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """Relative-URL normalization (Crawler.java:663-777)."""
    return pd.Series([textproc.normalize_url(b, h) for b, h in zip(base, href)])


# Anchor-text extraction needs (target_url, position-indexed tokens) per
# <a> tag — returned as an array of structs for downstream explode.
from pyspark.sql.types import IntegerType, StructField, StructType  # noqa: E402

_ANCHOR_HIT = ArrayType(
    StructType(
        [
            StructField("target", StringType()),
            StructField("word", StringType()),
            StructField("position", IntegerType()),
        ]
    )
)

import re  # noqa: E402

_ANCHOR_RE = re.compile(r'(?i)<a\s+[^>]*href\s*=\s*"([^"]+)"[^>]*>(.*?)</a>')


def _anchor_hits(html) -> list[dict]:
    """(word, target, position) triples per page.
    Reference: AnchorTextIndexer.java:41-70 — regex
    ``(?i)<a\\s+[^>]*href\\s*=\\s*"([^"]+)"[^>]*>(.*?)</a>`` (no DOTALL,
    matching the Java pattern exactly); positions are 1-based token
    indexes within each anchor (AnchorTextIndexer.java:57-66)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    if not html:
        return []
    out = []
    for m in _ANCHOR_RE.finditer(html):
        target = textproc.java_trim(m.group(1))
        words = textproc.cleanup_anchor(m.group(2))
        for i, w in enumerate(words):
            if w:
                out.append({"target": target, "word": w, "position": i + 1})
    return out


@pandas_udf(_ANCHOR_HIT)
def anchor_hits_udf(html: pd.Series) -> pd.Series:
    return html.map(_anchor_hits)


# Per-document posting synthesis: tf + 1-based positions are a
# *within-row* computation, so they're built here in one vectorized pass
# instead of an explode → groupBy(term, doc) → collect_list aggregation
# (which allocates millions of tiny buffers JVM-side and anti-scales).
from pyspark.sql.types import LongType as _LongType  # noqa: E402

from .hashing import term_hash63  # noqa: E402

_DOC_POSTINGS_TYPE = StructType(
    [
        StructField("dl", IntegerType()),
        StructField(
            "postings",
            ArrayType(
                StructType(
                    [
                        StructField("term", StringType()),
                        StructField("th", _LongType()),  # term_hash63
                        StructField("tf", IntegerType()),
                        StructField("positions", ArrayType(IntegerType())),
                    ]
                )
            ),
        ),
    ]
)


_TH_CACHE: dict[str, int] = {}


def _th(t: str) -> int:
    h = _TH_CACHE.get(t)
    if h is None:
        h = term_hash63(t)
        if len(_TH_CACHE) < 1_000_000:  # bounded per-worker cache
            _TH_CACHE[t] = h
    return h


def _doc_postings(tokens: list[str]) -> list[dict]:
    acc: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        acc.setdefault(t, []).append(i + 1)
    return [
        {"term": t, "th": _th(t), "tf": len(ps), "positions": ps}
        for t, ps in acc.items()
    ]


def _doc_postings_frame(token_lists: list[list[str]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "dl": pd.array([len(ts) for ts in token_lists], dtype="int32"),
            "postings": [_doc_postings(ts) for ts in token_lists],
        }
    )


@pandas_udf(_DOC_POSTINGS_TYPE)
def doc_postings_udf(text: pd.Series) -> pd.DataFrame:
    """Normalized text → per-doc posting fragments (Indexer.java:129-140
    tokens; positions are 1-based token indexes)."""
    return _doc_postings_frame([textproc.tokenize(t) for t in text])


@pandas_udf(_DOC_POSTINGS_TYPE)
def doc_postings_from_html_udf(html: pd.Series) -> pd.DataFrame:
    """Raw HTML → per-doc posting fragments via the full
    returnCleanedupPage pipeline (Indexer.java:83-141)."""
    return _doc_postings_frame([textproc.extract_and_tokenize(h) for h in _as_str(html)])


@pandas_udf(_DOC_POSTINGS_TYPE)
def doc_postings_stem_udf(text: pd.Series) -> pd.DataFrame:
    """Tokens + Porter stemming → per-doc posting fragments."""
    return _doc_postings_frame(
        [[porter_stem(w) for w in textproc.tokenize(t)] for t in text]
    )


# Combined per-page field terms: all four url-set index tokenizers in
# ONE pass over the corpus — the union-of-four-indexes shape reads the
# pages table four times (four UDF evaluations of the same rows); at
# 10^12 pages that is four full scans for one logical product.
_FIELD_TERMS_TYPE = ArrayType(
    StructType([StructField("field", StringType()), StructField("term", StringType())])
)


def _field_terms_row(html: str | None, url: str | None, text: str | None) -> list[dict]:
    out = []
    for t in set(textproc.tokenize(text)):
        out.append({"field": "body", "term": t})
    title = textproc.extract_title(html)
    if title is not None:
        for t in set(textproc.clean_title_tokens(title)):
            out.append({"field": "title", "term": t})
    for t in set(textproc.extract_tokens_from_url(url)):
        out.append({"field": "url", "term": t})
    for t in set(textproc.extract_alt_tokens(html)):
        out.append({"field": "imagealt", "term": t})
    return out


@pandas_udf(_FIELD_TERMS_TYPE)
def field_terms_udf(html: pd.Series, url: pd.Series, text: pd.Series) -> pd.Series:
    return pd.Series(
        [_field_terms_row(h, u, t) for h, u, t in zip(_as_str(html), url, text)]
    )


@pandas_udf(ArrayType(StringType()))
def link_hosts_udf(links: pd.Series) -> pd.Series:
    """Per-link-array host extraction with the SAME URI.getHost-parity
    parser the page's own host uses (textproc.extract_host) — the
    PageRank adjacency must not mix two host grammars (code-review r04:
    F.parse_url keeps e.g. underscore reg-names that URI.getHost
    rejects, silently changing out-degrees).  Null/empty hosts are
    dropped here."""
    # `arr if arr is not None else []`, NOT `arr or []`: Arrow delivers
    # array<string> elements as numpy arrays in some plans (e.g. after
    # a checkpoint/cache boundary), and bool(ndarray) with 2+ elements
    # raises — confirmed by execution in code-review r04b
    return links.map(
        lambda arr: [
            h
            for h in (
                textproc.extract_host(u)
                for u in (arr if arr is not None else [])
            )
            if h
        ]
    )
