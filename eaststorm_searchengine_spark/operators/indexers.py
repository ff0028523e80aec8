"""Capability-parity index jobs — Spark-first rewrites of the
reference's five index builders over the ``pages`` table.

Where the reference folds comma-joined URL strings per token
(O(n²) contains-scans, ``Indexer.java:55-60``), these produce typed
columns: ``array<string>`` URL sets (canonicalized to sorted order —
the reference's HashSet/fold order is nondeterministic by contract,
SURVEY.md §7) or struct arrays with positions.  All heavy lifting is
built-in Spark (explode / groupBy / collect_set); the only Python is
the vectorized tokenizer UDFs.

Pre-shuffle reduction: tokens are deduped per page *before* explode
(``array_distinct``) exactly as the reference dedupes per-page HashSets
before emitting pairs (``Indexer.java:45``, ``TitleIndexer.java:49``) —
the map-side combine that keeps stopword shuffle volume at one row per
(term, page).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import (
    alt_tokens_udf,
    anchor_hits_udf,
    extract_title_udf,
    title_tokens_udf,
    url_tokens_udf,
)


def body_index(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pt-page-index analogue: term → sorted url set.
    Reference: ``jobs/Indexer.java:36-75`` (tokens from the already
    extracted ``text`` column — the golden extraction output)."""
    from ..functions.udfs import tokenize_udf

    return (
        pages.select("url", F.explode(F.array_distinct(tokenize_udf(F.col(text_col)))).alias("term"))
        .groupBy("term")
        .agg(F.sort_array(F.collect_set("url")).alias("urls"))
    )


def title_index(pages: DataFrame) -> DataFrame:
    """pt-title-index analogue. Reference: ``jobs/TitleIndexer.java:11-79``
    (title extracted from html per ``Crawler.java:823-846``; unique words
    per title; term → url set)."""
    titles = pages.select("url", extract_title_udf("html").alias("title")).filter(
        F.col("title").isNotNull()
    )
    return (
        titles.select("url", F.explode(F.array_distinct(title_tokens_udf("title"))).alias("term"))
        .groupBy("term")
        .agg(F.sort_array(F.collect_set("url")).alias("urls"))
    )


def url_index(pages: DataFrame) -> DataFrame:
    """pt-url-index analogue. Reference: ``jobs/URLIndexer.java:28-76``
    (path tokens minus stoplist; term → url set)."""
    return (
        pages.select("url", F.explode(url_tokens_udf("url")).alias("term"))
        .groupBy("term")
        .agg(F.sort_array(F.collect_set("url")).alias("urls"))
    )


def imagealt_index(pages: DataFrame) -> DataFrame:
    """pt-imagealt-index analogue. Reference:
    ``jobs/ImageAltSelfIndexer.java:19-103`` (meaningful <img alt>
    tokens → url of the page hosting the image)."""
    return (
        pages.select("url", F.explode(F.array_distinct(alt_tokens_udf("html"))).alias("term"))
        .groupBy("term")
        .agg(F.sort_array(F.collect_set("url")).alias("urls"))
    )


def anchor_index(pages: DataFrame) -> DataFrame:
    """pt-anchor-index analogue: term → postings array of
    (url, positions), urls ordered by hit-count desc (ties: url asc —
    the reference's comparator sort is stable on its HashMap iteration
    order, i.e. unspecified; we canonicalize).
    Reference: ``jobs/AnchorTextIndexer.java:41-97`` extraction and
    ``:123-169`` per-term value assembly (positions are 1-based token
    indexes within each anchor, deduped+sorted per url)."""
    hits = pages.select(F.explode(anchor_hits_udf("html")).alias("h")).select(
        F.col("h.word").alias("term"),
        F.col("h.target").alias("target"),
        F.col("h.position").alias("position"),
    )
    per_url = hits.groupBy("term", "target").agg(
        F.sort_array(F.collect_set("position")).alias("positions")
    )
    return (
        per_url.withColumn("hits", F.size("positions"))
        .groupBy("term")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(
                        (-F.col("hits")).alias("neg_hits"),
                        F.col("target").alias("url"),
                        F.col("positions").alias("positions"),
                    ))
                ),
                lambda s: F.struct(s["url"].alias("url"), s["positions"].alias("positions")),
            ).alias("postings")
        )
    )


def field_indexes(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """All four url-set indexes in ONE corpus pass → (field, term,
    urls): a single combined tokenizer UDF emits the per-page distinct
    (field, term) set, then one explode → groupBy((field, term)) →
    collect_set builds every index together.  Same results as the four
    individual builders (equality-tested in tests/test_parity_jobs.py)
    with one scan and one shuffle instead of four of each — the 100-TB
    shape for producing the full index family."""
    from ..functions.udfs import field_terms_udf

    return (
        pages.select(
            "url",
            F.explode(field_terms_udf("html", "url", F.col(text_col))).alias("ft"),
        )
        .select("url", F.col("ft.field").alias("field"), F.col("ft.term").alias("term"))
        .groupBy("field", "term")
        .agg(F.sort_array(F.collect_set("url")).alias("urls"))
    )
