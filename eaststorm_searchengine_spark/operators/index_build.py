"""Inverted-index construction — the engine's core batch pipeline.

Implements BASELINE.json north_star: vectorized tokenization →
per-(term, doc) postings with tf + positions → salted
repartition-by-term shuffle → per-partition sorted posting runs →
delta-gap + varbyte block encoding with block-max metadata, written as
term-bucketed segment files.  Replaces the reference's eager
string-fold index build (``jobs/Indexer.java:36-75``) with a
shuffle-conscious DataFrame plan.

Scale design (the 10^12-doc story):

* **Doc-range chunking is the salt.**  ``chunk = doc_id >> CHUNK_BITS``
  bounds every ``(term, chunk)`` group at 2^CHUNK_BITS postings, so even
  a stopword that appears in *every* document never forms a single
  giant shuffle group — its postings land in one bounded group per doc
  range.  Because chunks partition the doc-id space into ordered
  disjoint ranges, the "external merge" of per-partition sorted runs is
  free: reading a term's blocks ordered by ``first_doc`` *is* the merged
  list (same trick as Lucene segment ordering).
* **Term buckets give query-side pruning.**  Segments are written
  partitioned by ``bucket = xxhash64(term) % n_buckets``; a query reads
  only its terms' buckets (directory-level partition pruning).
* **Single tokenize pass.**  Tokenization (the expensive pandas-UDF
  stage) runs once; the aggregated postings are staged to parquet, and
  doc lengths, corpus stats, segments, term stats and lineage all derive
  from the staged postings — no recomputation of lineage per action.
  The staging directory doubles as the build checkpoint.
* **Block-max metadata.**  Each 128-posting block stores
  ``max(tf_norm)`` (the doc-dependent BM25 factor, avgdl fixed at build
  time), so query-time block upper bound = ``idf * max_tfnorm`` —
  exactly what block-max WAND needs.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import sqltok
from ..functions.udfs import tokenize_udf, tokenize_stem_udf
from . import codec

CHUNK_BITS = 18  # 262,144 docs per chunk → bounded (term, chunk) groups
BLOCK = 128  # postings per block (classic block-max WAND block size)
DEFAULT_BUCKETS = 16

SEGMENT_SCHEMA = (
    "bucket int, term string, chunk long, first_doc long, last_doc long, "
    "n int, max_tfnorm double, docs binary, tfs binary, dls binary, pos binary"
)

SEGMENT_COLS = [
    "bucket", "term", "chunk", "first_doc", "last_doc", "n",
    "max_tfnorm", "docs", "tfs", "dls", "pos",
]


class IndexPaths:
    def __init__(self, root: str):
        self.root = root
        self.postings = os.path.join(root, "postings")  # staged, also checkpoint
        self.segments = os.path.join(root, "segments")
        self.term_stats = os.path.join(root, "term_stats")
        self.doclens = os.path.join(root, "doclens")
        self.stats = os.path.join(root, "stats.json")
        self.lineage = os.path.join(root, "lineage")
        self.commits = os.path.join(root, "_commits")


def tokenize_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", stem: bool = False
) -> DataFrame:
    """(doc_id, tokens, dl). Tokens per ``jobs/Indexer.java:129-140``;
    optional Porter stemming (north-star analyzer)."""
    udf = tokenize_stem_udf if stem else tokenize_udf
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        udf(F.col(text_col)).alias("tokens"),
    ).withColumn("dl", F.size("tokens"))


def build_postings(tokens_df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(term, doc_id, tf, positions, dl, bucket, chunk) — positions are
    1-based token indexes (position convention per
    ``AnchorTextIndexer.java:57-66``; body postings carry positions per
    the north_star).  groupBy(term, doc_id) keys are fine-grained (≤ one
    row per term per doc), so partial aggregation keeps the shuffle
    balanced even for stopword terms."""
    exploded = tokens_df.select(
        "doc_id",
        "dl",
        F.posexplode("tokens").alias("pos0", "term"),
    )
    return (
        exploded.groupBy("term", "doc_id")
        .agg(
            F.count("*").cast("int").alias("tf"),
            F.sort_array(F.collect_list((F.col("pos0") + 1).cast("int"))).alias("positions"),
            F.first("dl").alias("dl"),
        )
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
        .withColumn(
            "chunk", F.floor(F.col("doc_id") / F.lit(1 << CHUNK_BITS)).cast("long")
        )
    )


def _make_encoder(avgdl: float):
    """Closure-captured avgdl (cloudpickle ships nested functions by
    value, so the constant reaches executors)."""
    k1, b = sqltok.K1, sqltok.B

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        tf_norm = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        positions = pdf["positions"].tolist()
        bucket = int(pdf["bucket"].iloc[0])
        term = pdf["term"].iloc[0]
        chunk = int(pdf["chunk"].iloc[0])
        rows = []
        for s in range(0, len(docs), BLOCK):
            e = min(s + BLOCK, len(docs))
            rows.append(
                {
                    "bucket": bucket,
                    "term": term,
                    "chunk": chunk,
                    "first_doc": int(docs[s]),
                    "last_doc": int(docs[e - 1]),
                    "n": e - s,
                    "max_tfnorm": float(tf_norm[s:e].max()),
                    "docs": codec.delta_encode(docs[s:e].astype(np.uint64)),
                    "tfs": codec.vb_encode(tfs[s:e].astype(np.uint64)),
                    "dls": codec.vb_encode(dls[s:e].astype(np.uint64)),
                    "pos": codec.encode_positions(positions[s:e]),
                }
            )
        return pd.DataFrame(rows, columns=SEGMENT_COLS)

    return encode_group


def build_segments(postings: DataFrame, avgdl: float) -> DataFrame:
    """Salted repartition-by-term → sorted, compressed block rows.

    The shuffle key is (bucket, term, chunk): term for locality, chunk
    (doc range) as the skew salt.  applyInPandas sorts each bounded
    group and emits ≤ ceil(group/128) block rows."""
    return postings.groupBy("bucket", "term", "chunk").applyInPandas(
        _make_encoder(avgdl), SEGMENT_SCHEMA
    )


def _doclens_from_postings(staged: DataFrame) -> DataFrame:
    # (doc_id, dl) appears identically on every posting of a doc;
    # max aggregation is partial-agg friendly (no distinct shuffle blowup).
    return staged.groupBy("doc_id").agg(F.max("dl").alias("dl"))


def _finalize(spark: SparkSession, paths: IndexPaths) -> tuple[DataFrame, DataFrame]:
    seg_read = spark.read.parquet(paths.segments)
    term_stats = seg_read.groupBy("term").agg(F.sum("n").cast("long").alias("df"))
    term_stats.write.mode("overwrite").parquet(paths.term_stats)
    # per-chunk (shuffle-partition) lineage + metrics — north_rule
    lineage = (
        seg_read.groupBy("chunk")
        .agg(
            F.sum("n").cast("long").alias("postings"),
            F.countDistinct("term").alias("terms"),
            F.sum(
                F.length("docs") + F.length("tfs") + F.length("dls") + F.length("pos")
            ).cast("long").alias("bytes"),
        )
        .withColumn("status", F.lit("complete"))
    )
    lineage.write.mode("overwrite").parquet(paths.lineage)
    return term_stats, lineage


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    stem: bool = False,
) -> dict:
    """Full index build → ``out_dir``.  Returns build stats/metrics.

    Layout:
      postings/   staged aggregated postings (checkpoint of the
                  expensive tokenize+shuffle stage)
      segments/   parquet, partitioned by bucket (term-hash pruning)
      term_stats/ parquet (term, df)
      doclens/    parquet (doc_id, dl)
      lineage/    parquet per-chunk metrics (postings, terms, bytes)
      stats.json  {n_docs, avgdl, total_tokens, n_terms, ...}
    """
    t0 = time.time()
    paths = IndexPaths(out_dir)

    tokens_df = tokenize_docs(docs, id_col, text_col, stem=stem)
    build_postings(tokens_df, n_buckets).write.mode("overwrite").parquet(paths.postings)
    staged = spark.read.parquet(paths.postings)

    doclens = _doclens_from_postings(staged)
    doclens.write.mode("overwrite").parquet(paths.doclens)
    agg = spark.read.parquet(paths.doclens).agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
    ).collect()[0]
    n_docs = int(agg["n_docs"])
    avgdl = float(agg["avgdl"] or 0.0)

    build_segments(staged, avgdl).write.mode("overwrite").partitionBy("bucket").parquet(
        paths.segments
    )
    term_stats, _ = _finalize(spark, paths)

    stats = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "total_tokens": int(agg["total_tokens"] or 0),
        "n_terms": int(term_stats.count()),
        "n_buckets": n_buckets,
        "block": BLOCK,
        "chunk_bits": CHUNK_BITS,
        "stem": stem,
        "k1": sqltok.K1,
        "b": sqltok.B,
        "build_sec": time.time() - t0,
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(paths.stats, "w") as f:
        json.dump(stats, f, indent=2)
    return stats


def build_index_resumable(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    n_jobs: int = 4,
    fail_after: int | None = None,
) -> dict:
    """Checkpointed build: docs are processed in ``n_jobs`` doc-id-range
    jobs; each job writes its segments under ``part=<j>`` and commits a
    marker.  A re-run skips committed parts, so resume-after-kill equals
    from-scratch (FIXTURES.md §5).

    ``fail_after`` (tests only): raise after that many parts commit,
    simulating a mid-build crash."""
    paths = IndexPaths(out_dir)
    os.makedirs(paths.root, exist_ok=True)
    os.makedirs(paths.commits, exist_ok=True)

    # stats pass (cheap relative to the build; itself checkpointed)
    if not os.path.exists(os.path.join(paths.commits, "doclens.done")):
        tokens_all = tokenize_docs(docs, id_col, text_col)
        tokens_all.select("doc_id", "dl").write.mode("overwrite").parquet(paths.doclens)
        open(os.path.join(paths.commits, "doclens.done"), "w").close()
    doclens = spark.read.parquet(paths.doclens)
    agg = doclens.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(agg["n_docs"]), float(agg["avgdl"] or 0.0)

    bounds = docs.agg(
        F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
    ).collect()[0]
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = (hi - lo + 1 + n_jobs - 1) // n_jobs

    done = 0
    for j in range(n_jobs):
        marker = os.path.join(paths.commits, f"part-{j}.done")
        if os.path.exists(marker):
            continue
        part_docs = docs.filter(
            (F.col(id_col) >= lo + j * span) & (F.col(id_col) < lo + (j + 1) * span)
        )
        part_postings = build_postings(
            tokenize_docs(part_docs, id_col, text_col), n_buckets
        )
        build_segments(part_postings, avgdl).write.mode("overwrite").parquet(
            os.path.join(paths.segments, f"part={j}")
        )
        with open(marker, "w") as f:
            json.dump({"part": j, "lo": lo + j * span, "hi": lo + (j + 1) * span}, f)
        done += 1
        if fail_after is not None and done >= fail_after:
            raise RuntimeError(f"simulated crash after {done} parts")

    term_stats, _ = _finalize(spark, paths)
    stats = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_terms": int(term_stats.count()),
        "n_buckets": n_buckets,
        "resumable": True,
        "n_jobs": n_jobs,
    }
    with open(paths.stats, "w") as f:
        json.dump(stats, f, indent=2)
    return stats
