"""Incremental index maintenance via Structured Streaming.

The reference has no streaming (SURVEY.md §2.8 — its crawler is a
batch-iterative loop), but the fragment segment layout makes streaming
ingestion natural: new documents are new doc-id batches, and a batch's
blocks are self-contained segment rows — appending them never rewrites
existing data (the same property Lucene exploits with per-segment
flushes).

Shape: ``readStream`` (file source on the pages/documents directory) →
``foreachBatch`` → the same fragment generator as the batch fast path →
parquet append partitioned by bucket.  ``refresh_metadata`` rebuilds
doclens / term_stats / lineage / stats.json from the segment store
(idempotent; run after a trigger or on a schedule).  Query engine is
unchanged — a ``BM25Index`` opened after refresh sees all ingested docs.

Exactly-once notes: the parquet file-source + checkpointLocation give
exactly-once batch replay; segment rows are keyed by (chunk=first_doc)
so a replayed batch appends duplicate chunks — to stay idempotent under
retries each micro-batch writes to ``segments/stream_batch=<id>/``,
which overwrite-replaces on replay (the standard idempotent-sink
pattern for foreachBatch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index_build as ib


def _append_batch(batch_df: DataFrame, batch_id: int, index_dir: str,
                  id_col: str, text_col: str, from_html: bool,
                  n_buckets: int) -> None:
    paths = ib.IndexPaths(index_dir)
    src = batch_df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col)
    )
    frags = src.mapInPandas(
        ib._make_fragment_gen(text_col, from_html, False, n_buckets),
        ib.SEGMENT_SCHEMA,
    )
    # idempotent per-micro-batch sink: overwrite this batch's directory.
    # repartition("bucket") first so each fragment lands as ONE file per
    # (batch, bucket) — the LSM sorted-run shape (r9): without it every
    # map partition wrote its own file per bucket (~13x the files; the
    # measured 50-fragment store was 42k files and served 11x slower
    # than compacted).  The per-batch shuffle is small (one micro-batch
    # of encoded blocks) and buys bounded read amplification: fragments
    # x n_buckets files, independent of ingest parallelism.
    out = os.path.join(paths.segments, f"stream_batch={batch_id}")
    (
        frags.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )


def start_incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    from_html: bool = False,
    n_buckets: int = ib.DEFAULT_BUCKETS,
    available_now: bool = True,
):
    """Start (and with ``available_now`` drain) the ingestion stream."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: _append_batch(
                df, bid, index_dir, id_col, text_col, from_html, n_buckets
            )
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def refresh_metadata(spark: SparkSession, index_dir: str, n_buckets: int = ib.DEFAULT_BUCKETS) -> dict:
    """Rebuild doclens / term_stats / lineage / stats.json from the
    segment store (idempotent)."""
    import json

    import numpy as np
    import pandas as pd

    from ..operators import codec

    paths = ib.IndexPaths(index_dir)
    seg = spark.read.parquet(paths.segments)
    dl_rows = seg.filter(F.col("term") == ib.DOCLEN_TERM).select("docs", "dls")

    def decode_dl(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples():
                ids = codec.delta_decode(r.docs).astype(np.int64)
                dls = codec.vb_decode(r.dls).astype(np.int64)
                outs.append(pd.DataFrame({"doc_id": ids, "dl": dls}))
            if outs:
                yield pd.concat(outs)

    from pyspark.sql import Observation

    dl_obs = Observation()
    dl_rows.mapInPandas(decode_dl, "doc_id long, dl long").observe(
        dl_obs,
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
    ).write.mode("overwrite").parquet(paths.doclens)
    agg = dl_obs.get  # corpus stats ride the write job (r8 floor cut)
    n_terms = ib._finalize(spark, paths)
    stats = {
        "n_docs": int(agg["n_docs"]),
        "avgdl": float(agg["avgdl"] or 0.0),
        "total_tokens": int(agg["total_tokens"] or 0),
        "n_terms": n_terms,
        "n_buckets": n_buckets,
        "block": ib.BLOCK,
        "layout": "fragment-streaming",
        "k1": 1.2,
        "b": 0.75,
    }
    from ..sources import fsio

    fsio.write_text(spark, paths.stats, json.dumps(stats, indent=2))
    return stats


# ---------------------------------------------------------------------------
# Auto-compaction policy (VERDICT r08 #5)
#
# A long-running ingest appends one fragment set per micro-batch; reads
# degrade with fragment count (measured r8: batch-of-12 serving 12.6 s
# on a 50-fragment store vs 1.13 s compacted — 42k files vs ~800).  The
# cure (compact_index) exists; this is the POLICY that applies it, the
# way any LSM-shaped system schedules merges: a cheap metadata check
# after each trigger, a full re-chunk compaction when the store crosses
# a fragment-count or file-count threshold.  Compaction must run with
# the ingest stream idle (availableNow drains naturally); the rewrite
# lands in a temp dir and swaps in atomically — stats.json mtime
# changes last, so live BM25Index handles pick the new layout up
# through their existing rebuild detection.
# ---------------------------------------------------------------------------

# Defaults sized from the measured degradation curve (sf0.1 batch-of-12
# serving): the SLOPE is stable across measurement windows at ~0.23-0.28
# s/fragment, but the compacted baseline itself swings 1.0-2.2 s with
# the window — so the threshold must hold the ~2x read-amplification
# budget at the FAST baseline, not the slow one (8 fragments read 2.8x
# when compacted serving is 1.0 s; 4 fragments stay <=2x at every
# measured baseline: 1.0+4*0.23=1.9x fast, 1.4x slow).  File count is
# the second trigger because batch SIZE varies — many tiny batches can
# leave a pathological file count at low fragment counts.
MAX_FRAGMENTS = 4
MAX_SEGMENT_FILES = 8192


def fragment_stats(index_dir: str) -> dict:
    """Cheap driver-side metadata scan of a segment store: number of
    micro-batch fragment sets (``stream_batch=*`` directories; a plain
    batch-built store counts as one) and total parquet data files."""
    paths = ib.IndexPaths(index_dir)
    fragments = set()
    n_files = 0
    for root, _dirs, files in os.walk(paths.segments):
        pq = sum(1 for f in files if f.endswith(".parquet"))
        if pq == 0:
            continue  # partition-dir skeleton / _SUCCESS only
        rel = os.path.relpath(root, paths.segments)
        frag = next(
            (p for p in rel.split(os.sep) if p.startswith("stream_batch=")),
            "",
        )
        fragments.add(frag)
        n_files += pq
    return {"n_fragments": len(fragments), "n_files": n_files}


def should_compact(
    stats: dict,
    max_fragments: int = MAX_FRAGMENTS,
    max_files: int = MAX_SEGMENT_FILES,
) -> bool:
    """Pure policy predicate over :func:`fragment_stats` output."""
    return (
        stats["n_fragments"] > max_fragments or stats["n_files"] > max_files
    )


def auto_compact(
    spark: SparkSession,
    index_dir: str,
    max_fragments: int = MAX_FRAGMENTS,
    max_files: int = MAX_SEGMENT_FILES,
    chunk_bits: int | None = None,
) -> dict | None:
    """Compact ``index_dir`` in place iff the policy triggers.

    Returns the new stats dict when compaction ran, ``None`` when the
    store is healthy.  The ingest stream must be idle (between
    ``availableNow`` drains, or with the query stopped): compaction
    reads the whole segment store and replaces it.  The swap is
    directory-rename atomic for readers holding the OLD file index —
    live handles re-open through stats.json mtime detection
    (BM25Index._refresh_if_rebuilt)."""
    import shutil

    fstats = fragment_stats(index_dir)
    if not should_compact(fstats, max_fragments, max_files):
        return None
    tmp_out = index_dir.rstrip("/") + ".compact_tmp"
    old = index_dir.rstrip("/") + ".compact_old"
    shutil.rmtree(tmp_out, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    stats = ib.compact_index(spark, [index_dir], tmp_out, chunk_bits=chunk_bits)
    os.rename(index_dir, old)
    os.rename(tmp_out, index_dir)
    shutil.rmtree(old, ignore_errors=True)
    # the rewrite replaced every file under the same paths: drop the
    # stale file-index caches so fresh reads list the new layout
    for p in ("segments", "term_stats", "doclens"):
        try:
            spark.catalog.refreshByPath(getattr(ib.IndexPaths(index_dir), p))
        except Exception:
            pass
    return stats
