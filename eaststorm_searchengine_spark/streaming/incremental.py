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
    # idempotent per-micro-batch sink: overwrite this batch's directory
    out = os.path.join(paths.segments, f"stream_batch={batch_id}")
    frags.write.mode("overwrite").partitionBy("bucket").parquet(out)


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
