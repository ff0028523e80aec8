"""Streaming exact deduplication — the ingest-time half of the batch
dedup family (``operators/dedup.py``), for pipelines that index or
train on a document FEED rather than a frozen corpus.

``dropDuplicatesWithinWatermark`` keyed on the text digest: the first
arrival of a text is emitted, any copy arriving within the watermark
window is dropped, and the watermark EVICTS the digest state — bounded
state, which is the trade every streaming dedup makes: two copies
farther apart in event time than the watermark both pass (downstream
batch :func:`operators.dedup.exact_dup_groups` over the sink catches
those; the stream keeps the hot-path duplicate storm out of the
index/training pipeline).

Scale shape: state is a digest → seen map partitioned by digest hash —
uniform keys, no skew (identical-document floods all hit ONE state key
and are dropped at source, the exact workload batch dedup needs the
star bound for).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str,
    watermark: str = "10 minutes",
    text_col: str = "text",
) -> None:
    """File-source document stream → md5 digest → watermarked
    drop-duplicates → APPEND parquet sink of first-arrival rows
    (doc_id, text_hash, ts).  Restartable from the checkpoint: the
    digest state survives restarts, so a duplicate arriving in a later
    run (within the watermark) is still dropped.  Runs all available
    micro-batches and returns."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = (
        stream.withColumn(
            "text_hash", F.md5(F.coalesce(F.col(text_col), F.lit("")))
        )
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .select("doc_id", "text_hash", "ts")
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
