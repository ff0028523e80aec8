"""Event-time streaming operators: watermarked tumbling-window
aggregation and custom stateful sessionization.

The reference has no streaming (SURVEY.md §2.8); these are the two
canonical event-stream shapes the build brief calls for:

* :func:`windowed_event_counts` — ``readStream → withWatermark →
  groupBy(window(...), key) → agg``.  The watermark bounds state AND
  defines late-data semantics: an event older than
  ``max(event time seen) - delay`` arrives after its window is
  finalized and is dropped (tested explicitly with a straggler batch).
* :func:`sessionize_stream` — gap-based sessionization via
  ``applyInPandasWithState`` (GroupState): per-user open-session state
  carries (start, last-seen, count, sum) across micro-batches; a
  processing-time timeout flushes sessions whose gap elapsed with no
  new events.  This is the custom-stateful-operator escape hatch for
  semantics window aggs can't express (data-driven session boundaries).

At scale both shapes keep state partitioned by key (user/event_type),
and the watermark/timeout bound state size — the standard Structured
Streaming story; nothing here is driver-resident.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts_batch(events: DataFrame, window_sec: int = 300) -> DataFrame:
    """Batch mirror of the streaming windowed agg (stream == batch is
    the correctness gate, minus late-data drops)."""
    return (
        events.groupBy(
            F.window(F.col("ts"), f"{window_sec} seconds").alias("w"), "event_type"
        )
        .agg(F.count("*").cast("long").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
            "event_type", "n", "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def run_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_table: str,
    schema: str,
    window_sec: int = 300,
    watermark: str = "10 minutes",
) -> None:
    """File-source stream → watermark → tumbling-window counts →
    complete-mode memory sink (bounded: windows × types).  Runs all
    available micro-batches and returns."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), f"{window_sec} seconds").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_SESSION_STATE_SCHEMA = "start long, last long, n long, total double"
_SESSION_OUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long, total_value double"
)


def _session_fn(gap_sec: int):
    def fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs)).sort_values("epoch")
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        out = []
        for r in rows.itertuples():
            e, v = int(r.epoch), float(r.value)
            if last is not None and e - last > gap_sec:
                out.append({"user_id": user_id, "session_start": start,
                            "session_end": last, "n_events": n, "total_value": total})
                start, n, total = e, 0, 0.0
            if start is None:
                start = e
            last = e
            n += 1
            total += v
        state.update((start, last, n, total))
        if out:
            yield pd.DataFrame(out)

    return fn


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_table: str,
    schema: str,
    gap_sec: int = 1800,
) -> None:
    """Gap-based sessionization as a custom stateful streaming operator
    (``applyInPandasWithState``): emits a session row when a later
    event crosses the user's EVENT-time gap (``gap_sec``).  Each user's
    final still-open session correctly remains in state — it is not
    closed yet; a continuously-running job would flush it with a
    processing-time timeout, but Spark 4.1.2's availableNow drain
    never terminates while ProcessingTimeTimeout timers are pending
    (observed: endless "no new data but cleaning up state" batches),
    so this operator uses NoTimeout and leaves open sessions to the
    next run's state.  State per user is one open-session tuple —
    bounded by active users, partitioned by user_id.

    Spark 4.1.2 workarounds, all environment-verified:
    * planning FlatMapGroupsInPandasWithState with AQE enabled hits an
      internal NPE (PythonSQLMetrics on a session-less SparkPlan while
      AQE is being force-disabled for the stateful query), so AQE is
      toggled off around the stream and restored after;
    * the newer ``transformWithStateInPandas`` would avoid that, but
      its state protocol needs google.protobuf, which this container
      doesn't ship.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withColumn("epoch", F.col("ts").cast("timestamp").cast("long"))
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_sec),
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName(out_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
