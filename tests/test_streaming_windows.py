"""Watermarked windowed aggregation (stream == batch; late data
dropped past the watermark) and applyInPandasWithState sessionization
(stream sessions == the batch sessionizer's closed sessions)."""

import shutil

import pytest
from pyspark.sql import functions as F

from eaststorm_searchengine_spark.operators import analytics
from eaststorm_searchengine_spark.streaming import windows as W

SF = "/root/testdata/sf0.001"
TMP = "/root/repo/_tmp/t_stream_win"
EVENTS_SCHEMA = "event_id long, user_id long, event_type string, ts timestamp, value double"


@pytest.fixture(scope="module")
def events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .cache()
    )


def test_windowed_counts_stream_equals_batch(spark, events):
    shutil.rmtree(TMP, ignore_errors=True)
    # two micro-batch waves
    events.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(f"{TMP}/in")
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(f"{TMP}/in")
    W.run_windowed_event_counts(
        spark, f"{TMP}/in", f"{TMP}/ckpt", "win_counts", EVENTS_SCHEMA
    )
    got = sorted(
        tuple(r) for r in spark.sql(
            "SELECT window_start, event_type, n, total_value FROM win_counts"
        ).collect()
    )
    want = sorted(tuple(r) for r in W.windowed_event_counts_batch(events).collect())
    assert got == want and len(got) > 0


def test_watermark_drops_late_events(spark, events):
    """A straggler micro-batch far older than the watermark must not
    change finalized windows (append-mode semantics)."""
    tmp = f"{TMP}_late"
    shutil.rmtree(tmp, ignore_errors=True)
    on_time = events.filter(F.col("event_id") < 500)
    on_time.write.mode("overwrite").parquet(f"{tmp}/in")

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(f"{tmp}/in")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "300 seconds").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.col("w.start").cast("timestamp").cast("long").alias("ws"), "event_type", "n")
    )

    def run():
        q = (
            agg.writeStream.outputMode("append").format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run()
    # straggler: an event 1 day older than everything already seen —
    # far past the 10-minute watermark
    old = on_time.orderBy("ts").limit(1).withColumn(
        "ts", F.col("ts") - F.expr("INTERVAL 1 DAY")
    ).withColumn("event_id", F.lit(999999))
    old.write.mode("append").parquet(f"{tmp}/in")
    run()
    rows = spark.read.parquet(f"{tmp}/out").collect()
    # the late event's day-old window was already past the watermark:
    # it must not appear in the emitted (finalized) windows
    late_ws = (
        old.select(F.col("ts").cast("timestamp").cast("long")).collect()[0][0]
        // 300 * 300
    )
    assert not any(r["ws"] == late_ws for r in rows), rows[:5]


def test_stateful_sessionize_matches_batch(spark, events):
    tmp = f"{TMP}_sess"
    shutil.rmtree(tmp, ignore_errors=True)
    events.write.mode("overwrite").parquet(f"{tmp}/in")
    W.sessionize_stream(
        spark, f"{tmp}/in", f"{tmp}/ckpt", "stream_sessions", EVENTS_SCHEMA, gap_sec=1800
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }
    want_all = {
        (r.user_id, r.start_epoch, r.end_epoch, r.n_events, round(r.total_value, 6))
        for r in analytics.sessionize(events, gap_minutes=30).collect()
    }
    # the stream emits sessions CLOSED by a later event crossing the
    # gap; each user's final session is still open (stays in state for
    # the next run), so: emitted == batch minus each user's last session
    last_per_user = {}
    for u, st, e, n, t in want_all:
        if u not in last_per_user or st > last_per_user[u][1]:
            last_per_user[u] = ((u, st, e, n, t), st)
    want_closed = want_all - {v[0] for v in last_per_user.values()}
    assert got == want_closed
    assert len(got) > 0
