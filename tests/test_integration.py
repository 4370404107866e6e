"""End-to-end tick-database pipeline: the composition a kerf user runs.

stream-ingest events -> date-partitioned workspace table -> as-of join
-> xbar bars -> kerf-SQL on the result.  Each stage is covered by unit
tests elsewhere; this pins that they compose (schemas, ts_ns convention,
partition discipline survive across stage boundaries).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_tick_pipeline_end_to_end(spark, tables, tmp_path):
    from kerf_spark.functions import temporal as TM
    from kerf_spark.operators.asof import asof_join
    from kerf_spark.plans.kerfsql import kerf_sql
    from kerf_spark.sources.catalog import Workspace
    from kerf_spark.streaming.ingest import (
        read_file_stream,
        with_event_time,
        write_partitioned,
    )

    ev = tables["events"]

    # 1. feed-handler ingestion: file stream -> date-partitioned parquet
    src = str(tmp_path / "feed")
    ev.limit(400).write.parquet(src)
    stream = with_event_time(
        read_file_stream(spark, src, ev.schema), "ts"
    ).withColumn("date", F.to_date("__event_time"))
    q = write_partitioned(
        stream.drop("__event_time"),
        path=str(tmp_path / "ticks"),
        checkpoint=str(tmp_path / "ck"),
        partition_by=("date",),
    )
    # availableNow-style: let the single batch drain, then stop
    q.processAllAvailable()
    q.stop()

    # 2. register in the workspace (folio discipline: partitioned by date)
    ws = Workspace(spark, str(tmp_path / "ws"))
    ingested = spark.read.parquet(str(tmp_path / "ticks"))
    assert ingested.count() == 400
    ws.save("ticks", ingested, partition_by=["date"], sort_by=["ts"])

    # 3. as-of enrich: latest prior event value per user (self as-of)
    ticks = ws.load("ticks")
    anchors = ticks.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("anchor_id")
    )
    history = ticks.select("user_id", "ts", F.col("value").alias("prev_value"))
    enriched = asof_join(
        anchors, history, on="ts", by="user_id", right_cols=["prev_value"]
    )
    assert enriched.count() == anchors.count()  # left preserved exactly
    # every anchor has itself at ts<=ts, so prev_value is never null
    assert enriched.where(F.col("prev_value").isNull()).count() == 0

    # 4. xbar bars over the ingested table
    bars = (
        ticks.withColumn("bar", TM.xbar("ts", TM.span_ns(5, "m")))
        .groupBy("bar")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    assert bars.agg(F.sum("n")).head()[0] == 400

    # 5. kerf-SQL over the enriched result
    enriched.createOrReplaceTempView("enriched")
    out = kerf_sql(
        spark,
        "select n: count(*), hi: max(prev_value) by user_id from enriched "
        "where prev_value > 0 order by user_id limit 5",
    )
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert set(out.columns) == {"user_id", "n", "hi"}
