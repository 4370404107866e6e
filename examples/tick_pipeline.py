"""Runnable tour of the kerf_spark engine on the bundled fixtures.

    python examples/tick_pipeline.py [sf_dir]

Covers the workflow a kerf/tick-DB user runs daily: load partitioned
data, bucket into bars, as-of join, kerf-SQL, then the training-data
extras (dedup, similarity, sampling).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import Workspace, asof_join, get_spark, kerf_sql  # noqa: E402
from kerf_spark.functions import temporal as TM  # noqa: E402
from kerf_spark.operators import dedup as DD  # noqa: E402
from kerf_spark.operators import sampling as SMP  # noqa: E402
from kerf_spark.operators import similarity as SIM  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("kerf_spark_example")

    from kerf_spark.sources.io import read_table

    events = read_table(spark, sf, "events")  # ts: epoch-ns long (normalized)
    orders = read_table(spark, sf, "orders")
    docs = read_table(spark, sf, "documents")
    emb = read_table(spark, sf, "embeddings")

    print("== 5-minute bars (xbar) ==")
    bars = (
        events.withColumn("bar", TM.xbar("ts", TM.span_ns(5, "m")))
        .groupBy("bar", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("vol"))
    )
    bars.orderBy("bar").show(5)

    print("== as-of join: latest order at-or-before each event ==")
    right = orders.select(
        F.col("o_custkey").alias("user_id"),
        TM.ts_to_ns("o_orderdate").alias("ts"),
        "o_totalprice",
    )
    asof_join(
        events.select("event_id", "user_id", "ts"),
        right,
        on="ts",
        by="user_id",
        right_cols=["o_totalprice"],
    ).show(5)

    print("== kerf-SQL (by before from) ==")
    events.createOrReplaceTempView("events")
    kerf_sql(
        spark,
        "select n: count(*), avg_v: avg(value) by event_type from events "
        "where value > 0 order by event_type",
    ).show()

    print("== kerf language script (lambda traced to Catalyst) ==")
    from kerf_spark.plans.kerf_lang import run_df

    run_df(
        spark,
        "clip: {[x, lo, hi] ifelse(x < lo, lo, ifelse(x > hi, hi, x))}\n"
        "t0: 2024-01-07; t1: t0 + 7d\n"
        "select n: count(*), m: round(avg(clip(value, 0, 100)), 3)"
        " by event_type from events where ts >= t0 and ts < t1"
        " order by event_type",
        tables={"events": events},
    ).show()

    print("== workspace: save partitioned, reload by name ==")
    ws = Workspace(spark, tempfile.mkdtemp(prefix="kerf_example_ws_"))
    ws.save(
        "events_by_date",
        events.withColumn("date", TM.ns_to_date("ts")),
        partition_by=["date"],
        sort_by=["ts"],
    )
    print("tables:", ws.tables(), "rows:", ws.load("events_by_date").count())

    print("== near-dup pairs (MinHash + LSH + Jaccard verify) ==")
    DD.minhash_dedup(docs, num_hashes=32, bands=8, threshold=0.7).show(5)

    print("== cosine top-3 neighbors for 3 query vectors ==")
    q = emb.where(F.col("vec_id") < 3)
    SIM.cosine_topk(emb, q, k=3).show(9)

    print("== deterministic 10% sample + split counts ==")
    print("sample rows:", SMP.hash_sample(docs, "doc_id", 10).count())
    SMP.train_val_test_split(docs, "doc_id").groupBy("split").count().show()

    print("== EMA smoother (8-row window, decay 0.9) ==")
    from kerf_spark.operators import windows as W

    events.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        F.round(W.ema("value", 8, ["user_id"], ["ts", "event_id"]), 2).alias("ema8"),
    ).show(5)

    print("== salted two-phase agg over the 5-value hot key ==")
    from kerf_spark.operators import skew as SK

    SK.salted_groupby_agg(
        events,
        ["event_type"],
        [("value", "sum", "total"), ("value", "count", "n")],
        buckets=32,
    ).orderBy("event_type").show()

    spark.stop()


if __name__ == "__main__":
    main()
