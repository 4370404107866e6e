"""Constant-size summaries and graph analytics on the bundled fixtures.

    python examples/sketches_and_graph.py [sf_dir]

The three sketches (Bloom / count-min / HyperLogLog) share one design
rule: the summary's size is a function of its GEOMETRY, never of the
data — which is what lets a 100 TB pipeline keep one per partition/day
and merge them (bit-or / cell-sum / register-max) instead of
re-shuffling raw keys.  PageRank shows the iterative-join pattern the
same engine runs for dup-cluster resolution.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import get_spark  # noqa: E402
from kerf_spark.operators import sketches as SK  # noqa: E402
from kerf_spark.operators.curation import bloom_semi_join  # noqa: E402
from kerf_spark.operators.graph import pagerank  # noqa: E402
from kerf_spark.sources.io import read_table  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sketches-example", master="local[8]", shuffle_partitions=8)

    events = read_table(spark, sf, "events")
    orders = read_table(spark, sf, "orders")
    lineitem = read_table(spark, sf, "lineitem")

    # -- HyperLogLog: distinct users per event type, 256 registers/group
    regs = SK.hll_registers(events, "user_id", ["event_type"])
    print("== HLL distinct-user estimates (vs exact) ==")
    (
        SK.hll_estimate(regs, ["event_type"])
        .join(
            events.groupBy("event_type").agg(
                F.countDistinct("user_id").alias("exact")
            ),
            "event_type",
        )
        .select("event_type", F.round("est", 1).alias("hll"), "exact")
        .orderBy("event_type")
        .show()
    )

    # -- count-min: frequency estimates for the busiest users
    sk = SK.cms_build(events, "user_id")
    top = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.desc("exact"))
        .limit(5)
    )
    print("== CMS estimates for the 5 busiest users (est >= exact) ==")
    SK.cms_estimate(top, "user_id", sk).orderBy(F.desc("est")).show()

    # -- Bloom prefilter: exact semi-join, fact rows dropped map-side
    big_orders = orders.where(F.col("o_totalprice") > 300000).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    matched = bloom_semi_join(lineitem, big_orders, "l_orderkey")
    print("== lineitems of big orders (Bloom-prefiltered semi-join) ==")
    print("rows:", matched.count())

    # -- PageRank over the customer<->supplier trade graph
    e0 = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).localCheckpoint()
    ranks = pagerank(
        edges, weight="w", iters=3, handle_dangling=False, symmetric=True
    )
    print("== top-5 suppliers by trade-graph PageRank ==")
    (
        ranks.where(F.col("node") % 2 == 1)
        .select(((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"), "rank")
        .orderBy(F.desc("rank"))
        .limit(5)
        .show()
    )

    spark.stop()


if __name__ == "__main__":
    main()
