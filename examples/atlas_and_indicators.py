"""Runnable tour of the round-6 surfaces: schemaless ATLAS documents,
the tick-indicator family, deterministic sampling, and the ANN recall
meter.

    python examples/atlas_and_indicators.py [sf_dir]

The ATLAS half shows what a tick-DB user does the day a feed adds a
field: amend documents in place without a schema, profile the drift,
and keep reading with total extraction.  The indicator half runs the
drawdown / Bollinger / RSI / MACD family on exact integer-cents
accumulation, and the recall meter prints the number every
approximate-index decision is tuned on.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import get_spark  # noqa: E402
from kerf_spark.functions.scalars import rand_det  # noqa: E402
from kerf_spark.operators import atlas as AT  # noqa: E402
from kerf_spark.operators import similarity as SIM  # noqa: E402
from kerf_spark.operators import windows as W  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("kerf_spark_atlas_example")

    from kerf_spark.sources.io import read_table

    events = read_table(spark, sf, "events")
    emb = read_table(spark, sf, "embeddings")

    print("== ATLAS: amend schemaless documents in place ==")
    tier = F.when(F.col("value") > 0.5, F.lit('"pro"')).otherwise(
        F.lit('"basic"')
    )
    amended = events.select(
        "event_id",
        AT.doc_set(
            AT.doc_set("props", ["meta", "tier"], tier),
            ["meta", "score"],
            F.round("value", 3).cast("string"),
        ).alias("doc"),
    )
    amended.show(3, truncate=False)

    print("== ATLAS: profile schema drift (promote-on-append) ==")
    AT.schema_profile(amended, "doc").orderBy("key").show()

    print("== deterministic draws: same key -> same u on any layout ==")
    events.select(
        "event_id", F.round(rand_det(42, "event_id"), 6).alias("u")
    ).show(3)

    print("== drawdown (exact integer-cents accumulation) ==")
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = events.select(
        "user_id", "event_id", "ts", F.sum(cents).over(w).alias("cum_c")
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum.select(
        "user_id",
        "event_id",
        F.round(F.col("cum_c") / 100.0, 2).alias("cum"),
        F.round((F.max("cum_c").over(wp) - F.col("cum_c")) / 100.0, 2).alias(
            "drawdown"
        ),
    ).show(5)

    print("== MACD family (one applyInPandas kernel per user) ==")
    W.macd(
        events.where(F.col("value").isNotNull()).select(
            "user_id", "event_id", "ts", "value"
        ),
        "value",
        ["user_id"],
        ["ts", "event_id"],
    ).select("user_id", "event_id", "macd", "signal", "hist").show(5)

    print("== ANN recall meter: exact vs IVF vs PQ+rerank ==")
    q = emb.where(F.col("vec_id") < 8)
    exact = SIM.cosine_topk(emb, q, k=5)
    ivf = SIM.ivf_topk(emb, q, k=5, n_cells=8, nprobe=4)
    SIM.ann_recall(ivf, exact).agg(
        F.round(F.avg("recall"), 3).alias("ivf_mean_recall@5")
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
