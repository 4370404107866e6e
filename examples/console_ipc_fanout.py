"""Round-7 surfaces end-to-end: console scripting, IPC client/server,
feed fanout, PCG64 RNG parity, fp16 storage, protected eval.

Run:  python examples/console_ipc_fanout.py
(uses /root/testdata/sf0.001; finishes in ~1 min on local[8])
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from kerf_spark.session import get_spark
    from kerf_spark.sources.io import read_table

    spark = get_spark("example_r7", master="local[8]", shuffle_partitions=8)
    events = read_table(spark, SF, "events")

    # ---- 1. scripting with protected eval (errors as values) --------
    from kerf_spark.plans.kerf_lang import run

    out = run(
        spark,
        'e: try(select no_such from events)\n'
        'kind: e["kind"]\n'
        'ifelse(is_error(e), 1, 0)',
        tables={"events": events},
    )
    print("protected eval caught:", out == 1)

    # ---- 2. IPC: same engine over a socket --------------------------
    from kerf_spark.server import KerfClient, KerfServer

    srv = KerfServer(spark, tables={"events": events}).start()
    host, port = srv.address
    with KerfClient(host, port) as c:
        r = c.execute(
            "select event_type, n: count(*) from events"
            " group by event_type order by event_type",
            limit=3,
        )
        print("ipc preview:", r["columns"], r["rows"], "more:", r["more"])
    srv.stop()

    # ---- 3. feed fanout: one stream, two sinks ----------------------
    from kerf_spark.streaming.ingest import (
        fanout, parquet_epoch_sink, read_file_stream,
    )

    root = tempfile.mkdtemp(prefix="fanout_demo_")
    src = events.select("event_id", "event_type", "value")
    src.coalesce(1).write.parquet(f"{root}/src/part0")
    feed = read_file_stream(spark, f"{root}/src/part*", src.schema)
    fanout(
        feed,
        f"{root}/ckpt",
        parquet_epoch_sink(f"{root}/log"),
        parquet_epoch_sink(f"{root}/by_type", partition_by=["event_type"]),
        available_now=True,
    ).awaitTermination()
    n = src.count()
    print(
        "fanout sinks complete:",
        spark.read.parquet(f"{root}/log").count() == n,
        spark.read.parquet(f"{root}/by_type").count() == n,
    )

    # ---- 4. PCG64 parity + fp16 storage -----------------------------
    from kerf_spark.functions.scalars import rand_pcg
    from kerf_spark.operators.similarity import fp16_pack, fp16_unpack

    em = read_table(spark, SF, "embeddings").limit(4)
    demo = em.select(
        "vec_id",
        rand_pcg(42, "vec_id").alias("pcg_draw"),
        F.length(fp16_pack("embedding")).alias("fp16_bytes"),
        F.size(fp16_unpack(fp16_pack("embedding"))).alias("dims"),
    )
    demo.show()
    spark.stop()


if __name__ == "__main__":
    main()
