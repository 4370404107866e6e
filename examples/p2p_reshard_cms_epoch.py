"""Round-13 surfaces end-to-end: the MEMBER→MEMBER reshard plane
(moved bytes go shipper→receiver direct; two-phase publish — stage,
check, flip — so a failed exchange publishes nothing anywhere;
``persist=`` makes the exchange survive member restarts), CMS HEAVY
HITTERS over the folio (mergeable Count-Min cell partials + local
candidates — bounded wire on any value domain), the ROOT EPOCH
POINTER (raw ``spark.read.parquet`` readers get one atomic
cross-table flip per commit), and transactional APPENDS (an append
inside a transaction stages a hardlinked version — invisible until
the epoch commits).

Run:  python examples/p2p_reshard_cms_epoch.py [sf_dir]
(defaults to /root/testdata/sf0.001; finishes in ~1 min on local[8])
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import get_spark  # noqa: E402
from kerf_spark.server import (  # noqa: E402
    KerfServer,
    folio_remote,
    folio_reshard,
    folio_select,
)
from kerf_spark.sources.catalog import Workspace  # noqa: E402
from kerf_spark.sources.io import read_table  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("p2p_reshard_cms_epoch", master="local[8]")
    cust = read_table(spark, SF, "customer")

    srvs = [
        KerfServer(
            spark,
            tables={"customer": cust.where(F.col("c_custkey") % 3 == i)},
        ).start()
        for i in range(3)
    ]
    addrs = [s.address for s in srvs]
    persist_dir = tempfile.mkdtemp(prefix="kerf_reshard_")
    try:
        print("== member→member reshard, persisted ==")
        stats = folio_reshard(
            addrs, "customer", "c_nationkey", "cust_bynat",
            persist=persist_dir,
        )
        print(f"   rows={stats['rows']} moved={stats['moved']}")
        for p in stats["persisted"]:
            print(f"   persisted shard: {p}")

        print("== restart a member: reload its shard from parquet ==")
        srvs[2].stop()
        srvs[2] = KerfServer(
            spark,
            tables={
                "cust_bynat": spark.read.parquet(
                    f"{persist_dir}/cust_bynat_m2"
                )
            },
        ).start()
        addrs[2] = srvs[2].address
        total = folio_remote(
            spark, addrs, "select count(*) as n from cust_bynat"
        ).agg(F.sum("n")).head()[0]
        print(f"   rows after restart: {total}")

        print("== CMS heavy hitters over the folio ==")
        # the reborn member no longer serves `customer`, so the CMS
        # statement runs over the two original shards
        folio_select(
            spark,
            addrs[:2],
            "select c_nationkey, approx_mode(c_mktsegment) as seg_mode,"
            " heavy_hitters(c_mktsegment, 2) as top2, count(*) as n"
            " from customer group by c_nationkey"
            " order by c_nationkey limit 5",
        ).show(5, truncate=False)
    finally:
        for s in srvs:
            s.stop()

    print("== epoch pointer + transactional append ==")
    root = tempfile.mkdtemp(prefix="kerf_epoch_")
    ws = Workspace(spark, root)
    ws.save("facts", cust.select("c_custkey", "c_nationkey"))
    ws.save("dims", cust.select("c_nationkey").distinct())
    with ws.transaction():
        ws.append(
            "facts",
            spark.range(5).select(
                (-(F.col("id") + 1)).cast(
                    ws.load("facts").schema["c_custkey"].dataType
                ).alias("c_custkey"),
                F.lit(99).cast(
                    ws.load("facts").schema["c_nationkey"].dataType
                ).alias("c_nationkey"),
            ),
        )
        ws.save("dims", ws.load("dims").union(
            spark.sql("select cast(99 as long)")
            .toDF("c_nationkey")
            .select(F.col("c_nationkey").cast(
                ws.load("dims").schema["c_nationkey"].dataType
            ))
        ))
        # mid-transaction: a raw epoch reader still sees the OLD pair
        n_mid = spark.read.parquet(ws.epoch_path("facts")).count()
        print(f"   raw epoch reader mid-txn: facts={n_mid} (pre-append)")
    n_post = spark.read.parquet(ws.epoch_path("facts")).count()
    d_post = spark.read.parquet(ws.epoch_path("dims")).count()
    print(f"   after commit: facts={n_post} dims={d_post} "
          f"(append + dim flip landed together)")
    spark.stop()


if __name__ == "__main__":
    main()


# Appendix: when members mount ONE filesystem/object store, the
# exchange can skip the socket plane entirely —
#
#   folio_reshard(addrs, "orders", "o_custkey", "orders_rs",
#                 via="parquet", shared_dir="/mnt/shared/exchange",
#                 persist="/mnt/shared/durable")
#
# each member writes its outgoing rows as bucket-PARTITIONED parquet
# (executor-parallel), receivers stage partition-pruned reads of their
# own bucket directories, and the flip publishes from the persisted
# copy so the exchange files are disposable.  This is the shape a
# 100x folio runs: both halves scale with executors, not with any
# single process.
