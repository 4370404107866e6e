"""folio_window: member-complete WINDOW analytics over a sharded
folio — the ordered half of "a folio of tables should behave like a
table" (reference: presented.h:409; folio_select covers aggregates,
folio_remote rows, folio_reshard the exchange).

The idea: moving averages, running sums, lag/lead, and ranks are
window functions, and when every OVER clause partitions by the key
the folio is SHARDED on, each member's window frames are complete —
the whole computation is embarrassingly parallel, zero cross-member
bytes, reusing the shuffle the sharding already paid for.  That is
exactly the plan a 1000-executor cluster wants for `mavg(5, price)
by sym` over a sym-sharded tick store.

The guard is the feature: a mis-partitioned window shipped naively
(folio_remote would happily run it) returns frames silently missing
every other member's rows.  folio_window refuses those — and
`check=` verifies the folio really is sharded by the key.

Run:  python examples/folio_window_analytics.py [sf_dir]
(defaults to /root/testdata/sf0.001; finishes in ~1 min on local[8])
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import get_spark  # noqa: E402
from kerf_spark.errors import ArgsError  # noqa: E402
from kerf_spark.plans import kerf_lang as KL  # noqa: E402
from kerf_spark.functions import temporal as TM  # noqa: E402
from kerf_spark.server import (  # noqa: E402
    KerfServer,
    folio_asof,
    folio_remote,
    folio_reshard,
    folio_window,
)
from kerf_spark.sources.io import read_table  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("folio_window_analytics", master="local[8]")
    orders = read_table(spark, SF, "orders").withColumn(
        "oc", F.round(F.col("o_totalprice") * 100).cast("long")
    )

    # a folio sharded by customer — every o_custkey's rows live on
    # exactly one member (three residue classes)
    srvs = [
        KerfServer(
            spark,
            tables={"orders": orders.where(F.col("o_custkey") % 3 == i)},
        ).start()
        for i in range(3)
    ]
    addrs = [s.address for s in srvs]
    try:
        print("== member-complete windows, gathered ==")
        df = folio_window(
            spark,
            addrs,
            "select o_custkey, o_orderkey,"
            " sum(oc) over (partition by o_custkey"
            "   order by o_orderdate, o_orderkey"
            "   rows between 2 preceding and current row) as m3,"
            " row_number() over (partition by o_custkey"
            "   order by o_orderdate, o_orderkey) as rn"
            " from orders where o_custkey % 50 = 1"
            " order by o_custkey, rn limit 8",
            shard_key="o_custkey",
        )
        df.show()

        print("== kerf ordered-verb spelling (same guard path) ==")
        verb = folio_window(
            spark,
            addrs,
            "select o_custkey, o_orderkey, o_orderdate,"
            " msum(3, oc) as m3 by o_custkey from orders"
            " order by o_orderdate, o_orderkey",
            shard_key="o_custkey",
        )
        print(f"   {verb.count()} windowed rows across 3 members")

        print("== publish=: windowed shards STAY member-side ==")
        res = folio_window(
            spark,
            addrs,
            "select o_custkey, o_orderkey, sum(oc) over"
            " (partition by o_custkey order by o_orderkey) as rsum"
            " from orders",
            shard_key="o_custkey",
            publish="owin",
        )
        print(f"   published {res['rows']} rows: {res['rows_by_member']}")
        agg = folio_remote(
            spark, addrs, "select max(rsum) as mx from owin"
        )
        print(f"   member maxima: {[r.mx for r in agg.collect()]}")

        print("== the guard: a mis-partitioned window refuses ==")
        try:
            folio_window(
                spark,
                addrs,
                "select o_orderkey, sum(oc) over"
                " (partition by o_orderstatus order by o_orderdate)"
                " as s from orders",
                shard_key="o_custkey",
            )
        except ArgsError as e:
            print(f"   refused: {str(e)[:100]}...")

        print("== script plane: folio_window as a kerf verb ==")
        members = ", ".join(f'"{h}:{p}"' for h, p in addrs)
        out = KL.run(
            spark,
            f'folio_window([{members}],'
            f' "select o_custkey, o_orderkey, row_number() over'
            f' (partition by o_custkey order by o_orderkey) as rn'
            f' from orders", "o_custkey")',
        )
        print(f"   verb returned {out.count()} rows")
    finally:
        for s in srvs:
            s.stop()

    # A folio sharded by the WRONG key? The check fails loud — and
    # folio_reshard makes it right.
    print("== mis-sharded folio: check trips, reshard fixes ==")
    srvs2 = [
        KerfServer(
            spark,
            tables={"orders": orders.where(F.col("o_orderkey") % 3 == i)},
        ).start()
        for i in range(3)
    ]
    addrs2 = [s.address for s in srvs2]
    try:
        q = (
            "select o_custkey, o_orderkey, row_number() over"
            " (partition by o_custkey order by o_orderkey) as rn"
            " from orders"
        )
        try:
            folio_window(spark, addrs2, q, shard_key="o_custkey")
        except ArgsError as e:
            print(f"   refused: {str(e)[:90]}...")
        folio_reshard(addrs2, "orders", "o_custkey", "orders_rs")
        fixed = folio_window(
            spark, addrs2, q.replace("from orders", "from orders_rs"),
            shard_key="o_custkey",
        )
        print(f"   after reshard: {fixed.count()} windowed rows, "
              f"frames complete")
    finally:
        for s in srvs2:
            s.stop()

    # The temporal join gets the same treatment: folio_asof verifies
    # BOTH tables are co-sharded on the equi key (the cross-table
    # hazard per-table disjointness misses), then joins member-side.
    print("== folio_asof: guarded distributed as-of join ==")
    ev = read_table(spark, SF, "events").select(
        "event_id", "user_id", "ts"
    )
    oaj = read_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("user_id"),
        TM.ts_to_ns("o_orderdate").alias("ts"),
        "o_orderkey",
    )
    srvs3 = [
        KerfServer(
            spark,
            tables={
                "ev": ev.where(F.col("user_id") % 3 == i),
                "ord": oaj.where(F.col("user_id") % 3 == i),
            },
        ).start()
        for i in range(3)
    ]
    try:
        joined = folio_asof(
            spark,
            [s.address for s in srvs3],
            "select event_id, user_id, orderkey: o_orderkey"
            " from ev asof join ord on user_id, ts"
            " where o_orderkey is not null"
            " order by event_id limit 5",
        )
        joined.show()
        print("   (co-sharding verified before any member joined)")
    finally:
        for s in srvs3:
            s.stop()
    spark.stop()


if __name__ == "__main__":
    main()
