"""Round-12 surfaces end-to-end: the FOLIO RESHARD exchange (make two
differently-sharded member tables co-sharded on demand, then run the
fact-to-fact join member-side), MODE + ordered STRING_AGG over the
folio (one fused GROUPING SETS member round trip carries the spine
and every histogram), sum/avg(DISTINCT) on the same histogram split,
the EPOCH publish (a transaction's tables become visible together —
one manifest swap), kerf-SQL transactions (begin; …; commit |
rollback), and version LEASES (ws.pin — a long scan survives any
number of concurrent publishes).

Run:  python examples/reshard_and_epoch.py [sf_dir]
(defaults to /root/testdata/sf0.001; finishes in ~1 min on local[8])
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import get_spark  # noqa: E402
from kerf_spark.plans.kerfsql import kerf_sql  # noqa: E402
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
    spark = get_spark("reshard_and_epoch", master="local[8]")

    cust = read_table(spark, SF, "customer")
    ords = read_table(spark, SF, "orders")

    # three members; customer sharded on custkey residues, orders
    # DELIBERATELY sharded on orderkey residues — misaligned with the
    # join key, the exact shape the folio join guard refuses
    srvs = [
        KerfServer(
            spark,
            tables={
                "customer": cust.where(F.col("c_custkey") % 3 == i),
                "orders": ords.where(F.col("o_orderkey") % 3 == i),
            },
        ).start()
        for i in range(3)
    ]
    addrs = [s.address for s in srvs]
    try:
        print("== folio_reshard: misaligned -> co-sharded on demand ==")
        st1 = folio_reshard(addrs, "orders", "o_custkey", "orders_rs")
        st2 = folio_reshard(addrs, "customer", "c_custkey", "cust_rs")
        print(f"  orders:   {st1['rows']} rows conserved, "
              f"{st1['moved']} shipped over the wire")
        print(f"  customer: {st2['rows']} rows conserved, "
              f"{st2['moved']} shipped")
        joined = folio_select(
            spark, addrs,
            "select c_nationkey, count(*) as n,"
            " sum(cast(round(o_totalprice * 100) as bigint)) as cents"
            " from orders_rs join cust_rs on o_custkey = c_custkey"
            " group by c_nationkey",
            member_local_joins=True,
        )
        local = (
            ords.join(cust, ords.o_custkey == cust.c_custkey)
            .groupBy("c_nationkey").count()
        )
        print(f"  member-side join groups: {joined.count()} "
              f"(local check: {local.count()})")

        print("== mode / string_agg / DISTINCT — one fused round trip ==")
        m = folio_select(
            spark, addrs,
            "select c_nationkey, mode(c_mktsegment) as seg,"
            " count(distinct c_mktsegment) as segs,"
            " sum(distinct c_custkey % 97) as sd,"
            " median(c_custkey + 0) as med"
            " from customer group by c_nationkey",
        )
        m.orderBy("c_nationkey").show(5, truncate=False)

        print("== folio_remote still gathers raw rows when asked ==")
        n = folio_remote(
            spark, addrs, "select count(*) as n from orders_rs"
        ).agg(F.sum("n")).head()[0]
        print(f"  resharded orders across members: {n} rows")
    finally:
        for s in srvs:
            s.stop()

    # ------------------------------------------------- epoch publish
    print("== epoch publish: a transaction's tables flip TOGETHER ==")
    root = tempfile.mkdtemp(prefix="kerf_r12_demo_")
    ws = Workspace(spark, root)
    ws.save("facts", ords.limit(1000), minimize_widths=False)
    ws.save("dims", cust.limit(100), minimize_widths=False)
    reader = Workspace(spark, root)
    with ws.transaction():
        ws.save("facts", ords.limit(500), minimize_widths=False)
        ws.save("dims", cust.limit(50), minimize_widths=False)
        reader.refresh()
        print(f"  mid-txn sibling sees: facts={reader.load('facts').count()} "
              f"dims={reader.load('dims').count()} (pre-txn state)")
    reader.refresh()
    print(f"  post-commit sibling:  facts={reader.load('facts').count()} "
          f"dims={reader.load('dims').count()} (both flipped at once)")

    print("== kerf-SQL transactions ==")
    ws.save(
        "t",
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        key="k", minimize_widths=False,
    )
    try:
        kerf_sql(
            spark,
            "begin; delete from t where k in (1, 2, 3);"
            " delete from ghost where k in (1); commit",
            workspace=ws,
        )
    except Exception as e:  # noqa: BLE001 - demo
        print(f"  failing tail rolled the batch back: {str(e)[:60]} ...")
    print(f"  t still has {ws.load('t').count()} rows")
    kerf_sql(
        spark, "begin; delete from t where k in (1, 2, 3); commit",
        workspace=ws,
    )
    print(f"  committed batch: {ws.load('t').count()} rows")

    print("== version leases: a long scan outlives rapid publishes ==")
    with ws.pin("t") as df:
        for i in range(3):
            ws.save(
                "t",
                spark.range(10 + i).select(
                    F.col("id").alias("k"), F.lit(i).alias("v")
                ),
                key="k", minimize_widths=False,
            )
        print(f"  pinned scan still reads {df.count()} rows "
              f"through 3 publishes; live is {ws.load('t').count()}")
    print(f"demo workspace left at {root} (delete at will)")
    spark.stop()


if __name__ == "__main__":
    main()
