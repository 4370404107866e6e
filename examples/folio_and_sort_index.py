"""Round-9 surfaces end-to-end: the distributed folio (scatter-gather
over live kerf servers, with Arrow frames both ways), the unique-key
sort index (enforced constraints + file-pruned point/range reads),
late-data auto-backfill on attached rollups, and the new script verbs
(bound-square amends, group, table sorts, folio-as-a-value).

Run:  python examples/folio_and_sort_index.py [sf_dir]
(defaults to /root/testdata/sf0.001; finishes in ~1 min on local[8])
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pyarrow as pa  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import get_spark  # noqa: E402
from kerf_spark.errors import KeysError  # noqa: E402
from kerf_spark.functions.temporal import span_ns  # noqa: E402
from kerf_spark.plans import kerf_lang as KL  # noqa: E402
from kerf_spark.server import KerfClient, KerfServer, folio_remote  # noqa: E402
from kerf_spark.sources import rollup as RU  # noqa: E402
from kerf_spark.sources.catalog import Workspace  # noqa: E402
from kerf_spark.sources.io import read_table  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("folio_and_sort_index", master="local[8]")
    root = tempfile.mkdtemp(prefix="kerf_r9_demo_")

    # ------------------------------------------------ unique-key sort index
    print("== unique-key sort index (enums.h:265) ==")
    orders = read_table(spark, SF, "orders")
    ws = Workspace(spark, os.path.join(root, "ws"))
    ws.save("orders", orders, key="o_orderkey", key_partitions=8)
    meta = ws.manifest["tables"]["orders"]
    print(f"  saved keyed: {len(meta['key_file_ranges'])} files carry "
          f"[min,max,rows] ranges in the manifest")
    try:  # ERROR_KEYS: duplicates refuse loudly
        ws.append("orders", orders.limit(1))
    except KeysError as e:
        print(f"  duplicate key refused: {e}")
    some = [r["o_orderkey"] for r in orders.limit(3).collect()]
    hit = ws.key_lookup("orders", [int(k) for k in some])
    print(f"  point lookup of {some}: {hit.count()} rows from "
          f"{len(set(hit.inputFiles()))} file(s) "
          f"(of {len(meta['key_file_ranges'])})")
    hik = int(orders.agg(F.max("o_orderkey")).head()[0])
    lo = hik - hik // 8
    rng = ws.key_range("orders", lo=lo)
    print(f"  range scan [>= {lo}]: {rng.count()} rows, "
          f"{len(set(rng.inputFiles()))} file(s) "
          f"(of {len(meta['key_file_ranges'])})")

    # --------------------------------- late-data auto-backfill (rollups)
    print("== attached rollup + late-data auto-backfill ==")
    ev = read_table(spark, SF, "events")
    q = ev.selectExpr("percentile(ts, 0.4) a", "percentile(ts, 0.7) b").head()
    a, b = int(q["a"]), int(q["b"])
    ws.save("ticks", ev.where((F.col("ts") < a) | (F.col("ts") >= b)))
    ws.attach_rollup(
        "ticks", "bars5m", time_col="ts", keys=["event_type"],
        values=["value"], width_ns=span_ns(5, "m"),
    )
    # ONE mixed batch: stragglers behind the watermark + nothing fresh —
    # the hook routes them through backfill instead of dropping them
    ws.append("ticks", ev.where((F.col("ts") >= a) & (F.col("ts") < b)))
    bars = RU.read_rollup(spark, ws.rollup_path("bars5m"))
    epochs = RU.rollup_meta(ws.rollup_path("bars5m"))["epochs"]
    print(f"  bars: {bars.count()} (epochs: {len(epochs)}, "
          f"backfill epochs: {sum(1 for e in epochs if e.get('backfill'))})")

    # --------------------------------------- distributed folio (3 servers)
    print("== distributed folio scatter-gather (presented.h:427-430) ==")
    cust = read_table(spark, SF, "customer")
    shards = [cust.where(F.col("c_custkey") % 3 == i) for i in range(3)]
    srvs = [KerfServer(spark, tables={"customer": s}).start() for s in shards]
    try:
        parts = folio_remote(
            spark,
            [s.address for s in srvs],
            "select c_nationkey, count(*) as n from customer "
            "group by c_nationkey",
            tag_col="member",
        )
        total = parts.agg(F.sum("n")).head()[0]
        print(f"  3 members x 1 statement -> {parts.count()} partial rows, "
              f"{total} customers gathered (== {cust.count()})")

        # Arrow upload: ship a table TO a server, query it there
        host, port = srvs[0].address
        with KerfClient(host, port) as cli:
            tbl = pa.table({"k": list(range(1000)), "v": [i * i for i in range(1000)]})
            r = cli.execute(
                "select count(*) as n, max(v) as mx from up",
                upload=("up", tbl),
            )
            print(f"  arrow upload round trip: {r['rows']}")

        # the folio as a language VALUE (script plane)
        members = ", ".join(f'"{h}:{p}"' for h, p in (s.address for s in srvs))
        df = KL.run(
            spark,
            f'f: [{members}]\n'
            f'folio(f, "select count(*) as n from customer")',
        )
        print(f"  folio() script verb: member counts = "
              f"{[r['n'] for r in df.collect()]}")
    finally:
        for s in srvs:
            s.stop()

    # -------------------------------------------------- r9 script verbs
    print("== script verbs: amends, group, table sort ==")
    out = KL.run(spark, """
v: 10 20 30 40 50
a: @[v; 1 3; 0]                  // bound-square amend (parser.h:471-486)
b: .[[1 2 3, 4 5 6]; 1 0; 99]    // deep-path amend
g: group(1 2 1 3 2 1)            // map: value -> index vector
j: sv("-", vs(",", "a,b,c"))
[a[1], b[1][0], count(g[1]), j]
""")
    print(f"  amend/group/sv-vs: {list(out)}")
    t = KL.run(spark, 't: {{a: 3 1 2, b: 30 10 20}}\nxdesc(t, "a")')
    print(f"  xdesc table sort: a = {[r['a'] for r in t.collect()]}")
    print("done.")


if __name__ == "__main__":
    main()
