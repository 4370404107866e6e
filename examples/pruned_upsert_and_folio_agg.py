"""Round-10 surfaces end-to-end: the KEY-PRUNED upsert (rewrite only
the files holding the corrected keys — mtimes prove it), the
COMPOSITE-key sort index ((sym, ts)-style tuple probes scan fewer
files than lead-only probes), the FOLIO AGGREGATE AUTO-SPLIT
(avg/sum/count/min/max over live remote members; holistic
median/percentile/count-DISTINCT split EXACTLY via merged member
histograms, approx_count_distinct via mergeable HLL sketches;
order-dependent aggregates refused), key-pruned deletes
(delete_keys / delete_range retention), cross-process manifest
merging, and the q table verbs
(xkey / ij / lj / uj / ungroup).

Run:  python examples/pruned_upsert_and_folio_agg.py [sf_dir]
(defaults to /root/testdata/sf0.001; finishes in ~1 min on local[8])
"""

from __future__ import annotations

import os
import sys
import tempfile
from urllib.parse import urlparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kerf_spark import get_spark  # noqa: E402
from kerf_spark.errors import ArgsError  # noqa: E402
from kerf_spark.plans import kerf_lang as KL  # noqa: E402
from kerf_spark.server import KerfServer, folio_select  # noqa: E402
from kerf_spark.sources.catalog import Workspace  # noqa: E402
from kerf_spark.sources.io import read_table  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("pruned_upsert_and_folio_agg", master="local[8]")
    root = tempfile.mkdtemp(prefix="kerf_r10_demo_")

    # ------------------------------------------------ key-pruned upsert
    print("== key-pruned upsert (O(matching files), not O(table)) ==")
    orders = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    ws = Workspace(spark, os.path.join(root, "ws"))
    ws.save("orders", orders, key="o_orderkey", key_partitions=8)
    ranges = ws.manifest["tables"]["orders"]["key_file_ranges"]
    before = {
        urlparse(f).path: os.path.getmtime(urlparse(f).path) for f in ranges
    }
    lows = [
        int(r[0])
        for r in orders.orderBy("o_orderkey").limit(5)
        .select("o_orderkey").collect()
    ]
    corrections = orders.where(F.col("o_orderkey").isin(lows)).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.0
    )
    ws.upsert("orders", corrections)  # the sort index prunes the rewrite
    after = ws.manifest["tables"]["orders"]["key_file_ranges"]
    kept = [
        p for p in before
        if p in {urlparse(f).path for f in after}
        and os.path.getmtime(p) == before[p]
    ]
    print(f"  corrected {len(lows)} keys: {len(before) - len(kept)} file(s) "
          f"rewritten, {len(kept)} of {len(before)} kept byte-identical "
          f"(mtime-proven)")

    # ------------------------------- key-pruned delete + range retention
    print("== key-pruned deletes: delete_keys / delete_range ==")
    n = ws.delete_keys("orders", lows[:3])  # purge by key list
    mids = sorted(
        int(r[0]) for r in ws.manifest["tables"]["orders"]
        ["key_file_ranges"].values() if r[0] is not None and r[2] > 0
    )
    files_before = len(ws.manifest["tables"]["orders"]["key_file_ranges"])
    # retention: expire everything in the middle half of the key space
    lo, hi = mids[len(mids) // 4], mids[3 * len(mids) // 4]
    nr = ws.delete_range("orders", lo, hi)
    files_after = len(ws.manifest["tables"]["orders"]["key_file_ranges"])
    print(f"  delete_keys purged {n} rows (broadcast anti-join, covering "
          f"files only); delete_range expired {nr} rows "
          f"[{lo}, {hi}] — {files_before} files -> {files_after} "
          f"(interior files unlink with zero reads)")

    # ------------------------------ snapshots: reads that survive writes
    print("== hardlink snapshots: point-in-time reads + restore ==")
    n_now = ws.load("orders").count()
    ws.snapshot("before_purge")
    ws.delete_range("orders", None, hi)  # purge everything up to hi
    print(f"  live after purge: {ws.load('orders').count()} rows; "
          f"snapshot still reads {ws.load_snapshot('before_purge', 'orders').count()} "
          f"(zero bytes copied — links keep the unlinked inodes alive)")
    ws.restore("before_purge", "orders")
    print(f"  restore('before_purge'): live back to "
          f"{ws.load('orders').count()} rows == {n_now}")

    # ------------------------- multi-table transactions + SQL surface
    print("== transaction(): all-or-nothing multi-table writes ==")
    from kerf_spark.plans.kerfsql import kerf_sql

    n0 = ws.load("orders").count()
    try:
        with ws.transaction():
            kerf_sql(
                spark,
                f"delete from orders where o_orderkey between "
                f"{lows[0]} and {lows[-1]}",
                workspace=ws,
            )
            raise RuntimeError("downstream validation failed")
    except RuntimeError:
        pass
    print(f"  failed batch rolled back: {ws.load('orders').count()} "
          f"rows == {n0} (created tables would drop too)")
    with ws.consistent_view() as view:
        print(f"  consistent_view: tables {view.tables()} read one "
              f"point in time while writers keep publishing")
    # kerf-SQL text is a complete catalog surface: selects resolve
    # workspace tables without view registration; keyed DML prunes
    top = kerf_sql(
        spark,
        "select n: count(*) by o_custkey from orders "
        "order by n desc limit 3",
        workspace=ws,
    )
    top.show(3)
    ws.vacuum()  # sweep anything a crash could have left behind

    # --------------------------------------- composite-key tuple lookup
    print("== composite sort index: tuple probes prune deeper ==")
    ticks = spark.range(40_000).select(
        F.when(F.col("id") < 20_000, "AAPL").otherwise("MSFT").alias("sym"),
        (F.col("id") % 20_000).alias("ts"),
        (F.col("id") * 2).alias("px"),
    )
    ws.save("ticks", ticks, key=("sym", "ts"), key_partitions=8,
            minimize_widths=False)
    lead = ws.key_lookup("ticks", [("AAPL",)])
    tup = ws.key_lookup("ticks", [("AAPL", 7)])
    print(f"  lead-only probe ('AAPL',): {len(lead.inputFiles())} files; "
          f"tuple probe ('AAPL', 7): {len(tup.inputFiles())} file(s) — "
          f"px={tup.head()['px']}")

    # --------------------------------------- folio aggregate auto-split
    print("== folio_select: aggregates split into member partials ==")
    cust = read_table(spark, SF, "customer")
    shards = [cust.where(F.col("c_custkey") % 3 == i) for i in range(3)]
    srvs = [KerfServer(spark, tables={"customer": s}).start() for s in shards]
    try:
        merged = folio_select(
            spark, [s.address for s in srvs],
            "select c_nationkey, count(*) as n, avg(c_acctbal) as avg_bal "
            "from customer group by c_nationkey order by c_nationkey limit 5",
        )
        merged.show(5)
        # holistic aggregates split EXACTLY via member histograms
        # (the wire carries distinct-value counts, never rows), and
        # approx_count_distinct ships mergeable HLL sketch buffers
        hol = folio_select(
            spark, [s.address for s in srvs],
            "select c_nationkey, median(c_acctbal) as med,"
            " count(distinct c_mktsegment) as segs,"
            " approx_count_distinct(c_mktsegment) as segs_hll"
            " from customer group by c_nationkey"
            " order by c_nationkey limit 5",
        )
        hol.show(5)
        # ORDERED aggregates split exactly once an ordering column is
        # named — the canonical distributed tick query
        last = folio_select(
            spark, [s.address for s in srvs],
            "select c_nationkey, last(c_acctbal, c_custkey) as last_bal"
            " from customer group by c_nationkey"
            " order by c_nationkey limit 3",
        )
        last.show(3)
        try:
            folio_select(spark, [srvs[0].address],
                         "select mode(c_acctbal) as m from customer")
        except ArgsError as e:
            print(f"  order-dependent refused: {str(e)[:70]} ...")
        # fact-to-fact joins refuse with guidance: a member-side join
        # of two SHARDED tables would drop cross-member matches.  The
        # scale paths: (a) replicate the dim on every member and pass
        # member_local_joins=True (the star shape above), or (b)
        # co-shard both tables on the join key — each member joins
        # complete residue classes — or (c) gather via folio_remote
        # and join locally.
        try:
            folio_select(
                spark, [srvs[0].address],
                "select count(*) as n from customer join orders"
                " on c_custkey = o_custkey",
            )
        except ArgsError as e:
            print(f"  fact-to-fact join refused: {str(e)[:70]} ...")
    finally:
        for s in srvs:
            s.stop()

    # --------------------------------------------------- q table verbs
    print("== q table verbs: xkey / lj / ij / uj / ungroup ==")
    out = KL.run_df(
        spark,
        "n0: select n_nationkey as k, n_name from nation\n"
        "c0: select c_custkey as custkey, c_nationkey as k,"
        " c_acctbal as bal from customer\n"
        'j: lj(c0, xkey(n0, "k"))\n'
        "rich: select custkey, n_name, bal from j where bal >= 9000\n"
        'xdesc(rich, "bal")',
        tables={
            "nation": read_table(spark, SF, "nation"),
            "customer": cust,
        },
    )
    out.show(3)
    ug = KL.run_df(
        spark,
        "t: select custkey, array(1, 2) as leg, array(bal, 0.0 - bal)"
        " as signed from r\nungroup(t)",
        tables={"r": out.select("custkey", "bal").limit(2)},
    )
    ug.show()

    print(f"demo workspace left at {root} (delete at will)")


if __name__ == "__main__":
    main()
