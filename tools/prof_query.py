"""Isolate one bench query: N timed noop-sink runs after a warmup.

Usage: python tools/prof_query.py <query> [n_runs=4]
Prints per-run seconds + min/median.  Mirrors bench.py methodology
(same session confs, noop sink) so numbers are comparable.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kerf_spark import queries as Q
    from kerf_spark.queries import QUERIES
    from kerf_spark.session import get_spark

    extra = {
        "minhash_dedup_pairs": Q.minhash_dedup_pairs,
        "ivf_ann_topk": Q.ivf_ann_topk,
    }
    spark = get_spark(
        "kerf_spark_prof",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    fn = QUERIES.get(name) or extra[name]

    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 4)

    run()  # warmup (codegen, file listing, memoized fits)
    ts = [run() for _ in range(n_runs)]
    print(f"{name}: runs={ts} min={min(ts)} median={statistics.median(ts)}")
    spark.stop()


if __name__ == "__main__":
    main()
