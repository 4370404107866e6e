"""SparkSession bootstrap for the kerf_spark engine.

The reference (kevinlawler/kerf) builds its own bottom half: slab memory
cells, columnar vectors, mmap persistence, thread pools (slab.h:5-345,
templates.h:213-494, thread.h:10-226).  On Spark all of that dissolves
into Tungsten + Parquet + the task scheduler; what remains for us is to
configure the session so Catalyst/AQE behave well at scale:

* AQE on (runtime re-plan, skew-join handling, partition coalescing).
* Arrow on (any pandas UDF path is batched, never row-at-a-time).
* zstd Parquet (kerf's ZIP_ARRAY, enums.h:256, is "transparent
  compression" — Parquet page compression is the Spark-native analogue).
* ``spark.sql.legacy.parquet.nanosAsLong=true``: kerf's native timestamp
  is *nanoseconds* (STAMP_NANOSECONDS, enums.h:175).  Parquet
  TIMESTAMP(NANOS) columns (e.g. the events fixture) surface as LongType
  epoch-nanos — exactly the engine-wide ``ts_ns`` convention
  (see kerf_spark.functions.temporal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that define engine semantics — applied to every session we build.
ENGINE_CONFS: dict[str, str] = {
    # kerf ns timestamps surface as LongType epoch-nanos (ts_ns convention)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # adaptive execution: runtime shuffle-partition coalescing + skew splits
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every Python<->JVM columnar exchange
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # kerf ZIP_ARRAY analogue: transparent on-disk compression
    "spark.sql.parquet.compression.codec": "zstd",
    # timestamps in fixtures are wall-clock without zone
    "spark.sql.session.timeZone": "UTC",
    # Broadcast discipline: the STATIC threshold stays at Spark's
    # conservative default — it is applied to pre-filter size
    # *estimates*, and a generous value lets a filtered FACT table
    # masquerade as a dim (observed: q3 broadcasting 3M filtered
    # lineitem rows at sf1 — a single-threaded build locally, an OOM at
    # cluster scale).  The ADAPTIVE threshold is the generous one: AQE
    # applies it to the TRUE post-shuffle sizes at runtime, which is
    # exactly when a 64 MB broadcast decision is safe.  Fixed-size dims
    # (region/nation) are pinned with F.broadcast() at the query sites.
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    "spark.sql.adaptive.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Streaming state store: RocksDB instead of the default HDFS-backed
    # in-heap map (guide §5 — bounded native memory, no per-batch full
    # snapshot rewrite).  Measured r14 at sf0.01, warm runs: the
    # stream-stream join 22.0 → 13.8 s, incremental stream dedup
    # 4.03 → 2.46 s (multi-micro-batch stateful rows, 1.6x); the
    # single-batch windowed-bars metric pays RocksDB init once
    # (2.64 → 3.45 s) — the many-batch shape is what production runs.
    # Results are state-store-independent (oracle-checked either way).
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    # BIGINT_UNIT boundary (enums.h:230, SURVEY §1.2): kerf's
    # arbitrary-precision integer maps to DecimalType(38,0).  Pinned ANSI
    # mode (Spark 4's default, but a cluster's spark-defaults may flip
    # it) makes arithmetic past 38 digits raise a typed
    # SparkArithmeticException (NUMERIC_VALUE_OUT_OF_RANGE) instead of
    # silently returning NULL — overflow ERRORS rather than promotes.
    "spark.sql.ansi.enabled": "true",
}


def get_spark(
    app_name: str = "kerf_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and submit through spark-submit — nothing here
    assumes single-node.
    """
    # local-mode hardening must key on the RESOLVED master, not on
    # whether the caller spelled it out: an explicit master="local[32]"
    # previously skipped the heap/code-cache sizing and ran the whole
    # 32-thread JVM on Spark's 1g default — instant OOM at 10x scale
    local = master is None or str(master).startswith("local")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    b = SparkSession.builder.appName(app_name).master(master)
    if local:
        # local mode: the driver JVM hosts every executor thread, and
        # Spark's 1g default heap can't even build a mid-size broadcast
        # relation — size it for the box (only honored at JVM launch)
        b = b.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # long sessions compile hundreds of wholestage-codegen classes;
        # the JVM's 240m default code cache fills, JIT quietly degrades,
        # and late queries run interpreted at 5-10x cost (observed as
        # intermittent multi-second stalls in bench slope runs)
        b = b.config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
    b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in ENGINE_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def configure(spark: SparkSession) -> SparkSession:
    """Apply engine semantics confs to an externally-created session.

    Only runtime-settable confs can be applied here; ``nanosAsLong`` and
    shuffle settings are fine, static ones are skipped silently.
    """
    for k, v in ENGINE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    try:
        # right-size shuffles for the local core count (AQE coalesces
        # down, but the 200-partition default still costs task overhead)
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            cpus if cpus and cpus.isdigit() else "32",
        )
    except Exception:
        pass
    return spark
