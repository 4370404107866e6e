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

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


_READ_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (TESTDATA.md layout).

    The analyzed plan is memoized per (session, path): fixture tables are
    immutable, and a registry sweep touches each one dozens of times — the
    cache skips repeated file listing + footer schema reads without
    changing the physical plan (no ``.cache()``: scans stay Parquet scans
    so pushdown/pruning plan tests hold).
    """
    key = (id(spark), sf_dir, name)
    df = _READ_CACHE.get(key)
    if df is None:
        if len(_READ_CACHE) > 256:
            _READ_CACHE.clear()
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _READ_CACHE[key] = df
    return df


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
