"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 pricing summary) on
the sf0.001 fixtures.  ``queries()``/``oracle_sql()`` expose the full
operator inventory of SURVEY.md §2 — definitions live in
``kerf_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def _prepare(spark: SparkSession) -> SparkSession:
    """Apply engine-critical runtime confs (nanosAsLong for the events
    table's TIMESTAMP(NANOS) column) to a driver-provided session."""
    from kerf_spark.session import configure

    return configure(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kerf_spark.queries import QUERIES

    _prepare(spark)
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kerf_spark.queries import QUERIES

    return {
        name: (lambda fn: (lambda spark, sf_dir: fn(_prepare(spark), sf_dir)))(fn)
        for name, fn in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    from kerf_spark.queries import ORACLES

    return dict(ORACLES)
