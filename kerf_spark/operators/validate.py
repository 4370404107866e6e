"""Data-quality validation: declarative rules -> one audit pass.

The ingest-side discipline for a 100 TB pipeline: every batch gets a
rule report BEFORE it merges — null/range/enum/regex violations from a
single aggregation over one scan (all row-level rules are Column
predicates, so the audit is a projection + one 1-row agg: zero
shuffles beyond the final combine); uniqueness and referential
integrity are the two rules that genuinely need a shuffle and are
reported by dedicated helpers.

Beyond the reference's surface (it has no validation verbs); the shape
follows the same philosophy as the rest of the engine: rules compile
to Catalyst expressions, never Python predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


# ------------------------------------------------------------- builders
def not_null(col) -> tuple[str, Column]:
    return f"not_null({col})", _c(col).isNotNull()


def in_range(col, lo, hi) -> tuple[str, Column]:
    c = _c(col)
    return f"in_range({col},{lo},{hi})", c.isNotNull() & (c >= lo) & (c <= hi)


def in_set(col, values) -> tuple[str, Column]:
    vals = list(values)
    return f"in_set({col},{len(vals)} values)", _c(col).isin(vals)


def matches(col, pattern: str) -> tuple[str, Column]:
    return f"matches({col},{pattern})", _c(col).rlike(pattern)


def custom(name: str, predicate: Column) -> tuple[str, Column]:
    """Any Column predicate as a named rule."""
    return name, predicate


# --------------------------------------------------------------- audits
def audit(df: DataFrame, rules) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, violation_rate).

    All rules evaluate in a SINGLE scan — each compiles to a
    conditional count inside one aggregation, so adding a rule costs a
    column expression, not a pass over the data.
    """
    # internal agg aliases are positional (__r0, __r1, ...): display
    # names carry arbitrary text (regex patterns, duplicate columns)
    # that would collide or mis-parse as column references
    aggs = [F.count(F.lit(1)).alias("__n")]
    names = []
    for i, (name, pred) in enumerate(rules):
        names.append(name)
        aggs.append(
            F.sum(F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0))
            .cast("long")
            .alias(f"__r{i}")
        )
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__r{i}").alias("n_violations"),
                    )
                    for i, name in enumerate(names)
                ]
            )
        ).alias("r")
    )
    return stacked.select(
        "r.rule",
        "r.n_rows",
        "r.n_violations",
        F.round(F.col("r.n_violations") / F.col("r.n_rows"), 6).alias(
            "violation_rate"
        ),
    )


def duplicate_keys(df: DataFrame, keys) -> DataFrame:
    """Keys appearing more than once: (keys..., n).  The uniqueness
    rule — one keyed shuffle, the unavoidable cost of a global
    distinctness check."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def orphans(child: DataFrame, parent: DataFrame, on) -> DataFrame:
    """Child rows whose key has no parent (referential integrity) —
    a left-anti join; broadcast when the parent key set is small."""
    on = [on] if isinstance(on, str) else list(on)
    return child.join(parent.select(*on).distinct(), on, "left_anti")
