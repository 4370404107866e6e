"""Skew-handling operators: salted two-phase aggregation and salted
replicated joins.

The reference is single-node and has no shuffle, so no skew problem
exists there; its parallel primitive ``mapcores`` simply segments the
array (adverbs.h:210-295).  On a 1000-executor cluster a hot grouping
key (one symbol carrying 30% of all ticks) serializes into one reducer
task.  These helpers break hot keys deterministically:

* :func:`salted_groupby_agg` — phase 1 aggregates on ``(keys, salt)``
  so every hot key fans out over ``buckets`` reducers; phase 2 combines
  the tiny per-salt partials on ``keys`` alone.  Only algebraic
  aggregates are offered (sum/count/min/max, and avg derived from
  sum+count) because only those re-combine losslessly.
* :func:`salted_join` — replicates the *small* side once per salt value
  (a ``buckets``-way explode, still broadcastable) and salts the big
  side deterministically, so one hot join key spreads over ``buckets``
  tasks.  Equality with the unsalted join is exact, which makes the
  operator oracle-checkable.

AQE's runtime skew-join splitting (``spark.sql.adaptive.skewJoin``) is
the first line of defense and stays on (session.py); these are the
explicit tools for *aggregation* skew — which AQE does not split — and
for engines/plans where AQE isn't available.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salt_column", "salted_groupby_agg", "salted_join"]

_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
# how a phase-1 partial recombines in phase 2
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salt_column(df: DataFrame, buckets: int, by: list[str] | None = None) -> Column:
    """Deterministic salt in ``[0, buckets)`` — a hash of ``by`` (default:
    every column), NOT ``rand()``, so reruns and retried tasks land rows
    in the same bucket (idempotent under Spark task retry)."""
    cols = by if by is not None else df.columns
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys.

    ``aggs`` is ``[(col, fn, alias)]`` with ``fn`` in
    ``{"sum","count","min","max","avg"}``.  Phase 1 groups on
    ``keys + [salt]`` (hot keys split across ``buckets`` reducers),
    phase 2 re-combines partials on ``keys``.  Result is exactly
    ``df.groupBy(keys).agg(...)`` — same rows, same values (float sums
    may associate differently, as any partial aggregation does).
    """
    partial_cols, final_cols = [], []
    for col, fn, alias in aggs:
        if fn == "avg":  # algebraic via sum+count
            partial_cols += [
                F.sum(col).alias(f"__s_{alias}"),
                F.count(col).alias(f"__c_{alias}"),
            ]
            final_cols.append(
                (F.sum(f"__s_{alias}") / F.sum(f"__c_{alias}")).alias(alias)
            )
        else:
            partial_cols.append(_PARTIAL[fn](col).alias(f"__p_{alias}"))
            final_cols.append(_COMBINE[fn](f"__p_{alias}").alias(alias))
    salted = df.withColumn("__salt", salt_column(df, buckets))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_cols)
    return partial.groupBy(*keys).agg(*final_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``big`` has hot values in ``on``: salt the big
    side by a hash of its non-key columns, replicate the small side
    ``buckets`` times, join on ``on + [salt]``.  Each hot key's rows
    spread over ``buckets`` tasks instead of one.

    ``how`` may be ``inner`` or ``left`` (left rows are never lost —
    every (key, salt) pair exists on the replicated side whenever the
    key itself does... a missing key still null-fills exactly once).
    The replicated small side is ``buckets ×`` its size — keep it the
    dimension side.  Result equals ``big.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    non_key = [c for c in big.columns if c not in on]
    bs = big.withColumn("__salt", salt_column(big, buckets, by=non_key or on))
    ss = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = bs.join(F.broadcast(ss), on + ["__salt"], how)
    return out.drop("__salt")
