"""As-of and interval (window) joins — the tick-database core operators.

The reference's whole temporal type system (enums.h:166-185) exists to
serve queries like "for each trade, the most recent quote at or before
it"; kerf1 ships ``asof`` for this and the reference plants the hooks
(SQL ``on`` token lexer.h:104, SORT_INDEX enums.h:265).  Spark has no
built-in as-of join, so this is genuinely custom (SURVEY.md §2.3, §4).

Implementation: the **union-tag + forward-fill** plan.

    1. tag left rows (is_left=1) and right rows (is_left=0), union
    2. single shuffle: partition by the ``by`` keys
    3. single sort within partitions: (ts, is_left, tiebreak)
    4. last(right_col, ignorenulls) over rows-unbounded-preceding
       forward-fills each right column onto subsequent left rows
    5. keep left rows

Why this shape at 100 TB: exactly ONE shuffle of left+right on the join
key and ONE within-partition sort — the same cost profile as a
sort-merge join, with no row explosion (contrast the naive
``left.join(right, r.ts <= l.ts)`` + max, which is quadratic per key).
Skewed keys are handled by AQE skew-split since the heavy op is a
window, and the plan stays fully JVM-side (no Python).

Tie semantics: right rows sort *before* left rows at equal timestamps
(is_left ascending with right=0), so an exactly-simultaneous quote IS
visible to the trade — kerf's ``<=`` convention.  Among right rows with
identical timestamps the last by ``tiebreak`` wins deterministically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ArgsError
from ..functions.temporal import _divfloor

_L = "__kf_is_left"
_TB = "__kf_tiebreak"
_RV = "__kf_right_val"  # struct(__on, carried right cols) — filled atomically


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str | None = None,
    right_cols: Sequence[str] | None = None,
    tolerance_ns: int | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group — or, with
    ``direction="forward"``, the earliest right row with
    ``right.on >= left.on`` (ties: backward takes the *last* right row
    at equal ``on``/tiebreak order, forward the *first*).

    Parameters
    ----------
    on : ordering column name, present in both frames (epoch-ns long or
        any orderable type).
    by : equi-key column(s) present in both frames (e.g. ``sym``).
    right_cols : right columns to carry (default: all non-key columns).
        Name collisions with left get ``suffix``.
    tolerance_ns : if set, matches older than ``on - tolerance_ns`` are
        nulled out (kerf window-limited asof).
    tiebreak : right column ordering ties at equal ``on`` (last wins);
        defaults to arbitrary-but-deterministic by all carried columns.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }

    # the right payload travels as ONE nullable struct (timestamp +
    # carried columns), so the window fill picks a whole right ROW
    # atomically — filling each column independently with ignorenulls
    # would let a NULL in a carried column fall through to an older
    # (possibly tolerance-violating) row's value, diverging from the
    # row semantics of merge_asof and of the SQL oracles
    tb_src = (
        F.col(tiebreak)
        if tiebreak
        else F.struct(*[F.col(c) for c in right_cols])
    )
    rhs = right.select(
        *[F.col(c) if c in by or c == on else F.lit(None).cast(t).alias(c)
          for c, t in left.dtypes],
        F.lit(0).alias(_L),
        F.struct(
            F.col(on).cast("long").alias("__on"),
            *[F.col(c).alias(out_names[c]) for c in right_cols],
        ).alias(_RV),
        tb_src.alias(_TB),
    )
    rv_type = rhs.schema[_RV].dataType
    tb_type = rhs.schema[_TB].dataType
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_L),
        F.lit(None).cast(rv_type).alias(_RV),
        F.lit(None).cast(tb_type).alias(_TB),
    )
    unioned = lhs.unionByName(rhs)

    if direction == "nearest":
        return _asof_nearest(
            unioned, left, on, by, right_cols, out_names, tolerance_ns
        )
    if direction not in ("backward", "forward"):
        raise ArgsError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    fwd = direction == "forward"
    # forward: left rows sort before equal-ts right rows so the
    # (currentRow, following) frame still sees them; fill = first match
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col(on).asc(),
        F.col(_L).desc() if fwd else F.col(_L).asc(),
        F.col(_TB).asc(),
    )
    w = (
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        if fwd
        else w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill = (
        F.first(F.col(_RV), ignorenulls=True)
        if fwd
        else F.last(F.col(_RV), ignorenulls=True)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col(_L),
        fill.over(w).alias(_RV),
    )

    out = filled.where(F.col(_L) == 1)
    rt = F.col(_RV)["__on"]
    if tolerance_ns is not None:
        if fwd:
            stale = rt > (F.col(on).cast("long") + F.lit(tolerance_ns))
        else:
            stale = rt < (F.col(on).cast("long") - F.lit(tolerance_ns))
        keep = F.col(_RV).isNotNull() & ~stale
    else:
        keep = F.col(_RV).isNotNull()
    return out.select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(keep, F.col(_RV)[out_names[c]])
            .otherwise(F.lit(None))
            .alias(out_names[c])
            for c in right_cols
        ],
    )


_RVB = "__kf_rv_bwd"
_RVF = "__kf_rv_fwd"


def _asof_nearest(
    unioned: DataFrame,
    left: DataFrame,
    on: str,
    by: list,
    right_cols: Sequence[str],
    out_names: dict,
    tolerance_ns: int | None,
) -> DataFrame:
    """``direction="nearest"``: the right row with the smallest
    |right.on - left.on|; ties (equidistant before/after, or an exact
    equal-``on`` match) prefer the backward row, pandas-style.

    ONE union, ONE exchange, ONE sort: the backward fill (last over
    unboundedPreceding..current) and the forward fill (first over
    current..unboundedFollowing) are two frames over the SAME
    partitioning and ordering, so Catalyst plans a single Exchange +
    Sort feeding both Window frames (plan-asserted).  Equal-``on``
    right rows sort before left rows and are therefore seen only by
    the backward frame — harmless, because an equal match has distance
    0 and backward wins ties anyway.
    """
    w0 = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col(on).asc(), F.col(_L).asc(), F.col(_TB).asc()
    )
    wb = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col(_L),
        F.last(F.col(_RV), ignorenulls=True).over(wb).alias(_RVB),
        F.first(F.col(_RV), ignorenulls=True).over(wf).alias(_RVF),
    ).where(F.col(_L) == 1)

    on_l = F.col(on).cast("long")
    rtb = F.col(_RVB)["__on"]
    rtf = F.col(_RVF)["__on"]
    bdist = on_l - rtb
    fdist = rtf - on_l
    use_b = rtb.isNotNull() & (rtf.isNull() | (bdist <= fdist))
    dist = F.when(use_b, bdist).otherwise(fdist)
    keep = (
        dist.isNotNull()
        if tolerance_ns is None
        else dist.isNotNull() & (dist <= F.lit(tolerance_ns))
    )
    chosen = F.when(use_b, F.col(_RVB)).otherwise(F.col(_RVF))
    return filled.select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(keep, chosen[out_names[c]])
            .otherwise(F.lit(None))
            .alias(out_names[c])
            for c in right_cols
        ],
    )


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str,
    right_cols: Sequence[str] | None = None,
    tolerance_ns: int | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    batch_keys: bool = True,
) -> DataFrame:
    """Same semantics as :func:`asof_join` (all three directions),
    alternate physical strategy: co-grouped ``applyInPandas`` running
    ``pandas.merge_asof`` per key group — whose tie conventions
    (backward last / forward first / nearest prefers backward) match
    the window variant's by construction.

    When to prefer which (both cost one shuffle of each side on ``by``):

    * ``asof_join`` (window forward-fill) stays fully JVM-side — best
      when right carries few columns and groups can be huge (the sort
      spills; no group must fit in memory).
    * ``asof_join_merge`` does a linear two-pointer merge per group in
      Arrow batches — best when right is *wide* (forward-fill pays one
      ``last() over window`` per carried column; the merge pays O(1))
      and per-key data fits an executor's Arrow batch comfortably.

    Physical shape (optimization r14): both sides cogroup on a
    DETERMINISTIC hash bucket of the ``by`` keys (xxhash64 —
    retry-safe, SPARK-38388) rather than on the keys themselves, and
    ONE vectorized ``pandas.merge_asof(..., by=...)`` call per bucket
    handles every key in it.  Per-key cogrouping dispatched Python
    once per group (guide §4.1 — measured ~10k Arrow round trips +
    per-group pandas overhead dominating the operator at ~10k tiny
    groups); bucket count derives from the session's shuffle
    partitioning, so a cluster sized for the data gets proportionally
    more buckets and each task materializes a bounded slice.  Float /
    double ``by`` keys keep the per-key cogroup (exact NULL-vs-NaN
    group identity cannot survive the pandas conversion) — as does
    ``batch_keys=False``: pass it when both inputs are CO-BUCKETED on
    ``by`` (``Workspace.save_bucketed``), where the per-key cogroup
    inherits the bucketed scans' distribution and the whole as-of runs
    with ZERO exchanges (a derived batch key would reintroduce two).

    Requires at least one ``by`` key (the window variant also supports
    global as-of).
    """
    import pandas as pd

    by = [by] if isinstance(by, str) else list(by)
    if not by:
        raise ArgsError("asof_join_merge requires at least one `by` key")
    if direction not in ("backward", "forward", "nearest"):
        raise ArgsError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    rtypes = dict(right.dtypes)
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`{out_names[c]}` {rtypes[c]}" for c in right_cols]
    )
    lcols = list(left.columns)
    # pandas nullable dtypes keep int/bool columns intact when unmatched
    # left rows introduce missing values (plain int64 would float-ify)
    _NULLABLE = {
        "tinyint": "Int8", "smallint": "Int16", "int": "Int32",
        "bigint": "Int64", "boolean": "boolean",
    }

    # unique right-side names BEFORE cogroup: when left and right share
    # lineage (e.g. both filtered from one frame), duplicate attribute
    # ids make Catalyst mis-prune the right child's columns
    rpre = right.toDF(*[f"__r_{c}" for c in right.columns])
    r_on, r_keys = f"__r_{on}", [f"__r_{c}" for c in by]
    r_carry = [f"__r_{c}" for c in right_cols]
    ltypes = dict(left.dtypes)
    coarse = batch_keys and not any(
        ltypes.get(c) in ("float", "double") for c in by
    )

    def fix_types(df: pd.DataFrame) -> pd.DataFrame:
        for c in right_cols:
            want = _NULLABLE.get(rtypes[c])
            if want:
                df[out_names[c]] = df[out_names[c]].astype(want)
        return df

    out_cols = lcols + [out_names[c] for c in right_cols]
    r_renames = {
        r_on: on,
        **{f"__r_{c}": out_names[c] for c in right_cols},
    }

    def null_fill(lpdf: pd.DataFrame) -> pd.DataFrame:
        merged = lpdf.copy()
        for c in right_cols:
            merged[out_names[c]] = None
        return fix_types(merged)[out_cols]

    def merge_one(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        """One key group (or the whole non-null slice of a bucket with
        ``with_by``): the original per-group merge_asof."""
        if len(rpdf) == 0:
            return null_fill(lpdf)
        lpdf = lpdf.sort_values(on, kind="mergesort")
        rsel = rpdf[[r_on, *r_carry]].sort_values(
            [r_on, *r_carry], kind="mergesort"
        )
        merged = pd.merge_asof(
            lpdf,
            rsel.rename(columns=r_renames),
            on=on,
            direction=direction,
            allow_exact_matches=True,
            tolerance=tolerance_ns,
        )
        return fix_types(merged)[out_cols]

    def merge_bucket(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket: vectorized merge_asof over every key in it.
        Rows whose key carries a NULL component take a per-key-tuple
        side path (Spark groups NULL = NULL; pandas ``by`` matching
        would drop them) — exact for the non-float key types this path
        admits, because NA in the converted frame can only mean NULL."""
        if len(lpdf) == 0:
            return pd.DataFrame(columns=out_cols)
        lnull = lpdf[by].isna().any(axis=1)
        rnull = (
            rpdf[r_keys].isna().any(axis=1)
            if len(rpdf)
            else pd.Series([], dtype=bool)
        )
        parts = []
        lmain = lpdf[~lnull] if lnull.any() else lpdf
        rmain = rpdf[~rnull] if len(rpdf) and rnull.any() else rpdf
        if len(lmain):
            if len(rmain) == 0:
                parts.append(null_fill(lmain))
            else:
                lmain = lmain.sort_values(on, kind="mergesort")
                rsel = rmain[[*r_keys, r_on, *r_carry]].sort_values(
                    [r_on, *r_carry], kind="mergesort"
                ).rename(
                    columns={
                        **r_renames,
                        **{f"__r_{c}": c for c in by},
                    }
                )
                # a by column whose bucket slice held NULLs arrives as
                # float64/object while its twin stays int64/bool —
                # merge_asof refuses mismatched by dtypes, and object
                # is the lossless common ground (values are exact: the
                # NULL rows were routed off above)
                for c in by:
                    if lmain[c].dtype != rsel[c].dtype:
                        lmain = lmain.astype({c: object})
                        rsel = rsel.astype({c: object})
                merged = pd.merge_asof(
                    lmain,
                    rsel,
                    on=on,
                    by=by,
                    direction=direction,
                    allow_exact_matches=True,
                    tolerance=tolerance_ns,
                )
                parts.append(fix_types(merged)[out_cols])
        if lnull.any():
            lrest = lpdf[lnull]
            rrest = rpdf[rnull] if len(rpdf) and rnull.any() else rpdf.iloc[0:0]

            def key_of(frame, cols):
                # a Series grouper, NOT a bare list (pandas would read
                # a list of tuples as a list of column names)
                return pd.Series(
                    [
                        tuple(None if pd.isna(v) else v for v in t)
                        for t in frame[list(cols)].itertuples(index=False)
                    ],
                    index=frame.index,
                    dtype=object,
                )

            rgroups: dict = {}
            if len(rrest):
                for k, grp in rrest.groupby(
                    key_of(rrest, r_keys), sort=False
                ):
                    rgroups[k] = grp
            for k, lgrp in lrest.groupby(key_of(lrest, by), sort=False):
                parts.append(
                    merge_one(lgrp, rgroups.get(k, rpdf.iloc[0:0]))
                )
        if not parts:
            return pd.DataFrame(columns=out_cols)
        if len(parts) == 1:
            return parts[0]
        return pd.concat(parts, ignore_index=True)

    if not coarse:
        # per-key cogroup (the pre-r14 shape): each dispatch is exactly
        # one Spark-identified key group, so NULL-vs-NaN float key
        # identity is decided by Spark, never by pandas
        def merge_keyed(lpdf: pd.DataFrame, rpdf: pd.DataFrame):
            if len(lpdf) == 0:
                # key exists only on the right: no left rows to emit
                return pd.DataFrame(columns=out_cols)
            return merge_one(lpdf, rpdf)

        return (
            left.groupBy(*by)
            .cogroup(rpre.groupBy(*r_keys))
            .applyInPandas(
                lambda ldf, rdf: merge_keyed(ldf, rdf), schema=out_schema
            )
        )

    spark = left.sparkSession
    try:
        sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        sp = 200
    import os as _os

    nb = int(
        _os.environ.get("KERF_ASOF_MERGE_BUCKETS", 0)
    ) or max(1, sp) * 4
    _B = "__kf_bucket"
    lb = left.withColumn(
        _B, F.pmod(F.xxhash64(*[F.col(c) for c in by]), F.lit(nb))
    )
    rb = rpre.withColumn(
        _B, F.pmod(F.xxhash64(*[F.col(c) for c in r_keys]), F.lit(nb))
    )
    return (
        lb.groupBy(_B)
        .cogroup(rb.groupBy(_B))
        .applyInPandas(
            lambda ldf, rdf: merge_bucket(ldf, rdf), schema=out_schema
        )
    )


def window_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lo_ns: int,
    hi_ns: int,
    by: Sequence[str] | str | None = None,
    bucket_ns: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Interval join: all right rows with ``r.on in [l.on+lo, l.on+hi]``
    per ``by`` group (kerf window-join; SURVEY.md §2.3).

    Scale strategy: a raw range predicate inside an equi-join on ``by``
    is fine when ``by`` is selective, but degenerates toward
    nested-loops for hot keys.  When ``bucket_ns`` is given, both sides
    are bucketed to span-sized buckets and the left side explodes to the
    covered bucket range, turning the range join into an equi-join on
    (by, bucket) + residual filter — bounded fan-out, shuffle-friendly.
    ``bucket_ns`` should be >= (hi-lo) for a fan-out of at most 2-3
    buckets per row.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    ln, rn = left.alias("l"), right.alias("r")
    renames = {
        c: (c + suffix if c in left.columns else c)
        for c in right.columns
        if c not in by
    }

    key_eq = [F.col(f"l.{c}") == F.col(f"r.{c}") for c in by]
    lo = F.col(f"l.{on}").cast("long") + F.lit(lo_ns)
    hi = F.col(f"l.{on}").cast("long") + F.lit(hi_ns)
    in_range = (F.col(f"r.{on}").cast("long") >= lo) & (
        F.col(f"r.{on}").cast("long") <= hi
    )

    if bucket_ns is None:
        joined = ln.join(rn, [*key_eq, in_range], "inner")
    else:
        # exact integer floor for buckets: double division near a bucket
        # boundary (epoch-ns > 2^53) can disagree between the left
        # coverage range and the right bucket, silently dropping matches
        lb = ln.withColumn(
            "__kf_bucket",
            F.explode(
                F.sequence(
                    _divfloor(F.col(f"{on}").cast("long") + F.lit(lo_ns), bucket_ns),
                    _divfloor(F.col(f"{on}").cast("long") + F.lit(hi_ns), bucket_ns),
                )
            ),
        ).alias("l")
        rb = rn.withColumn(
            "__kf_bucket", _divfloor(F.col(on).cast("long"), bucket_ns)
        ).alias("r")
        joined = lb.join(
            rb,
            [
                F.col("l.__kf_bucket") == F.col("r.__kf_bucket"),
                *[F.col(f"l.{c}") == F.col(f"r.{c}") for c in by],
                in_range,
            ],
            "inner",
        )

    return joined.select(
        *[F.col(f"l.{c}").alias(c) for c in left.columns],
        *[F.col(f"r.{c}").alias(renames[c]) for c in right.columns if c not in by],
    )


def window_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lo_ns: int,
    hi_ns: int,
    by: Sequence[str] | str | None = None,
    out: str = "n_in_window",
) -> DataFrame:
    """For each left row, COUNT right rows with ``r.on`` in
    ``[l.on+lo, l.on+hi]`` per ``by`` group — the aggregate twin of
    :func:`window_join` that never materializes the matched pairs.

    Rank-difference plan: each left row emits two probe rows (one at
    the window's lower edge ordered *before* right rows at equal time,
    one at the upper edge ordered *after*), unioned with the right rows
    carrying weight 1.  One shuffle on ``by``, one in-partition sort, a
    running sum of weights, then the per-left-row difference of the two
    probe counts (signs +1/-1, summed per left row).

    Why this shape at 100 TB: :func:`window_join` + groupBy computes the
    same answer but its intermediate row count is the number of MATCHES
    — a hot anchor with a million right rows in its window explodes a
    million joined rows just to count them.  Here rows through the
    shuffle are |left|·2 + |right| regardless of window density, there
    is no join, and both closed bounds are exact (probe ordering, not a
    residual filter).  Same cost profile as the union-tag as-of join.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    kf_lid, kf_ts, kf_kind, kf_sign, kf_w = (
        "__kf_lid", "__kf_ts", "__kf_kind", "__kf_sign", "__kf_w"
    )
    # one scan of left: both probes explode from the same row, so the
    # synthetic id (unique, layout-dependent — internal only) is
    # consistent across the pair by construction
    probes = (
        left.withColumn(kf_lid, F.monotonically_increasing_id())
        .select(
            *left.columns,
            kf_lid,
            F.explode(
                F.array(
                    # kind 0 sorts before right rows (kind 1): its running
                    # count excludes rows AT the closed lower bound
                    F.struct(
                        (F.col(on).cast("long") + F.lit(lo_ns)).alias(kf_ts),
                        F.lit(0).alias(kf_kind),
                        F.lit(-1).alias(kf_sign),
                    ),
                    # kind 2 sorts after right rows: count includes the
                    # closed upper bound
                    F.struct(
                        (F.col(on).cast("long") + F.lit(hi_ns)).alias(kf_ts),
                        F.lit(2).alias(kf_kind),
                        F.lit(1).alias(kf_sign),
                    ),
                )
            ).alias("__kf_p"),
        )
        .select(
            *left.columns, kf_lid,
            F.col(f"__kf_p.{kf_ts}").alias(kf_ts),
            F.col(f"__kf_p.{kf_kind}").alias(kf_kind),
            F.col(f"__kf_p.{kf_sign}").alias(kf_sign),
            F.lit(0).cast("long").alias(kf_w),
        )
    )
    ltypes = dict(left.dtypes)
    rhs = right.select(
        *[
            F.col(c).cast(ltypes[c]).alias(c) if c in by
            else F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
        F.lit(None).cast("long").alias(kf_lid),
        F.col(on).cast("long").alias(kf_ts),
        F.lit(1).alias(kf_kind),
        F.lit(0).alias(kf_sign),
        F.lit(1).cast("long").alias(kf_w),
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(F.col(kf_ts).asc(), F.col(kf_kind).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    counted = (
        probes.unionByName(rhs)
        .withColumn("__kf_cnt", F.sum(kf_w).over(w))
        .where(F.col(kf_kind) != 1)
    )
    return (
        counted.groupBy(kf_lid, *[F.col(c) for c in left.columns])
        .agg(F.sum(F.col(kf_sign) * F.col("__kf_cnt")).alias(out))
        .drop(kf_lid)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start: str,
    end: str,
    bucket_ns: int,
    by: Sequence[str] | str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Interval×interval overlap join: pairs where
    ``l.start <= r.end AND r.start <= l.end`` (+ equal ``by`` keys).

    The interval-interval generalization of :func:`window_join`
    (point-in-window): both sides explode to the span-sized buckets
    they cover, the overlap test becomes an equi-join on (by, bucket)
    plus the exact residual predicate, and duplicate hits from spanning
    multiple buckets collapse by synthetic per-row id — NOT full-row
    distinct, so two genuinely identical input rows still yield two
    output pairs (bag semantics, matching SQL join behavior).  Choose
    ``bucket_ns`` near the typical interval length: fan-out stays at
    2-3 buckets per row and no pair is ever compared outside a shared
    bucket — the standard distributed overlap-join (no nested loop, no
    cross).

    Adds ``overlap`` — the overlap length ``min(ends) - max(starts)``.
    """
    by = [by] if isinstance(by, str) else list(by or [])

    def bucketed(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.withColumn(f"__kf_{alias}id", F.monotonically_increasing_id())
            .withColumn(
                "__kf_bucket",
                F.explode(
                    F.sequence(
                        _divfloor(F.col(start).cast("long"), bucket_ns),
                        _divfloor(F.col(end).cast("long"), bucket_ns),
                    )
                ),
            )
            .alias(alias)
        )

    lb, rb = bucketed(left, "l"), bucketed(right, "r")
    overlap_ok = (F.col(f"l.{start}") <= F.col(f"r.{end}")) & (
        F.col(f"r.{start}") <= F.col(f"l.{end}")
    )
    renames = {
        c: (c + suffix if c in left.columns else c)
        for c in right.columns
        if c not in by
    }
    joined = lb.join(
        rb,
        [
            F.col("l.__kf_bucket") == F.col("r.__kf_bucket"),
            *[F.col(f"l.{c}") == F.col(f"r.{c}") for c in by],
            overlap_ok,
        ],
        "inner",
    )
    out = (
        joined.select(
            F.col("l.__kf_lid"),
            F.col("r.__kf_rid"),
            *[F.col(f"l.{c}").alias(c) for c in left.columns],
            *[
                F.col(f"r.{c}").alias(renames[c])
                for c in right.columns
                if c not in by
            ],
        )
        .dropDuplicates(["__kf_lid", "__kf_rid"])
        .drop("__kf_lid", "__kf_rid")
    )
    return out.withColumn(
        "overlap",
        F.least(F.col(end), F.col(renames[end]))
        - F.greatest(F.col(start), F.col(renames[start])),
    )


def resample(
    df: DataFrame,
    on: str,
    step: int,
    by: Sequence[str] | str | None = None,
    val_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Regular-grid resample with as-of fill (the kerf/kdb "align ticks
    to bars and carry the last observation" idiom; the grid twin of
    xbar bucketing, SURVEY.md §2.4/§2.5 — stamp-bucket lattice
    enums.h:167-175).

    Per ``by`` group, emits one row for every ``step``-aligned grid
    point between the group's min and max ``on`` (a long — epoch-ns/µs
    or any integer axis), each carrying the latest observation at or
    before that point (``val_cols``, forward-filled by :func:`asof_join`).

    Scale strategy: the grid is built from a per-group (min, max)
    aggregate — one partial-aggregated shuffle over the keys, then a
    narrow ``sequence``+``explode`` that never materializes more than
    span/step rows per group; the fill reuses the single-shuffle
    union-tag as-of join, so the whole op is two key-partitioned
    exchanges regardless of input size.  Grid density is the caller's
    dial: step must be sized so span/step per group stays sane (a 1s
    grid over a year is 31M rows per key — intended, but loud in the
    row count, never a hidden blowup).

    ``tiebreak``: with multiple source rows at one grid-aligned ``on``
    value the fill is still deterministic via asof_join's tiebreak
    ordering (last wins); pre-aggregate to one row per (by, on) when
    the source needs an explicit reduction first.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    aligned = lambda c: c - F.pmod(c, F.lit(step))  # noqa: E731 — pmod:
    # true floor for negative (pre-1970) stamps too, not trunc-to-zero
    grid = (
        df.groupBy(*by)
        .agg(F.min(on).alias("__kf_mn"), F.max(on).alias("__kf_mx"))
        .select(
            *by,
            F.explode(
                F.sequence(
                    aligned(F.col("__kf_mn").cast("long")),
                    aligned(F.col("__kf_mx").cast("long")),
                    F.lit(step).cast("long"),
                )
            ).alias(on),
        )
    )
    return asof_join(
        grid, df, on=on, by=by, right_cols=val_cols, tiebreak=tiebreak
    )


def resample_interp(
    df: DataFrame,
    on: str,
    step: int,
    by: Sequence[str] | str | None,
    val_col: str,
    out: str = "interp",
) -> DataFrame:
    """Regular-grid resample with *linear interpolation* between the
    surrounding observations — the smooth twin of :func:`resample`'s
    carry-last fill (kerf/kdb tick-alignment family, SURVEY.md §2.5).

    Per ``by`` group and ``step``-aligned grid point ``t``: find the
    latest observation at-or-before ``t`` and the earliest at-or-after,
    and emit ``pv + (nv - pv) * (t - pt) / (nt - pt)`` (the value
    itself when the grid point lands on a tick; NULL outside the
    observed span).  Multiple observations at one ``on`` value are
    pre-averaged so the interpolant is tiebreak-free and
    engine-portable.

    Scale shape: one partial-agg shuffle to collapse duplicate stamps,
    the grid build from per-group (min, max), then TWO chained
    union-tag as-of passes (backward, then forward over the backward
    result) — every exchange hash-partitions on the same ``by`` keys,
    so AQE reuses the partitioning and the whole plan stays
    key-parallel regardless of input size.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    src = df.groupBy(*by, on).agg(F.avg(val_col).alias(val_col))
    aligned = lambda c: c - F.pmod(c, F.lit(step))  # noqa: E731
    grid = (
        src.groupBy(*by)
        .agg(F.min(on).alias("__kf_mn"), F.max(on).alias("__kf_mx"))
        .select(
            *by,
            F.explode(
                F.sequence(
                    aligned(F.col("__kf_mn").cast("long")),
                    aligned(F.col("__kf_mx").cast("long")),
                    F.lit(step).cast("long"),
                )
            ).alias(on),
        )
    )
    prev = src.select(
        *by,
        F.col(on),
        F.col(val_col).alias("__kf_pv"),
        F.col(on).cast("long").alias("__kf_pt"),
    )
    nxt = src.select(
        *by,
        F.col(on),
        F.col(val_col).alias("__kf_nv"),
        F.col(on).cast("long").alias("__kf_nt"),
    )
    back = asof_join(grid, prev, on=on, by=by, right_cols=["__kf_pv", "__kf_pt"])
    both = asof_join(
        back, nxt, on=on, by=by, right_cols=["__kf_nv", "__kf_nt"],
        direction="forward",
    )
    t = F.col(on).cast("double")
    pv, pt = F.col("__kf_pv"), F.col("__kf_pt")
    nv, nt = F.col("__kf_nv"), F.col("__kf_nt")
    interp = (
        F.when(pt.isNull() | nt.isNull(), F.lit(None).cast("double"))
        .when(nt == pt, pv)
        .otherwise(
            pv + (nv - pv) * ((t - pt.cast("double")) / (nt.cast("double") - pt.cast("double")))
        )
    )
    return both.select(*by, F.col(on), interp.alias(out))


def merge_intervals(
    df: DataFrame,
    start: str,
    end: str,
    by: Sequence[str] | str | None = None,
) -> DataFrame:
    """Coalesce overlapping-or-touching intervals per key: the classic
    gaps-and-islands merge.  Returns one row per merged island with
    ``start`` = min start and ``end`` = running-max end.

    ONE keyed shuffle: a running max of ``end`` over the start order
    marks island breaks (a new island begins where a start exceeds
    every previous end), a running sum of the breaks numbers the
    islands, and a groupBy on (key, island) — all three sharing the
    same partitioning — emits the merged spans.  The coverage measure
    of a union of intervals falls out as sum(end - start) over the
    result, with double-counted overlaps already removed.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col(start).asc(), F.col(end).asc()
    )
    prev_max = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = df.withColumn(
        "__kf_new",
        F.when(
            prev_max.isNull() | (F.col(start) > prev_max), 1
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "__kf_island",
        F.sum("__kf_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy(*by, "__kf_island")
        .agg(F.min(start).alias(start), F.max(end).alias(end))
        .drop("__kf_island")
    )


def interval_gaps(
    df: DataFrame,
    start: str,
    end: str,
    by: Sequence[str] | str | None = None,
) -> DataFrame:
    """The complement of :func:`merge_intervals`: the gaps BETWEEN a
    key's merged islands — (key..., gap_start, gap_end), one row per
    downtime window.  Composes as merge + one lead() over the same key
    partitioning (the merge's final groupBy already hash-partitioned
    on the key, so the window reuses that exchange)."""
    by = [by] if isinstance(by, str) else list(by or [])
    merged = merge_intervals(df, start, end, by)
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col(start).asc()
    )
    nxt = F.lead(start).over(w)
    return (
        merged.select(
            *by,
            F.col(end).alias("gap_start"),
            nxt.alias("gap_end"),
        )
        .where(F.col("gap_end").isNotNull())
    )
