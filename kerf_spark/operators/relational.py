"""Relational surface: kerf-SQL verbs select/update/delete/insert/upsert,
top-k, set ops, dictionary joins.

The reference lexes+parses the full SQL surface (``select update insert
upsert delete ... from group where order limit``, lexer.h:103-104,
parser.h:541-567) but never evaluates it (interpreter stub).  These are
the evaluations, expressed as stock DataFrame ops so Catalyst owns
pushdown, pruning, and join planning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cs) -> list[Column]:
    if isinstance(cs, (str, Column)):
        cs = [cs]
    return [F.col(c) if isinstance(c, str) else c for c in cs]


# ----------------------------------------------------------- update/delete
def update(df: DataFrame, where: Column, **sets: Column) -> DataFrame:
    """SQL ``update t set c=expr where cond`` as a pure transformation:
    rows matching ``where`` get the new values, others keep theirs.
    (Persisted-table update is the catalog's partition-rewrite job.)"""
    out = df
    for name, expr in sets.items():
        base = F.col(name) if name in df.columns else F.lit(None)
        out = out.withColumn(name, F.when(where, expr).otherwise(base))
    return out


def delete(df: DataFrame, where: Column) -> DataFrame:
    """SQL ``delete from t where cond`` == keep the complement.
    Null-safe: rows where ``where`` is NULL are kept (ANSI delete
    semantics — only TRUE predicates delete)."""
    return df.where(~F.coalesce(where, F.lit(False)))


def insert(df: DataFrame, rows: DataFrame) -> DataFrame:
    """Append by column name (kerf table append; schema must conform —
    promotion is handled by the catalog on persisted tables)."""
    return df.unionByName(rows)


def upsert(df: DataFrame, rows: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keyed upsert without a transactional format: new rows win.

    MERGE emulation = (old rows anti-joined on keys) ∪ new rows.  The
    anti join broadcasts when ``rows`` is small — the common "today's
    corrections" shape; at scale both sides shuffle once on the keys.

    Null keys are VALUES (kerf unique semantics, the discipline
    append enforces): the anti join is null-safe (``<=>``), so an
    incoming null-key row REPLACES a stored null-key row instead of
    both surviving the merge — SQL ``null == null`` is never true,
    which would silently break the unique invariant the catalog
    declares (ERROR_KEYS, jump.h:168).  ``<=>`` is still an equi-join
    key for Catalyst (null-safe hash join), so the plan shape is
    unchanged.
    """
    from functools import reduce

    keys = list(keys)
    incoming = rows.select(
        *[F.col(k).alias(f"__up_{k}") for k in keys]
    ).distinct()
    cond = reduce(
        lambda a, b: a & b,
        [F.col(k).eqNullSafe(F.col(f"__up_{k}")) for k in keys],
    )
    survivors = df.join(incoming, on=cond, how="left_anti")
    return survivors.unionByName(rows)


# ----------------------------------------------------------- order / top-k
def top_k(
    df: DataFrame, order: Sequence[Column | str], k: int, desc: bool = True
) -> DataFrame:
    """kerf ``k take grade_down`` — Catalyst compiles orderBy+limit to
    TakeOrderedAndProject: per-partition heaps + driver merge, no global
    sort.  Pass a unique tiebreak in ``order`` for determinism."""
    cols = _cols(order)
    if desc:
        cols = [c.desc() for c in cols]
    return df.orderBy(*cols).limit(k)


# ----------------------------------------------------------- set ops
def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """SET union (presented.cc:475-502 unique-insert semantics)."""
    return a.unionByName(b).distinct()


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def in_keys(df: DataFrame, keys_df: DataFrame, on: Sequence[str]) -> DataFrame:
    """Membership filter == left-semi join (SET membership, enums.h:247)."""
    return df.join(keys_df, on=list(on), how="left_semi")


def not_in_keys(df: DataFrame, keys_df: DataFrame, on: Sequence[str]) -> DataFrame:
    return df.join(keys_df, on=list(on), how="left_anti")


# ----------------------------------------------------------- dict join
def decode_dict(
    df: DataFrame,
    dict_df: DataFrame,
    key: str,
    value_cols: Sequence[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Vectorized dictionary lookup ``m[k]`` (the ENUM intern decode,
    presented.cc:621-624 ``indices()[keys()[rhs]]``): broadcast-join the
    intern table.  Explicit ``broadcast`` — a dictionary is small by
    definition; never let it pick a shuffle."""
    cols = list(value_cols) if value_cols else [c for c in dict_df.columns if c != key]
    return df.join(F.broadcast(dict_df.select(key, *cols)), on=key, how=how)


# ----------------------------------------------------------- vector group-by
def group_vectors(
    df: DataFrame,
    by: Sequence[str],
    collect: dict[str, str],
    sort_lists: bool = True,
) -> DataFrame:
    """Kerf grouped-``by`` with *vector* results: each group maps to the
    per-group value vectors, not scalars (SURVEY §2.4).

    ``collect`` maps output name -> source column.  Lists are sorted for
    deterministic value semantics (kerf groups preserve appearance
    order; a distributed engine cannot, so the engine's contract is
    sorted vectors).  Memory note: per-group vectors materialize in the
    agg hash map — prefer window functions when groups can be huge.
    """
    aggs = []
    for out, src in collect.items():
        c = F.collect_list(src)
        if sort_lists:
            c = F.array_sort(c)
        aggs.append(c.alias(out))
    return df.groupBy(*_cols(by)).agg(*aggs)


def transpose_vectors(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """General transpose of a list-of-vectors column — the reference's
    FLIPPED_TRANSPOSED object (enums.h:260): row-major vectors become
    position-major vectors, ordered by the row id.

    Distributed reshape, not a driver op: ``posexplode`` fans each
    vector into (id, pos, val) triples, then one shuffle keyed on
    ``pos`` regroups — position keys are uniform (every row contributes
    to every position), so the exchange is perfectly balanced at any
    scale.  Output: (pos, vals array sorted by ``id_col``).
    """
    ex = df.select(
        F.col(id_col).alias("__t_id"),
        F.posexplode(vec_col).alias("pos", "__t_val"),
    )
    sorted_vals = F.transform(
        F.array_sort(F.collect_list(F.struct("__t_id", "__t_val"))),
        lambda s: s["__t_val"],
    )
    return ex.groupBy("pos").agg(sorted_vals.alias("vals"))


def top_k_by_group(
    df: DataFrame,
    by: Sequence[str] | str,
    order: Sequence[Column | str],
    k: int,
    desc: bool = True,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k (kerf ``k take grade_down`` inside each ``by``
    group — the "best 3 per symbol" tick idiom).

    One shuffle on the group keys, a per-partition sort, and a rank
    filter: no global sort and no per-group limit collection, so it
    scales with the number of groups, not with k x groups on the
    driver (contrast :func:`top_k`, whose TakeOrderedAndProject merges
    on the driver — right for global top-k, wrong per-group).  Pass a
    unique tiebreak in ``order`` for determinism.
    """
    by = [by] if isinstance(by, str) else list(by)
    cols = _cols(order)
    if desc:
        cols = [c.desc() for c in cols]
    from pyspark.sql import Window

    w = Window.partitionBy(*by).orderBy(*cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def melt(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "measure",
    value_name: str = "val",
) -> DataFrame:
    """Unpivot wide measure columns into (measure, value) rows — the
    inverse of the pivot surface and the relational face of kerf's
    flip/transpose family (FLIPPED enums.h:259; SURVEY §2.4 pivot row).

    Uses the native ``unpivot`` (Expand physical node): each input row
    fans out JVM-side to one row per measure with zero shuffle — the
    plan is scan -> Expand -> project however wide the melt is.
    """
    return df.unpivot(
        [F.col(c) for c in ids],
        [F.col(c) for c in values],
        var_name,
        value_name,
    )


def scd2_history(
    log: DataFrame,
    key: Sequence[str] | str,
    ts: str,
    attrs: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log:
    one row per (key, attribute-state) interval with ``valid_from`` =
    the first timestamp the state was observed and ``valid_to`` = the
    timestamp it changed (NULL = still current).

    Consecutive log rows with identical ``attrs`` collapse (no spurious
    versions); the whole build is ONE keyed shuffle — a lag() for
    change detection and a lead() over the surviving change rows,
    both windows sharing the key partitioning.  Point-in-time lookup is
    then a filter: ``valid_from <= t AND (valid_to IS NULL OR t <
    valid_to)``.
    """
    key = [key] if isinstance(key, str) else list(key)
    attrs = list(attrs)
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(*key).orderBy(*order)
    state = F.struct(*[F.col(a) for a in attrs])
    changed = log.withColumn(
        "__prev", F.lag(state).over(w)
    ).where(
        F.col("__prev").isNull() | (F.col("__prev") != state)
    )
    return changed.select(
        *key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
    )


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    key: Sequence[str] | str,
    ts: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Merge a new changelog batch into an existing SCD2 ``history``
    (as produced by :func:`scd2_history`): keys touched by the batch
    are rebuilt from their recorded versions plus the new rows; keys
    the batch never mentions pass through untouched (anti-join, no
    window work).  Incremental discipline: per-batch cost scales with
    the touched keys' history, not the full dimension.

    CONTRACT — the history is the system of record, so the rebuild
    sees one row per recorded VERSION, not the raw assertion log.
    The exact invariant (unit-tested) is against the collapsed
    changelog: scd2_apply(scd2_history(C1), C2) ==
    scd2_history(C1 ∪ C2) whenever no C2 row lands strictly inside a
    same-state run of C1's RAW source — always true when C1 was
    already collapse-free (each row a genuine change) or when batches
    arrive in time order.  A batch row that interleaves a collapsed
    run cannot resurrect the run's later re-assertion (that evidence
    was never recorded); pipelines needing full out-of-order fidelity
    keep the raw changelog (bronze) and rebuild touched keys from it —
    see the stream_scd2_history query for that pattern.
    """
    key = [key] if isinstance(key, str) else list(key)
    attrs = list(attrs)
    touched = batch.select(*key).distinct()
    untouched = history.join(touched, key, "left_anti")
    hist_log = history.join(touched, key, "left_semi").select(
        *key, *attrs, F.col("valid_from").alias(ts)
    )
    merged_log = hist_log.unionByName(batch.select(*key, *attrs, ts))
    rebuilt = scd2_history(merged_log, key, ts, attrs)
    return untouched.unionByName(rebuilt)
