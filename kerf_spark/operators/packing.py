"""Training-corpus assembly operators: sequence packing, mixture
rebalancing, deterministic shuffle order.

Beyond-reference mandate (brief: "operations a large-scale
training-data pipeline would need").  Everything here is built from
window/agg/filter primitives — no UDFs — and every order/sample
decision keys on a content hash, so results are identical across
partitionings, engines, and reruns (the property the whole
deterministic-sampling suite is built on, operators/sampling.py).

Scale notes:

* ``sequence_pack`` windows WITHIN a hash shard, never globally — the
  pack boundary scan is embarrassingly parallel across shards, which is
  how production packers run (per-worker packing); one shuffle on the
  shard key.
* ``rebalance_mixture`` is a per-key aggregate broadcast back as a
  keep-probability — one small agg + one map-side filter.
* ``shuffle_order`` materializes only the bounded prefix (top-k by
  hash, TakeOrderedAndProject), then numbers the bounded slice — the
  positional-family discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket


def sequence_pack(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int = 4096,
    shards: int = 16,
) -> DataFrame:
    """Assign each document to a training-sequence pack.

    Contiguous-fill packing: docs are sharded by a content hash of the
    id, ordered by id within the shard, and a doc is assigned to pack
    ``floor(preceding_tokens / budget)`` — i.e. pack boundaries fall at
    multiples of ``budget`` in the running token stream.  This is
    *crossing-based* assignment, not capacity enforcement: a doc that
    straddles a boundary joins the pack its predecessors opened, so a
    pack's total can exceed ``budget`` (downstream sequence assembly
    truncates or wraps); an over-budget doc occupies one or more whole
    boundary intervals, pushing the next doc into a fresh pack.

    Adds columns ``shard``, ``pack_id`` (globally unique:
    ``shard * 2^40 + local pack``), and ``pack_pos``.
    """
    shard = hash_bucket(id_col, shards, "shard").alias("shard")
    w = Window.partitionBy("shard").orderBy(id_col)
    pre = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    local_pack = F.floor(pre / F.lit(budget))
    return (
        df.withColumn("shard", shard)
        .withColumn("pack_id", (F.col("shard") * F.lit(2**40) + local_pack).cast("long"))
        .withColumn("pack_pos", F.row_number().over(w))
    )


def rebalance_mixture(
    df: DataFrame,
    key_col: str,
    id_col: str,
    targets: dict[str, float],
    denom: int = 10_000,
) -> DataFrame:
    """Downsample per-``key_col`` groups toward a target mixture.

    ``targets`` maps key -> desired share of the OUTPUT corpus.  Each
    group's keep-probability is ``min(1, target_share * total /
    group_n)`` — groups over-represented relative to the target are
    hash-thinned (deterministic by id), under-represented groups pass
    through whole (no upsampling).  Keys absent from ``targets`` drop.

    One aggregate over the corpus (two numbers per key), broadcast back
    into a pure filter: no per-row state, no second shuffle.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    total = counts.agg(F.sum("__n").alias("__total"))
    tgt = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )
    ratio = tgt[F.col(key_col)] * F.col("__total") / F.col("__n")
    probs = (
        counts.crossJoin(F.broadcast(total))
        # NB: F.least SKIPS nulls (least(1.0, NULL) = 1.0), so the
        # absent-key null must be filtered BEFORE the clamp or dropped
        # keys would silently pass whole
        .where(ratio.isNotNull())
        .select(key_col, F.least(F.lit(1.0), ratio).alias("__keep_p"))
    )
    bucket = hash_bucket(id_col, denom, "mix")
    return (
        df.join(F.broadcast(probs), key_col)
        .where(bucket < F.col("__keep_p") * denom)
        .drop("__keep_p")
    )


def shuffle_order(
    df: DataFrame, id_col: str, seed: str = "epoch0", n: int = 100
) -> DataFrame:
    """First ``n`` rows of a deterministic pseudo-random corpus order.

    Training-epoch shuffling without randomness: order = md5(seed || id).
    The full order is never materialized — ``orderBy(hash).limit(n)``
    plans as TakeOrderedAndProject and only the bounded prefix is
    row-numbered.  Different ``seed`` = a fresh epoch permutation.
    """
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    sliced = (
        df.withColumn("__h", h)
        .orderBy("__h")
        .limit(n)
    )
    w = Window.orderBy("__h")
    return (
        sliced.withColumn("position", F.row_number().over(w))
        .drop("__h")
    )
