"""Deterministic sampling & splits for training-data pipelines.

Random sampling (``F.rand``) is partition-layout-dependent — rerunning
after a repartition yields a different sample, which is unacceptable in
a data pipeline that must be reproducible across runs and engines.
These operators derive the sampling decision from a *content hash* of a
key column: the same row lands in the same bucket on any engine, any
partitioning, any day.  (Beyond the reference's surface; the reference
ships only a PRNG, rng.h:7-46.)

md5 is used (not xxhash64) so results are portable across engines —
the hash is hex-parsed to a bucket in [0, 100) or [0, denom).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def hash_bucket(key: Column | str, denom: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, denom) from a content hash of ``key``.

    The first 8 hex chars of md5 give 32 uniform bits — plenty for
    percentage-style bucketing; ``salt`` derives independent bucketings
    from the same key (e.g. one for sampling, one for splitting).
    """
    h = F.md5(F.concat(_c(key).cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % denom).alias(
        "bucket"
    )


def hash_sample(
    df: DataFrame, key: str, pct: int, salt: str = ""
) -> DataFrame:
    """Keep ~pct% of rows, deterministically by key hash.

    Filter-only: no shuffle, prunes at the scan when combined with
    other predicates, identical output on every rerun.
    """
    if not 0 <= pct <= 100:
        raise ValueError("pct must be in [0, 100]")
    return df.where(hash_bucket(key, 100, salt) < pct)


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Attach a stable ``split`` column ('train'/'val'/'test').

    Key-hash assignment means all rows sharing a key land in the same
    split (group-leakage-safe when ``key`` is the dedup/cluster key).
    """
    b = hash_bucket(key, 100, salt)
    return df.withColumn(
        "split",
        F.when(b < val_pct, F.lit("val"))
        .when(b < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    strata: str,
    frac: float,
    id_col: str,
) -> DataFrame:
    """Exact-count stratified sample: ceil(frac * n) rows from every
    stratum, chosen by content-hash order — deterministic across
    engines, partitionings, and reruns (contrast ``df.sampleBy``, whose
    per-row Bernoulli draw gives only an *expected* fraction and is
    layout-dependent).

    One shuffle on the stratum key; within each stratum rows are ranked
    by md5(id) (a uniform permutation independent of data order), so
    the kept set is an unbiased fixed-size sample per stratum — the
    shape training-data pipelines need for per-source quotas.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata).orderBy(
        F.md5(_c(id_col).cast("string")), _c(id_col)
    )
    cnt = Window.partitionBy(strata)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(cnt))
        .where(F.col("__rn") <= F.ceil(F.lit(frac) * F.col("__cnt")).cast("long"))
        .drop("__rn", "__cnt")
    )


def rendezvous_shard(
    key: Column | str, n_shards: int = 8, salt: str = "rdv"
) -> Column:
    """Highest-random-weight (rendezvous) shard assignment in
    [0, n_shards): every row scores each shard with the portable md5
    family and takes the argmax.

    Unlike ``hash % n``, rendezvous hashing is *monotone*: adding a
    shard moves only ~1/(n+1) of the keys (those whose new shard wins),
    never reshuffling the survivors — the property a 100 TB pipeline
    needs to grow a sharded sink without rewriting every partition.
    Pure projection, no shuffle; ties (probability ~2^-60) break to the
    higher shard id, identically in any engine that compares (score,
    shard) pairs lexicographically.
    """
    kc = _c(key).cast("string")
    scored = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_shards) - 1)),
        lambda j: F.struct(
            F.conv(
                F.substring(
                    F.md5(F.concat(kc, F.lit("#" + salt), j.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("score"),
            j.cast("long").alias("shard"),
        ),
    )
    return F.array_max(scored)["shard"]
