"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data pipeline dedup at 100 TB (SURVEY.md §7 milestone 5).
Design rules applied throughout:

* never collect to the driver; candidate generation is always a
  shuffle-on-small-key (band hash / prefix bucket), never all-pairs;
* hash computation is JVM-side (`xxhash64` — same family as the
  reference's fasthash/xxh, hash.h:46-54); no Python in the scan;
* verification (true Jaccard) runs only on LSH candidates, whose count
  is data-dependent but tiny relative to n².
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import ngrams, normalize_text

_LOG = logging.getLogger("kerf_spark.dedup")

# one warning per (operator, cap) per process — the cap fires at plan
# build, so a bench loop re-planning the same operator hundreds of
# times would otherwise bury its own output in identical lines; the
# per-bucket drop audit lives in hot_bucket_report, not the log
_CAP_WARNED: set[tuple[str, int]] = set()

# In-bucket candidate generation is O(bucket²) per bucket: one
# degenerate bucket (empty/boilerplate docs sharing a band hash or
# prefix) can go quadratic at corpus scale.  Every blocked candidate
# generator below therefore caps buckets at `max_bucket` members (the
# smallest ids survive, so the cap is deterministic and retry/oracle-
# safe); capped-away rows simply stop producing candidates from that
# bucket.  The cap also bounds the per-bucket arrays `_bucket_pairs`
# collects, so the join-free pair explosion is memory-safe.  The cap is
# LOUD, not silent: a WARNING names the operator and threshold at plan
# build, and `hot_bucket_report` gives per-bucket drop counts for audit.
DEFAULT_MAX_BUCKET = 10_000


def _cap_buckets(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    max_bucket: int | None,
    what: str,
) -> DataFrame:
    """Keep the ``max_bucket`` smallest ``id_col`` members per bucket.

    The row_number window partitions on the same keys the downstream
    consumer needs — the in-bucket pair aggregation of
    :func:`_bucket_pairs` (HashAggregate over the window's partitioning,
    plan-pinned as zero extra Exchanges in
    tests/test_plans_props.py::test_lsh_candidates_joinfree) or a
    blocked self-join — so the guard
    costs an in-partition sort, never an extra shuffle.
    """
    if max_bucket is None:
        return df
    if (what, max_bucket) not in _CAP_WARNED:
        _CAP_WARNED.add((what, max_bucket))
        _LOG.warning(
            "%s: bucket cap %d in effect — buckets larger than this keep "
            "only their %d smallest ids as candidates; run "
            "dedup.hot_bucket_report(...) to audit dropped volume "
            "(warned once per operator)",
            what, max_bucket, max_bucket,
        )
    # ONE parsed window expr (optimization r13): the Window-builder tree
    # (partitionBy/orderBy/over/withColumn/col) costs ~10 py4j round
    # trips per cap site; the SQL form is the identical RowNumber window
    # (asc nulls-first default both ways)
    part = ", ".join(f"`{k}`" for k in keys)
    return (
        df.selectExpr(
            "*",
            f"row_number() over (partition by {part} order by `{id_col}`)"
            " as __kf_rn",
        )
        .where(f"__kf_rn <= {int(max_bucket)}")
        .drop("__kf_rn")
    )


def _bucket_pairs(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    max_bucket: int | None,
    what: str,
    payload: tuple[str, ...] = (),
) -> DataFrame:
    """All (id_a < id_b) pairs within each bucket, WITHOUT a self-join.

    Plan: cap (window over the bucket keys — the only shuffle), then
    ``groupBy(keys).collect_list(...)`` which reuses the window's
    partitioning (HashAggregate directly over the window output, no new
    Exchange), then pair explosion from the per-bucket array via two
    pipelined Generates.  vs the naive blocked self-join this computes
    the upstream pipeline (tokenize → minhash → band) ONCE instead of
    once per join side, and needs no join at all.

    Without ``payload``, emits bare ``(id_a, id_b)`` columns (the
    cheapest shape).  With ``payload`` column names, each bucket
    collects ``(id, *payload)`` structs — ordered by id, since the id
    is the leading struct field — and the output rows carry the full
    pair as ``__a``/``__b`` structs for the caller to project (e.g. the
    simhash value for a Hamming check).

    Memory bound: the cap runs before the collect, so a bucket array is
    ≤ ``max_bucket`` entries (~80 KB at the 10k default for bare ids);
    pair output streams row-at-a-time through the Generates — the
    per-bucket pair set is never materialized as one array.
    """
    capped = _cap_buckets(df, keys, id_col, max_bucket, what)
    # parsed-expr forms of the collect/explode stages (optimization r13
    # — identical expressions, a handful of py4j round trips instead of
    # dozens of Column-builder calls per construction)
    elem_sql = (
        f"`{id_col}`"
        if not payload
        else "struct(" + ", ".join(f"`{c}`" for c in (id_col, *payload)) + ")"
    )
    a_name, b_name = ("id_a", "id_b") if not payload else ("__a", "__b")
    buckets = capped.groupBy(*keys).agg(
        F.expr(f"sort_array(collect_list({elem_sql}))").alias("__m")
    )
    return buckets.selectExpr(
        f"posexplode(__m) as (__i, {a_name})", "__m"
    ).selectExpr(
        a_name,
        f"explode(slice(__m, __i + 2, size(__m) - __i - 1)) as {b_name}",
    )


def hot_bucket_report(
    df: DataFrame, keys: list[str], max_bucket: int = DEFAULT_MAX_BUCKET
) -> DataFrame:
    """(bucket keys, n, dropped) for every bucket over the cap — the
    audit companion to the loud cap in the blocked self-joins."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket)
        .withColumn("dropped", F.col("n") - F.lit(max_bucket))
    )


# ------------------------------------------------------------------ exact
def exact_dedup(
    df: DataFrame, on: str = "text", id_col: str = "doc_id", keep: str = "min"
) -> DataFrame:
    """Exact dedup by content: one survivor per distinct value of ``on``.

    hash-groupBy plan: map-side partial agg on (value) then final —
    one shuffle keyed by the (dictionary-encodable) content column.
    For very wide text, group on ``fingerprint_md5`` instead to shrink
    shuffle rows (collision-safe at 128 bits for practical corpora).
    """
    keep_fn = F.min if keep == "min" else F.max
    winners = df.groupBy(on).agg(
        keep_fn(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count")
    )
    return winners.select(id_col, on, "dup_count")


def dedup_rows(df: DataFrame, keys: list[str]) -> DataFrame:
    """dropDuplicates on keys — kerf SET/distinct semantics over rows."""
    return df.dropDuplicates(keys)


# ------------------------------------------------------------------ minhash
#: word_tokens(normalize_text(col)) as one SQL expr — lowercase,
#: collapse whitespace, trim, whitespace-split; blank text -> empty
#: array (the exact Column-form composition, value-for-value)
_TOKENIZE_SQL = (
    "CASE WHEN length(trim(lower(trim(regexp_replace({t}, '\\\\s+', ' ')))))"
    " = 0 THEN cast(array() as array<string>)"
    " ELSE split(trim(lower(trim(regexp_replace({t}, '\\\\s+', ' ')))),"
    " '\\\\s+') END"
)


def _shingle_sql(n: int, words: str = "__w") -> str:
    """Distinct word-``n``-gram strings of a token-array column as one
    SQL expr (the staged-projection twin of the old transform/sequence
    Column tree — identical values, one parse instead of ~n·4 py4j
    round trips)."""
    parts = ", ".join(
        f"element_at({words}, i)" if j == 0 else f"element_at({words}, i + {j})"
        for j in range(n)
    )
    return (
        f"array_distinct(transform(sequence(1, greatest(size({words})"
        f" - {n - 1}, 1)), i -> concat_ws(' ', {parts})))"
    )


def _shingle_hash_df(
    df: DataFrame, text_col: str, id_col: str, n: int, out: str = "sh",
    spread: bool = True,
) -> DataFrame:
    """(id, distinct shingle-hash array) — STAGED through projection
    boundaries.

    Why staged: referencing a split() expression inside a transform
    lambda re-evaluates the tokenizer per array element (no CSE across
    lambda scopes) — quadratic per row.  Each select below materializes
    its arrays once per row, so the next stage reads a column slot.
    ``spread`` repartitions ahead of the heavy projection so rows cover
    all cores even when the source is one small parquet file; pass
    ``spread=False`` when the input is already post-shuffle (e.g. the
    semi-joined candidate set in jaccard_verify) — besides the useless
    extra exchange, the partition-count probe itself (`df.rdd`) forces
    a full redundant analysis+physical-planning pass over the upstream
    plan, which measurably dominated driver time on deep pipelines.
    """
    if spread:
        ncores = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < ncores:
            df = df.repartition(ncores)
    # each stage is ONE parsed expr, not a Column-builder tree: the
    # lambda/HOF builder forms cost hundreds of py4j round trips per
    # plan construction (measured ~0.3-0.7 s of pure driver latency
    # per dedup query — optimization r13); the parsed expressions
    # evaluate identically (same deterministic string/hash functions)
    words = df.selectExpr(id_col, f"{_TOKENIZE_SQL.format(t=text_col)} as __w")
    grams = words.selectExpr(id_col, f"{_shingle_sql(n)} as __g")
    return grams.selectExpr(
        id_col,
        f"array_distinct(transform(__g, g -> xxhash64(g))) as {out}",
    )


#: XXH64 primes — decompiled from Spark's
#: org.apache.spark.sql.catalyst.expressions.XXH64 (javap -c of the
#: catalyst jar); identical to the published xxHash spec constants.
_XXH_P1 = 11400714785074694791
_XXH_P2 = 14029467366897019727
_XXH_P3 = 1609587929392839161
_XXH_P4 = 9650029242287828579
_XXH_P5 = 2870177450012600261


def minhash_arrow(
    shdf: DataFrame,
    id_col: str,
    num_hashes: int,
    sh_col: str = "sh",
    out: str = "minhash",
) -> DataFrame:
    """The k-seed xxhash64 MinHash projection as ONE Arrow-batched NumPy
    kernel — the vectorized twin of the ``transform(seeds, i ->
    array_min(transform(sh, h -> xxhash64(h, i))))`` expression, where
    the interpreted higher-order-function passes (k rescans of every
    shingle array, no codegen inside lambda scopes) dominated the
    minhash stage (guide §4.2: hand whole batches to vectorized native
    code).

    BITWISE identical to the expression form by construction: Spark's
    ``xxhash64(h: bigint, i: int)`` is ``XXH64.hashInt(i,
    XXH64.hashLong(h, 42))`` (null children leave the running hash
    untouched), reproduced here in wrap-around uint64 NumPy arithmetic
    with the decompiled constants and verified value-for-value against
    the SQL function over the int64 domain extremes
    (tests/test_operators.py); the per-seed minimum compares SIGNED
    int64 exactly like ``array_min`` over bigints; NULL and EMPTY
    shingle arrays both yield an all-NULL signature — the outer
    ``transform`` runs over the (never-null) seeds array, so a NULL
    ``sh`` nulls each ELEMENT (``array_min(NULL)``), not the row.

    Narrow zero-shuffle projection, same as the expression it replaces.
    """
    import numpy as np
    import pyarrow as pa

    U = np.uint64
    P1, P2, P3 = U(_XXH_P1), U(_XXH_P2), U(_XXH_P3)
    P4, P5 = U(_XXH_P4), U(_XXH_P5)

    def _rotl(x, r):
        return (x << U(r)) | (x >> U(64 - r))

    def _fmix(h):
        h = h ^ (h >> U(33))
        h = h * P2
        h = h ^ (h >> U(29))
        h = h * P3
        return h ^ (h >> U(32))

    def _hash_long(v, seed):  # XXH64.hashLong(v, seed), vectorized
        h = seed + P5 + U(8)
        h = h ^ (_rotl(v * P2, 31) * P1)
        h = _rotl(h, 27) * P1 + P4
        return _fmix(h)

    def _hash_int(i, seed):  # XXH64.hashInt(i, seed), vector seed
        h = seed + P5 + U(4)
        h = h ^ (U(i & 0xFFFFFFFF) * P1)
        h = _rotl(h, 23) * P2 + P3
        return _fmix(h)

    k = int(num_hashes)
    id_field = shdf.schema[id_col]
    schema_ddl = (
        f"`{id_col}` {id_field.dataType.simpleString()}, "
        f"`{out}` array<bigint>"
    )

    def kernel(batches):
        import warnings

        with np.errstate(over="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            for b in batches:
                ids, lst = b.column(0), b.column(1)
                n = len(lst)
                if n == 0:
                    continue
                lens = np.asarray(
                    lst.value_lengths().fill_null(0), dtype=np.int64
                )
                vals = lst.flatten()
                if lst.null_count or vals.null_count or (lens == 0).any():
                    mh = _minhash_rare(
                        np, pa, lst, lens, vals, k,
                        _hash_long, _hash_int, U,
                    )
                else:
                    u = np.asarray(vals).view(np.uint64)
                    h1 = _hash_long(u, U(42))
                    starts = np.zeros(n, dtype=np.int64)
                    np.cumsum(lens[:-1], out=starts[1:])
                    res = np.empty((n, k), dtype=np.int64)
                    for i in range(k):
                        full = _hash_int(i, h1).view(np.int64)
                        res[:, i] = np.minimum.reduceat(full, starts)
                    offs = pa.array(
                        np.arange(0, (n + 1) * k, k, dtype=np.int32),
                        type=pa.int32(),
                    )
                    mh = pa.ListArray.from_arrays(
                        offs, pa.array(res.reshape(-1), type=pa.int64())
                    )
                yield pa.RecordBatch.from_arrays(
                    [ids, mh], names=[id_col, out]
                )

    return shdf.select(id_col, sh_col).mapInArrow(kernel, schema_ddl)


def _minhash_rare(np, pa, lst, lens, vals, k, _hash_long, _hash_int, U):
    """Null/empty-aware minhash for the rare batch shapes the fast
    reduceat path cannot express (NULL shingle arrays, empty arrays,
    NULL elements) — per-row, Python-object output, same formulas:
    a NULL element contributes ``hashInt(i, 42)`` (the null child
    leaves the running hash at the seed); NULL and empty arrays both
    yield ``[NULL]*k`` (the outer transform iterates the seeds array,
    so ``array_min`` sees NULL / an empty array per element)."""
    n = len(lst)
    row_null = np.asarray(lst.is_null())
    elem_null = (
        np.asarray(vals.is_null()) if vals.null_count else None
    )
    u = np.asarray(vals.fill_null(0)).view(np.uint64)
    h1 = _hash_long(u, U(42))
    if elem_null is not None:
        h1[elem_null] = U(42)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    out_rows: list = []
    for r in range(n):
        if row_null[r] or lens[r] == 0:
            out_rows.append([None] * k)
        else:
            seg = h1[starts[r] : starts[r] + lens[r]]
            out_rows.append(
                [
                    int(_hash_int(i, seg).view(np.int64).min())
                    for i in range(k)
                ]
            )
    return pa.array(out_rows, type=pa.list_(pa.int64()))


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    use_arrow: bool = True,
) -> DataFrame:
    """MinHash signatures, zero-shuffle.

    Universal-hash family over one base hash: h_i(x) = xxhash64(x, i)
    via seeding each permutation with a distinct literal — standard
    practice (equivalent to k independent hash functions for MinHash's
    purposes).  The k-seed min stage runs as the :func:`minhash_arrow`
    NumPy kernel (bit-identical by construction — see its docstring);
    ``use_arrow=False`` keeps the pure-expression twin (k array_min
    rescans of the shingle array — the equality oracle for the kernel,
    and the measured-slower fallback: interpreted HOF lambdas evaluate
    per element with no codegen).  Measured note: the single-fold
    running-minimum expression shape (see minhash_dedup_portable) is
    SLOWER here than the k-rescan form — xxhash64 is so cheap that the
    fold's per-shingle accumulator-array allocation dominates.
    """
    shdf = _shingle_hash_df(df, text_col, id_col, shingle_n)
    if use_arrow:
        return minhash_arrow(shdf, id_col, num_hashes)

    # ONE parsed expr over a literal seed array (optimization r13 —
    # previously one nested HOF Column tree, itself an improvement on
    # num_hashes parallel subtrees): the values are bit-identical
    # (int seeds, same xxhash64 inputs) and the whole projection is a
    # single py4j round trip
    seeds = ", ".join(str(i) for i in range(num_hashes))
    return shdf.selectExpr(
        id_col,
        f"transform(cast(array({seeds}) as array<int>),"
        " i -> array_min(transform(sh, h -> xxhash64(h, i))))"
        " as minhash",
    )


def lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 4,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """LSH banding: docs sharing any band-hash become candidate pairs.

    Plan: explode to (band, band_hash) — bands× row fan-out of a tiny
    projection — then in-bucket pair explosion via :func:`_bucket_pairs`
    (ONE shuffle keyed on the band hash, no self-join, signatures
    computed once).  The shuffle key is uniform by construction, so no
    skew; pair explosion is bounded by bucket sizes and the loud
    ``max_bucket`` cap (see module header).
    Returns distinct (id_a < id_b) candidate pairs.
    """
    # ONE parsed expr for the band array (optimization r13): the nested
    # F.xxhash64/element_at builders cost ~bands×rows_per_band py4j
    # round trips per construction; the SQL form parses to the identical
    # XxHash64(seed 42) over the identical element_at children
    band_elems = ", ".join(
        "xxhash64("
        + ", ".join(
            f"element_at(minhash, {i * rows_per_band + r + 1})"
            for r in range(rows_per_band)
        )
        + ")"
        for i in range(bands)
    )
    b = sigs.selectExpr(
        f"`{id_col}`",
        f"posexplode(array({band_elems})) as (band, band_hash)",
    )
    return _bucket_pairs(
        b, ["band", "band_hash"], id_col, max_bucket, "lsh_candidates"
    ).distinct()


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard on candidate pairs only.

    Joins shingle-hash arrays onto both pair sides (two broadcast-or-
    shuffle hash joins on ids) and computes |∩|/|∪| with array
    intrinsics.  Returns pairs with ``jaccard >= threshold``.

    Scale note: shingles are computed only for docs that actually appear
    in a candidate pair (semi-join first) — after LSH banding the
    candidate set is orders of magnitude smaller than the corpus, so the
    expensive tokenize/shingle pass must not rerun over everything.
    """
    cand_ids = (
        pairs.selectExpr(f"id_a as `{id_col}`")
        .unionByName(pairs.selectExpr(f"id_b as `{id_col}`"))
        .distinct()
    )
    needed = df.join(cand_ids, id_col, "left_semi")
    # spread=False: the semi-join output is already post-shuffle, and
    # probing its partition count would re-plan the whole LSH pipeline
    sh = _shingle_hash_df(needed, text_col, id_col, shingle_n, spread=False)
    # selectExpr renames + ONE parsed jaccard expr (optimization r13):
    # withColumnRenamed chains and the size/intersect Column tree cost
    # dozens of py4j round trips; the parsed forms analyze to the
    # identical expressions (Spark `/` is double division both ways)
    j = (
        pairs.join(sh.selectExpr(f"`{id_col}` as id_a", "sh as sh_a"), "id_a")
        .join(sh.selectExpr(f"`{id_col}` as id_b", "sh as sh_b"), "id_b")
        .selectExpr(
            "id_a",
            "id_b",
            "(size(array_intersect(sh_a, sh_b))"
            " / size(array_union(sh_a, sh_b))) as jaccard",
        )
    )
    return j.where(F.col("jaccard") >= threshold)


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """End-to-end near-dup detection: shingle → minhash → LSH bands →
    exact-Jaccard verify.  Returns confirmed near-dup pairs.
    """
    sigs = minhash_signature(df, text_col, id_col, num_hashes, shingle_n)
    cands = lsh_candidates(sigs, id_col, bands, num_hashes // bands)
    # verify consumes candidates twice (semi-join id set + pair join);
    # persist the tiny id-pair set so the LSH pipeline runs once — the
    # same stage boundary you'd checkpoint in a 100 TB run
    cands = cands.persist()
    return jaccard_verify(df, cands, text_col, id_col, shingle_n, threshold)


def dedup_survivors(df: DataFrame, dup_pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop the higher id of each confirmed pair (union-find-lite: since
    pairs carry id_a < id_b, dropping every id_b keeps exactly one doc
    per connected component's minimum...n.b. per-edge, which
    over-deletes only within already-duplicate clusters — the standard
    cheap policy)."""
    losers = dup_pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ------------------------------------------------------- portable minhash
def portable_band_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Shared portable LSH stage: (banded (id, band, key), shingles).

    Used by :func:`minhash_dedup_portable` and by the hot-bucket audit
    query — the band keys are md5-family so any SQL engine re-derives
    them bit-for-bit.
    """
    rows_per_band = num_hashes // bands
    ncores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < ncores:
        df = df.repartition(ncores)
    # staged tokens -> shingles (see _shingle_hash_df: unstaged ngrams()
    # re-evaluates the tokenizer per shingle); every stage is ONE
    # parsed expr — the Column/lambda builder forms cost hundreds of
    # py4j round trips per plan construction (optimization r13)
    words = df.selectExpr(
        id_col, f"{_TOKENIZE_SQL.format(t=text_col)} as __w"
    )
    sh = words.selectExpr(id_col, f"{_shingle_sql(shingle_n)} as sh")

    # single fold pass, as in minhash_signature: running-minimum array
    # accumulator against the portable "#i" suffix family
    sufs = ", ".join(f"'#{i}'" for i in range(num_hashes))
    sig = sh.selectExpr(
        id_col,
        f"aggregate(sh,"
        f" array_repeat(cast({2**63 - 1} as bigint), {num_hashes}),"
        f" (acc, s) -> zip_with(acc, array({sufs}),"
        f" (a, suf) -> least(a, cast(conv(substring(md5(concat(s, suf)),"
        f" 1, 15), 16, 10) as bigint)))) as sig",
    )
    band_elems = ", ".join(
        "concat_ws(',', "
        + ", ".join(
            f"element_at(sig, {b * rows_per_band + r + 1})"
            for r in range(rows_per_band)
        )
        + ")"
        for b in range(bands)
    )
    banded = sig.selectExpr(
        id_col,
        f"posexplode(array({band_elems})) as (band, key)",
    )
    return banded, sh


def minhash_dedup_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with an engine-portable hash family.

    Same pipeline as :func:`minhash_dedup` but the k hash functions are
    ``int(md5(shingle + '#' + i)[:15 hex], 16)`` (60 uniform bits) over
    *string* shingles — computable bit-for-bit in any SQL engine, so the
    whole shingle→minhash→banding→verify pipeline is oracle-checkable
    (the xxhash64 variant is the faster production default).  Plan
    shape is identical: staged projections, join-free in-bucket pair
    explosion (:func:`_bucket_pairs`), exact Jaccard verify on candidate
    docs only.
    """
    banded, sh = portable_band_keys(
        df, text_col, id_col, num_hashes, bands, shingle_n
    )
    cand = (
        _bucket_pairs(
            banded, ["band", "key"], id_col, max_bucket, "minhash_dedup_portable"
        )
        .distinct()
        .persist()
    )
    # parsed-expr renames + jaccard (optimization r13 — identical
    # round(size/size, 9) expression, single parse per projection)
    x = sh.selectExpr(f"`{id_col}` as id_a", "sh as sh_a")
    y = sh.selectExpr(f"`{id_col}` as id_b", "sh as sh_b")
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .selectExpr(
            "id_a",
            "id_b",
            "round(size(array_intersect(sh_a, sh_b))"
            " / size(array_union(sh_a, sh_b)), 9) as jaccard",
        )
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------ components
def dup_clusters(
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
    check_every: int = 3,
) -> DataFrame:
    """Connected components over near-dup pairs: (id, cluster) where
    cluster is the minimum doc id reachable through dup edges — the
    correct grouping for "keep one doc per duplicate cluster"
    (``dedup_survivors`` is the cheap per-edge approximation).

    Iterative min-label propagation: each round joins labels across
    edges and keeps the per-node minimum; converges in O(graph diameter)
    rounds (real dup clusters are shallow — pairwise-similar docs link
    almost directly).  Each round is one shuffle join + one groupBy on
    the *candidate-pair* node set, which is tiny relative to the corpus.

    Scale discipline: the convergence probe is an aggregate-only action,
    and it fires only every ``check_every`` rounds — a driver action per
    round would re-walk lineage and serialize the loop on job latency.
    ``localCheckpoint`` at each probe truncates the iterative lineage so
    plan size stays O(check_every), not O(rounds) (the executor-local
    flavor: no DFS round-trip; recompute-on-loss is acceptable for a
    deterministic label table).  Extra rounds run between probes are
    no-ops on converged labels (min of equals), so results are exact.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    # LAZY checkpoints throughout (optimization r14): eager=True ran a
    # dedicated materialization JOB per probe (plus one before the
    # loop); lazy materializes inside the probe's own count action —
    # same lineage truncation, one job per probe instead of two
    labels = (
        edges.select(F.col("src").alias(id_col))
        .distinct()
        .withColumn("cluster", F.col(id_col))
        .localCheckpoint(eager=False)
    )
    for it in range(1, max_iter + 1):
        # labels seen from neighbors, then min with own label
        via_edges = (
            edges.join(labels, edges.dst == F.col(id_col))
            .select(F.col("src").alias(id_col), "cluster")
        )
        new_labels = (
            labels.unionByName(via_edges)
            .groupBy(id_col)
            .agg(F.min("cluster").alias("cluster"))
        )
        if it % check_every == 0 or it == max_iter:
            new_labels = new_labels.localCheckpoint(eager=False)
            changed = (
                new_labels.join(labels.withColumnRenamed("cluster", "old"), id_col)
                .where(F.col("cluster") != F.col("old"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    else:
        # ran out of rounds with the final probe still reporting change:
        # the labels are PARTIAL.  Returning them silently would let a
        # chain-shaped cluster (diameter > max_iter) split across
        # downstream consumers that assume one label per component —
        # e.g. leakage_safe_split's no-straddle guarantee.  Fail loud.
        edges.unpersist()
        raise ValueError(
            f"dup_clusters: min-label propagation did not converge in "
            f"{max_iter} rounds (a dup-chain longer than max_iter exists); "
            f"raise max_iter — rounds are cheap joins over the candidate "
            f"node set, and partial labels are silently wrong"
        )
    edges.unpersist()
    return labels


# ------------------------------------------------------------------ simhash
def _simhash_expr(words: Column, nbits: int) -> Column:
    """Single-pass SimHash: ONE fold over the word-hash array
    accumulates all ``nbits`` bit-votes as an array (zip_with against a
    bit-mask literal), then one zip_with folds votes back into the
    packed signature.  The previous shape — one aggregate expression
    per bit — rescanned the array ``nbits`` times per row.

    Masks are two's-complement longs (bit 63's mask is the negative
    min-long), so ``h & mask != 0`` tests the bit and ``OR mask`` sets
    it for the sign bit too.

    NULL text (hence a NULL word-hash array) yields simhash 0, matching
    the per-bit-aggregate shape this fold replaced: ``aggregate`` over
    NULL propagates NULL, so the whole expression coalesces at the end
    — without it, NULL-text duplicates would silently vanish from
    near-dup detection (hamming NULL fails every filter).
    """
    masks = F.lit(
        [(1 << b) if b < 63 else -(2**63) for b in range(nbits)]
    ).cast("array<bigint>")
    votes = F.aggregate(
        words,
        F.array_repeat(F.lit(0).cast("long"), nbits),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(b),
    )
    return F.coalesce(packed, F.lit(0).cast("long"))


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over word hashes, pure Column expressions.

    For each bit b: sum(sign of bit b over token hashes) — positive
    majority sets the bit.  One fold pass per row (see
    :func:`_simhash_expr`); columnar and shuffle-free.
    """
    ncores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < ncores:
        df = df.repartition(ncores)
    staged = df.select(
        F.col(id_col),
        F.transform(
            F.array_distinct(F.split(normalize_text(text_col), " ")),
            lambda w: F.xxhash64(w),
        ).alias("__wh"),
    )
    return staged.select(
        F.col(id_col), _simhash_expr(F.col("__wh"), 64).alias("simhash")
    )


def simhash_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash with the engine-portable md5 hash family (see
    :func:`minhash_dedup_portable` for the rationale) — same bit-vote
    construction as :func:`simhash64`, oracle-verifiable bit-for-bit.
    """
    ncores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < ncores:
        df = df.repartition(ncores)
    staged = df.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                F.split(normalize_text(text_col), " "),
                lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast(
                    "long"
                ),
            )
        ).alias("__wh"),
    )
    return staged.select(
        F.col(id_col), _simhash_expr(F.col("__wh"), 60).alias("simhash")
    )


def hamming64(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    sims: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    prefix_bits: int = 16,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate pairs by identical high ``prefix_bits`` of simhash
    (block key), verified by full Hamming distance.  Blocking keeps the
    candidate set keyed and bounded, same scaling argument as LSH bands;
    degenerate blocks are capped loudly at ``max_bucket``.

    Join-free via :func:`_bucket_pairs` with the simhash carried as
    pair payload: cap → collect (id, simhash) structs per block
    (shuffle-partitioning reused, ≤ ``max_bucket`` structs per array) →
    pipelined pair explosion → Hamming filter.  One shuffle, no join,
    the simhash computation runs once.
    """
    keyed = sims.withColumn("blk", F.shiftright("simhash", 64 - prefix_bits))
    pairs = _bucket_pairs(
        keyed, ["blk"], id_col, max_bucket, "simhash_near_pairs",
        payload=("simhash",),
    )
    return (
        pairs.select(
            F.col(f"__a.{id_col}").alias("id_a"),
            F.col(f"__b.{id_col}").alias("id_b"),
            hamming64(F.col("__a.simhash"), F.col("__b.simhash")).alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------------------ jaccard by prefix bucket
def _prefix_shingled(
    df: DataFrame,
    text_col: str,
    id_col: str,
    prefix_len: int,
    shingle_n: int,
    max_bucket: int | None,
    opname: str,
) -> DataFrame:
    """Shared staging for the prefix-blocked shingle family
    (:func:`prefix_jaccard_pairs`, :func:`containment_pairs`):
    normalize, cut the blocking prefix, tokenize, build distinct
    word-``shingle_n``-grams as STRINGS (not hashes — an ANSI-SQL
    oracle reproduces them bit-for-bit), and cap hot prefix buckets.
    Returns (id_col, pfx, sh).  Tokens are staged through projection
    boundaries (same CSE trap as _shingle_hash_df: an unstaged
    tokenizer re-evaluates per element)."""
    from .text import word_tokens

    n = shingle_n
    ncores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < ncores:
        df = df.repartition(ncores)
    staged = df.select(
        F.col(id_col), normalize_text(text_col).alias("__t")
    ).select(
        F.col(id_col),
        F.substring("__t", 1, prefix_len).alias("pfx"),
        word_tokens(F.col("__t")).alias("__w"),
    )
    k = F.greatest(F.size("__w") - (n - 1), F.lit(1))
    sh = staged.select(
        F.col(id_col),
        "pfx",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(F.col("__w"), i + j) for j in range(n)]
                ),
            )
        ).alias("sh"),
    )
    return _cap_buckets(sh, ["pfx"], id_col, max_bucket, opname)


def _prefix_block_join(sh: DataFrame, id_col: str):
    """Self-join the staged shingle frame on the blocking prefix with
    the canonical id_a < id_b dedup of the pair space."""
    a, b = sh.alias("a"), sh.alias("b")
    return a.join(
        b,
        (F.col("a.pfx") == F.col("b.pfx"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 32,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """n-gram Jaccard near-dup with *prefix blocking* (SQL-oracle-able):
    docs sharing the first ``prefix_len`` normalized chars are
    candidates; exact word-shingle Jaccard verifies.  This variant uses
    string shingles (not hashes) so an ANSI-SQL oracle can reproduce it
    bit-for-bit.
    """
    sh = _prefix_shingled(
        df, text_col, id_col, prefix_len, shingle_n, max_bucket,
        "prefix_jaccard_pairs",
    )
    return (
        _prefix_block_join(sh, id_col)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 32,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """ASYMMETRIC near-dup: shingle containment C(A->B) = |A∩B| / |A|.

    Jaccard misses the contained-document case — a paragraph pasted
    into a much longer page scores |A∩B|/|A∪B| ≈ |A|/|B| ≈ 0 even
    though A is entirely inside B.  Containment scores it ~1 in the
    A->B direction.  Returns both directions plus their max; pairs
    with max containment >= ``threshold`` are containment duplicates.
    Same prefix blocking, staging, and hot-bucket caps as
    :func:`prefix_jaccard_pairs` (string shingles — SQL-oracle-able
    bit-for-bit); the blocking means only pairs sharing a normalized
    prefix are candidates — the right recall profile for the
    boilerplate-prefix duplication it targets.
    """
    sh = _prefix_shingled(
        df, text_col, id_col, prefix_len, shingle_n, max_bucket,
        "containment_pairs",
    )
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    c_ab = inter / F.size("a.sh")
    c_ba = inter / F.size("b.sh")
    return (
        _prefix_block_join(sh, id_col)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(c_ab, 9).alias("c_ab"),
            F.round(c_ba, 9).alias("c_ba"),
            F.round(F.greatest(c_ab, c_ba), 9).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


# ------------------------------------------------------ substring dedup
def substring_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Exact substring (token-window) dedup signal — the "repeated long
    span" statistic behind exact-substring training-data dedup (Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models
    Better"): per doc, how many of its ``window``-token spans (sampled
    every ``stride`` tokens) also occur verbatim in at least one other
    doc.

    Returns (id, n_windows, n_dup_windows, dup_frac) for every doc with
    at least ``window`` tokens.  Span identity is md5 of the
    space-joined token window — engine-portable, so the whole statistic
    is SQL-oracle-checkable.

    Scale shape: three key-partitioned exchanges and NO pair explosion
    anywhere — (hash, id) pre-aggregation collapses within-doc repeats,
    a count-over-hash window marks cross-doc spans (a ubiquitous
    boilerplate span costs |docs containing it| rows, never |docs|²),
    and a final per-doc aggregation. The shuffle key is an md5 hash:
    uniform by construction.
    """
    from .text import normalize_text, word_tokens

    ncores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < ncores:
        df = df.repartition(ncores)
    staged = df.select(
        F.col(id_col), word_tokens(normalize_text(text_col)).alias("__w")
    ).where(F.size("__w") >= window)
    k = (F.size("__w") - window) / stride  # floor via int cast below
    wins = staged.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), k.cast("int")),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("__w", i * stride + 1, window))
                ),
            )
        ).alias("__h"),
    )
    per_doc_h = wins.groupBy("__h", id_col).agg(
        F.count(F.lit(1)).alias("__occ")
    )
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("__h"))
    marked = per_doc_h.withColumn("__nd", n_docs)
    return (
        marked.groupBy(id_col)
        .agg(
            F.sum("__occ").alias("n_windows"),
            F.sum(F.when(F.col("__nd") >= 2, F.col("__occ")).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
        .select(
            id_col,
            "n_windows",
            "n_dup_windows",
            F.round(
                F.col("n_dup_windows") / F.col("n_windows"), 9
            ).alias("dup_frac"),
        )
    )


# ------------------------------------------------------------------ edit distance by prefix bucket
def levenshtein_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 32,
    cmp_len: int = 200,
    max_dist: int = 30,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Edit-distance near-dup with prefix blocking: docs sharing the
    first ``prefix_len`` normalized chars are candidates; Levenshtein
    over the first ``cmp_len`` chars verifies (unit costs — the ANSI
    definition both Spark and standard SQL engines implement).

    Same scale shape as the other blocked self-joins: candidates come
    only from shared-prefix buckets (hot buckets capped loudly via
    ``max_bucket``), and the O(cmp_len²) distance kernel runs JVM-side
    on candidates only — never all pairs, never in Python.
    """
    from .text import normalize_text

    staged = df.select(
        F.col(id_col),
        F.substring(normalize_text(text_col), 1, cmp_len).alias("__t"),
    ).select(
        F.col(id_col),
        F.substring("__t", 1, prefix_len).alias("pfx"),
        F.col("__t"),
    )
    staged = _cap_buckets(staged, ["pfx"], id_col, max_bucket, "levenshtein_pairs")
    a, b = staged.alias("a"), staged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.pfx") == F.col("b.pfx"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.levenshtein("a.__t", "b.__t").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )


# ------------------------------------------------- incremental dedup
def incremental_neardup(
    batch: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    index_bands: DataFrame | None = None,
    index_shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-dup detection of a NEW batch against an EXISTING index —
    the continuous-ingestion shape: dedupe today's crawl against the
    historical corpus without ever re-pairing the history with itself.

    Same engine-portable band-key family as
    :func:`minhash_dedup_portable`, but the candidate stage is an
    equi-join of batch band keys against index band keys — never a
    self-join and never index×index, so work scales with
    |batch| × collision-rate, not |index|².  At 100 TB pass
    ``index_bands``/``index_shingles`` — the stored tables from a
    one-time ``portable_band_keys(index)`` run, saved bucketed by
    (band, key) via ``Workspace.save`` — so each increment pays one
    band-key build over the BATCH plus one bucketed join, never a
    re-hash of the history (without them, ``index`` is re-banded per
    call, which is only acceptable at exploratory scale).  Hot buckets
    are capped loudly on BOTH sides (``_cap_buckets`` discipline — a
    boilerplate-heavy batch would otherwise multiply uncapped against
    capped index buckets) and exact-Jaccard verification touches index
    shingles only for docs that actually appear in a candidate pair
    (semi-join first).

    Returns verified ``(batch_id, index_id, jaccard)`` pairs.
    """
    bb, bsh = portable_band_keys(
        batch, text_col, id_col, num_hashes, bands, shingle_n
    )
    if index_bands is not None and index_shingles is not None:
        ib, ish = index_bands, index_shingles
    else:
        ib, ish = portable_band_keys(
            index, text_col, id_col, num_hashes, bands, shingle_n
        )
    ib = _cap_buckets(ib, ["band", "key"], id_col, max_bucket, "incremental_neardup")
    bb = _cap_buckets(bb, ["band", "key"], id_col, max_bucket, "incremental_neardup")
    # parsed-expr renames + jaccard throughout (optimization r13 —
    # identical expressions, single parse per projection)
    cand = (
        bb.selectExpr(f"`{id_col}` as batch_id", "band", "key")
        .join(ib.selectExpr(f"`{id_col}` as index_id", "band", "key"),
              ["band", "key"])
        .select("batch_id", "index_id")
        .distinct()
        .persist()
    )
    ish_needed = ish.join(
        cand.selectExpr(f"index_id as `{id_col}`").distinct(),
        id_col,
        "left_semi",
    )
    x = bsh.selectExpr(f"`{id_col}` as batch_id", "sh as sh_a")
    y = ish_needed.selectExpr(f"`{id_col}` as index_id", "sh as sh_b")
    return (
        cand.join(x, "batch_id")
        .join(y, "index_id")
        .selectExpr(
            "batch_id",
            "index_id",
            "round(size(array_intersect(sh_a, sh_b))"
            " / size(array_union(sh_a, sh_b)), 9) as jaccard",
        )
        .where(F.col("jaccard") >= threshold)
    )


def incremental_new_docs(
    batch: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    index_bands: DataFrame | None = None,
    index_shingles: DataFrame | None = None,
    index_fingerprints: DataFrame | None = None,
) -> DataFrame:
    """The rows an incremental ingest actually admits: batch docs that
    are neither exact duplicates (normalized-content fingerprint
    anti-join) nor verified near-duplicates of the index.  Two
    anti-joins over the batch.  At production scale pass the stored
    index tables (``index_bands``/``index_shingles`` from
    ``portable_band_keys``, ``index_fingerprints`` as a one-column
    fingerprint frame) so the history is only touched through its
    precomputed, bucketed artifacts."""
    from .text import fingerprint_md5

    fp_batch = batch.select(F.col(id_col), fingerprint_md5(text_col).alias("__fp"))
    if index_fingerprints is not None:
        fp_index = index_fingerprints.select(
            F.col(index_fingerprints.columns[0]).alias("__fp")
        ).distinct()
    else:
        fp_index = index.select(fingerprint_md5(text_col).alias("__fp")).distinct()
    exact_new = fp_batch.join(fp_index, "__fp", "left_anti").select(id_col)
    near = incremental_neardup(
        batch, index, text_col, id_col, num_hashes, bands, shingle_n,
        threshold, DEFAULT_MAX_BUCKET, index_bands, index_shingles,
    )
    near_ids = near.select(F.col("batch_id").alias(id_col)).distinct()
    return (
        batch.join(exact_new, id_col, "left_semi")
        .join(near_ids, id_col, "left_anti")
    )


def cluster_best_survivors(
    df: DataFrame,
    clusters: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware dedup survivorship: keep the HIGHEST-``quality_col``
    document from each duplicate cluster (ties -> smallest id), not the
    arbitrary min-id.  Real pipelines keep the longest / best-scored
    near-duplicate — min-id throws away the better copy half the time.

    ``clusters`` is :func:`dup_clusters` output (id, cluster); documents
    absent from it are singletons and survive unconditionally (left
    join, cluster defaults to own id).  Two keyed aggregates + one
    same-key join over the corpus — no window, no sort, scales like
    exact dedup; the tie-break is ``min(id)`` computed directly, so any
    orderable id type works (a negated-id struct trick would break on
    string ids).  Returns (cluster, keep_id, quality, cluster_size).
    """
    lab = clusters.select(
        F.col(id_col).alias("__id"), F.col("cluster").alias("__cl")
    )
    tagged = df.select(
        F.col(id_col).alias("__id"), F.col(quality_col).alias("__q")
    ).join(lab, "__id", "left").select(
        "__id", "__q", F.coalesce("__cl", F.col("__id")).alias("cluster")
    )
    best = tagged.groupBy("cluster").agg(
        F.max("__q").alias("quality"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return (
        tagged.join(best, "cluster")
        .where(F.col("__q").eqNullSafe(F.col("quality")))
        .groupBy("cluster", "quality", "cluster_size")
        .agg(F.min("__id").alias("keep_id"))
        .select("cluster", "keep_id", "quality", "cluster_size")
    )


# --------------------------------------------------------- ppjoin (exact)
def _ppjoin_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    threshold: float,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Shared PPJoin prefix stage: ``(sh, pref)`` where ``sh`` is the
    persisted per-doc distinct word-shingle arrays and ``pref`` is the
    exploded rarity-ordered prefix rows ``(id, __sz, s)`` — each
    document's ``p = |s| − ceil(τ·|s|) + 1`` globally-rarest shingles
    (document frequency asc, shingle asc: a portable total order, since
    shingles are distinct within a doc)."""
    from .text import normalize_text, word_tokens

    n = shingle_n
    ncores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < ncores:
        df = df.repartition(ncores)
    staged = df.select(
        F.col(id_col), normalize_text(text_col).alias("__t")
    ).select(F.col(id_col), word_tokens(F.col("__t")).alias("__w"))
    k = F.greatest(F.size("__w") - (n - 1), F.lit(1))
    sh = staged.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(F.col("__w"), i + j) for j in range(n)]
                ),
            )
        ).alias("sh"),
    )
    # persist the shingle stage: it feeds FOUR consumers (df counts,
    # rarity ordering, and both verify sides), and explode over the
    # raw expression collapses the staged projections — re-tokenizing
    # per element (measured 25 s vs 0.4 s at sf0.1).  The same stage
    # boundary you'd checkpoint in a 100 TB run.  The audit path
    # (ppjoin_prefix_buckets) passes persist=False — a session-lived
    # .persist() per audit call would pin cache forever — but its
    # ``ex`` still feeds TWO consumers (the df counts and the rarity
    # join), so a LAZY localCheckpoint materializes the shingle stage
    # once inside the first action and frees with the DataFrame
    # (optimization r14: audit execute 3.1 → 1.5 s at sf0.01).
    if persist:
        sh = sh.persist()
    else:
        sh = sh.localCheckpoint(eager=False)
    ex = sh.select(F.col(id_col), F.explode("sh").alias("s"))
    freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
    # per-doc shingles sorted by (global df asc, shingle asc): struct
    # sort gives the portable total order both engines agree on
    ordered = (
        ex.join(freq, "s")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("s")))
            ).alias("__os"),
        )
    )
    size = F.size("__os")
    p = (size - F.ceil(F.lit(float(threshold)) * size) + 1).cast("int")
    pref = ordered.select(
        F.col(id_col),
        size.alias("__sz"),
        F.transform(F.slice("__os", 1, p), lambda st: st["s"]).alias("__p"),
    ).select(
        F.col(id_col), "__sz", F.explode("__p").alias("s")
    )
    return sh, pref


def ppjoin_prefix_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Audit companion to :func:`ppjoin_pairs`: the size of every
    prefix-shingle join bucket, ``(s, bucket_n)`` — the exact join-key
    fan-in the candidate stage would see.  Use it to decide whether an
    opt-in ``max_bucket`` cap is safe (every capped bucket voids the
    zero-false-negative guarantee for pairs that only meet in that
    bucket) and to quantify what a cap would drop
    (``sum(bucket_n − cap)`` over buckets above the cap) — the
    ``hot_bucket_report`` discipline applied to the exact join."""
    _sh, pref = _ppjoin_prefix(
        df, text_col, id_col, shingle_n, threshold, persist=False
    )
    return pref.groupBy("s").agg(F.count(F.lit(1)).alias("bucket_n"))


def ppjoin_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    PPJoin/AllPairs family — Xiao et al. 2008, Bayardo et al. 2007,
    public papers).  With the default ``max_bucket=None`` every pair
    with word-shingle Jaccard ≥ τ is returned, ZERO false negatives by
    theorem — unlike the LSH and char-prefix-blocked near-dup paths,
    which trade recall for speed heuristically.  Passing a
    ``max_bucket`` cap is strictly OPT-IN and voids that guarantee for
    any pair whose only shared prefix shingle lands in a capped bucket;
    audit first with :func:`ppjoin_prefix_buckets`.

    The pruning: order each document's distinct shingles by GLOBAL
    rarity (document frequency asc, shingle asc — ties portable), keep
    only the first ``p = |s| − ceil(τ·|s|) + 1`` as its *prefix*.  Two
    sets with ``J ≥ τ`` must overlap in ≥ ``τ/(1+τ)·(|a|+|b|)``
    elements, which forces at least one shared PREFIX element — so an
    equi-join on prefix shingles finds every qualifying pair.  A length
    filter (``min ≥ τ·max``, also implied by ``J ≥ τ``) prunes further
    before the exact verify.

    Scale shape: one shuffle for shingle document-frequencies, one for
    the per-doc sort, an equi-join keyed on RARE-by-construction
    shingles, then exact verification on candidate pairs only.  The
    DuckDB oracle is the brute-force DEFINITION over all pairs, so a
    green row proves the pruning loses nothing.

    Honest caveat: the pruning power IS the corpus's shingle rarity.
    On natural text (Zipf tails) each document's rarest shingles are
    near-unique and candidates stay near-linear; on a LOW-ENTROPY
    corpus (tiny vocabulary — the synthetic fixture is adversarial
    here) even the rarest shingles have df growing linearly with the
    corpus, so candidates grow superlinearly: measured 3.3% of the
    pair space at sf0.1.  For corpora like that, either opt into
    ``max_bucket`` (exactness degrades, loudly) or use the MinHash-LSH
    paths (recall-bounded, density-immune); this operator stays the
    exactness escape hatch.
    """
    sh, pref = _ppjoin_prefix(df, text_col, id_col, shingle_n, threshold)
    pref = _cap_buckets(
        pref, ["s"], id_col, max_bucket, "ppjoin_pairs"
    ).persist()  # self-joined: run the prefix pipeline once
    a, b = pref.alias("a"), pref.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # length filter: J >= tau implies min|s| >= tau * max|s|
            & (
                F.least(F.col("a.__sz"), F.col("b.__sz"))
                >= F.lit(float(threshold))
                * F.greatest(F.col("a.__sz"), F.col("b.__sz"))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("__sa"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("__sb"))
    jac = F.size(F.array_intersect("__sa", "__sb")) / F.size(
        F.array_union("__sa", "__sb")
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
