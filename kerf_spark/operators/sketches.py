"""Portable probabilistic sketches: count-min and HyperLogLog.

Together with `curation.bloom_build` these cover the three classic
constant-size summaries a 100 TB pipeline leans on: membership
(Bloom), frequency (count-min), cardinality (HLL).  All three use the
engine-portable md5 hash family, so every estimate — including the
sketches' characteristic error — is a deterministic function of the
input multiset that a SQL oracle reproduces bit-for-bit.  (Spark's own
`approx_count_distinct` / `count_min_sketch` are JVM-internal and not
oracle-checkable; these exist for cross-engine reproducibility and as
the explicit algebra.  Both sketches are trivially mergeable — cell-sum
/ register-max — which is what makes them map-side-combine friendly.)

Scale: a sketch build is one keyed shuffle whose key space is the
sketch's CONSTANT cell count (d*w cells for CMS, m registers per group
for HLL) regardless of input rows; estimates broadcast the cell table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def _h60(key: Column, salt: str) -> Column:
    """60 uniform bits from md5 — same construction as dedup/curation."""
    return F.conv(
        F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 15), 16, 10
    ).cast("long")


# ------------------------------------------------------------ count-min
def _cms_cells(key, depth: int, width: int, salt: str) -> Column:
    """Array of (row, bucket) structs addressing one cell per sketch
    row for ``key``."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(int(depth) - 1)),
        lambda j: F.struct(
            j.cast("int").alias("__d"),
            (
                _h60(
                    F.concat(
                        _c(key).cast("string"),
                        F.lit("#" + salt),
                        j.cast("string"),
                    ),
                    "",
                )
                % F.lit(int(width))
            ).alias("__b"),
        ),
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of the ``key_col`` multiset: one row per
    occupied cell, columns (``__d`` row, ``__b`` bucket, ``__n``
    count).  At most depth*width rows at ANY input size; the build is
    one keyed shuffle with map-side partial counting.

    ``weight_col`` builds the identical sketch from pre-aggregated
    (key, count) rows — hash each distinct key once and sum the counts
    into its cells.  When the caller already has per-key totals (e.g.
    alongside an exact heavy-hitter pass), this turns the build from a
    token-stream-sized explode into a vocabulary-sized one."""
    cells = df.select(
        (F.col(weight_col) if weight_col else F.lit(1)).alias("__w"),
        F.explode(_cms_cells(key_col, depth, width, salt)).alias("__cell"),
    )
    return (
        cells.select(
            F.col("__cell.__d").alias("__d"),
            F.col("__cell.__b").alias("__b"),
            "__w",
        )
        .groupBy("__d", "__b")
        .agg(F.sum("__w").cast("long").alias("__n"))
    )


def cms_estimate(
    df: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    out: str = "est",
) -> DataFrame:
    """Point-query the sketch for each distinct ``key_col`` of ``df``:
    the min over depth rows of the addressed cell counts (the classic
    one-sided overestimate).  The sketch broadcasts (<= depth*width
    rows); the probe is a depth-row explode + one keyed
    re-aggregation."""
    pos = df.select(
        _c(key_col).alias("__k"),
        F.explode(_cms_cells(key_col, depth, width, salt)).alias("__cell"),
    ).select(
        "__k",
        F.col("__cell.__d").alias("__d"),
        F.col("__cell.__b").alias("__b"),
    )
    looked = pos.join(F.broadcast(sketch), ["__d", "__b"], "left")
    return looked.groupBy("__k").agg(
        F.min(F.coalesce(F.col("__n"), F.lit(0))).alias(out)
    )


# ---------------------------------------------------------- hyperloglog
def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list | None = None,
    m: int = 256,
    salt: str = "hll",
) -> DataFrame:
    """HLL registers per group: (group_cols..., ``__idx``, ``__rho``).

    The 60-bit md5 hash splits into 8 register-index bits (m=256) and
    52 pattern bits; ``__rho`` is the leading-zero rank (1..53) of the
    pattern, maxed per register.  At most m rows per group no matter
    the input cardinality — the constant-size distinct-count summary.
    The rank comes from integer bit arithmetic (``length(bin(x))``),
    NOT ``floor(log2(x))``: both engines' float log2 mis-round just
    below powers of two (e.g. Spark gives floor(log2(2^48-1)) = 48,
    DuckDB 47), which would flip a register and break the bit-for-bit
    oracle claim.
    """
    if m != 256:
        raise ValueError("m=256 (8 index bits) is the portable layout")
    group_cols = group_cols or []
    h = _h60(_c(key_col).cast("string"), "#" + salt)
    rest = h % F.lit(1 << 52)
    rho = F.when(rest == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(rest))
    )
    keyed = df.select(
        *group_cols,
        # shiftright, NOT division: h exceeds double's exact integer
        # range, so h/2^52 would round before the cast
        F.shiftright(h, 52).alias("__idx"),
        rho.cast("long").alias("__rho"),
    )
    return keyed.groupBy(*group_cols, "__idx").agg(
        F.max("__rho").alias("__rho")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list | None = None,
    m: int = 256,
    out: str = "est",
) -> DataFrame:
    """Cardinality estimate from `hll_registers` output, with the
    standard small-range (linear counting) correction.  Pure
    aggregation arithmetic — the oracle replays the identical formula,
    so even the estimator's bias is reproduced exactly."""
    group_cols = group_cols or []
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__present"),
        F.sum(F.pow(F.lit(2.0), -F.col("__rho"))).alias("__spresent"),
    )
    zeros = F.lit(m) - F.col("__present")
    s = F.col("__spresent") + zeros.cast("double")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias(out))


# ----------------------------------------------------- histogram quantiles
def hist_build(
    df: DataFrame,
    col,
    lo: float,
    hi: float,
    n_bins: int = 256,
    by: tuple = (),
) -> DataFrame:
    """The FOURTH mergeable constant-size summary: quantiles.  A
    fixed-boundary equi-width histogram over ``[lo, hi)`` — ``n_bins``
    integer counts per group, mergeable by plain cnt-sum (map-side
    combine collapses any input to the constant cell count, the
    CMS/HLL shape).  Out-of-range values clamp into the edge bins
    (document your range); nulls are dropped.  Unlike t-digest/GK the
    boundaries carry no data dependence, so the sketch — and every
    quantile read off it — is a deterministic function of the input
    multiset that a SQL oracle reproduces bit-for-bit."""
    w = (float(hi) - float(lo)) / n_bins
    b = F.least(
        F.greatest(F.floor((_c(col) - lo) / w), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.where(_c(col).isNotNull())
        .groupBy(*by, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantile(
    hist: DataFrame,
    q: float,
    lo: float,
    hi: float,
    n_bins: int = 256,
    by: tuple = (),
    out: str = "quantile",
) -> DataFrame:
    """Quantile ``q`` from a :func:`hist_build` sketch: rank
    ``r = max(1, ceil(q*N))`` per group, locate the unique bin with
    ``cum − cnt < r ≤ cum`` (a window cumsum over the CONSTANT n_bins
    rows per group — never data-sized), linear interpolation inside
    it.  Estimate error is bounded by the bin width; the arithmetic
    shape (one int/int division, one multiply-add) is written
    identically in the oracle so estimates match bit-for-bit."""
    from pyspark.sql import Window

    w = (float(hi) - float(lo)) / n_bins
    gw = Window.partitionBy(*[_c(c) for c in by]).orderBy("bin")
    h = hist.withColumn("cum", F.sum("cnt").over(gw))
    tot = hist.groupBy(*by).agg(F.sum("cnt").cast("long").alias("__n"))
    if by:
        h = h.join(tot, list(by))
    else:
        h = h.crossJoin(F.broadcast(tot))
    r = F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(q) * F.col("__n")))
    est = F.lit(float(lo)) + F.lit(w) * (
        F.col("bin")
        + (r - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    )
    picked = F.when(
        (F.col("cum") >= r) & (F.col("cum") - F.col("cnt") < r), est
    )
    return h.groupBy(*by).agg(F.max(picked).alias(out))
