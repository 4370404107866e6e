"""Kerf scalar-verb surface: math / string / array / map / json / hash / rand.

The reference implements atomic (rank-polymorphic) application once
(verbs.cc:32-83) and would lift every scalar verb over arrays with it;
kerf1 supplies the verb list (§2.8 of SURVEY.md).  On Spark, columnar
expressions are *already* atomic over rows, and ``F.transform`` lifts
over array elements — so this module is a thin, kerf-named veneer over
``pyspark.sql.functions`` plus the few places where kerf semantics
diverge from ANSI (mod sign, NaN handling, 1-based vs 0-based).

Everything is a JVM Column expression; no Python UDFs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

from .semantics import nan_to_null


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ----------------------------------------------------------------- math
def neg(x):  # verbs.cc:236-255
    return -_c(x)


def divide(x, y):
    """Kerf ``%`` is float division (APL-family); div-by-zero -> null
    (kerf yields inf; we normalize per the null adapter)."""
    y_ = _c(y)
    return F.when(y_ == 0, F.lit(None)).otherwise(_c(x) / y_)


def intdiv(x, y):
    y_ = _c(y)
    return F.when(y_ == 0, F.lit(None)).otherwise(F.floor(_c(x) / y_).cast("long"))


def mod(x, y):
    """Kerf/K mod is floored (sign follows divisor) — Spark's pmod."""
    return F.pmod(_c(x), _c(y))


def power(x, y):
    return F.pow(_c(x), _c(y))


def sqrt(x):
    """sqrt of negative -> null (kerf NaN-is-null)."""
    return nan_to_null(F.sqrt(_c(x)))


def ln(x):
    return F.when(_c(x) > 0, F.log(_c(x)))


def log10(x):
    return F.when(_c(x) > 0, F.log10(_c(x)))


def exp(x):
    return F.exp(_c(x))


def absolute(x):
    return F.abs(_c(x))


def floor_(x):
    return F.floor(_c(x))


def ceil_(x):
    return F.ceil(_c(x))


def sign(x):
    return F.signum(_c(x)).cast("int")


def within(x, lo, hi):
    """Kerf ``within``: lo <= x <= hi."""
    return _c(x).between(lo, hi)


# ----------------------------------------------------------------- string
def len_(s):
    return F.length(_c(s))


def upper(s):
    return F.upper(_c(s))


def lower(s):
    return F.lower(_c(s))


def trim_(s):
    return F.trim(_c(s))


def substr(s, pos: int, n: int):
    """1-based substring (SQL convention, matches the oracle)."""
    return F.substring(_c(s), pos, n)


def split_(s, pattern: str):
    return F.split(_c(s), pattern)


def like(s, pattern: str):
    return _c(s).like(pattern)


def rlike(s, pattern: str):
    return _c(s).rlike(pattern)


def replace_all(s, pattern: str, repl: str):
    return F.regexp_replace(_c(s), pattern, repl)


def concat_ws(sep: str, *cols):
    return F.concat_ws(sep, *[_c(c) for c in cols])


def format_(fmt: str, *cols):
    return F.format_string(fmt, *[_c(c) for c in cols])


def tokens(s):
    """Whitespace tokenization of trimmed text (empty -> empty array)."""
    t = F.trim(_c(s))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


# ----------------------------------------------------------------- array
# kerf verbs first/last/reverse/enlist/flatten/count (slop.h:1173-1186)
def first_(a):
    return F.element_at(_c(a), 1)


def last_(a):
    return F.element_at(_c(a), -1)


def reverse_(a):
    return F.reverse(_c(a))


def enlist(*xs):
    return F.array(*[_c(x) for x in xs])


def flatten_(a):
    return F.flatten(_c(a))


def count_(a):
    return F.size(_c(a))


def til(n):
    """kerf ``range n`` / ``til n`` as an array value (AFFINE analogue —
    lazy until projected).  For a *table* of n rows use ``spark.range``."""
    return F.sequence(F.lit(0), F.lit(n - 1))


def take_cyclic(n: int, a):
    """Kerf cyclic take: ``5 take 1 2 3`` -> [1,2,3,1,2]."""
    arr = _c(a)
    idx = F.sequence(F.lit(0), F.lit(n - 1))
    return F.transform(idx, lambda i: F.element_at(arr, (i % F.size(arr)) + 1))


def in_(x, a):
    """Kerf ``in``: membership of x in vector a."""
    return F.array_contains(_c(a), x)


def find_(a, x):
    """Index of first match, 1-based; 0 when absent (array_position)."""
    return F.array_position(_c(a), x)


def distinct_(a):
    return F.array_distinct(_c(a))


def union_(a, b):
    return F.array_union(_c(a), _c(b))


def intersect_(a, b):
    return F.array_intersect(_c(a), _c(b))


def except_(a, b):
    return F.array_except(_c(a), _c(b))


# ----------------------------------------------------------------- map
def keys_(m):  # slop.h:1206-1207
    return F.map_keys(_c(m))


def values_(m):
    return F.map_values(_c(m))


def map_amend(m, k, v):
    """Point-amend a map value (presented.cc:339-361): m[k] := v."""
    return F.map_concat(
        F.map_filter(_c(m), lambda kk, _: kk != F.lit(k)),
        F.create_map(F.lit(k), _c(v) if isinstance(v, Column) else F.lit(v)),
    )


def map_lookup(m, k):
    """m[k], nil if absent (presented.cc:511-532)."""
    return F.element_at(_c(m), k)


# ----------------------------------------------------------------- json
def json_get(s, path: str):
    """Atlas/JSON field extraction (ATLAS decl enums.h:262)."""
    return F.get_json_object(_c(s), path)


def json_parse(s, schema: str):
    return F.from_json(_c(s), schema)


def json_render(col):
    return F.to_json(_c(col))


# ----------------------------------------------------------------- weighted aggs
def wavg(w, x):
    """Weighted average sum(w*x)/sum(w) — kerf1's `wavg` verb (the
    classic tick-DB VWAP kernel; [kerf-lang], hook via fold `adverbs.h:33-71`).
    Aggregate expression: use inside groupBy().agg(). A row with a null
    weight OR value drops out of BOTH sums (kerf folds elide nulls);
    the product w*x is null iff either side is, so it gates the
    denominator too."""
    w, x = _c(w), _c(x)
    wx = w * x
    return F.sum(wx) / F.sum(F.when(wx.isNotNull(), w))


def wsum(w, x):
    """Weighted sum sum(w*x) — kerf1 `wsum`."""
    return F.sum(_c(w) * _c(x))


# ----------------------------------------------------------------- hash / rand
def hash64(*cols):
    """64-bit xxHash — same family as the reference's fasthash/xxh
    (hash.h:46-54)."""
    return F.xxhash64(*[_c(c) for c in cols])


def md5_(s):
    return F.md5(_c(s).cast("string"))


def rand_uniform(seed: int | None = None):
    """U[0,1) per row (reference: per-thread PCG64, rng.h:7-46).
    Seeded for reproducibility — Spark's generator is per-partition
    deterministic given the seed, the distributed analogue of kerf's
    per-thread streams."""
    return F.rand(seed) if seed is not None else F.rand()


def rand_normal(seed: int | None = None):
    return F.randn(seed) if seed is not None else F.randn()


# ----------------------------------------------------------------- cast
def cast_(x, to: str):
    """Explicit cast (I_cast/F_cast, presented.h:39-41).  double->int
    truncates toward zero like kerf (Spark semantics match)."""
    return _c(x).cast(to)


# --------------------------------------------------------------- zorder
def zorder_guard(col, bits: int = 16):
    """Checked identity: returns ``col`` as a long, raising if any
    value leaves [0, 2^bits) OR is non-integral (3.7 must refuse
    loudly, not alias to 3 in the written table).  Wrap the OUTPUT
    columns of a z-ordered write with this — an output projection
    cannot be optimized away, unlike a sort key (Spark eliminates
    local sorts over <=1-row partitions, and the guard would vanish
    with them)."""
    if not 1 <= int(bits) <= 31:
        raise ValueError("bits must be in [1, 31]")
    hi = (1 << bits) - 1
    raw = _c(col)
    c = raw.cast("long")
    return F.when(
        (c < 0) | (c > hi) | (raw.cast("double") != c.cast("double")),
        F.raise_error(
            F.concat(
                F.lit(
                    f"zorder: value not an integer in the {bits}-bit "
                    f"domain [0, {hi}]: "
                ),
                raw.cast("string"),
            )
        ).cast("long"),
    ).otherwise(c)


def zorder_key(x, y, bits: int = 16, checked: bool = False):
    """Morton (Z-order) interleave of two non-negative ints truncated
    to ``bits`` bits each -> a single 2*bits-bit clustering key.

    Sorting a table by this key before writing co-locates rows that
    are close in BOTH dimensions, so Parquet row-group min/max stats
    prune scans filtered on EITHER column — the multi-dimensional
    extension of the Workspace's sorted-write data skipping.  Pure
    integer arithmetic (shift/mask composed as exact power-of-two
    multiplies), identically evaluable in any SQL engine — no UDF, no
    floats.
    """
    if not 1 <= int(bits) <= 31:
        raise ValueError("bits must be in [1, 31]")
    hi = (1 << bits) - 1

    def _masked(col):
        if checked:
            # NOTE: a checked key is only enforced where the key itself
            # is evaluated — if the key feeds a sort that the optimizer
            # can drop (<=1-row partitions), the check drops with it.
            # Write paths guard the OUTPUT columns via `zorder_guard`.
            return zorder_guard(col, bits)
        return _c(col).cast("long").bitwiseAND(F.lit(hi))

    xb = _masked(x)
    yb = _masked(y)
    out = F.lit(0).cast("long")
    for j in range(int(bits)):
        # literal shift amounts, so shiftright applies directly — true
        # integer arithmetic end to end; 2*bits <= 62 keeps the
        # accumulator clear of the sign bit
        xbit = F.shiftright(xb, j).bitwiseAND(F.lit(1))
        ybit = F.shiftright(yb, j).bitwiseAND(F.lit(1))
        out = (
            out
            + xbit * F.lit(1 << (2 * j))
            + ybit * F.lit(1 << (2 * j + 1))
        )
    return out


def zorder_key_n(cols, bits: int = 16, checked: bool = False):
    """N-column Morton interleave: bit ``j`` of column ``i`` lands at
    position ``j*k + i`` of a single ``k*bits``-bit clustering key
    (``k = len(cols)``; ``k*bits`` must stay <= 62).  The k-dimensional
    generalization of :func:`zorder_key` — same pure power-of-two long
    arithmetic, same engine portability, same row-group-stat pruning
    story for scans filtered on ANY of the k columns.  Earlier columns
    get the lower interleave positions (ties sort by the later ones
    last), matching the 2-column layout.
    """
    cols = list(cols)
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key_n needs at least 2 columns")
    if not 1 <= int(bits) <= 31 or k * int(bits) > 62:
        raise ValueError(
            f"need 1 <= bits and len(cols)*bits <= 62, got {k}*{bits}"
        )
    hi = (1 << bits) - 1

    def _masked(col):
        if checked:
            return zorder_guard(col, bits)
        return _c(col).cast("long").bitwiseAND(F.lit(hi))

    masked = [_masked(c) for c in cols]
    out = F.lit(0).cast("long")
    for j in range(int(bits)):
        for i, mc in enumerate(masked):
            bit = F.shiftright(mc, j).bitwiseAND(F.lit(1))
            out = out + bit * F.lit(1 << (j * k + i))
    return out


def rand_det(seed, *keys) -> Column:
    """Deterministic uniform draw in (0, 1): the reproducible twin of
    kerf's seeded RNG stream (rng.h:7-46 — per-thread PCG64 giving the
    same stream for the same seed).  Spark's ``F.rand(seed)`` seeds
    per-PARTITION, so the value a row sees depends on the partition
    layout — repartition the input and every draw changes.  The
    engine's deterministic rand is therefore counter-based: a draw is
    a pure function of (seed, key columns), identical on any layout
    and any engine.

    ``u = (int(md5(seed || '#' || keys)[:8], 16) + 1) / (2^32 + 1)``
    — 32 uniform bits from the engine-portable md5 family (the same
    construction DSIR's Gumbel noise uses), strictly inside (0, 1) so
    ``log(u)`` / inverse-CDF transforms never hit the endpoints.  SQL
    twin: ``(('0x' || substr(md5(...), 1, 8))::BIGINT + 1) /
    4294967297.0``.

    NULL keys draw NULL (``concat`` propagates, matching the SQL
    twin's ``||``) — ``concat_ws`` would silently SKIP the null,
    colliding ('a', NULL, 'b') with ('a', 'b') and handing a NULL key
    a real draw the SQL twin denies."""
    parts: list[Column] = [F.lit(str(seed))]
    for k in keys:
        parts.append(F.lit("#"))
        parts.append(_c(k).cast("string"))
    key = F.concat(*parts)
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)


def rand_pcg(seed: int, key) -> Column:
    """Bit-exact PCG64 stream parity with the reference's RNG
    (rng.h:18 — per-thread pcg64, same stream for the same seed).

    ``rand_pcg(seed, k)`` is draw number ``k`` of numpy's
    ``Generator(PCG64(seed)).random()`` stream — the reference's
    "reproducible seeded stream" contract made layout-invariant the
    same way :func:`rand_det` is: the draw is a pure function of
    (seed, key), not of partition layout or row order.  Each Arrow
    batch advances ONE PCG64 instance by the (mod 2^128) delta
    between consecutive keys — ``advance`` is O(log delta) by LCG
    jump-ahead, so arbitrary key order costs log time, no per-row
    object churn, and executors never share RNG state.

    NULL keys draw NULL (the :func:`rand_det` contract).  This is the
    one deliberately-Python scalar in the module: PCG64's 128-bit LCG
    + XSL-RR output has no Catalyst expression, so the twin runs as a
    vectorized pandas_udf (Arrow-batched, never row-at-a-time);
    prefer :func:`rand_det` when cross-engine SQL reproducibility
    matters more than reference-bitstream parity.
    """
    from pyspark.sql.functions import pandas_udf

    seed = int(seed)

    @pandas_udf("double")
    def _pcg(keys: pd.Series) -> pd.Series:
        import numpy as np
        from numpy.random import PCG64, Generator

        bg = PCG64(seed)
        gen = Generator(bg)
        pos = 0
        out = np.full(len(keys), np.nan, dtype="float64")
        vals = keys.to_numpy()
        idx = np.nonzero(keys.notna().to_numpy())[0]
        if len(idx) == 0:
            return pd.Series(out)
        ks = np.fromiter(
            (int(vals[i]) for i in idx), dtype="int64", count=len(idx)
        )
        # run-compressed replay: sort keys, then draw each maximal run
        # of consecutive counters as ONE block Generator.random(n) —
        # the dense case (key = row id) costs one advance + one
        # vectorized draw per partition slice instead of a Python
        # round-trip per row; duplicates copy the first draw (same
        # counter, same draw, no state motion)
        order = np.argsort(ks, kind="stable")
        t = 0
        while t < len(order):
            k0 = int(ks[order[t]])
            run = [order[t]]
            t += 1
            while t < len(order) and ks[order[t]] == k0 + len(run):
                run.append(order[t])
                t += 1
            bg.advance((k0 - pos) % (1 << 128))
            block = gen.random(len(run))
            pos = k0 + len(run)
            for off, oi in enumerate(run):
                out[idx[oi]] = block[off]
            # duplicates of the LAST key in the run
            while t < len(order) and ks[order[t]] == k0 + len(run) - 1:
                out[idx[order[t]]] = block[-1]
                t += 1
        return pd.Series(out)

    return nan_to_null(_pcg(_c(key).cast("long")))
