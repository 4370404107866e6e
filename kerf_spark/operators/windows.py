"""Ordered analytics: kerf adverbs (fold/unfold/mapback) as window ops.

The reference implements the adverb kernels once — fold (adverbs.h:33-71),
unfold/scan (adverbs.h:75-120), mapback/eachprior (adverbs.h:156-206) —
and derives deltas/ratios/running-aggregates from them (test.cc:330-346).
On Spark those become window-function plans:

    fold      -> groupBy().agg()             (partial+final, map-side combine)
    unfold    -> agg OVER (rows unbounded preceding)
    mapback   -> lag(1) + binary op
    moving    -> agg OVER (rows n-1 preceding)
    grade     -> row_number over orderBy     (grade.cc sort permutation)

Scale note: a window spec with ``partitionBy`` shuffles once on the key
and sorts within partitions — the right plan at 100 TB *provided the key
has enough cardinality*.  Window specs WITHOUT partitionBy collapse to a
single task; every helper here takes ``by`` and warns-by-design in the
docstring rather than silently degrading.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _cols(cs: Sequence[Column | str] | Column | str | None) -> list[Column]:
    if cs is None:
        return []
    if isinstance(cs, (str, Column)):
        cs = [cs]
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def ordered_window(
    by: Sequence[Column | str] | None,
    order: Sequence[Column | str],
) -> WindowSpec:
    """Window over groups ``by`` ordered by ``order``.  ``by=None`` means
    a global ordering — single-task, only for small frames."""
    w = Window.partitionBy(*_cols(by)) if by else Window.partitionBy()
    return w.orderBy(*_cols(order))


# ------------------------------------------------------------ unfold / scan
def running(
    agg: str,
    col: Column | str,
    by: Sequence[Column | str] | None,
    order: Sequence[Column | str],
) -> Column:
    """Kerf ``unfold`` (f\\): running aggregate over event order.

    ``agg`` is any Spark agg fn name: sum/min/max/avg/count...
    """
    w = ordered_window(by, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return getattr(F, agg)(F.col(col) if isinstance(col, str) else col).over(w)


def running_sum(col, by, order) -> Column:
    return running("sum", col, by, order)


def running_min(col, by, order) -> Column:
    return running("min", col, by, order)


def running_max(col, by, order) -> Column:
    return running("max", col, by, order)


# ----------------------------------------------- distributed global scan
def global_scan_multi(
    df,
    aggs: dict,
    order: Sequence[str],
    bucket: Column | str | None = None,
    by: Sequence[str] | None = None,
):
    """Several whole-table running aggregates in ONE two-phase scan —
    see :func:`global_scan` for the algorithm.  ``aggs`` maps output
    column -> (agg fn in {sum,min,max,count}, value column); every agg
    shares the single bucketed window partitioning, the single totals
    aggregate, and the single broadcast join."""
    for name, (agg, _) in aggs.items():
        if agg not in ("sum", "min", "max", "count"):
            raise ValueError(
                f"global_scan: no closed-form combine for {agg!r} ({name})"
            )
    by = list(by or [])
    b = bucket if bucket is not None else order[0]
    b = F.col(b) if isinstance(b, str) else b
    bucketed = df.withColumn("__g", b)
    part = [F.col(c) for c in by] + [F.col("__g")]
    w = Window.partitionBy(*part).orderBy(
        *[F.col(c) for c in order]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def _agg_expr(agg, col):
        c = F.col(col) if isinstance(col, str) else col
        return F.count(c) if agg == "count" else getattr(F, agg)(c)

    scanned = bucketed
    for name, (agg, col) in aggs.items():
        scanned = scanned.withColumn(
            f"__loc_{name}", _agg_expr(agg, col).over(w)
        )

    totals = bucketed.groupBy(*by, "__g").agg(
        *[
            _agg_expr(agg, col).alias(f"__t_{name}")
            for name, (agg, col) in aggs.items()
        ]
    )
    pw = (
        Window.partitionBy(*[F.col(c) for c in by]) if by else Window.partitionBy()
    ).orderBy("__g").rowsBetween(Window.unboundedPreceding, -1)
    pre = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    off_df = totals.select(
        *by,
        "__g",
        *[
            pre[agg](F.col(f"__t_{name}")).over(pw).alias(f"__off_{name}")
            for name, (agg, _) in aggs.items()
        ],
    )
    # NULL-SAFE join keys: the window/groupBy treat a NULL by-key or
    # NULL bucket as one ordinary group, so the offset join must match
    # it too — a plain equi-join drops NULL keys and silently resets
    # the running totals at every bucket boundary of that group
    cond = F.lit(True)
    for c in [*by, "__g"]:
        cond = cond & scanned[c].eqNullSafe(off_df[c])
    joined = scanned.join(F.broadcast(off_df), cond, "left").drop(
        *[off_df[c] for c in [*by, "__g"]]
    )
    out = joined
    for name, (agg, _) in aggs.items():
        loc = F.col(f"__loc_{name}")
        off = F.col(f"__off_{name}")
        if agg in ("sum", "count"):
            # null-safe add: a bucket whose prefix is all-null has loc
            # NULL but must still surface the prior buckets' offset
            combined = F.when(off.isNull(), loc).otherwise(
                F.when(loc.isNull(), off).otherwise(loc + off)
            )
        elif agg == "min":
            combined = F.least(loc, off)  # least/greatest skip NULLs
        else:
            combined = F.greatest(loc, off)
        out = out.withColumn(name, combined).drop(
            f"__loc_{name}", f"__off_{name}"
        )
    return out.drop("__g")


def global_scan(
    df,
    value_col: str,
    order: Sequence[str],
    agg: str = "sum",
    bucket: Column | str | None = None,
    out_col: str = "run",
    by: Sequence[str] | None = None,
):
    """Kerf ``unfold`` over the WHOLE table order (``sums(t.col)`` with
    no by-key) — the shape ``running(by=None, ...)`` cannot survive at
    scale: an empty PARTITION BY funnels every row through ONE task.

    Two-phase prefix scan (Blelloch) with a CONTENT-DERIVED bucket key:

    1. ``bucket`` (default: the leading order column) splits the table
       into order-aligned groups — every row with the same bucket value
       sorts contiguously in the global order.  Being a pure projection
       of the row, the split is identical on every execution and every
       engine; a sampled range partitioning would not be (sampled
       boundaries drift between executions, and an early prototype here
       mis-ranked rows whenever one plan branch re-sampled).
    2. Local running aggregate per bucket (window PARTITION BY bucket —
       many balanced keys, never one).
    3. Per-bucket totals prefix-combined EXCLUSIVELY in-plan and
       broadcast-joined back (NULL-SAFE on the bucket/by keys).  The
       prefix window is a single task over one row PER DISTINCT BUCKET
       — bounded by bucket cardinality, not by the data.  Zero
       driver-side data.

    ``agg`` ∈ {sum, min, max, count}: the associative scans whose
    cross-partition combine is closed-form.  NOTE ``count`` counts
    NON-NULL values of ``value_col`` (SQL count(col)); scan a literal
    column for row counts (:func:`global_rank`).  ``order`` must be a
    total order (add a unique tiebreaker).  ``by`` scopes the scan to
    groups while keeping the bucketed shape — the scale path when the
    group key itself has too FEW distinct values to parallelize a plain
    windowed scan.  Several aggregates in one pass:
    :func:`global_scan_multi`.  BUCKET CHOICE: pick one with enough
    distinct values to spread the data; the bucket MUST be a monotone
    function of the order prefix — it is, by construction, at the
    default.  SKEW: one hot bucket value concentrates its rows in one
    task — coarsen or refine the bucket expression accordingly.
    """
    return global_scan_multi(
        df, {out_col: (agg, value_col)}, order, bucket=bucket, by=by
    )


def volume_bars(
    df,
    vol_col: str,
    threshold: float,
    order: Sequence[str],
    by: Sequence[str] | None = None,
    bucket: Column | str | None = None,
    out_col: str = "bar_id",
):
    """Assign volume-bar ids: bar ``k`` holds the rows where the
    running ``vol_col`` total (in event order, per ``by`` series) is in
    ``(k*threshold, (k+1)*threshold]`` — the event-driven bar family
    quant pipelines prefer over time bars (uniform information per
    bar; time bars oversample quiet periods).  Built on
    :func:`global_scan`, so the cumulative sum is the distributed
    two-phase scan, never a single-task window; NULL volumes count 0.
    Aggregate OHLC/VWAP per (series, bar_id) downstream.  The running
    total is rounded at 6dp before the bar division on EVERY
    implementation of this rule (here, the streaming twin, the SQL
    oracles), so an fp ulp at a block boundary cannot flip a bar id
    between engines or between batch and streaming.
    """
    d = df.withColumn("__vol", F.coalesce(F.col(vol_col), F.lit(0.0)))
    s = global_scan(
        d, "__vol", order, agg="sum", bucket=bucket, out_col="__cum",
        by=by,
    )
    bar = F.ceil(F.round(F.col("__cum"), 6) / F.lit(float(threshold))) - 1
    return s.withColumn(
        out_col, F.greatest(bar, F.lit(0)).cast("long")
    ).drop("__vol", "__cum")


def global_rank(
    df, order: Sequence[str], bucket=None, out_col: str = "rn",
    by: Sequence[str] | None = None,
):
    """Whole-table (or per-``by``-group) 1-based rank in ``order`` (kerf
    grade) — the count specialization of :func:`global_scan`, sharing
    its scale shape.  ``order`` must be a total order.  ``by`` makes it
    the scale path for ranking WITHIN a low-cardinality group (3 return
    flags over 100 TB rank at flags x buckets parallelism instead of a
    3-task window)."""
    tagged = df.withColumn("__one", F.lit(1))
    return global_scan(
        tagged, "__one", order, agg="count", bucket=bucket,
        out_col=out_col, by=by,
    ).drop("__one")


# ------------------------------------------------------------ mapback
def mapback(
    f,
    col: Column | str,
    by: Sequence[Column | str] | None,
    order: Sequence[Column | str],
    seed: Column | None = None,
) -> Column:
    """Kerf ``mapback``/eachprior: f(x_i, x_{i-1}) pairwise.

    ``seed`` fills the first element's predecessor (adverbs.h:168-176
    seeded variant); default yields NULL for the first row.
    """
    c = F.col(col) if isinstance(col, str) else col
    prev = F.lag(c, 1).over(ordered_window(by, order))
    if seed is not None:
        prev = F.coalesce(prev, seed)
    return f(c, prev)


def deltas(col, by, order, seed: Column | None = None) -> Column:
    """x - prev(x); kerf ``deltas`` = mapback of ``-`` (test.cc:344)."""
    return mapback(lambda a, b: a - b, col, by, order, seed)


def ratios(col, by, order) -> Column:
    """x / prev(x); NULL on first row and div-by-zero."""
    def f(a, b):
        return F.when(b == 0, F.lit(None)).otherwise(a / b)
    return mapback(f, col, by, order)


# ------------------------------------------------------------ moving frames
def moving(
    agg: str,
    col: Column | str,
    n: int,
    by: Sequence[Column | str] | None,
    order: Sequence[Column | str],
) -> Column:
    """n-row trailing window aggregate (kerf mavg/msum/mmin/mmax)."""
    w = ordered_window(by, order).rowsBetween(-(n - 1), 0)
    return getattr(F, agg)(F.col(col) if isinstance(col, str) else col).over(w)


def mavg(col, n, by, order) -> Column:
    return moving("avg", col, n, by, order)


def msum(col, n, by, order) -> Column:
    return moving("sum", col, n, by, order)


def mdev(col, n, by, order) -> Column:
    """n-row trailing sample stddev (kerf mdev), computed from moving
    sums — ``sqrt((Σx² - (Σx)²/m) / (m-1))`` with m the actual frame
    size (< n at partition edges; NULL when m == 1).  The sum-form is
    engine-portable: identical inputs give identical sums, where a
    streaming Welford accumulation would expose implementation order.
    Clamped at 0 so fp cancellation can't drive sqrt negative."""
    c = F.col(col) if isinstance(col, str) else col
    w = ordered_window(by, order).rowsBetween(-(n - 1), 0)
    m = F.count(c).over(w).cast("double")
    sx = F.sum(c).over(w)
    sxx = F.sum(c * c).over(w)
    var = (sxx - (sx * sx) / m) / (m - F.lit(1.0))
    return F.when(m > 1, F.sqrt(F.greatest(var, F.lit(0.0))))


def chunked_moving(
    df: DataFrame,
    aggs: dict[str, tuple[str, Column | str]],
    n: int,
    by: Sequence[str],
    order: Sequence[str],
    chunk: Column | str,
    validate: bool = True,
) -> DataFrame:
    """Trailing ``n``-row moving aggregates over LOW-CARDINALITY series
    keys, distributed — the hot-key fix for moving windows.

    ``moving()`` partitions by the series key alone; with 3 return
    flags over 100 TB that is 3 tasks, each sorting a third of the
    table, no matter the cluster.  Here each series splits into
    order-aligned chunks (``chunk`` must be a monotone function of the
    leading order columns — ``l_orderkey div 4096``, a date, an hour),
    and the last ``n-1`` rows of every chunk are REPLICATED into the
    next chunk as borrowed context, so a window partitioned by
    (series, chunk) sees every row's full trailing frame:

        parallelism = series x chunks, replication = (n-1)/chunk_rows.

    PRECONDITION: every non-final chunk holds >= n-1 rows, or a frame
    would need rows from two chunks back (borrowed context only spans
    one boundary).  Size chunks orders of magnitude above ``n``.
    ``validate=True`` (default) ENFORCES this: one extra count
    aggregate over the same (series, chunk) groups — bounded output,
    ``limit(1)`` driver check — raises ``ValueError`` naming the first
    violating chunk instead of silently truncating frames.  Pass
    ``validate=False`` only when the chunking is known-safe by
    construction (e.g. a fixed divisor orders of magnitude above n on
    a dense key).

    ``aggs`` maps output column -> (agg fn name, value column); each is
    computed over ``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW``.  All
    windows share one (series, chunk) partitioning: one exchange.

    PLAN SHAPE (optimization r13): the big table crosses exactly ONE
    exchange + sort.  The previous shape unioned borrowed tails into
    the data *before* the window, which cost three full passes (a
    distinct for successor chunks, a full descending sort to rank out
    each chunk's tail, and the union's own exchange+sort).  Now the
    single (series, chunk)-partitioned pass computes every frame
    in-chunk plus a row number and the chunk size; rows deeper than
    ``n-1`` into their chunk have complete frames already, and only
    the first ``n-1`` rows of each chunk — whose frames span the
    boundary — are recomputed in a FIX-UP window over (early rows ∪
    predecessor tails), a dataset of O(n · chunks) rows regardless of
    table size.  The windowed pass is locally checkpointed so its
    four consumers (complete rows, early rows, donor tails, chunk
    directory) read it once instead of re-sorting per branch.  Frame
    contents and in-frame order are identical to the union shape, so
    results are bitwise unchanged.
    """
    ckey = F.col(chunk) if isinstance(chunk, str) else chunk
    d = df.withColumn("__chunk", ckey)
    pcols = [F.col(c) for c in by] + [F.col("__chunk")]
    word = Window.partitionBy(*pcols).orderBy(*[F.col(c) for c in order])
    wframe = word.rowsBetween(-(n - 1), 0)
    wall = Window.partitionBy(*pcols)

    def _agg_cols() -> list[Column]:
        out = []
        for name, (fn, col) in aggs.items():
            c = F.col(col) if isinstance(col, str) else col
            # fn is either a pyspark.sql.functions aggregate name, or a
            # callable (col, window) -> Column for frame folds the
            # builtin aggregates can't express (e.g. ewma_over) — all
            # share the one (series, chunk) exchange
            expr = fn(c, wframe) if callable(fn) else getattr(F, fn)(c).over(wframe)
            out.append(expr.alias(name))
        return out

    # the ONE pass over the big table: every agg frame (truncated at
    # chunk start), the in-chunk row number, and the chunk row count
    # ride the same exchange + sort; eager local checkpoint so the
    # branches below scan the materialized result, not the lineage
    main = d.select(
        "*",
        F.row_number().over(word).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("__cnt"),
        *_agg_cols(),
    ).localCheckpoint()
    # successor chunk per series (chunk values may be sparse): one row
    # per (series, chunk) out of the checkpoint, window over that
    sw = Window.partitionBy(*[F.col(c) for c in by]).orderBy("__chunk")
    if validate:
        # enforce the >= n-1 precondition: an interior chunk (has both
        # a predecessor and a successor) with fewer than n-1 rows means
        # some frame in the successor needs rows from two chunks back,
        # which the single-boundary borrow cannot supply.  A first
        # chunk may be short (frames truncate at series start — still
        # correct).  Cost: one partial-agg count keyed exactly like the
        # main window + a limit(1) driver check over the tiny
        # (series, chunk) table.
        lead_ord = F.col(order[0])
        counts = (
            main.groupBy(*by, "__chunk")
            .agg(
                F.count(F.lit(1)).alias("__rows"),
                F.min(lead_ord).alias("__omin"),
                F.max(lead_ord).alias("__omax"),
            )
            .withColumn("__has_next", F.lead("__chunk").over(sw).isNotNull())
            .withColumn("__has_prev", F.lag("__chunk").over(sw).isNotNull())
            .withColumn("__prev_omax", F.lag("__omax").over(sw))
        )
        bad = (
            counts.where(
                (
                    F.col("__has_next")
                    & F.col("__has_prev")
                    & (F.col("__rows") < n - 1)
                )
                # chunk must be MONOTONE in the leading order column:
                # overlapping order ranges across consecutive chunks
                # mean frames mix rows from the wrong side of a chunk
                # boundary (e.g. chunking on orderkey while ordering
                # by date) — silently wrong on every boundary.  >= not
                # >: a boundary TIE means the same order value sits in
                # two chunks, so the tiebreak columns decide global
                # order and can cross the boundary — a true monotone
                # function of order[0] never produces cross-chunk
                # equality, so this rejects only impure chunkings
                | (F.col("__prev_omax") >= F.col("__omin"))
            )
            .limit(1)
            .collect()
        )
        if bad:
            r = bad[0]
            key = {c: r[c] for c in by}
            if r["__prev_omax"] is not None and r["__prev_omax"] >= r["__omin"]:
                raise ValueError(
                    f"chunked_moving: chunk {r['__chunk']!r} of series "
                    f"{key} starts at {order[0]}={r['__omin']!r} but the "
                    f"previous chunk runs to {r['__prev_omax']!r} — the "
                    "chunk expression is not monotone in the leading "
                    "order column, so borrowed tails land on the wrong "
                    "rows.  Chunk on a function of the order columns "
                    "themselves."
                )
            raise ValueError(
                f"chunked_moving: interior chunk {r['__chunk']!r} of "
                f"series {key} holds {r['__rows']} rows < n-1={n - 1}; "
                "its successor's trailing frames would silently "
                "truncate.  Use coarser chunks (or validate=False if "
                "the chunking is safe by construction)."
            )
    src_cols = list(df.columns)
    out_cols = src_cols + list(aggs)
    # rows at least n deep into their chunk: frames complete in-chunk,
    # already correct from the single pass
    ok = main.where(F.col("__rn") > n - 1).select(*out_cols)
    # boundary FIX-UP over O(n · chunks) rows: the first n-1 rows of
    # every chunk (their frames span the boundary; first-chunk rows
    # recompute to the same truncated value) windowed together with the
    # predecessor chunk's last n-1 rows, retagged via the successor map
    succ = (
        main.where(F.col("__rn") == 1)
        .select(*by, "__chunk")
        .withColumn("__next", F.lead("__chunk").over(sw))
        .where(F.col("__next").isNotNull())
    )
    donors = (
        main.where(F.col("__cnt") - F.col("__rn") <= n - 2)
        .select(*src_cols, "__chunk")
        .join(succ, [*by, "__chunk"], "inner")  # AQE broadcasts when small
        .withColumn("__chunk", F.col("__next"))
        .drop("__next")
        .withColumn("__borrowed", F.lit(1))
    )
    early = (
        main.where(F.col("__rn") <= n - 1)
        .select(*src_cols, "__chunk")
        .withColumn("__borrowed", F.lit(0))
    )
    fix = (
        early.unionByName(donors)
        .select("*", *_agg_cols())
        .where(F.col("__borrowed") == 0)
        .select(*out_cols)
    )
    return ok.unionByName(fix)


def mcorr(x, y, n, by, order) -> Column:
    """n-row trailing Pearson correlation of two columns (rolling
    corr/beta — the pairs-trading window stat).  Sum-form:
    ``(mΣxy - ΣxΣy) / sqrt((mΣx² - (Σx)²)(mΣy² - (Σy)²))``; NULL when
    either side's frame variance rounds to zero at 9dp (constant
    series — also shields the cross-engine fp boundary where a
    mathematically-zero variance lands ±1e-18)."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    w = ordered_window(by, order).rowsBetween(-(n - 1), 0)
    m = F.count(F.lit(1)).over(w).cast("double")
    sx, sy = F.sum(cx).over(w), F.sum(cy).over(w)
    sxx = F.sum(cx * cx).over(w)
    syy = F.sum(cy * cy).over(w)
    sxy = F.sum(cx * cy).over(w)
    cov = m * sxy - sx * sy
    vx = F.greatest(m * sxx - sx * sx, F.lit(0.0))
    vy = F.greatest(m * syy - sy * sy, F.lit(0.0))
    denom = F.sqrt(vx * vy)
    return F.when(F.round(denom, 9) != 0, cov / denom)


def ewma_over(alpha: float):
    """Frame-fold factory for a trailing exponentially-weighted moving
    average — the one moving stat the sum-form family can't express
    (every row's weight differs, so there is no pair of running sums to
    difference).  Returns a ``(col, window) -> Column`` callable usable
    directly or as a ``chunked_moving`` agg value (the low-cardinality
    distributed path shares its single (series, chunk) exchange).

    This is the JVM-side twin of ``ema_exact`` (the applyInPandas
    full-history kernel used by ``macd``): the fold stays inside
    Catalyst — no Python in the hot path, no Arrow round-trip — at the
    price of a bounded n-row lookback instead of unbounded history.

    Semantics: the unadjusted recursion ``y = (1-alpha)*y + alpha*x``
    folded left over the window frame, seeded ``y = x`` at the frame's
    first row.  With a ``ROWS BETWEEN n-1 PRECEDING`` frame this is the
    n-row *re-seeded* EWMA; since weights decay geometrically, choosing
    ``n >> 1/alpha`` (e.g. ``n = ceil(36/alpha)``, where the oldest
    row's weight underflows double noise) makes it numerically
    indistinguishable from kerf/kdb's full-history ``ema`` — which is
    inherently sequential and has no truncation-free distributed form.

    Determinism: ``F.aggregate`` is a left fold, so the fp op sequence
    is fixed by the frame order — bit-identical to DuckDB's
    ``list_reduce`` over the same list (both seed with the first
    element: the null-init WHEN branch here resolves to ``x`` exactly).
    NULL inputs are skipped (``collect_list`` drops them), kerf's
    out-of-band-null discipline; a NULL-keeping engine's ``list()``
    needs a ``list_filter`` to match.
    """
    decay, gain = F.lit(1.0 - alpha), F.lit(alpha)

    def _fold(c: Column, w) -> Column:
        frame = F.collect_list(c.cast("double")).over(w)
        return F.aggregate(
            frame,
            F.lit(None).cast("double"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                acc * decay + gain * x
            ),
        )

    return _fold


def ewma(
    col: Column | str,
    alpha: float,
    n: int,
    by: Sequence[Column | str] | None,
    order: Sequence[Column | str],
) -> Column:
    """Trailing n-row EWMA column (see ewma_over for semantics).

    SCALE: the frame materializes n doubles per row inside the window
    sort — bounded amplification, no extra exchange.  Partition ``by``
    a key whose cardinality grows with the data (ticker, user); for a
    LOW-cardinality series key, route the same fold through
    ``chunked_moving(aggs={"y": (ewma_over(a), col)}, ...)`` so
    parallelism is series x chunks rather than one task per series.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = ordered_window(by, order).rowsBetween(-(n - 1), 0)
    return ewma_over(alpha)(c, w)


def time_moving(
    agg: str,
    col: Column | str,
    span_ns: int,
    by: Sequence[Column | str] | None,
    ts_ns: Column | str,
) -> Column:
    """Time-based trailing window: rows with t in (cur - span, cur].

    rangeBetween over the epoch-ns long column — the tick-DB "volume in
    the last 5 minutes" shape, no self-join needed.
    """
    ts = F.col(ts_ns) if isinstance(ts_ns, str) else ts_ns
    w = (
        (Window.partitionBy(*_cols(by)) if by else Window.partitionBy())
        .orderBy(ts.cast("long"))
        .rangeBetween(-(span_ns - 1), 0)
    )
    return getattr(F, agg)(F.col(col) if isinstance(col, str) else col).over(w)


# ------------------------------------------------------------ rank / grade
def grade(
    order: Sequence[Column | str],
    by: Sequence[Column | str] | None = None,
    desc: bool = False,
) -> Column:
    """Sort permutation position (1-based): kerf grade_up/grade_down
    (grade.cc).  Supply a unique tiebreak column in ``order`` for a
    deterministic permutation, as kerf's stable sort would give."""
    cols = _cols(order)
    if desc:
        cols = [c.desc() for c in cols]
    return F.row_number().over(ordered_window(by, cols))


def rank_(order, by=None, dense: bool = False, desc: bool = False) -> Column:
    cols = _cols(order)
    if desc:
        cols = [c.desc() for c in cols]
    fn = F.dense_rank if dense else F.rank
    return fn().over(ordered_window(by, cols))


def differ(col, by, order) -> Column:
    """Kerf/kdb ``differ``: true where the value changes from the
    previous row in event order; the first row of each group is true
    (run-length encoding kernel — ``sum(differ)`` numbers the runs).
    Null-safe compare so NULL->NULL is *not* a change mid-stream."""
    c = F.col(col) if isinstance(col, str) else col
    w = ordered_window(by, order)
    prev = F.lag(c, 1).over(w)
    return (F.row_number().over(w) == 1) | ~prev.eqNullSafe(c)


def ffill(col, by, order) -> Column:
    """Kerf/kdb ``fills``: propagate the last non-null value forward in
    event order — the tick-DB quote-carry verb.  ``last(ignorenulls)``
    over an unbounded-preceding frame: one shuffle on ``by``, sort
    within partitions, stays inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    w = ordered_window(by, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return F.last(c, ignorenulls=True).over(w)


def bfill(col, by, order) -> Column:
    """Backward fill: next non-null value at-or-after each row (the
    reverse of ``fills``; kerf idiom ``reverse fills reverse``)."""
    c = F.col(col) if isinstance(col, str) else col
    w = ordered_window(by, order).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return F.first(c, ignorenulls=True).over(w)


def shift(col, n: int, by, order) -> Column:
    """prev/next: n>0 looks back (prev), n<0 looks forward (next)."""
    c = F.col(col) if isinstance(col, str) else col
    w = ordered_window(by, order)
    return F.lag(c, n).over(w) if n >= 0 else F.lead(c, -n).over(w)


def ema(
    col: Column | str,
    n: int,
    by: Sequence[Column | str],
    order: Sequence[Column | str],
    decay: float = 0.9,
) -> Column:
    """Windowed exponential moving average — the kerf/kdb ``ema`` tick
    smoother, bounded to the last ``n`` rows so the kernel is a pure
    window expression (the unbounded recurrence needs a sequential fold;
    bounding it keeps everything inside whole-stage codegen: no UDF, no
    Python, and the truncation error is ``decay**n``).

    ``ema_t = Σ_{k<n} decay^k · x_{t-k} / Σ_{k<n} decay^k`` over rows of
    the ``by``-partitioned ``order``-sorted frame.  One single-pass fold
    carries ``(dot, decay^k)`` in a struct accumulator, so the window
    expression appears exactly once in the plan (a re-used HOF operand
    would re-run the collect_list per reference); the weight sum falls
    out of the geometric closed form in the finish lambda.
    """
    assert 0.0 < decay < 1.0, "decay must be in (0, 1)"
    c = F.col(col) if isinstance(col, str) else col
    w = ordered_window(by, order).rowsBetween(-(n - 1), 0)
    vals = F.reverse(F.collect_list(c).over(w))  # newest first
    return F.aggregate(
        vals,
        F.struct(F.lit(0.0).alias("s"), F.lit(1.0).alias("w")),
        lambda acc, v: F.struct(
            (acc["s"] + v * acc["w"]).alias("s"),
            (acc["w"] * F.lit(decay)).alias("w"),
        ),
        # acc.w == decay^len; Σ decay^k = (1 - decay^len) / (1 - decay)
        lambda acc: acc["s"] * F.lit(1.0 - decay) / (F.lit(1.0) - acc["w"]),
    )


def ema_exact(
    df: DataFrame,
    col: str,
    by: Sequence[str],
    order: Sequence[str],
    decay: float = 0.9,
    out: str = "ema",
) -> DataFrame:
    """Exact *unbounded* EMA: the full recurrence over each key's entire
    history, where :func:`ema` truncates at n rows (error ``decay**n``).

    ``ema_t = Σ_{k=0..t} decay^k · x_{t-k} / Σ_{k=0..t} decay^k`` — the
    adjusted exponential smoother (pandas ``ewm(adjust=True)``), which
    the bounded window fold converges to as n grows.

    Physical strategy: a sequential per-key recurrence cannot be a window
    expression, so this is the documented Pandas-UDF escape hatch —
    ``applyInPandas`` per ``by`` group over Arrow batches, one shuffle on
    the key, vectorized ``ewm`` inside (no Python-per-row).  Each key
    group must fit an executor Arrow batch: for tick data partition by
    (sym, day)-grade keys, exactly how kerf shards its folio tables.
    """
    from pyspark.sql import types as T

    if not by:
        from ..errors import ArgsError

        raise ArgsError("ema_exact requires at least one `by` key")
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.DoubleType())]
    )
    order_cols = list(order)
    alpha = 1.0 - decay

    def fn(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        pdf[out] = pdf[col].ewm(alpha=alpha, adjust=True).mean()
        return pdf

    return df.groupBy(*[F.col(c) for c in by]).applyInPandas(fn, schema)


def macd(
    df: DataFrame,
    col: str,
    by: Sequence[str],
    order: Sequence[str],
    fast_decay: float = 0.85,
    slow_decay: float = 0.925,
    signal_decay: float = 0.8,
) -> DataFrame:
    """MACD indicator family: fast EMA − slow EMA, a signal EMA of
    that difference, and their histogram — the classic trend gauge,
    expressed with kerf-style explicit decays (alpha = 1 − decay;
    the common span-12/26/9 parameterization is decay ≈ 0.846/0.926/
    0.8).  All three smoothers are the adjusted unbounded recurrence
    of :func:`ema_exact`, so the same physical strategy applies: ONE
    ``applyInPandas`` kernel per key group (one shuffle on the key,
    vectorized ``ewm`` inside — the signal EMA chains on the macd
    series, which no window expression can do), and the same fit-an-
    executor-batch precondition: partition by (sym, day)-grade keys.
    Appends ``macd``, ``signal``, ``hist`` columns.

    NULL handling follows pandas ``ewm(adjust=True)`` (``ignore_na=
    False``): a NaN contributes no value but its POSITION still decays
    earlier observations.  Filter nulls first when cross-engine
    reproducibility matters — closed-form oracles count list positions
    in the denominator and diverge from pandas on null inputs."""
    from pyspark.sql import types as T

    if not by:
        from ..errors import ArgsError

        raise ArgsError("macd requires at least one `by` key")
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("macd", T.DoubleType()),
            T.StructField("signal", T.DoubleType()),
            T.StructField("hist", T.DoubleType()),
        ]
    )
    order_cols = list(order)
    a_fast, a_slow, a_sig = (
        1.0 - fast_decay,
        1.0 - slow_decay,
        1.0 - signal_decay,
    )

    def fn(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        fast = pdf[col].ewm(alpha=a_fast, adjust=True).mean()
        slow = pdf[col].ewm(alpha=a_slow, adjust=True).mean()
        line = fast - slow
        sig = line.ewm(alpha=a_sig, adjust=True).mean()
        pdf["macd"] = line
        pdf["signal"] = sig
        pdf["hist"] = line - sig
        return pdf

    return df.groupBy(*[F.col(c) for c in by]).applyInPandas(fn, schema)


def weighted_median(
    df: DataFrame,
    value: str,
    weight: str,
    by: Sequence[str],
    tiebreak: Sequence[str] = (),
    out: str = "wmedian",
) -> DataFrame:
    """Per-group weighted median: the smallest ``value`` whose cumulative
    ``weight`` reaches half the group total — the tick-analytics median
    (median price weighted by size) kerf expresses as a fold over the
    sorted column.

    Physical strategy: one shuffle on ``by``; a running-sum window and
    the group-total window REUSE that exchange (same partition keys), so
    the whole aggregate costs a single exchange + in-partition sort.
    ``tiebreak`` columns make the cumulative order total, hence the
    result deterministic across engines and partitionings.  Weights that
    are integral (counts, lot sizes) sum exactly in doubles, so the
    half-total comparison is engine-portable with no rounding step.
    """
    keys = list(by)
    cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__v"), *[F.col(t) for t in tiebreak])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*keys)
    staged = df.select(
        *keys,
        F.col(value).alias("__v"),
        F.col(weight).cast("double").alias("__w"),
        *[F.col(t) for t in tiebreak],
    ).select(
        *keys,
        "__v",
        F.sum("__w").over(cum).alias("__cumw"),
        F.sum("__w").over(tot).alias("__tot"),
    )
    return (
        staged.where(F.col("__cumw") * 2 >= F.col("__tot"))
        .groupBy(*keys)
        .agg(F.min("__v").alias(out))
    )
