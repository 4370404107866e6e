"""Structured Streaming ingestion: the feed-handler surface.

The reference declares the skeleton only — TRANSMITTER/EMITTER socket
pumps (bus.h:7-251), libevent loop (main.cc:83-97), fanout remark
(bus.h:119) — with append-optimized storage underneath.  We adopt
Spark's model wholesale (SURVEY.md §2.10): readStream -> event-time
transforms with watermarks -> partitioned parquet sink with
checkpointing.  That *is* the kerf tick-ingestion design point:
append-only, date-partitioned, snapshot-consistent readers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions import temporal as TM
from ..functions.temporal import span_ns


def read_file_stream(
    spark: SparkSession, path: str, schema, fmt: str = "parquet", **opts
) -> DataFrame:
    """Tail a directory as a stream (the file-drop feed handler)."""
    r = spark.readStream.format(fmt).schema(schema)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(path)


def stream_table(
    spark: SparkSession, sf_dir: str, name: str = "events", **opts
) -> DataFrame:
    """Tail one fixture table as a stream, ts_ns-normalized.

    ``readStream.schema(...)`` must match the file's *physical* schema,
    so the raw schema is probed first (one footer read), then the same
    read-edge promotion as the batch path (``sources.io.normalize_ts_ns``)
    runs on the stream — a ``ts`` column is epoch-ns LongType to every
    operator downstream regardless of the fixture's on-disk width.
    """
    from ..sources.io import normalize_ts_ns, read_table_raw

    raw = read_table_raw(spark, sf_dir, name)
    opts.setdefault("pathGlobFilter", f"{name}.parquet")
    return normalize_ts_ns(read_file_stream(spark, sf_dir, raw.schema, **opts))


def read_rate_stream(spark: SparkSession, rows_per_sec: int = 1000) -> DataFrame:
    """Synthetic tick source for tests/benchmarks."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
    )


def parse_feed_lines(
    lines: DataFrame,
    schema,
    fmt: str = "json",
    options: dict | None = None,
) -> DataFrame:
    """Decode a line-oriented feed (one record per ``value`` string) into
    typed columns — the wire-format half of the feed handler, shared by
    the socket source, file tailing of raw logs, and any future Kafka
    wiring (all of them surface the same single-string-column shape).

    ``schema`` is a StructType or DDL string; ``fmt`` is ``json`` or
    ``csv``.  Malformed lines land as all-null records (PERMISSIVE), so
    one bad tick never kills the feed; filter on a non-null key column
    downstream to drop them.  A ``ts`` long column is epoch-ns by the
    engine-wide convention and passes through untouched.
    """
    c = F.col("value").cast("string")
    if fmt == "json":
        rec = F.from_json(c, schema, options or {})  # StructType or DDL
    elif fmt == "csv":
        if hasattr(schema, "fields"):  # StructType -> DDL for from_csv
            schema = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
            )
        rec = F.from_csv(c, schema, options or {})
    else:
        raise ValueError(f"parse_feed_lines: unknown fmt {fmt!r}")
    return lines.select(rec.alias("__rec")).select("__rec.*")


def read_socket_stream(
    spark: SparkSession,
    host: str,
    port: int,
    schema=None,
    fmt: str = "json",
    options: dict | None = None,
) -> DataFrame:
    """Socket feed handler — the reference's TRANSMITTER/EMITTER socket
    pump (bus.h:7-251) and libevent accept loop (main.cc:83-97),
    re-expressed as Spark's socket source feeding the shared line
    decoder.  With ``schema=None`` the raw ``value`` lines stream
    through undecoded.

    The socket source is the dev/tick-replay transport (single
    receiver, no replay on failure — same durability class as the
    reference's in-process bus).  A durable production feed swaps in a
    replayable source (Kafka/file) ahead of the SAME parse → watermark →
    dedup → partitioned-sink chain; nothing downstream changes.
    """
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", int(port))
        .load()
    )
    if schema is None:
        return lines
    return parse_feed_lines(lines, schema, fmt, options)


def with_event_time(df: DataFrame, ts_ns_col: str) -> DataFrame:
    """Attach a µs event-time timestamp column derived from ts_ns (the
    watermark clock must be a TimestampType)."""
    # ns_to_us is an exact decimal floor-div: (ns / 1000).cast('long')
    # rounds through double for epoch-ns magnitudes (> 2^53) and lands
    # ~1-in-8 rows 1µs off, shifting them across window boundaries.
    return df.withColumn(
        "__event_time",
        F.timestamp_micros(TM.ns_to_us(F.col(ts_ns_col))),
    )


def deduped(
    df: DataFrame, keys: Sequence[str], delay: str = "10 minutes"
) -> DataFrame:
    """Stateful streaming dedup bounded by watermark — exactly-once-ish
    ingestion of an at-least-once feed."""
    return df.withWatermark("__event_time", delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def windowed_bars(
    df: DataFrame,
    value_col: str,
    width: str = "5 minutes",
    by: Sequence[str] | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming xbar: tumbling event-time bars with late-data handling.

    The streaming twin of ``temporal.xbar`` — same bucket semantics,
    plus watermark-driven state eviction so state stays bounded on an
    infinite feed.
    """
    keys = [F.window("__event_time", width).alias("bar")]
    keys += [F.col(c) for c in (by or [])]
    return (
        df.withWatermark("__event_time", delay)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
            F.first(value_col).alias("open"),
            F.last(value_col).alias("close"),
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    tolerance: str = "5 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: for each left row, right rows with the
    same keys and event time in ``[left_time - tolerance, left_time]``
    — the streaming twin of ``operators.asof.window_join`` (the
    trade←recent-quotes enrichment running on live feeds).

    Both sides must carry ``__event_time`` (see :func:`with_event_time`)
    and get watermarked with ``delay``; together with the closed time
    bound this lets Spark evict right-side state older than
    ``delay + tolerance`` — bounded state on infinite feeds, which is
    the whole trick of stream-stream joins.  Non-key right columns are
    suffixed ``_r`` to keep the joined schema unambiguous.
    """
    keys = list(on)
    l = left.withWatermark("__event_time", delay)
    r = right.withWatermark("__event_time", delay)
    for c in r.columns:
        if c not in keys:
            r = r.withColumnRenamed(c, f"{c}_r")
    cond = None
    for k in keys:
        eq = l[k] == r[k]
        cond = eq if cond is None else (cond & eq)
    rng = (F.col("__event_time_r") >= F.col("__event_time") - F.expr(
        f"INTERVAL {tolerance}"
    )) & (F.col("__event_time_r") <= F.col("__event_time"))
    out = l.join(r, cond & rng, "inner")
    # drop the duplicated key columns from the right side
    for k in keys:
        out = out.drop(r[k])
    return out


def static_asof_enrich(
    stream: DataFrame,
    static: DataFrame,
    on: str,
    by: Sequence[str] | str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Streaming as-of against a static reference table: each stream row
    gets the latest static row with ``static.on <= stream.on`` in its
    ``by`` group — live ticks enriched with reference data (the
    streaming twin of ``operators.asof.asof_join``).

    Plan: the static side compacts to ONE sorted struct-array per key
    (struct field order ``(on, *value_cols)`` makes array_max the
    argmax-by-(on, tiebreak...)), broadcast-joined onto the stream; the
    lookup is a JVM-side ``array_max(filter(...))`` — ZERO shuffle and
    zero state on the stream side, which is what makes it legal in a
    streaming plan (stream-static joins allow no stream-side
    re-aggregation).  Right-sized for dim-scale references (the compact
    index must broadcast); a fact-sized right side belongs in the batch
    as-of after ingest.
    """
    by = [by] if isinstance(by, str) else list(by)
    idx = static.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(on), *[F.col(c) for c in value_cols]))
        ).alias("__idx")
    )
    joined = stream.join(F.broadcast(idx), by, "left")
    best = F.array_max(
        F.filter(F.col("__idx"), lambda x: x[on] <= F.col(f"__stream_{on}"))
    )
    # stream.on shadows static.on inside the struct lambda; alias it
    joined = joined.withColumn(f"__stream_{on}", F.col(on))
    joined = joined.withColumn("__best", best).drop(f"__stream_{on}", "__idx")
    out = joined
    for c in value_cols:
        out = out.withColumn(c, F.col("__best")[c])
    return out.drop("__best")


def write_partitioned(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Sequence[str] = ("date",),
    trigger_secs: int | None = None,
) -> StreamingQuery:
    """Sink: append-only date-partitioned parquet with checkpointing —
    the folio discipline (append new date partitions only,
    presented.h:420-425) under exactly-once file-sink semantics."""
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*list(partition_by))
        .outputMode("append")
    )
    if trigger_secs:
        w = w.trigger(processingTime=f"{trigger_secs} seconds")
    return w.start()


def running_stats(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Custom stateful streaming operator (SURVEY §2.10 / brief:
    ``applyInPandasWithState`` for operators Spark's windowed aggs can't
    express): per-key running count/sum/min/max maintained in the state
    store across micro-batches, emitted once per batch per updated key.

    This is the streaming twin of kerf's running ``unfold`` folds — the
    accumulator lives in versioned state (RocksDB/HDFS-backed on a real
    cluster), so a feed can run forever with O(keys) state, and a
    restart resumes from the checkpoint.  Per batch the work is one
    shuffle on ``keys``, then an Arrow-batched pandas kernel per group.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keys = list(keys)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keys
    )
    out_schema = f"{key_fields}, n long, total double, lo double, hi double"
    state_schema = "n long, total double, lo double, hi double"

    def update(key, pdfs, state: GroupState):
        n, total, lo, hi = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            v = pdf[value_col].dropna()
            if len(v) == 0:
                continue
            n += int(v.count())
            total += float(v.sum())
            bl, bh = float(v.min()), float(v.max())
            lo = bl if lo is None else min(lo, bl)
            hi = bh if hi is None else max(hi, bh)
        state.update((n, total, lo, hi))
        import pandas as pd

        yield pd.DataFrame(
            [tuple(key) + (n, total, lo, hi)],
            columns=keys + ["n", "total", "lo", "hi"],
        )

    return df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ema(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    order_cols: Sequence[str],
    decay: float = 0.9,
) -> DataFrame:
    """Streaming twin of ``operators.windows.ema_exact``: the adjusted
    EMA recurrence per key, carried across micro-batches in the state
    store.

    State is O(1) per key — the closed-form pair (num, den) with
    ``num_t = x_t + decay·num_{t-1}``, ``den_t = 1 + decay·den_{t-1}``
    and ``ema_t = num_t / den_t`` (identical to pandas
    ``ewm(adjust=True)``, so finite-stream output matches the batch
    operator bit-for-bit).  Every input row is emitted with its EMA.

    Rows are folded in ``order_cols`` order *within* each batch; cross-
    batch order is arrival order — the feed-handler contract (kerf's
    ticker plant appends in time order; an out-of-order replay belongs
    in the batch operator).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keys, order_cols = list(keys), list(order_cols)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_fields = ", ".join(f"{k} {fields[k]}" for k in keys)
    order_fields = ", ".join(f"{c} {fields[c]}" for c in order_cols)
    out_schema = (
        f"{key_fields}, {order_fields}, {value_col} double, ema double"
    )

    if not 0.0 < decay < 1.0:
        from ..errors import ArgsError

        raise ArgsError("streaming_ema needs 0 < decay < 1")

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        num, den = state.get if state.exists else (0.0, 0.0)
        outs = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(order_cols, kind="mergesort")
            x = pdf[value_col].astype(float).to_numpy()
            n = len(x)
            # batch-local adjusted EMA, vectorized (pandas ewm), then
            # the carried state folds in through the closed form:
            #   num_t = num_b_t + decay^(t+1) · num_prev
            #   den_t = den_b_t + decay^(t+1) · den_prev
            # decay^(t+1) underflowing to 0 for long batches is the
            # mathematically correct limit, so no stability guard needed
            dp = decay ** np.arange(1, n + 1)
            den_b = (1.0 - dp) / (1.0 - decay)
            m = pd.Series(x).ewm(alpha=1.0 - decay, adjust=True).mean().to_numpy()
            num_t = m * den_b + dp * num
            den_t = den_b + dp * den
            out = pdf[keys + order_cols].copy()
            out[value_col] = x
            out["ema"] = num_t / den_t
            outs.append(out)
            num, den = float(num_t[-1]), float(den_t[-1])
        state.update((num, den))
        if outs:
            yield pd.concat(outs)

    return df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="num double, den double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_drawdown(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """Streaming twin of the drawdown query: running cumulative value,
    running peak, and peak-to-trough drawdown per key, carried across
    micro-batches in the state store.

    State is O(1) per key — the pair (cum cents, peak cents), exact
    int64 (the same no-fp-association discipline as the batch twin:
    the only fp ops are the final /100 divisions).  Rows fold in
    ``order_cols`` order within each batch; cross-batch order is
    arrival order (the feed-handler contract).  Emits every input row
    with ``cum_value`` and ``drawdown``.

    Cents are computed JVM-side with the batch twin's own expression
    (``F.round(value*100)``, HALF_UP) before the stateful fold — the
    Python kernel only ever cumsum's exact int64, so no second
    rounding convention (numpy's is half-to-EVEN) can diverge from
    the shared oracle.  A NULL value contributes 0 to the running
    sum — the batch window-sum's null-skip semantics — instead of
    poisoning the carried state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keys, order_cols = list(keys), list(order_cols)
    df = df.withColumn(
        "__cents", F.round(F.col(value_col) * 100).cast("long")
    )
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_fields = ", ".join(f"{k} {fields[k]}" for k in keys)
    order_fields = ", ".join(f"{c} {fields[c]}" for c in order_cols)
    out_schema = (
        f"{key_fields}, {order_fields}, cum_value double, drawdown double"
    )

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        cum, peak = state.get if state.exists else (0, -(1 << 62))
        outs = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(order_cols, kind="mergesort")
            # int64-with-nulls arrives as float64/NaN through Arrow;
            # cents are < 2^53 so the float round-trip is exact
            cents = (
                np.nan_to_num(
                    pdf["__cents"].to_numpy(dtype=float), nan=0.0
                ).astype(np.int64)
            )
            cums = cum + np.cumsum(cents)
            peaks = np.maximum.accumulate(np.maximum(cums, peak))
            out = pdf[keys + order_cols].copy()
            out["cum_value"] = cums / 100.0
            out["drawdown"] = (peaks - cums) / 100.0
            outs.append(out)
            cum, peak = int(cums[-1]), int(peaks[-1])
        state.update((cum, peak))
        if outs:
            yield pd.concat(outs)

    return df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="cum bigint, peak bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_volume_bars(
    df: DataFrame,
    keys: Sequence[str],
    vol_col: str,
    threshold: float,
    order_cols: Sequence[str],
) -> DataFrame:
    """Streaming twin of ``operators.windows.volume_bars``: assign each
    tick its volume-bar id from a running per-key volume total carried
    across micro-batches in the state store (O(1) state: one double per
    key).  bar = which ``threshold``-sized block the running total
    lands in — identical to the batch rule (ceil(cum/threshold) - 1,
    floored at 0), so finite-stream output equals the batch operator
    for in-order feeds regardless of batching.

    Rows fold in ``order_cols`` order within each batch; cross-batch
    order is arrival order — the feed-handler contract shared with
    :func:`streaming_ema`.
    """
    import math

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keys, order_cols = list(keys), list(order_cols)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_fields = ", ".join(f"{k} {fields[k]}" for k in keys)
    order_fields = ", ".join(f"{c} {fields[c]}" for c in order_cols)
    out_schema = (
        f"{key_fields}, {order_fields}, {vol_col} double, bar_id bigint"
    )
    thr = float(threshold)
    if not thr > 0:
        from ..errors import ArgsError

        raise ArgsError("streaming_volume_bars needs threshold > 0")

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (cum,) = state.get if state.exists else (0.0,)
        outs = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(order_cols, kind="mergesort")
            v = pdf[vol_col].astype(float).fillna(0.0).to_numpy()
            run = v.cumsum() + cum
            bars = [max(math.ceil(round(c, 6) / thr) - 1, 0) for c in run]
            out = pdf[keys + order_cols].copy()
            out[vol_col] = v
            out["bar_id"] = pd.array(bars, dtype="int64")
            outs.append(out)
            cum = float(run[-1])
        state.update((cum,))
        if outs:
            yield pd.concat(outs)

    return df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="cum double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_batches(query: StreamingQuery, n_seconds: float) -> None:
    """Test helper: let a stream run briefly, then stop it cleanly."""
    import time

    time.sleep(n_seconds)
    query.stop()


# ------------------------------------------------------------- fanout
def parquet_epoch_sink(path: str, partition_by: Sequence[str] = ()):
    """Fanout sink: each micro-batch lands under ``path/epoch=<id>/``
    with overwrite semantics.  Idempotence is the whole design: after
    a crash/restart Spark REPLAYS the last uncommitted epoch into
    foreachBatch, and overwriting the same epoch directory absorbs the
    replay — exactly-once per sink with zero sink-side dedup state.
    Readers ``spark.read.parquet(path)`` see every epoch as a
    partition (the epoch column also records arrival batch — kerf's
    append-only tick-log discipline, presented.h:420-425)."""
    import os as _os

    partition_by = list(partition_by)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        w = batch.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(_os.path.join(path, f"epoch={int(epoch_id)}"))

    return sink


def socket_rebroadcast_sink(host: str, port: int):
    """Re-broadcast sink — bus.h:119: fanout is "highly useful if
    we're re-broadcasting to several machines on a network (feed
    handler)".  Each micro-batch is serialized to the JSON wire format
    ``parse_feed_lines`` decodes and written to ``host:port`` from the
    EXECUTORS (``foreachPartition`` — one connection per partition,
    no driver-side collect, so re-broadcast scales with the feed's own
    parallelism).  Delivery is at-least-once on epoch replay; pair
    with a keyed dedup downstream (streaming.deduped) when the
    receiver needs exactly-once."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        def send(lines) -> None:
            import socket

            conn = socket.create_connection((host, port))
            try:
                for line in lines:
                    conn.sendall(line.encode() + b"\n")
            finally:
                conn.close()

        batch.toJSON().foreachPartition(send)

    return sink


def fanout(
    feed: DataFrame,
    checkpoint: str,
    *sinks,
    available_now: bool = False,
    trigger_secs: int | None = None,
) -> StreamingQuery:
    """One feed → N sinks (bus.h:119) under ONE checkpointed stream.

    ``foreachBatch`` persists each micro-batch once, then runs every
    sink against the SAME materialized batch with the same epoch id —
    the source is read once per epoch no matter how many sinks hang
    off it (the reference's fanout motivation: don't re-pull a feed
    that may not fit in memory, bus.h:115-119).  Restart semantics:
    the replayed epoch reaches every sink again; idempotent sinks
    (:func:`parquet_epoch_sink`) absorb it, at-least-once sinks
    (:func:`socket_rebroadcast_sink`) document it.  A sink failure
    fails the epoch BEFORE the checkpoint commits, so no sink can
    silently miss an epoch the others got."""
    sinks = list(sinks)
    if not sinks:
        raise ValueError("fanout needs at least one sink")

    def route(batch: DataFrame, epoch_id: int) -> None:
        batch.persist()
        try:
            for s in sinks:
                s(batch, epoch_id)
        finally:
            batch.unpersist()

    w = feed.writeStream.foreachBatch(route).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_secs:
        w = w.trigger(processingTime=f"{trigger_secs} seconds")
    return w.start()
