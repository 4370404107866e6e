"""End-to-end tick-database pipeline: the composition a kerf user runs.

stream-ingest events -> date-partitioned workspace table -> as-of join
-> xbar bars -> kerf-SQL on the result.  Each stage is covered by unit
tests elsewhere; this pins that they compose (schemas, ts_ns convention,
partition discipline survive across stage boundaries).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_tick_pipeline_end_to_end(spark, tables, tmp_path):
    from kerf_spark.functions import temporal as TM
    from kerf_spark.operators.asof import asof_join
    from kerf_spark.plans.kerfsql import kerf_sql
    from kerf_spark.sources.catalog import Workspace
    from kerf_spark.streaming.ingest import (
        read_file_stream,
        with_event_time,
        write_partitioned,
    )

    ev = tables["events"]

    # 1. feed-handler ingestion: file stream -> date-partitioned parquet
    src = str(tmp_path / "feed")
    ev.limit(400).write.parquet(src)
    stream = with_event_time(
        read_file_stream(spark, src, ev.schema), "ts"
    ).withColumn("date", F.to_date("__event_time"))
    q = write_partitioned(
        stream.drop("__event_time"),
        path=str(tmp_path / "ticks"),
        checkpoint=str(tmp_path / "ck"),
        partition_by=("date",),
    )
    # availableNow-style: let the single batch drain, then stop
    q.processAllAvailable()
    q.stop()

    # 2. register in the workspace (folio discipline: partitioned by date)
    ws = Workspace(spark, str(tmp_path / "ws"))
    ingested = spark.read.parquet(str(tmp_path / "ticks"))
    assert ingested.count() == 400
    ws.save("ticks", ingested, partition_by=["date"], sort_by=["ts"])

    # 3. as-of enrich: latest prior event value per user (self as-of)
    ticks = ws.load("ticks")
    anchors = ticks.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("anchor_id")
    )
    history = ticks.select("user_id", "ts", F.col("value").alias("prev_value"))
    enriched = asof_join(
        anchors, history, on="ts", by="user_id", right_cols=["prev_value"]
    )
    assert enriched.count() == anchors.count()  # left preserved exactly
    # every anchor has itself at ts<=ts, so prev_value is never null
    assert enriched.where(F.col("prev_value").isNull()).count() == 0

    # 4. xbar bars over the ingested table
    bars = (
        ticks.withColumn("bar", TM.xbar("ts", TM.span_ns(5, "m")))
        .groupBy("bar")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    assert bars.agg(F.sum("n")).head()[0] == 400

    # 5. kerf-SQL over the enriched result
    enriched.createOrReplaceTempView("enriched")
    out = kerf_sql(
        spark,
        "select n: count(*), hi: max(prev_value) by user_id from enriched "
        "where prev_value > 0 order by user_id limit 5",
    )
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert set(out.columns) == {"user_id", "n", "hi"}


def test_streaming_ema_matches_batch_across_microbatches(spark, tables, tmp_path):
    """Two files fed as *sequential* micro-batches must produce exactly
    the batch ema_exact over the union — proving the per-key (num, den)
    state carries correctly across batch boundaries."""
    import pandas as pd

    from kerf_spark.operators.windows import ema_exact
    from kerf_spark.streaming.ingest import streaming_ema

    ev = (
        tables["events"]
        .where(F.col("user_id") < 8)
        .select("user_id", "ts", "value")
    )
    # time-split halves: per key, file 1 strictly precedes file 2
    cut = ev.approxQuantile("ts", [0.5], 0.0)[0]
    src = str(tmp_path / "ema_feed")
    ev.where(F.col("ts") <= cut).coalesce(1).write.parquet(src)
    ev.where(F.col("ts") > cut).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(src)
    )
    out = streaming_ema(stream, ["user_id"], "value", ["ts"], decay=0.9)
    q = (
        out.writeStream.format("memory")
        .queryName("ema_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = (
        spark.table("ema_stream")
        .orderBy("user_id", "ts")
        .toPandas()[["user_id", "ts", "ema"]]
    )
    want = (
        ema_exact(ev, "value", by=["user_id"], order=["ts"], decay=0.9)
        .orderBy("user_id", "ts")
        .toPandas()[["user_id", "ts", "ema"]]
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_exact=False, rtol=1e-9,
    )


def test_socket_feed_handler_end_to_end(spark, tmp_path):
    """The reference's TRANSMITTER socket pump (bus.h:7-251) on Spark: a
    real loopback TCP server emits JSON tick lines; readStream's socket
    source feeds the shared wire parser; rows land typed and complete."""
    import json
    import socket
    import threading
    import time

    from kerf_spark.streaming.ingest import read_socket_stream

    ticks = [
        {"event_id": i, "ts": 1_700_000_000_000_000_000 + i * 1_000_000,
         "user_id": i % 3, "event_type": "tick", "value": i * 1.5}
        for i in range(20)
    ]

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def pump():
        conn, _ = srv.accept()
        with conn:
            payload = "".join(json.dumps(t) + "\n" for t in ticks)
            conn.sendall(payload.encode())
            stop.wait(30)  # hold the connection open while Spark drains

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        schema = ("event_id bigint, ts bigint, user_id bigint, "
                  "event_type string, value double")
        feed = read_socket_stream(spark, "127.0.0.1", port, schema=schema)
        got: list = []
        q = (
            feed.writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(lambda df, _id: got.extend(df.collect()))
            .start()
        )
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline and len(got) < len(ticks):
            q.processAllAvailable()
            time.sleep(0.2)
        q.stop()
    finally:
        stop.set()
        srv.close()

    assert len(got) == len(ticks)
    by_id = {r["event_id"]: r for r in got}
    assert by_id[7]["value"] == 10.5
    assert by_id[7]["ts"] == ticks[7]["ts"]
    assert all(r["event_type"] == "tick" for r in got)


def test_streamed_sink_registers_and_compacts(spark, tables, tmp_path):
    """The streaming sink's output adopts into the Workspace catalog
    (register_external) and gains the maintenance surface: per-batch
    small files compact to one file per partition; retention drops a
    date."""
    from pyspark.sql import functions as F

    from kerf_spark.sources.catalog import Workspace
    from kerf_spark.sources.io import read_table
    from kerf_spark.streaming.ingest import stream_table, write_partitioned

    sf = "/root/testdata/sf0.001"
    feed = stream_table(spark, sf, "events", maxFilesPerTrigger=1)
    feed = feed.withColumn(
        "date", F.date_format(F.timestamp_micros((F.col("ts") / 1000).cast("long")), "yyyy-MM-dd")
    )
    out = str(tmp_path / "sink")
    q = write_partitioned(
        feed, out, str(tmp_path / "ckpt"), partition_by=("date",)
    )
    q.processAllAvailable()
    q.stop()

    ws = Workspace(spark, str(tmp_path / "ws"))
    ws.register_external("ticks", out, partition_by=["date"])
    n = ws.load("ticks").count()
    assert n == read_table(spark, sf, "events").count()
    stats = ws.compact("ticks")
    assert stats["files_after"] <= stats["files_before"]
    dates = sorted(
        r.date for r in ws.load("ticks").select("date").distinct().collect()
    )
    assert len(dates) >= 2
    dropped = ws.drop_partitions("ticks", [dates[0]])
    assert dropped == 1
    after = ws.load("ticks")
    assert after.count() < n
    assert dates[0] not in {r.date for r in after.select("date").distinct().collect()}


def test_streaming_volume_bars_match_batch_across_microbatches(
    spark, tables, tmp_path
):
    """Sequential micro-batches must assign the identical volume-bar
    ids as the batch operator over the union — the per-key running
    total carries across batch boundaries."""
    from kerf_spark.operators.windows import volume_bars
    from kerf_spark.streaming.ingest import streaming_volume_bars

    ev = (
        tables["events"]
        .where(F.col("user_id") < 6)
        .select("user_id", "ts", "event_id", "value")
    )
    cut = ev.approxQuantile("ts", [0.5], 0.0)[0]
    src = str(tmp_path / "vb_feed")
    ev.where(F.col("ts") <= cut).coalesce(1).write.parquet(src)
    ev.where(F.col("ts") > cut).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_volume_bars(
        stream, ["user_id"], "value", 2000.0, ["ts", "event_id"]
    )
    q = (
        out.writeStream.format("memory")
        .queryName("vb_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["user_id"], r["event_id"]): r["bar_id"]
        for r in spark.table("vb_stream").collect()
    }
    want = {
        (r["user_id"], r["event_id"]): r["bar_id"]
        for r in volume_bars(
            ev, "value", 2000.0, ["ts", "event_id"], by=["user_id"]
        ).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_fanout_two_sinks_exactly_once_across_restart(spark, tmp_path):
    """Feed fanout (bus.h:119): ONE checkpointed stream drives two
    parquet sinks through foreachBatch.  Across a stop + restart with
    more data, BOTH sinks hold every source record exactly once — and
    a deliberately replayed epoch (the crash-recovery delivery) leaves
    the sinks unchanged, proving the epoch-directory overwrite is the
    idempotence mechanism, not luck."""
    from pyspark.sql import functions as F

    from kerf_spark.streaming.ingest import (
        fanout, parquet_epoch_sink, read_file_stream,
    )

    src = tmp_path / "src"
    a_dir, b_dir = str(tmp_path / "sink_a"), str(tmp_path / "sink_b")
    ckpt = str(tmp_path / "ckpt")
    rows = [(i, f"t{i % 3}", float(i)) for i in range(40)]
    base = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    for part in range(2):  # first run: two files -> two epochs
        base.where(F.col("event_id") % 4 == part).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"part{part}"))

    sink_a = parquet_epoch_sink(a_dir)
    sink_b = parquet_epoch_sink(b_dir, partition_by=["event_type"])

    def run_once():
        feed = read_file_stream(
            spark, str(src / "part*"), base.schema, maxFilesPerTrigger=1
        )
        q = fanout(feed, ckpt, sink_a, sink_b, available_now=True)
        q.awaitTermination()

    run_once()
    # restart with two MORE files on the same checkpoint
    for part in range(2, 4):
        base.where(F.col("event_id") % 4 == part).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"part{part}"))
    run_once()

    def ids(path):
        return sorted(
            r.event_id for r in spark.read.parquet(path).collect()
        )

    want = sorted(r[0] for r in rows)
    assert ids(a_dir) == want  # every record exactly once, no dupes
    assert ids(b_dir) == want
    # sink B really is partitioned by event_type inside each epoch
    assert any(
        p.name.startswith("event_type=")
        for epoch in (tmp_path / "sink_b").iterdir() if epoch.is_dir()
        for p in epoch.iterdir()
    )
    # crash-recovery delivery: replay an old epoch verbatim -> no change
    replay = spark.read.parquet(str(src / "part0"))
    sink_a(replay, 0)
    sink_b(replay, 0)
    assert ids(a_dir) == want
    assert ids(b_dir) == want


def test_fanout_socket_rebroadcast(spark, tmp_path):
    """The re-broadcast arm of bus.h:119: one stream fans to a parquet
    sink AND a live loopback TCP receiver; the receiver gets every
    record as a JSON wire line (executor-side connections, no driver
    collect in the sink)."""
    import json
    import socket
    import threading

    from kerf_spark.streaming.ingest import (
        fanout, parquet_epoch_sink, read_file_stream,
        socket_rebroadcast_sink,
    )

    rows = [(i, float(i) * 2.0) for i in range(30)]
    base = spark.createDataFrame(rows, "event_id long, value double")
    src = tmp_path / "src"
    base.coalesce(1).write.parquet(str(src / "part0"))

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(8)
    port = srv.getsockname()[1]
    got: list[dict] = []
    done = threading.Event()

    def receiver():
        while not done.is_set():
            try:
                srv.settimeout(0.5)
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            except OSError:  # server closed during teardown
                return
            with conn:
                data = b""
                while True:
                    chunk = conn.recv(65536)
                    if not chunk:
                        break
                    data += chunk
            for line in data.decode().splitlines():
                if line.strip():
                    got.append(json.loads(line))

    t = threading.Thread(target=receiver, daemon=True)
    t.start()
    try:
        feed = read_file_stream(spark, str(src / "part*"), base.schema)
        q = fanout(
            feed,
            str(tmp_path / "ckpt"),
            parquet_epoch_sink(str(tmp_path / "sink_a")),
            socket_rebroadcast_sink("127.0.0.1", port),
            available_now=True,
        )
        q.awaitTermination()
        deadline = threading.Event()
        for _ in range(100):
            if len(got) >= len(rows):
                break
            deadline.wait(0.1)
    finally:
        done.set()
        srv.close()

    assert sorted(r["event_id"] for r in got) == [r[0] for r in rows]
    assert {r["event_id"]: r["value"] for r in got}[7] == 14.0
    pq = spark.read.parquet(str(tmp_path / "sink_a"))
    assert pq.count() == len(rows)


def test_workspace_index_registration(spark, tmp_path):
    """Persisted indexes are first-class workspace citizens: register
    records the sidecar's kind, indexes()/index_path() resolve them,
    queries run through the resolved path, drop_index forgets (and
    optionally deletes)."""
    import pytest

    from pyspark.sql import functions as F

    from kerf_spark.operators import annindex as AI
    from kerf_spark.operators import textindex as TI
    from kerf_spark.sources.catalog import Workspace

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ws = Workspace(spark, str(tmp_path / "ws"))

    ivf = str(tmp_path / "ivf")
    AI.build_ivf_index(emb, ivf, n_cells=8)
    ti = str(tmp_path / "ti")
    TI.build_text_index(docs, ti)

    assert ws.register_index("emb_ivf", ivf)["kind"] == "ivf"
    assert ws.register_index("docs_text", ti)["kind"] == "text"
    assert ws.indexes() == ["docs_text", "emb_ivf"]

    # queries run through the resolved path
    q = emb.where(F.col("vec_id") < 2)
    got = AI.ivf_topk_indexed(spark, ws.index_path("emb_ivf"), q, k=3)
    assert got.count() == 6
    assert (
        TI.keyword_search(
            spark, ws.index_path("docs_text"), ["merge"], "or"
        ).count()
        > 0
    )

    # manifest survives a reopen
    ws2 = Workspace(spark, str(tmp_path / "ws"))
    assert ws2.indexes() == ["docs_text", "emb_ivf"]

    with pytest.raises(ValueError, match="sidecar"):
        ws2.register_index("nope", str(tmp_path))
    ws2.drop_index("emb_ivf", delete=True)
    assert ws2.indexes() == ["docs_text"]
    import os as _os

    assert not _os.path.isdir(ivf)
    with pytest.raises(KeyError, match="emb_ivf"):
        ws2.index_path("emb_ivf")
