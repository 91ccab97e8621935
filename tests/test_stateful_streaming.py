"""applyInPandasWithState sessionization (streaming/stateful.py): the
stateful-stream analog of the oracle-green batch ``sessionize`` entry.
Drives a real Structured Streaming query over a file source with one
file per micro-batch (maxFilesPerTrigger=1 + availableNow), so sessions
close across batch boundaries and the event-time timeout actually fires
as the watermark advances."""

import datetime as dt
import os
import time




def _write_batch(spark, path, rows, mtime):
    # ONE plain parquet file (a df.write.parquet DIRECTORY would be
    # invisible to the file stream source's top-level listing)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
                "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            }
        ),
        path,
    )
    os.utime(path, (mtime, mtime))


def _t(sec):
    return dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(seconds=sec)


def test_streaming_sessionize_closes_and_times_out(spark, tmp_path):
    from beetle_search_engine_spark.streaming.stateful import streaming_sessionize

    src = tmp_path / "stream_in"
    src.mkdir()
    now = time.time()
    # batch A: user 1 two close events; user 2 one event
    _write_batch(
        spark, str(src / "a.parquet"),
        [(1, _t(1000), 1.0), (1, _t(1100), 1.0), (2, _t(1000), 5.0)],
        now - 30,
    )
    # batch B: user 1 gap > 1800 closes session 0; user 2 continues;
    # user 3 pushes the watermark to 50000
    _write_batch(
        spark, str(src / "b.parquet"),
        [(1, _t(5000), 7.0), (2, _t(2000), 2.5), (3, _t(50_000), 9.0)],
        now - 20,
    )
    # batch C: far-future event -> watermark passes every open session's
    # (last + gap), firing the event-time timeouts for users 1 and 2
    _write_batch(
        spark, str(src / "c.parquet"), [(99, _t(200_000), 0.0)], now - 10,
    )
    # batch D: one more advance so user 3's and 99's tails also flush
    _write_batch(
        spark, str(src / "d.parquet"), [(98, _t(400_000), 0.0)], now - 5,
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sessions = streaming_sessionize(stream, gap_s=1800, watermark="0 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_epoch"], r["session_value"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    base = int(_t(0).timestamp())
    # user 1: session 0 closed by the gap rule mid-stream; session 1 by timeout
    assert got[(1, 0)] == (2, base + 1000, 2.0)
    assert got[(1, 1)] == (1, base + 5000, 7.0)
    # user 2: one session spanning batches A+B, closed by timeout
    assert got[(2, 0)] == (2, base + 1000, 7.5)
    # user 3: flushed once the batch-D watermark passed 50000 + gap
    assert got[(3, 0)] == (1, base + 50_000, 9.0)
    # user 98/99's tails may legitimately still be open state
    assert set(got) >= {(1, 0), (1, 1), (2, 0), (3, 0)}


def test_streaming_sessionize_matches_batch_twin(spark, tmp_path):
    """Every session the stream CLOSES must equal the batch window-scan
    sessionizer's row for the same events (the driver-green `sessionize`
    logic), modulo still-open tails."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from beetle_search_engine_spark.streaming.stateful import streaming_sessionize

    rows = [
        (u, _t(t), float(v))
        for u, t, v in [
            (1, 0, 1), (1, 500, 2), (1, 3000, 3), (1, 3100, 4), (1, 9000, 5),
            (2, 100, 1), (2, 5000, 2),
        ]
    ]
    src = tmp_path / "stream_in2"
    src.mkdir()
    now = time.time()
    _write_batch(spark, str(src / "a.parquet"), rows, now - 20)
    _write_batch(spark, str(src / "z.parquet"), [(99, _t(10_000_000), 0.0)], now - 10)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_sessionize(stream, gap_s=1800, watermark="0 seconds")
        .writeStream.format("memory").queryName("sess_twin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_epoch"], r["session_value"])
        for r in spark.sql("SELECT * FROM sess_twin WHERE user_id != 99").collect()
    }

    # batch twin: the window-scan gap sessionizer over the same rows
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = (
        ev.withColumn("new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_id", F.sum("new").over(w) - 1)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.col("ts").cast("long")).alias("start_epoch"),
            F.sum("value").alias("session_value"),
        )
    )
    want = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_epoch"], r["session_value"])
        for r in sess.collect()
    }
    assert got == want  # all sessions closed (the z-file watermark flushed every tail)


def test_streaming_sessionize_late_event_across_batches(spark, tmp_path):
    """An out-of-order event in a LATER micro-batch (older than the open
    session's last, within watermark) extends the session backwards —
    it must not regress `last` (spurious split) and must pull `start`
    earlier, matching the batch scan over the same global event set."""
    from beetle_search_engine_spark.streaming.stateful import streaming_sessionize

    src = tmp_path / "stream_late"
    src.mkdir()
    now = time.time()
    _write_batch(spark, str(src / "a.parquet"), [(1, _t(1000), 1.0)], now - 30)
    # t=900 is late (older than state's last=1000) but within the 1h
    # watermark; t=2750 is 1750s after the TRUE last (1000) — inside the
    # 1800s gap, but 1850s after the late event, so a regressed `last`
    # would split here
    _write_batch(
        spark, str(src / "b.parquet"), [(1, _t(900), 2.0), (1, _t(2750), 4.0)], now - 20
    )
    _write_batch(spark, str(src / "c.parquet"), [(99, _t(10_000_000), 0.0)], now - 10)
    _write_batch(spark, str(src / "d.parquet"), [(98, _t(20_000_000), 0.0)], now - 5)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_sessionize(stream, gap_s=1800, watermark="1 hour")
        .writeStream.format("memory").queryName("sess_late")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_epoch"], r["session_value"])
        for r in spark.sql("SELECT * FROM sess_late WHERE user_id = 1").collect()
    }
    base = int(_t(0).timestamp())
    # ONE session covering all three events — the batch scan's answer
    assert got == {(1, 0): (3, base + 900, 7.0)}


def test_streaming_sessionize_late_beyond_gap_splits(spark, tmp_path):
    """A cross-batch straggler MORE than gap_s older than the open
    session's start must become its own earlier session (the batch scan
    would never merge it), not extend the open session backwards; a
    straggler that a later event BRIDGES back within gap_s merges into
    the open session as batch semantics require."""
    from beetle_search_engine_spark.streaming.stateful import streaming_sessionize

    src = tmp_path / "stream_split"
    src.mkdir()
    now = time.time()
    # user 1: open session starts at t=10000; batch b delivers t=1000 and
    # t=1500 — both > 1800s older than start=10000, chained among
    # themselves -> ONE separate early session (2 events, start 1000).
    # user 2: open session at t=10000; batch b delivers t=7500 (beyond
    # gap of start) THEN t=9000, which is within gap of start AND within
    # gap of 7500 -> the chain bridges, everything merges into one
    # session starting at 7500.
    _write_batch(
        spark, str(src / "a.parquet"),
        [(1, _t(10_000), 1.0), (2, _t(10_000), 1.0)], now - 30,
    )
    _write_batch(
        spark, str(src / "b.parquet"),
        [(1, _t(1000), 2.0), (1, _t(1500), 3.0),
         (2, _t(7500), 2.0), (2, _t(9000), 3.0)],
        now - 20,
    )
    # watermark pushers: flush every open tail
    _write_batch(spark, str(src / "c.parquet"), [(99, _t(10_000_000), 0.0)], now - 10)
    _write_batch(spark, str(src / "d.parquet"), [(98, _t(20_000_000), 0.0)], now - 5)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_sessionize(stream, gap_s=1800, watermark="1 hour")
        .writeStream.format("memory").queryName("sess_split")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_epoch"], r["session_value"])
        for r in spark.sql("SELECT * FROM sess_split WHERE user_id IN (1, 2)").collect()
    }
    base = int(_t(0).timestamp())
    assert got == {
        # user 1: the early chain is its own session; the open session
        # (sid bumped past it) flushed by the watermark timeout
        (1, 0): (2, base + 1000, 5.0),
        (1, 1): (1, base + 10_000, 1.0),
        # user 2: bridged -> one merged session
        (2, 0): (3, base + 7500, 6.0),
    }


def test_streaming_sessionize_straggler_bridged_by_later_batch(spark, tmp_path):
    """The round-6 review scenario: a straggler beyond the gap of the
    open session (batch B, t=7000 vs start=10000) must NOT be flushed at
    end of batch, because a later in-watermark batch (C, t=8300) bridges
    the chain 7000 -> 8300 -> 10000 into ONE batch-semantics session.
    Emission is watermark-gated, so the stream reports exactly the batch
    scan's single 3-event session."""
    from beetle_search_engine_spark.streaming.stateful import streaming_sessionize

    src = tmp_path / "stream_bridge"
    src.mkdir()
    now = time.time()
    _write_batch(spark, str(src / "a.parquet"), [(1, _t(10_000), 1.0)], now - 40)
    # watermark after batch a = 10000 - 3600 = 6400 < 7000: in-watermark
    _write_batch(spark, str(src / "b.parquet"), [(1, _t(7000), 2.0)], now - 30)
    _write_batch(spark, str(src / "c.parquet"), [(1, _t(8300), 4.0)], now - 20)
    # flush the tail
    _write_batch(spark, str(src / "d.parquet"), [(99, _t(10_000_000), 0.0)], now - 10)
    _write_batch(spark, str(src / "e.parquet"), [(98, _t(20_000_000), 0.0)], now - 5)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_sessionize(stream, gap_s=1800, watermark="1 hour")
        .writeStream.format("memory").queryName("sess_bridge")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_epoch"], r["session_value"])
        for r in spark.sql("SELECT * FROM sess_bridge WHERE user_id = 1").collect()
    }
    base = int(_t(0).timestamp())
    assert got == {(1, 0): (3, base + 7000, 7.0)}
