"""Custom stateful streaming sessionizer (applyInPandasWithState with
event-time timeouts): sessions close on gap within a run and when the
watermark passes an idle session's end + gap across runs. Runs use
trigger(availableNow=True) drain-restart loops — the incremental-batch
pattern a scheduled pipeline uses — with state persisting in the
checkpoint between runs."""

from datetime import datetime

from pytorch_ie_spark.streaming.stateful import stream_sessionize


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _drain(spark, in_dir, ckpt, out_dir):
    """One availableNow drain-run: process everything available, append
    closed sessions to out_dir via foreachBatch (a sink that supports
    checkpoint recovery, unlike the memory sink), stop. Returns ALL rows
    accumulated in out_dir so far."""
    import os

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    sessions = stream_sessionize(
        stream, gap_minutes=30, watermark_delay="1 minutes"
    )

    def sink(bdf, _bid):
        bdf.write.mode("append").parquet(out_dir)

    q = (
        sessions.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "availableNow drain did not terminate"
    if not os.path.exists(out_dir):
        return []
    return spark.read.parquet(out_dir).collect()


def test_stream_sessionize_gap_then_watermark_close(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    # run 1: user 1 has two sessions separated by > 30 min (the second
    # still open at end of data); user 2 one open session
    _write_batch(
        spark,
        in_dir,
        [
            (1, 1, datetime(2024, 1, 1, 10, 0, 0), 1.0),
            (2, 1, datetime(2024, 1, 1, 10, 10, 0), 2.0),
            (3, 1, datetime(2024, 1, 1, 11, 0, 1), 3.0),
            (4, 2, datetime(2024, 1, 1, 9, 0, 0), 10.0),
        ],
    )
    out = str(tmp_path / "out")
    rows = _drain(spark, in_dir, ckpt, out)
    closed = {(r["user_id"], r["n_events"], r["total_value"]) for r in rows}
    # user 1's FIRST session closed by the in-data gap; user 2's idle
    # session closed by the watermark (11:00 event -> watermark 10:59,
    # past user 2's 9:00 end + 30 min gap). User 1's second session
    # (end 11:00:01) is still ahead of the watermark -> open.
    assert closed == {(1, 2, 3.0), (2, 1, 10.0)}

    # run 2: a next-day event pushes the watermark far past every open
    # session's end + gap -> user 1's second session closes (one more
    # drain so the advanced watermark is applied to the timeout check)
    _write_batch(spark, in_dir, [(5, 3, datetime(2024, 1, 2, 12, 0, 0), 1.0)])
    _drain(spark, in_dir, ckpt, out)
    rows = _drain(spark, in_dir, ckpt, out)  # cumulative parquet
    closed = {(r["user_id"], r["n_events"], r["total_value"]) for r in rows}
    assert (1, 1, 3.0) in closed  # user 1's second session (event 3)
    # user 3's new session stays open: the watermark has not passed it
    assert not any(u == 3 for u, _, _ in closed)


def test_stream_sessionize_extends_open_session(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        spark, in_dir, [(1, 7, datetime(2024, 1, 1, 10, 0, 0), 2.5)]
    )
    out = str(tmp_path / "out")
    rows = _drain(spark, in_dir, ckpt, out)
    assert rows == []  # open session, watermark behind -> nothing closed
    # a second event within the gap extends the same session; a third far
    # past the gap closes it with the two accumulated events
    _write_batch(
        spark,
        in_dir,
        [
            (2, 7, datetime(2024, 1, 1, 10, 5, 0), 1.5),
            (3, 7, datetime(2024, 1, 1, 20, 0, 0), 9.0),
        ],
    )
    rows = _drain(spark, in_dir, ckpt, out)
    assert len(rows) == 1
    r = rows[0]
    assert r["n_events"] == 2 and r["total_value"] == 4.0
    assert r["session_start"] == datetime(2024, 1, 1, 10, 0, 0)
    assert r["session_end"] == datetime(2024, 1, 1, 10, 5, 0)
