"""Sessionization (batch) + Structured Streaming windowed counts."""

from datetime import datetime

from pyspark.sql import functions as F

from pytorch_ie_spark.streaming.sessions import (
    sessionize,
    stream_windowed_counts,
    windowed_event_counts,
)


def _events(spark):
    rows = [
        # user 1: two sessions (gap > 30 min between e2 and e3)
        (1, 1, datetime(2024, 1, 1, 10, 0, 0), "click", 1.0),
        (2, 1, datetime(2024, 1, 1, 10, 10, 0), "view", 2.0),
        (3, 1, datetime(2024, 1, 1, 11, 0, 1), "click", 3.0),
        # user 2: one session
        (4, 2, datetime(2024, 1, 1, 9, 0, 0), "purchase", 10.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    ).withColumn("props", F.lit("{}"))


def test_sessionize_gap_splits(spark):
    out = sessionize(_events(spark), gap_minutes=30).collect()
    by_key = {(r["user_id"], r["session_seq"]): r for r in out}
    assert len(by_key) == 3
    assert by_key[(1, 0)]["n_events"] == 2
    assert by_key[(1, 1)]["n_events"] == 1
    assert by_key[(2, 0)]["n_events"] == 1
    assert by_key[(1, 0)]["total_value"] == 3.0


def test_windowed_counts_batch(spark):
    out = windowed_event_counts(_events(spark), minutes=60).collect()
    clicks = [r for r in out if r["event_type"] == "click"]
    assert sum(r["n_events"] for r in clicks) == 2
    assert len(clicks) == 2  # 10:00 window and 11:00 window


def test_structured_streaming_memory_sink(spark, sf_dir, tmp_path):
    # the file stream source requires a directory of files
    import shutil

    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", in_dir / "events.parquet")
    q = stream_windowed_counts(
        spark,
        str(in_dir),
        str(tmp_path / "ckpt"),
        query_name="t_stream_counts",
        minutes=60,
    )
    try:
        q.processAllAvailable()
        # update-mode memory sink accumulates per-trigger updated rows; the
        # final value per key is the max (counts only grow across triggers)
        rows = spark.sql(
            "SELECT window_start, event_type, max(n_events) AS n_events "
            "FROM t_stream_counts GROUP BY 1, 2"
        ).collect()
        assert len(rows) > 0
        batch = windowed_event_counts(
            spark.read.parquet(f"{sf_dir}/events.parquet"), minutes=60
        )
        # stream result must equal the batch computation on the same input
        stream_total = sum(r["n_events"] for r in rows)
        batch_total = sum(r["n_events"] for r in batch.collect())
        assert stream_total == batch_total
    finally:
        q.stop()


def test_asof_last_event_semantics(spark):
    from datetime import datetime

    from pytorch_ie_spark.streaming.sessions import asof_last_event

    rows = [
        # user 1: click, click, purchase -> matches latest prior click;
        # a click at the exact purchase ts counts (>= semantics)
        (1, 1, datetime(2024, 1, 1, 10, 0, 0), "click", 0.0),
        (2, 1, datetime(2024, 1, 1, 10, 5, 0), "click", 0.0),
        (3, 1, datetime(2024, 1, 1, 10, 5, 0), "purchase", 9.0),
        (4, 1, datetime(2024, 1, 1, 11, 0, 0), "purchase", 5.0),
        # user 2: purchase with no prior click -> null
        (5, 2, datetime(2024, 1, 1, 9, 0, 0), "purchase", 1.0),
        (6, 2, datetime(2024, 1, 1, 9, 30, 0), "click", 0.0),
        # other event types must be ignored
        (7, 1, datetime(2024, 1, 1, 10, 59, 0), "view", 0.0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    out = {r["event_id"]: r["asof_ts"] for r in asof_last_event(events).collect()}
    assert out[3] == datetime(2024, 1, 1, 10, 5, 0)  # same-ts click matches
    assert out[4] == datetime(2024, 1, 1, 10, 5, 0)  # view ignored
    assert out[5] is None  # no prior click
