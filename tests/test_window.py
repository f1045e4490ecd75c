"""Window math contracts (mirrors reference tests/utils/test_window.py
semantics for utils/window.py:4-68)."""

from pytorch_ie_spark.functions.window import enumerate_windows, window_around_slice


def test_enumerate_windows_no_overlap():
    # 10 tokens, window 4: tiles of 4/4/2, each token labeled exactly once
    ws = enumerate_windows(10, 4, 0)
    assert ws == [((0, 4), (0, 4)), ((4, 8), (0, 4)), ((8, 10), (0, 2))]


def test_enumerate_windows_with_overlap():
    ws = enumerate_windows(12, 6, 2)
    # label slices cover every position exactly once (the extractor's
    # docstring promises exactly-once labeling; a prior version emitted a
    # duplicate trailing window when tok_end hit seq_len early)
    covered = []
    for (ts, te), (ls, le) in ws:
        covered.extend(range(ts + ls, ts + le))
    assert sorted(covered) == list(range(12))
    # interior windows carry `overlap` tokens of context
    assert ws[1][0][0] < ws[0][0][1]


def test_enumerate_windows_no_duplicate_trailing_window():
    # regression: seq_len=209 / max=128 / overlap=16 used to emit a third
    # window re-labeling position 208
    ws = enumerate_windows(209, 128, 16)
    covered = []
    for (ts, te), (ls, le) in ws:
        covered.extend(range(ts + ls, ts + le))
    assert sorted(covered) == list(range(209))


def test_enumerate_windows_short_seq_single_window():
    assert enumerate_windows(5, 128, 16) == [((0, 5), (0, 5))]


def test_enumerate_windows_col_matches_python(spark):
    """The closed-form JVM expression must reproduce the Python loop for
    every length across several (max_size, overlap) shapes."""
    from pyspark.sql import functions as F

    from pytorch_ie_spark.functions.window import enumerate_windows_col

    lengths = list(range(1, 420)) + [1023, 1199, 4096]
    for max_size, overlap in [(128, 16), (64, 0), (16, 5), (300, 120)]:
        df = spark.createDataFrame([(l,) for l in lengths], "seq_len long")
        rows = df.select(
            "seq_len",
            enumerate_windows_col(
                F.col("seq_len"), max_size, overlap
            ).alias("ws"),
        ).collect()
        for r in rows:
            got = [
                ((w["tok_start"], w["tok_end"]), (w["rel_start"], w["rel_end"]))
                for w in r["ws"]
            ]
            assert got == enumerate_windows(r["seq_len"], max_size, overlap), (
                r["seq_len"],
                max_size,
                overlap,
            )


def test_window_around_slice_centered():
    assert window_around_slice((10, 12), 6, 100) == (8, 14)


def test_window_around_slice_left_boundary():
    assert window_around_slice((0, 2), 6, 100) == (0, 6)


def test_window_around_slice_right_boundary():
    assert window_around_slice((98, 100), 6, 100) == (94, 100)


def test_window_around_slice_too_large_returns_none():
    assert window_around_slice((0, 10), 6, 100) is None


def test_window_around_slice_short_input():
    assert window_around_slice((1, 3), 10, 4) == (0, 4)


def test_hf_overflow_windows_contract():
    from pytorch_ie_spark.functions.window import hf_overflow_windows

    # 10 tokens, max 4, stride 1: each next window re-includes the last
    # token of the previous (HF return_overflowing_tokens semantics)
    assert hf_overflow_windows(10, 4, 1) == [(0, 4), (3, 7), (6, 10)]
    # full coverage, overlap exactly `stride` between consecutive windows
    for seq_len in (1, 4, 5, 23, 128):
        for max_len, stride in ((8, 0), (8, 3), (5, 4)):
            ws = hf_overflow_windows(seq_len, max_len, stride)
            assert ws[0][0] == 0 and ws[-1][1] == seq_len
            for (s1, e1), (s2, e2) in zip(ws, ws[1:]):
                assert s2 == e1 - stride
                assert e1 - s1 == max_len  # only the last may be short
    assert hf_overflow_windows(0, 8, 2) == []


def test_enumerate_windows_col_empty_sequence(spark):
    from pyspark.sql import functions as F

    from pytorch_ie_spark.functions.window import enumerate_windows_col

    df = spark.createDataFrame([(0,), (1,)], "seq_len long")
    rows = {r["seq_len"]: list(r["ws"]) for r in df.select(
        "seq_len", enumerate_windows_col(F.col("seq_len"), 128, 16).alias("ws")
    ).collect()}
    assert rows[0] == []  # matches the Python loop: no windows for len 0
    assert len(rows[1]) == 1
