"""Span-enumeration head: enumeration completeness (the reference's
start/end/length grid, transformer_span_classification.py:101-131),
threshold filtering, and multilabel emission."""

from pytorch_ie_spark.operators.span_enum import (
    enumerate_and_classify_spans,
    mock_span_scores,
)


def test_enumeration_grid_and_threshold(spark):
    text = "alpha beta gamma delta"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    # threshold 0 keeps everything: the full reference grid must appear
    out = enumerate_and_classify_spans(
        docs, max_span_length=3, classes=("X",), threshold=0.0
    ).collect()
    n = 4
    expected_spans = {
        (s, s + l) for l in range(1, 4) for s in range(0, n - l + 1)
    }
    got_spans = {(r["tok_start"], r["tok_end"]) for r in out}
    assert got_spans == expected_spans
    assert len(out) == len(expected_spans)  # one class -> one row per span
    # scores are the deterministic mock
    for r in out:
        toks = text.split(" ")
        surface = " ".join(toks[r["tok_start"] : r["tok_end"]])
        assert r["surface"] == surface
        assert abs(r["score"] - round(mock_span_scores(surface, 1)[0], 6)) < 1e-9


def test_multilabel_rows_and_filtering(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    classes = ("ENGINE", "OP", "ALGO")
    thr = 0.5
    out = enumerate_and_classify_spans(
        docs, max_span_length=2, classes=classes, threshold=thr
    ).collect()
    assert all(r["score"] >= thr for r in out)
    # a span can carry several labels (multilabel); verify against the mock
    for r in out:
        ci = classes.index(r["label"])
        assert mock_span_scores(r["surface"], len(classes))[ci] >= thr
    by_span = {}
    for r in out:
        by_span.setdefault((r["tok_start"], r["tok_end"]), []).append(r["label"])
    assert any(len(v) > 1 for v in by_span.values()) or len(out) == 0
