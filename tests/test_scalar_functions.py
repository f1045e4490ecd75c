"""Scalar-function parity additions (SURVEY.md §2.4/§2.8): span-score
combination, majority vote, BIO int encoding, find_sublist, marker
insertion."""

import pytest

from pytorch_ie_spark.functions.span import (
    bio_encode_int,
    combine_span_score,
    find_sublist,
    insert_markers,
    majority_label,
)


def test_combine_span_score_modes():
    scores = [0.5, 0.8, 0.9]
    assert combine_span_score(scores, "mean") == pytest.approx(0.7333333333)
    assert combine_span_score(scores, "max") == 0.9
    assert combine_span_score(scores, "min") == 0.5
    assert combine_span_score(scores, "product") == pytest.approx(0.36)
    assert combine_span_score([], "mean") == 0.0


def test_majority_label_vote_and_tiebreak():
    assert majority_label(["a", "b", "b"]) == "b"
    # tie -> first seen wins (Counter.most_common insertion-order semantics)
    assert majority_label(["x", "y"]) == "x"


def test_bio_encode_int():
    # O=0, B-X = 2*id+1, I-X = 2*id+2
    spans = [("PER", (0, 1)), ("ORG", (3, 3))]
    out = bio_encode_int(spans, 5, {"ORG": 0, "PER": 1})
    assert out == [3, 4, 0, 1, 0]


def test_find_sublist():
    assert find_sublist([1, 2, 3, 4], [2, 3]) == 1
    assert find_sublist([1, 2, 3], [3, 4]) == -1
    assert find_sublist([1, 2], []) == 0
    assert find_sublist([], [1]) == -1


def test_insert_markers_positions():
    tokens = ["a", "b", "c", "d"]
    out, head, tail = insert_markers(tokens, (1, 1), (3, 3))
    assert out == ["a", "[H]", "b", "[/H]", "c", "[T]", "d", "[/T]"]
    assert out[head[0] : head[1] + 1] == ["b"]
    assert out[tail[0] : tail[1] + 1] == ["d"]


def test_insert_markers_multi_token_and_reverse_order():
    tokens = ["w", "x", "y", "z"]
    # tail before head in text
    out, head, tail = insert_markers(tokens, (2, 3), (0, 0))
    assert out == ["[T]", "w", "[/T]", "x", "[H]", "y", "z", "[/H]"]
    assert out[head[0] : head[1] + 1] == ["y", "z"]
    assert out[tail[0] : tail[1] + 1] == ["w"]


def test_events_funnel_fold_edges(spark):
    """Funnel fold edge cases: pre-view clicks skipped, same-timestamp
    click excluded (strict >), window expiry stops the stage, no restart
    on later views (first-touch attribution)."""
    from datetime import datetime, timedelta

    from pytorch_ie_spark.queries import q_events_funnel

    t0 = datetime(2024, 1, 1)

    def rows(user, seq):
        return [
            (user * 100 + i, t0 + timedelta(seconds=s), user, ty, 1.0, "{}")
            for i, (s, ty) in enumerate(seq)
        ]

    data = (
        # u1: clean conversion inside the windows
        rows(1, [(0, "view"), (10, "click"), (20, "purchase")])
        # u2: click BEFORE the first view -> not counted; no later click
        + rows(2, [(0, "click"), (10, "view"), (20, "purchase")])
        # u3: click at the SAME timestamp as the view -> strict > excludes
        + rows(3, [(0, "view"), (0, "click")])
        # u4: click outside the 24h window -> stalls at stage 1, and the
        # later view does NOT restart the funnel
        + rows(4, [(0, "view"), (90000, "view"), (90010, "click")])
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="funnel_")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(d, "events.parquet"))
    out = {r["user_id"]: r for r in q_events_funnel(spark, d).collect()}
    assert out[1]["funnel_stage"] == 3
    assert out[2]["funnel_stage"] == 1  # pre-view click never counts
    assert out[3]["funnel_stage"] == 1  # strict ordering at equal ts
    assert out[4]["funnel_stage"] == 1  # window expired; no restart
    assert out[4]["click_epoch"] is None


def test_winnowing_shared_substring_guarantee(spark, tmp_path):
    """Schleimer et al.'s guarantee: any shared substring of length
    K + W - 1 (= 8 chars here) yields at least one shared fingerprint;
    unrelated docs share none."""
    import os

    from pytorch_ie_spark.queries import q_text_winnowing

    shared = "xqzwvkyjt"  # 9 chars > K+W-1, absent from the other texts
    docs = [
        (1, f"aaaa bbbb {shared} cccc dddd"),
        (2, f"eeee ffff gggg {shared} hhhh"),
        (3, "iiii jjjj kkkk llll mmmm nnnn"),
    ]
    d = str(tmp_path / "win")
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(d, "documents.parquet"))
    fps = {}
    for r in q_text_winnowing(spark, d).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps[1] & fps[2]       # the guarantee
    assert not (fps[1] & fps[3])  # unrelated docs do not collide
    assert not (fps[2] & fps[3])
