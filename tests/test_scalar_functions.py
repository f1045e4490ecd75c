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
