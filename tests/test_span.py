"""BIO/IO codec contracts (reference: src/pytorch_ie/utils/span.py:41-216)."""

import pytest

from pytorch_ie_spark.functions.span import (
    InvalidTagSequence,
    bio_tags_to_spans,
    has_overlap,
    io_tags_to_spans,
    is_contained_in,
    span_distance,
    spans_to_bio_tags,
)


def test_bio_simple():
    tags = ["B-PER", "I-PER", "O", "B-ORG"]
    assert sorted(bio_tags_to_spans(tags)) == [("ORG", (3, 3)), ("PER", (0, 1))]


def test_bio_ill_formed_included_by_default():
    # I- with no open span: included (reference includes ill-formed spans so
    # precision can't be gamed)
    tags = ["O", "I-PER", "I-PER", "O"]
    assert bio_tags_to_spans(tags) == [("PER", (1, 2))]


def test_bio_ill_formed_excluded():
    tags = ["O", "I-PER", "I-PER", "O"]
    assert bio_tags_to_spans(tags, include_ill_formed=False) == []


def test_bio_label_switch_inside_i():
    tags = ["B-PER", "I-ORG"]
    assert sorted(bio_tags_to_spans(tags)) == [("ORG", (1, 1)), ("PER", (0, 0))]


def test_bio_classes_to_ignore():
    tags = ["B-PER", "I-PER", "B-MISC"]
    assert bio_tags_to_spans(tags, classes_to_ignore=["MISC"]) == [("PER", (0, 1))]


def test_bio_invalid_raises():
    with pytest.raises(InvalidTagSequence):
        bio_tags_to_spans(["X-PER"])


def test_io_tags():
    # IO encoding carries plain labels (no prefixes)
    tags = ["PER", "PER", "O", "ORG"]
    assert sorted(io_tags_to_spans(tags)) == [("ORG", (3, 3)), ("PER", (0, 1))]


def test_io_tags_verbatim_like_reference():
    # the reference (utils/span.py:121-165) compares raw tag strings: a
    # prefixed tag set fed into the IO decoder yields distinct runs per raw
    # tag, and classes_to_ignore matches whole tags
    tags = ["B-PER", "I-PER", "I-PER", "O"]
    assert sorted(io_tags_to_spans(tags)) == [
        ("B-PER", (0, 0)),
        ("I-PER", (1, 2)),
    ]
    assert sorted(
        io_tags_to_spans(["PER", "LOC", "PER"], classes_to_ignore=["LOC"])
    ) == [("PER", (0, 0)), ("PER", (2, 2))]


def test_bio_round_trip():
    spans = [("PER", (0, 1)), ("ORG", (3, 3))]
    tags = spans_to_bio_tags(spans, 5)
    assert tags == ["B-PER", "I-PER", "O", "B-ORG", "O"]
    assert sorted(bio_tags_to_spans(tags)) == sorted(spans)


def test_spans_to_bio_overlap_returns_none():
    assert spans_to_bio_tags([("A", (0, 2)), ("B", (2, 3))], 5) is None


def test_overlap_and_containment():
    assert has_overlap((0, 5), (4, 8))
    assert not has_overlap((0, 4), (4, 8))  # end-exclusive
    assert is_contained_in((2, 4), (0, 5))
    assert not is_contained_in((2, 6), (0, 5))


def test_span_distance_inner_outer():
    # reference: re_text_classification_with_indices.py:702-728
    assert span_distance((0, 5), (10, 12), "inner") == 5
    assert span_distance((0, 5), (10, 12), "outer") == 12
    assert span_distance((0, 5), (3, 8), "inner") == 0


def test_iob2_strict_decode_and_raise():
    from pytorch_ie_spark.functions.span import iob2_tags_to_spans

    assert iob2_tags_to_spans(["B-PER", "I-PER", "O", "B-ORG"]) == [
        ("PER", (0, 1)),
        ("ORG", (3, 3)),
    ]
    # I- without a same-label open span is ill-formed in strict IOB2
    with pytest.raises(InvalidTagSequence):
        iob2_tags_to_spans(["O", "I-PER"])
    with pytest.raises(InvalidTagSequence):
        iob2_tags_to_spans(["B-ORG", "I-PER"])
    # ignored classes are decoded but not emitted
    assert iob2_tags_to_spans(["B-PER", "I-PER"], ["PER"]) == []


def test_get_special_token_mask_excludes_unk():
    from pytorch_ie_spark.functions.span import get_special_token_mask

    # specials {0,1,2}, unk=2: unk marks REAL input, so it is not special
    assert get_special_token_mask([0, 5, 2, 6, 1], {0, 1, 2}, unk_id=2) == [
        1, 0, 0, 0, 1,
    ]


def test_tokens_and_tags_to_text_and_labeled_spans():
    from pytorch_ie_spark.functions.span import (
        tokens_and_tags_to_text_and_labeled_spans,
    )

    tokens = ["Karl", "Marx", "lived", "in", "London"]
    tags = ["B-PER", "I-PER", "O", "O", "B-LOC"]
    text, spans = tokens_and_tags_to_text_and_labeled_spans(tokens, tags)
    assert text == "Karl Marx lived in London"
    assert spans == [("PER", (0, 9)), ("LOC", (19, 25))]
    assert text[0:9] == "Karl Marx" and text[19:25] == "London"


def test_iob2_strict_raise_equals_local_validity_property():
    """Hypothesis: the sequential strict decoder raises EXACTLY when some
    I- tag fails the local check (previous tag is not B-/I- of the same
    label) — the equivalence the kg_iob2_strict DuckDB oracle encodes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pytorch_ie_spark.functions.span import (
        InvalidTagSequence,
        iob2_tags_to_spans,
    )

    tag = st.sampled_from(
        ["O", "B-A", "I-A", "B-B", "I-B", "B-LONG", "I-LONG"]
    )

    @given(st.lists(tag, max_size=12))
    @settings(max_examples=300, deadline=None)
    def check(tags):
        locally_valid = all(
            not t.startswith("I-")
            or (
                i > 0
                and tags[i - 1] in (f"B-{t[2:]}", f"I-{t[2:]}")
            )
            for i, t in enumerate(tags)
        )
        try:
            spans = iob2_tags_to_spans(tags)
            raised = False
        except InvalidTagSequence:
            raised = True
        assert raised == (not locally_valid)
        if not raised:
            # decoded spans reproduce the tags exactly (inverse property)
            rebuilt = ["O"] * len(tags)
            for label, (s, e) in spans:
                rebuilt[s] = f"B-{label}"
                for i in range(s + 1, e + 1):
                    rebuilt[i] = f"I-{label}"
            assert rebuilt == tags

    check()
