"""Pointer-network codec: branch coverage mirroring the reference's
tests/taskmodules/pointer_network/test_annotation_encoder_decoder.py
(span / labeled-span / relation encode-decode, every DecodingException
identifier, the resumable parse, and the per-step constraint builder)."""

import pytest

from pytorch_ie_spark.functions.pointer_codec import (
    ERR_CORRECT,
    ERR_INDEX,
    ERR_LABEL,
    ERR_LEN,
    ERR_ORDER,
    PointerDecodeError,
    PointerVocab,
    decode_labeled_span,
    decode_relation,
    decode_span,
    encode_labeled_span,
    encode_relation,
    encode_span,
    linearize_relations,
    next_step_constraints,
    parse_relation_sequence,
)

VOCAB = PointerVocab(
    span_labels=("PER", "ORG"),
    relation_labels=("works_for", "founded"),
)
# layout: <bos>=0 <eos>=1 none=2 PER=3 ORG=4 works_for=5 founded=6 -> offset 7
OFF = VOCAB.pointer_offset


def test_vocab_layout():
    assert OFF == 7
    assert VOCAB.none_id == 2
    assert VOCAB.span_ids == {3, 4}
    assert VOCAB.relation_ids == {5, 6}
    assert VOCAB.bos_id == 0 and VOCAB.eos_id == 1


@pytest.mark.parametrize("exclusive_end", [True, False])
def test_span_round_trip(exclusive_end):
    enc = encode_span(1, 3, exclusive_end=exclusive_end)
    assert enc == ([1, 3] if exclusive_end else [1, 2])
    assert decode_span(enc, exclusive_end=exclusive_end) == (1, 3)


def test_span_wrong_length():
    with pytest.raises(PointerDecodeError) as e:
        decode_span([1, 2, 3])
    assert e.value.identifier == ERR_LEN


def test_span_wrong_order():
    with pytest.raises(PointerDecodeError) as e:
        decode_span([3, 1])
    assert e.value.identifier == ERR_ORDER
    # inclusive end == start - 1 is also an order violation
    with pytest.raises(PointerDecodeError):
        decode_span([3, 1], exclusive_end=False)


def test_span_negative_index():
    with pytest.raises(PointerDecodeError) as e:
        decode_span([2, 5], offset=3)
    assert e.value.identifier == ERR_INDEX


def test_span_with_offset_round_trip():
    enc = encode_span(1, 3, offset=10)
    assert enc == [11, 13]
    assert decode_span(enc, offset=10) == (1, 3)


@pytest.mark.parametrize("mode", ["indices_label", "label_indices"])
def test_labeled_span_round_trip(mode):
    enc = encode_labeled_span(2, 5, "ORG", VOCAB, mode=mode)
    # inclusive end by default: [2+7, 4+7] plus label id 4
    span_part = [9, 11]
    assert enc == (span_part + [4] if mode == "indices_label" else [4] + span_part)
    assert decode_labeled_span(enc, VOCAB, mode=mode) == (2, 5, "ORG")


@pytest.mark.parametrize("mode", ["indices_label", "label_indices"])
def test_labeled_span_bad_label(mode):
    enc = encode_labeled_span(2, 5, "ORG", VOCAB, mode=mode)
    # swap the label id for a relation id -> label error
    bad = list(enc)
    bad[-1 if mode == "indices_label" else 0] = 5
    with pytest.raises(PointerDecodeError) as e:
        decode_labeled_span(bad, VOCAB, mode=mode)
    assert e.value.identifier == ERR_LABEL


def test_labeled_span_unknown_mode():
    with pytest.raises(ValueError):
        encode_labeled_span(2, 5, "ORG", VOCAB, mode="sideways")


HEAD = (1, 2, "PER")
TAIL = (4, 6, "ORG")


@pytest.mark.parametrize(
    "mode",
    ["head_tail_label", "tail_head_label", "label_head_tail", "label_tail_head"],
)
def test_relation_round_trip(mode):
    enc = encode_relation(HEAD, TAIL, "works_for", VOCAB, mode=mode)
    assert len(enc) == 7
    assert decode_relation(enc, VOCAB, mode=mode) == (HEAD, TAIL, "works_for")


@pytest.mark.parametrize(
    "mode",
    ["head_tail_label", "tail_head_label", "label_head_tail", "label_tail_head"],
)
def test_relation_loop_dummy_round_trip(mode):
    enc = encode_relation(HEAD, HEAD, VOCAB.loop_relation_label, VOCAB, mode=mode)
    assert len(enc) == 7
    # filler: three none ids for the second argument + none as the label
    assert enc.count(VOCAB.none_id) == 4
    head, tail, label = decode_relation(enc, VOCAB, mode=mode)
    assert head == tail == HEAD
    assert label == VOCAB.loop_relation_label


def test_relation_loop_dummy_requires_equal_args():
    with pytest.raises(ValueError):
        encode_relation(HEAD, TAIL, VOCAB.loop_relation_label, VOCAB)


def test_relation_wrong_encoding_size():
    with pytest.raises(PointerDecodeError) as e:
        decode_relation([1, 2, 3], VOCAB)
    assert e.value.identifier == ERR_LEN


def test_relation_wrong_label_index():
    enc = encode_relation(HEAD, TAIL, "works_for", VOCAB)
    bad = list(enc)
    bad[6] = 3  # a span label where the relation label belongs
    with pytest.raises(PointerDecodeError) as e:
        decode_relation(bad, VOCAB)
    assert e.value.identifier == ERR_LABEL


def test_relation_unknown_mode():
    with pytest.raises(ValueError):
        encode_relation(HEAD, TAIL, "works_for", VOCAB, mode="label")


def test_parse_clean_sequence_with_eos():
    rels = [(HEAD, TAIL, "works_for"), ((7, 8, "ORG"), (0, 1, "PER"), "founded")]
    ids = linearize_relations(rels, VOCAB)
    decoded, errors, rest = parse_relation_sequence(ids, VOCAB)
    assert errors == {ERR_CORRECT: 2}
    # canonical order: by head start then tail start
    assert decoded[0] == (HEAD, TAIL, "works_for")
    assert decoded[1] == ((7, 8, "ORG"), (0, 1, "PER"), "founded")
    # the eos id is an unconsumed tail, not an error
    assert rest == [VOCAB.eos_id]


def test_parse_counts_errors_and_recovers():
    good = encode_relation(HEAD, TAIL, "works_for", VOCAB)
    # order error: tail end pointer two before the start pointer (one before
    # would still be a valid empty inclusive span)
    bad_order = list(good)
    bad_order[1] = bad_order[0] - 2
    # label error: span label slot holds a relation id... terminates chunk
    # early at the relation id -> len error instead
    short = [good[0], 5]
    ids = bad_order + good + short
    decoded, errors, rest = parse_relation_sequence(ids, VOCAB)
    assert errors[ERR_CORRECT] == 1
    assert errors[ERR_ORDER] == 1
    assert errors[ERR_LEN] == 1
    assert [d for d in decoded] == [(HEAD, TAIL, "works_for")]
    assert rest == []


def test_parse_truncated_tail_is_resumable():
    good = encode_relation(HEAD, TAIL, "works_for", VOCAB)
    ids = good + good[:4]
    decoded, errors, rest = parse_relation_sequence(ids, VOCAB)
    assert len(decoded) == 1
    assert rest == good[:4]  # continuation point, nothing lost


def test_parse_loop_dummy_completes_at_seven():
    enc = encode_relation(HEAD, HEAD, VOCAB.loop_relation_label, VOCAB)
    decoded, errors, rest = parse_relation_sequence(enc, VOCAB)
    assert errors == {ERR_CORRECT: 1}
    assert decoded[0][2] == VOCAB.loop_relation_label
    assert rest == []


def test_constraints_step_walkthrough():
    # encode (tail_head_label, inclusive ends): every emitted id must be
    # permitted by the constraints computed from its prefix
    enc = encode_relation(HEAD, TAIL, "works_for", VOCAB, mode="tail_head_label")
    for i, t in enumerate(enc):
        allowed, disallowed = next_step_constraints(enc[:i], VOCAB)
        if allowed is not None:
            assert t in allowed, f"step {i}: {t} not in allowed {allowed}"
        if disallowed is not None:
            assert t not in disallowed, f"step {i}: {t} in disallowed"


def test_constraints_loop_dummy_walkthrough():
    enc = encode_relation(
        HEAD, HEAD, VOCAB.loop_relation_label, VOCAB, mode="tail_head_label"
    )
    for i, t in enumerate(enc):
        allowed, disallowed = next_step_constraints(enc[:i], VOCAB)
        if allowed is not None:
            assert t in allowed
        if disallowed is not None:
            assert t not in disallowed


def test_constraints_forbid_overlap_and_order():
    # first span = pointers [9, 11] (positions 2..4 inclusive)
    partial = [9, 11, 3]
    allowed, disallowed = next_step_constraints(partial, VOCAB)
    assert allowed is None
    # second span may not start inside the first
    assert {9, 10, 11} <= disallowed
    # span/relation labels are not valid span starts; none IS allowed
    assert {3, 4, 5, 6} <= disallowed
    assert VOCAB.none_id not in disallowed
    # step 1: end pointer cannot precede the start pointer
    _, dis1 = next_step_constraints([9], VOCAB)
    assert set(range(9)) <= dis1 and VOCAB.none_id in dis1


def test_constraints_second_span_before_first():
    # second span starts before the first -> it must end before it too
    partial = [9, 11, 3, 7]  # second start = pointer 7 < first start 9
    allowed, _ = next_step_constraints(partial, VOCAB)
    assert allowed == {7, 8}
