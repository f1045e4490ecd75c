"""Triplet linearization codec (reference: transformer_seq2seq.py:107-277)."""

from pytorch_ie_spark.functions.seq2seq import (
    ground_entity,
    linearize_triplets,
    parse_triplets,
)


def test_linearize_groups_shared_heads():
    triples = [
        ("Entity G", "H", "per:employee_of"),
        ("Entity G", "I", "per:founder"),
        ("I", "H", "org:founded_by"),
    ]
    s = linearize_triplets(triples)
    assert s == (
        "<triplet> Entity G <subj> H <obj> per:employee_of "
        "<subj> I <obj> per:founder "
        "<triplet> I <subj> H <obj> org:founded_by"
    )


def test_parse_round_trip():
    triples = [
        ("Entity G", "H", "per:employee_of"),
        ("Entity G", "I", "per:founder"),
        ("I", "H", "org:founded_by"),
    ]
    assert parse_triplets(linearize_triplets(triples)) == triples


def test_parse_malformed_tail_dropped():
    # truncated generation: incomplete final triplet is dropped, prefix kept
    s = "<triplet> A <subj> B <obj> rel:x <triplet> C <subj>"
    assert parse_triplets(s) == [("A", "B", "rel:x")]


def test_parse_garbage_is_empty():
    assert parse_triplets("no control tokens at all") == []
    assert parse_triplets("") == []


def test_ground_entity_case_insensitive_first_match():
    text = "Entity G works at H. And founded I."
    assert ground_entity(text, "entity g") == (0, 8)
    assert ground_entity(text, "H") == (18, 19)
    assert text[18:19] == "H"
    assert ground_entity(text, "missing") is None
