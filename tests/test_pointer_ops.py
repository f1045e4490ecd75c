"""DataFrame surface of the pointer codec: JVM-side encode must equal the
pure-Python linearizer; parse must invert encode and count errors."""

from pyspark.sql import functions as F

from pytorch_ie_spark.functions.pointer_codec import (
    PointerVocab,
    linearize_relations,
)
from pytorch_ie_spark.operators.pointer_ops import (
    parse_pointer_targets,
    pointer_parse_errors,
    pointer_target_ids,
)

VOCAB = PointerVocab(
    span_labels=("PER", "ORG"), relation_labels=("works_for", "founded")
)

RELS = [
    # (doc_id, head_start, head_end, head_label, tail_start, tail_end,
    #  tail_label, label)
    ("d1", 0, 4, "PER", 10, 13, "ORG", "works_for"),
    ("d1", 20, 24, "PER", 10, 13, "ORG", "founded"),
    ("d2", 5, 6, "ORG", 1, 3, "PER", "founded"),
]

SCHEMA = (
    "doc_id string, head_start long, head_end long, head_label string, "
    "tail_start long, tail_end long, tail_label string, label string"
)


def test_jvm_encode_matches_python_linearizer(spark):
    df = spark.createDataFrame(RELS, SCHEMA)
    got = {
        r["doc_id"]: list(r["target_ids"])
        for r in pointer_target_ids(df, VOCAB).collect()
    }
    for doc in ("d1", "d2"):
        rels = [
            ((hs, he, hl), (ts, te, tl), lab)
            for d, hs, he, hl, ts, te, tl, lab in RELS
            if d == doc
        ]
        assert got[doc] == linearize_relations(rels, VOCAB)


def test_parse_inverts_encode(spark):
    df = spark.createDataFrame(RELS, SCHEMA)
    targets = pointer_target_ids(df, VOCAB)
    parsed = parse_pointer_targets(targets, VOCAB)
    back = sorted(map(tuple, parsed.collect()))
    assert back == sorted(RELS)
    errs = {r["doc_id"]: r for r in pointer_parse_errors(targets, VOCAB).collect()}
    assert errs["d1"]["n_correct"] == 2 and errs["d2"]["n_correct"] == 1
    assert all(
        e["n_len"] == e["n_order"] == e["n_label"] == e["n_index"] == 0
        and e["n_remaining"] == 0
        for e in errs.values()
    )


def test_parse_errors_counted(spark):
    # a sequence with one good relation and one order-broken chunk
    good = pointer_target_ids(
        spark.createDataFrame(RELS[:1], SCHEMA), VOCAB
    ).collect()[0]["target_ids"]
    good = [int(x) for x in good if x != VOCAB.eos_id]
    broken = list(good)
    broken[1] = broken[0] - 2  # tail end pointer two before its start
    seq = good + broken
    df = spark.createDataFrame([("dx", seq)], "doc_id string, target_ids array<long>")
    errs = pointer_parse_errors(df, VOCAB).collect()[0]
    assert errs["n_correct"] == 1 and errs["n_order"] == 1
