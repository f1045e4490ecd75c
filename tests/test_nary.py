"""NaryRelation canonical order + MultiLabeledSpan collapse/vocabulary."""

from pyspark.sql import functions as F

from pytorch_ie_spark.operators.nary import (
    explode_multi_labels,
    group_nary_relations,
    multi_label_vocabulary,
    nary_from_binary,
    to_multi_labeled,
)


def test_nary_canonical_order_with_role_tiebreak(spark):
    # two args share (start, end): role breaks the tie alphabetically
    m = spark.createDataFrame(
        [
            ("d1", 10, 12, "zzz", "m3"),
            ("d1", 10, 12, "aaa", "m1"),
            ("d1", 2, 4, "mid", "m2"),
        ],
        "doc_id string, start long, end long, role string, mention_id string",
    )
    out = group_nary_relations(
        m.withColumn("label", F.col("role")), F.col("role")
    ).collect()[0]
    order = [(a["start"], a["role"]) for a in out["arguments"]]
    assert order == [(2, "mid"), (10, "aaa"), (10, "zzz")]


def test_nary_from_binary_orders_head_after_earlier_tail(spark):
    rels = spark.createDataFrame(
        [("d1", 20, 25, "h1", 3, 7, "t1", "works_for")],
        "doc_id string, head_start long, head_end long, head_mention_id string, "
        "tail_start long, tail_end long, tail_mention_id string, label string",
    )
    out = nary_from_binary(rels).collect()[0]
    assert [a["role"] for a in out["arguments"]] == ["tail", "head"]
    assert [a["start"] for a in out["arguments"]] == [3, 20]


def test_multi_labeled_round_trip_and_vocab(spark):
    m = spark.createDataFrame(
        [
            ("d1", 0, 3, "PER"),
            ("d1", 0, 3, "EMPLOYEE"),
            ("d1", 0, 3, "PER"),  # duplicate label collapses
            ("d1", 9, 12, "ORG"),
        ],
        "doc_id string, start long, end long, label string",
    )
    multi = to_multi_labeled(m)
    rows = {(r["doc_id"], r["start"]): r["labels"] for r in multi.collect()}
    assert rows[("d1", 0)] == ["EMPLOYEE", "PER"]
    assert rows[("d1", 9)] == ["ORG"]
    assert multi_label_vocabulary(multi) == ["EMPLOYEE", "ORG", "PER"]
    back = explode_multi_labels(multi)
    assert back.count() == 3  # dedup'd
