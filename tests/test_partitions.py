"""Sentence-partition containment (reference:
re_text_classification_with_indices.py:752-788)."""

from pyspark.sql import functions as F

from pytorch_ie_spark.corpus import (
    fixture_documents,
    fixture_gold_mentions,
    fixture_gold_relations,
)
from pytorch_ie_spark.operators.partitions import (
    assign_mentions_to_partitions,
    filter_relations_within_partition,
    prepare_label_vocabulary,
)


def test_mention_partition_assignment(spark):
    docs = fixture_documents(spark)
    mentions = fixture_gold_mentions(spark)
    assigned = assign_mentions_to_partitions(mentions, docs)
    # every gold mention sits inside a sentence
    assert assigned.count() == mentions.count()
    doc5 = {
        (r["start"], r["partition_idx"])
        for r in assigned.where(F.col("doc_id") == "train_doc5").collect()
    }
    assert doc5 == {(16, 1), (34, 1), (49, 2)}


def test_cross_sentence_relations_dropped(spark):
    """doc5's per:founder and org:founded_by straddle sentences 1/2 — the
    partition filter must drop exactly those (the reference warns + skips)."""
    docs = fixture_documents(spark)
    mentions = fixture_gold_mentions(spark)
    relations = fixture_gold_relations(spark)
    kept, dropped = filter_relations_within_partition(relations, mentions, docs)
    doc5_kept = [
        r["label"] for r in kept.where(F.col("doc_id") == "train_doc5").collect()
    ]
    doc5_dropped = sorted(
        r["label"] for r in dropped.where(F.col("doc_id") == "train_doc5").collect()
    )
    assert doc5_kept == ["per:employee_of"]
    assert doc5_dropped == ["org:founded_by", "per:founder"]
    # nothing silently lost
    assert kept.count() + dropped.count() == relations.count()


def test_prepare_label_vocabulary(spark):
    mentions = fixture_gold_mentions(spark, split=None)
    assert prepare_label_vocabulary(mentions) == ["ORG", "PER"]
    assert prepare_label_vocabulary(mentions, bio=True) == [
        "O",
        "B-ORG",
        "I-ORG",
        "B-PER",
        "I-PER",
    ]
