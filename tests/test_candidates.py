"""Candidate generation semantics (reference:
re_text_classification_with_indices.py:634-843)."""

from pyspark.sql import functions as F

from pytorch_ie_spark.corpus import fixture_documents, fixture_gold_mentions, fixture_gold_relations
from pytorch_ie_spark.operators.candidates import (
    candidate_pairs,
    label_gold_pairs,
    resolve_duplicate_candidates,
)


def test_doc6_ordered_pairs(spark):
    """doc6 has 3 entities, 0 relations -> 6 ordered none-labeled pairs
    (FIXTURES.md §4)."""
    mentions = fixture_gold_mentions(spark).where(F.col("doc_id") == "train_doc6")
    pairs = candidate_pairs(mentions)
    assert pairs.count() == 6


def test_distance_filter(spark):
    mentions = fixture_gold_mentions(spark).where(F.col("doc_id") == "train_doc5")
    # doc5 entities at (16,24), (34,35), (49,50): inner gaps 10, 14, 25
    assert candidate_pairs(mentions, max_distance=200).count() == 6
    assert candidate_pairs(mentions, max_distance=12).count() == 2  # (16,24)<->(34,35)


def test_argument_whitelist(spark):
    mentions = fixture_gold_mentions(spark).where(F.col("doc_id") == "train_doc5")
    pairs = candidate_pairs(mentions, argument_whitelist=[("PER", "ORG")])
    rows = pairs.select("head_label", "tail_label").distinct().collect()
    assert [(r["head_label"], r["tail_label"]) for r in rows] == [("PER", "ORG")]
    assert pairs.count() == 2


def test_gold_labeling_with_none(spark):
    mentions = fixture_gold_mentions(spark).where(F.col("doc_id") == "train_doc5")
    gold = fixture_gold_relations(spark).where(F.col("doc_id") == "train_doc5")
    labeled = label_gold_pairs(candidate_pairs(mentions), gold)
    counts = {
        r["gold_label"]: r["n"]
        for r in labeled.groupBy("gold_label").agg(F.count("*").alias("n")).collect()
    }
    assert counts["no_relation"] == 3
    assert counts["per:employee_of"] == 1
    assert counts["per:founder"] == 1
    assert counts["org:founded_by"] == 1


def test_gold_labeling_doc_id_participates(spark):
    """mention_id does NOT embed doc_id here: two docs reuse mention ids
    'm1'/'m2'. If the doc_id predicate degenerated to lit(true) (self-join
    attribute aliasing), the doc2 pair would steal doc1's gold label."""
    pairs = spark.createDataFrame(
        [
            ("d1", "m1", "m2", 0, 2, 5, 7, "PER", "ORG", "a", "b", 3, "sha"),
            ("d2", "m1", "m2", 0, 2, 5, 7, "PER", "ORG", "a", "b", 3, "sha"),
        ],
        "doc_id string, head_mention_id string, tail_mention_id string, "
        "head_start int, head_end int, tail_start int, tail_end int, "
        "head_label string, tail_label string, head_surface string, "
        "tail_surface string, distance int, content_sha256 string",
    )
    gold = spark.createDataFrame(
        [("d1", "m1", "m2", "works_at")],
        "doc_id string, head_mention_id string, tail_mention_id string, label string",
    )
    out = {
        r["doc_id"]: r["gold_label"]
        for r in label_gold_pairs(pairs, gold).select("doc_id", "gold_label").collect()
    }
    assert out == {"d1": "works_at", "d2": "no_relation"}


def test_gold_labeling_self_derived_gold(spark):
    """gold derived from `pairs` itself (the q_kg_gold_pair_labels shape):
    the join must still key on doc_id, not collapse to trivially-true."""
    mentions = fixture_gold_mentions(spark).where(
        F.col("doc_id").isin("train_doc5", "train_doc6")
    )
    pairs = candidate_pairs(mentions)
    gold = pairs.limit(2).select(
        "doc_id", "head_mention_id", "tail_mention_id",
        F.lit("g").alias("label"),
    )
    labeled = label_gold_pairs(pairs, gold)
    assert labeled.count() == pairs.count()
    assert labeled.filter(F.col("gold_label") == "g").count() == 2


def test_duplicate_resolution_policies(spark):
    mentions = fixture_gold_mentions(spark).where(F.col("doc_id") == "train_doc6")
    pairs = candidate_pairs(mentions)
    doubled = pairs.unionByName(pairs)
    assert resolve_duplicate_candidates(doubled, "keep_first").count() == 6
    assert resolve_duplicate_candidates(doubled, "keep_none").count() == 0
