"""Partition (sentence) containment operators.

Reference semantics:
  - entity x partition assignment: a mention belongs to the partition that
    fully contains it (re_text_classification_with_indices.py:752-758,
    is_contained_in on (start,end) pairs),
  - relation-partition filter: drop relations whose head/tail live in
    different partitions, with a warning counter
    (re_text_classification_with_indices.py:775-788).

Spark realization: explode the document's sentence array once, then a
range join (start >= p.start AND end <= p.end) — an equi-join on doc_id
with theta predicates, so Catalyst keeps it partition-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_partitions(documents: DataFrame) -> DataFrame:
    """(doc_id, partition_idx, p_start, p_end) from the sentences column."""
    return documents.select(
        "doc_id",
        F.posexplode("sentences").alias("partition_idx", "p"),
    ).select(
        "doc_id",
        "partition_idx",
        F.col("p.start").alias("p_start"),
        F.col("p.end").alias("p_end"),
    )


def assign_mentions_to_partitions(
    mentions: DataFrame, documents: DataFrame, keep_unassigned: bool = False
) -> DataFrame:
    """Attach partition_idx to each mention fully contained in a sentence."""
    parts = explode_partitions(documents)
    joined = mentions.join(
        parts,
        (mentions.doc_id == parts.doc_id)
        & (mentions.start >= parts.p_start)
        & (mentions.end <= parts.p_end),
        "left" if keep_unassigned else "inner",
    ).drop(parts.doc_id)
    return joined.drop("p_start", "p_end")


def filter_relations_within_partition(
    relations: DataFrame, mentions: DataFrame, documents: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Keep relations whose args share a partition; return (kept, dropped) so
    the straddlers are observable (the reference logs a warning per drop)."""
    assigned = assign_mentions_to_partitions(mentions, documents).select(
        F.col("mention_id"), F.col("partition_idx")
    )
    h = assigned.select(
        F.col("mention_id").alias("head_mention_id"),
        F.col("partition_idx").alias("head_part"),
    )
    t = assigned.select(
        F.col("mention_id").alias("tail_mention_id"),
        F.col("partition_idx").alias("tail_part"),
    )
    with_parts = relations.join(h, "head_mention_id", "left").join(
        t, "tail_mention_id", "left"
    )
    same = (
        F.col("head_part").isNotNull()
        & F.col("tail_part").isNotNull()
        & (F.col("head_part") == F.col("tail_part"))
    )
    kept = with_parts.where(same).drop("head_part", "tail_part")
    dropped = with_parts.where(~same | F.col("head_part").isNull()).drop(
        "head_part", "tail_part"
    )
    return kept, dropped


def prepare_label_vocabulary(
    mentions: DataFrame, bio: bool = False
) -> list[str]:
    """taskmodule._prepare: collect distinct labels, sorted, optionally
    BIO-expanded (transformer_token_classification.py:117-130;
    labeled_span_extraction_by_token_classification.py:211-232).
    Small driver-side collect by design — the vocab is broadcast back."""
    labels = sorted(
        r["label"] for r in mentions.select("label").distinct().collect()
    )
    if not bio:
        return labels
    out = ["O"]
    for lab in labels:
        out.extend([f"B-{lab}", f"I-{lab}"])
    return out


def prepare_label_to_id(labels: list[str]) -> dict[str, int]:
    """List-form _prepare for document-level classification (reference
    simple_transformer_text_classification.py:87-105): sorted distinct
    labels get ids from 1; id 0 is reserved for the 'O' (outside) class.
    Lives next to prepare_label_vocabulary so the id-assignment convention
    has exactly one home."""
    mapping = {lab: i + 1 for i, lab in enumerate(sorted(set(labels)))}
    mapping["O"] = 0
    return mapping
