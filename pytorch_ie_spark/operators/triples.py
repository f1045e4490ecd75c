"""Triple materialization: relations + mentions (+ canonical entities)
-> (subj, pred, obj) rows, partitioned on write.

The reference's final artifact is relation predictions attached to documents
(pipeline.py:423-427 resolve() ->
(label, ((head_label, head_text), (tail_label, tail_text))),
tests/pipeline/test_re_text_classification.py:68-72). The KG engine
materializes the same information as a graph table with stable entity ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relations_to_triples(
    relations: DataFrame,
    mentions: DataFrame,
    entity_ids: DataFrame | None = None,
) -> DataFrame:
    """Join relation args back to mention surfaces and (optionally) canonical
    entity ids (anti-pattern avoided: args resolved via two equi-joins on
    mention_id, the Spark form of the reference's index-into-layer
    resolution, tests/conftest.py:31-33)."""
    m = mentions.select("mention_id", "surface", "label")
    heads = m.select(
        F.col("mention_id").alias("head_mention_id"),
        F.col("surface").alias("head_surface"),
        F.col("label").alias("head_type"),
    )
    tails = m.select(
        F.col("mention_id").alias("tail_mention_id"),
        F.col("surface").alias("tail_surface"),
        F.col("label").alias("tail_type"),
    )
    t = (
        relations.join(heads, "head_mention_id")
        .join(tails, "tail_mention_id")
    )
    if entity_ids is not None:
        # canonical ids from the canonicalization stage: (mention_id, entity_id)
        he = entity_ids.select(
            F.col("mention_id").alias("head_mention_id"),
            F.col("entity_id").alias("subj_entity"),
        )
        te = entity_ids.select(
            F.col("mention_id").alias("tail_mention_id"),
            F.col("entity_id").alias("obj_entity"),
        )
        t = t.join(he, "head_mention_id", "left").join(te, "tail_mention_id", "left")
        subj = F.coalesce(F.col("subj_entity"), F.col("head_surface"))
        obj = F.coalesce(F.col("obj_entity"), F.col("tail_surface"))
    else:
        subj = F.col("head_surface")
        obj = F.col("tail_surface")
    return t.select(
        subj.alias("subj"),
        F.col("label").alias("pred"),
        obj.alias("obj"),
        "doc_id",
        "head_mention_id",
        "tail_mention_id",
        "score",
        "content_sha256",
    )


def dedupe_triples(triples: DataFrame) -> DataFrame:
    """Equality-by-value dedup keeping max score
    (utils/document.py:18-36 set semantics + highest-score keep)."""
    return (
        triples.groupBy("subj", "pred", "obj", "doc_id")
        .agg(
            F.max("score").alias("score"),
            F.min("head_mention_id").alias("head_mention_id"),
            F.min("tail_mention_id").alias("tail_mention_id"),
            F.first("content_sha256", ignorenulls=True).alias("content_sha256"),
        )
    )
