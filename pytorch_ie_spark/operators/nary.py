"""NaryRelation and MultiLabeledSpan data-model support.

Reference semantics:
  - NaryRelation arguments have roles and a canonical order: sorted by
    (span.start, span.end, role)
    (re_text_classification_with_indices.py:244-254,
    get_relation_argument_spans_and_roles),
  - BinaryRelation is the 2-ary special case with fixed roles
    ('head', 'tail'),
  - MultiLabeledSpan carries a label SET per span; `_prepare` unions the
    sets into the vocabulary (transformer_span_classification.py:116-128).

Spark realization: an n-ary relation row holds its arguments as an
array<struct<start,end,role,mention_id,span_label>>; the canonical order
is one sort_array (the struct field order IS the sort key). Multi-labeled
spans are a groupBy over the span identity with a sorted label set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NARY_ARG_FIELDS = "start long, end long, role string, mention_id string, span_label string"


def nary_arg_struct(start, end, role, mention_id=None, span_label=None) -> Column:
    """Argument struct in canonical field order — (start, end, role) lead
    so sort_array orders arguments exactly like the reference comparator."""
    return F.struct(
        start.cast("long").alias("start"),
        end.cast("long").alias("end"),
        role.alias("role"),
        (mention_id if mention_id is not None else F.lit(None).cast("string")).alias(
            "mention_id"
        ),
        (span_label if span_label is not None else F.lit(None).cast("string")).alias(
            "span_label"
        ),
    )


def canonical_nary_args(args_col) -> Column:
    """Arguments in canonical (start, end, role) order — sort_array over
    structs whose leading fields are the sort key."""
    return F.sort_array(args_col)


def nary_from_binary(relations: DataFrame) -> DataFrame:
    """BinaryRelation rows -> 2-ary NaryRelation rows with head/tail roles.
    Expects head_start/head_end/head_mention_id/tail_* columns; emits
    (doc_id, label, arguments) with canonically ordered arguments."""
    args = F.array(
        nary_arg_struct(
            F.col("head_start"),
            F.col("head_end"),
            F.lit("head"),
            F.col("head_mention_id") if "head_mention_id" in relations.columns else None,
        ),
        nary_arg_struct(
            F.col("tail_start"),
            F.col("tail_end"),
            F.lit("tail"),
            F.col("tail_mention_id") if "tail_mention_id" in relations.columns else None,
        ),
    )
    return relations.select(
        "doc_id", "label", canonical_nary_args(args).alias("arguments")
    )


def group_nary_relations(
    mentions: DataFrame, role_col, label: str = "mentions_of"
) -> DataFrame:
    """One n-ary relation per document over the given mentions, argument
    role = `role_col`, arguments canonically ordered. (The synthetic
    grouping used when a corpus has no native n-ary layer — real n-ary
    layers land in the same (doc_id, label, arguments) shape.)"""
    arg = nary_arg_struct(
        F.col("start"),
        F.col("end"),
        role_col,
        F.col("mention_id") if "mention_id" in mentions.columns else None,
        F.col("label") if "label" in mentions.columns else None,
    )
    return (
        mentions.select("doc_id", arg.alias("arg"))
        .groupBy("doc_id")
        .agg(canonical_nary_args(F.collect_list("arg")).alias("arguments"))
        .withColumn("label", F.lit(label))
    )


def to_multi_labeled(mentions: DataFrame) -> DataFrame:
    """Collapse per-span label rows into MultiLabeledSpan rows:
    (doc_id, start, end, labels sorted-distinct array)."""
    return (
        mentions.groupBy("doc_id", "start", "end")
        .agg(F.sort_array(F.collect_set("label")).alias("labels"))
    )


def explode_multi_labels(multi: DataFrame) -> DataFrame:
    """Inverse of to_multi_labeled (one row per (span, label))."""
    return multi.select(
        "doc_id", "start", "end", F.explode("labels").alias("label")
    )


def multi_label_vocabulary(multi: DataFrame) -> list[str]:
    """_prepare for the multi-label case: union of the per-span label sets,
    sorted. Driver-side collect by design — the vocab is broadcast back."""
    rows = (
        multi.select(F.explode("labels").alias("label"))
        .distinct()
        .collect()
    )
    return sorted(r["label"] for r in rows)
