"""Reversed-relation augmentation semantics (reference
re_text_classification_with_indices.py:544-620): suffix labeling,
symmetric passthrough/skip, argument-pair dedup, double-reversal error."""

import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException

from pytorch_ie_spark.operators.relations import add_reversed_relations

SCHEMA = (
    "doc_id long, head_start long, head_end long, "
    "tail_start long, tail_end long, label string"
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_reversal_suffix_and_symmetric(spark):
    rels = spark.createDataFrame(
        [
            (1, 0, 5, 10, 15, "works_for"),
            (1, 20, 25, 30, 35, "married_to"),  # symmetric
        ],
        SCHEMA,
    )
    out = _rows(
        add_reversed_relations(rels, symmetric_relations=["married_to"])
    )
    assert (1, 10, 15, 0, 5, "works_for_reversed") in out
    assert (1, 30, 35, 20, 25, "married_to") in out  # no suffix
    assert len(out) == 4


def test_symmetric_not_reversed_when_disabled(spark):
    rels = spark.createDataFrame([(1, 0, 5, 10, 15, "married_to")], SCHEMA)
    out = _rows(
        add_reversed_relations(
            rels,
            symmetric_relations=["married_to"],
            reverse_symmetric_relations=False,
        )
    )
    assert out == [(1, 0, 5, 10, 15, "married_to")]


def test_existing_reversed_argument_pair_is_skipped(spark):
    rels = spark.createDataFrame(
        [
            (1, 0, 5, 10, 15, "a_rel"),
            (1, 10, 15, 0, 5, "b_rel"),  # reversed args already present
        ],
        SCHEMA,
    )
    out = _rows(add_reversed_relations(rels))
    # neither reversal is added: each candidate's args already exist
    assert len(out) == 2


def test_double_reversal_raises(spark):
    rels = spark.createDataFrame(
        [(1, 0, 5, 10, 15, "works_for_reversed")], SCHEMA
    )
    with pytest.raises(SparkRuntimeException, match="reversal suffix"):
        add_reversed_relations(rels).collect()
