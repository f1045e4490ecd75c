"""Document-level text-classification taskmodule (reference
simple_transformer_text_classification.py:87-216)."""

import math

from pyspark.sql import functions as F

from pytorch_ie_spark.operators.doc_classify import (
    DOC_LABELS,
    classify_documents,
    prepare_label_to_id,
    softmax_argmax,
)


def test_prepare_label_to_id_sorted_with_outside_zero():
    """_prepare: sorted labels from 1, 'O' reserved at 0 (reference :87-105)."""
    mapping = prepare_label_to_id(["pos", "neg", "pos", "neutral"])
    assert mapping == {"neg": 1, "neutral": 2, "pos": 3, "O": 0}


def test_softmax_argmax_first_index_tie_break():
    idx, prob = softmax_argmax([2.0, 5.0, 5.0, 1.0])
    assert idx == 1
    # probability of the argmax under a plain softmax
    z = sum(math.exp(x - 5.0) for x in [2.0, 5.0, 5.0, 1.0])
    assert prob == 1.0 / z


def test_classify_documents_one_label_per_doc(spark):
    docs = spark.createDataFrame(
        [("d1", "spark joins scan tables"), ("d2", "the cat sat")],
        "doc_id string, text string",
    )
    out = classify_documents(docs).collect()
    assert len(out) == 2
    for r in out:
        assert r["label"] in DOC_LABELS
        assert 1.0 / len(DOC_LABELS) <= r["score"] <= 1.0
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["d1"]["n_tokens"] == 4


def test_truncation_bounds_the_encoding(spark):
    """Two texts identical in the first max_length tokens classify
    identically (encode_input truncation, reference :124-129), while
    n_tokens still reports the full document length."""
    common = " ".join(f"w{i}" for i in range(64))
    docs = spark.createDataFrame(
        [("a", common + " tail tokens here"), ("b", common + " different ending")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in classify_documents(docs, max_length=64).collect()}
    assert rows["a"]["label"] == rows["b"]["label"]
    assert rows["a"]["score"] == rows["b"]["score"]
    assert rows["a"]["n_tokens"] == 67
    # and WITHOUT truncation they diverge (md5 over the full text)
    full = {r["doc_id"]: r for r in classify_documents(docs, max_length=1024).collect()}
    assert (full["a"]["label"], full["a"]["score"]) != (
        full["b"]["label"],
        full["b"]["score"],
    )


def test_custom_label_vocabulary(spark):
    docs = spark.createDataFrame([("d", "some text")], "doc_id string, text string")
    out = classify_documents(
        docs, model_config={"labels": ["x", "y"]}
    ).collect()[0]
    assert out["label"] in ("x", "y")
