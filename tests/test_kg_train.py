"""Negative sampling + constraint validation for KG-embedding training."""

from pytorch_ie_spark.operators.kg_train import (
    cardinality_check,
    indexed_entities,
    negative_samples,
)


def _triples(spark):
    rows = [
        ("a", "p", "b"), ("a", "p", "c"), ("b", "p", "c"),
        ("c", "q", "a"), ("d", "q", "a"), ("d", "p", "e"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_indexed_entities_dense_and_deterministic(spark):
    t = _triples(spark)
    idx = {r["e"]: r["idx"] for r in indexed_entities(t).collect()}
    # dense 0..N-1 over the distinct subj/obj vocabulary
    assert sorted(idx.values()) == list(range(5))
    # stable across partitionings
    idx2 = {r["e"]: r["idx"] for r in indexed_entities(
        t.repartition(7)).collect()}
    assert idx == idx2


def test_negative_samples_are_true_negatives(spark):
    t = _triples(spark)
    true_set = {(r["subj"], r["pred"], r["obj"]) for r in t.collect()}
    neg = negative_samples(t, k=3).collect()
    assert len(neg) > 0
    for r in neg:
        assert (r["subj"], r["pred"], r["neg_obj"]) not in true_set
        assert r["neg_obj"] != r["obj"]
        # the corruption preserves the positive it came from
        assert (r["subj"], r["pred"], r["obj"]) in true_set
    # deterministic: same seed -> same pairs, regardless of partitioning
    neg2 = negative_samples(t.repartition(5), k=3).collect()
    assert sorted(map(tuple, neg)) == sorted(map(tuple, neg2))
    # different seed -> (almost surely) different draw
    neg3 = negative_samples(t, k=3, seed="other").collect()
    assert sorted(map(tuple, neg3)) != sorted(map(tuple, neg))


def test_cardinality_check_flags_multivalued_subjects(spark):
    out = {(r["subj"], r["pred"]): r for r in cardinality_check(
        _triples(spark), ["p"]).collect()}
    assert out[("a", "p")]["violates_functional"]  # a->b, a->c
    assert out[("a", "p")]["n_objects"] == 2
    assert not out[("b", "p")]["violates_functional"]
    assert ("c", "q") not in out  # q is not declared functional
