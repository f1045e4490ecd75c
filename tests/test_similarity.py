"""Similarity search: brute-force cosine top-k + LSH bucketing."""

from pytorch_ie_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_bucketed_ann,
)


def _emb(spark, vectors):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<float>, label int",
    )


def test_brute_force_topk_exact(spark):
    vs = [
        [1.0, 0.0],   # 0: query
        [0.9, 0.1],   # 1: closest
        [0.5, 0.5],   # 2
        [0.0, 1.0],   # 3: orthogonal
    ]
    out = brute_force_topk(_emb(spark, vs), [0], k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]


def test_topk_excludes_self_and_limits(spark):
    vs = [[1.0, 0.0]] * 5
    out = brute_force_topk(_emb(spark, vs), [0], k=2).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 0 not in ids and len(out) == 2


def test_lsh_bucket_recall_on_identical_vectors(spark):
    vs = [[1.0, 2.0, 3.0, 4.0]] * 3 + [[-1.0, -2.0, -3.0, -4.0]] * 2
    out = lsh_bucketed_ann(_emb(spark, vs), k=5, num_planes=4).collect()
    # identical vectors share a bucket -> each of the 3 finds the other 2
    neigh = {}
    for r in out:
        neigh.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert neigh[0] == {1, 2}
    assert neigh[3] == {4}


def test_embedding_near_duplicates_threshold(spark):
    vs = [[1.0, 0.0], [1.0, 0.001], [0.0, 1.0]]
    pairs = embedding_near_duplicates(_emb(spark, vs), threshold=0.99).collect()
    assert [(p["src_id"], p["dst_id"]) for p in pairs] == [(0, 1)]
