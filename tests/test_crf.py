"""CRF Viterbi decode: brute-force path-enumeration equality, JVM-fold
score parity, and the crf_ner model through the mention stage."""

import itertools

from pyspark.sql import functions as F

from pytorch_ie_spark.functions.crf import (
    EMIT_MOD,
    START,
    TAGS,
    TRANS,
    emission_scores,
    viterbi_decode,
    viterbi_score_col,
)


def _brute_force(tokens):
    n_tags = len(TAGS)
    ems = [emission_scores(t) for t in tokens]
    best_path, best_score = None, None
    for path in itertools.product(range(n_tags), repeat=len(tokens)):
        score = START[path[0]] + ems[0][path[0]]
        for i in range(1, len(tokens)):
            score += TRANS[path[i - 1]][path[i]] + ems[i][path[i]]
        # tie-break: lexicographically smallest tag-index path, matching
        # Viterbi's first-index argmax at every step
        key = (score, tuple(-p for p in path))
        if best_score is None or key > (best_score, tuple(-p for p in best_path)):
            best_score, best_path = score, path
    return [TAGS[s] for s in best_path], best_score


def test_viterbi_matches_brute_force():
    vocab = ["spark", "hash", "join", "x", "table", "scan"]
    for n in (1, 2, 3, 4, 5):
        for seed in range(6):
            tokens = [vocab[(seed + i * (seed + 3)) % len(vocab)] for i in range(n)]
            tags, score = viterbi_decode(tokens)
            bf_tags, bf_score = _brute_force(tokens)
            assert score == bf_score, (tokens, score, bf_score)
            assert tags == bf_tags, (tokens, tags, bf_tags)


def test_viterbi_path_respects_bio_constraint():
    # I-ENT never opens a sequence and never follows O (forbidden scores)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    for n in range(1, 6):
        tags, _ = viterbi_decode(vocab[:n])
        assert tags[0] != "I-ENT"
        for prev, cur in zip(tags, tags[1:]):
            if cur == "I-ENT":
                assert prev in ("B-ENT", "I-ENT")


def test_jvm_fold_matches_python(spark):
    texts = [
        "spark joins fast table scan merge",
        "x",
        "",
        "hash hash hash hash",
        " ".join(str(i) for i in range(60)),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", viterbi_score_col(F.split("text", " ")).alias("v")
        ).collect()
    }
    for i, t in enumerate(texts):
        tags, score = viterbi_decode(t.split(" "))
        assert rows[i]["v"]["viterbi_score"] == score, t
        last = TAGS[rows[i]["v"]["best_last_tag"] - 1]
        assert last == tags[-1], t


def test_crf_ner_model_through_mention_stage(spark):
    from pytorch_ie_spark.operators.mentions import detect_mentions

    docs = spark.createDataFrame(
        [("d1", "spark joins fast table scan merge sort", "s")],
        "doc_id string, text string, content_sha256 string",
    )
    m = detect_mentions(docs, model_name="crf_ner").collect()
    # spans decode from the Viterbi BIO tags: all labeled ENT, in-bounds,
    # and consistent with a direct decode of the same tokens
    tags, _ = viterbi_decode("spark joins fast table scan merge sort".split(" "))
    expected_b = sum(1 for t in tags if t == "B-ENT")
    assert len(m) == expected_b
    assert all(r["label"] == "ENT" for r in m)
