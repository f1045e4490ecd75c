"""Cross-text coref pairs: blocked pair construction, centered-window
context parity with window_around_slice, span-too-wide skip."""

from pyspark.sql import functions as F

from pytorch_ie_spark.functions.window import window_around_slice
from pytorch_ie_spark.operators.coref import (
    centered_window_cols,
    coref_skipped_spans,
    coref_text_pairs,
)


def _docs(spark):
    rows = [
        (1, "alice works at acme corp in berlin"),
        (2, "acme corp hired alice yesterday morning"),
        (3, "bob founded acme corp decades ago"),
        (4, "completely unrelated text about nothing"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mentions(spark):
    rows = [
        (1, 0, 5, "alice"),
        (1, 15, 24, "acme corp"),
        (2, 0, 9, "acme corp"),
        (2, 16, 21, "alice"),
        (3, 12, 21, "acme corp"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, start long, end long, surface string"
    )


def test_pairs_are_cross_document_and_blocked(spark):
    out = coref_text_pairs(
        _docs(spark), _mentions(spark), max_window=20, threshold=0.2
    ).collect()
    keys = {(r["block"], r["doc_id"], r["doc_id_pair"]) for r in out}
    # acme corp: docs (1,2), (1,3), (2,3); alice: docs (1,2) — no same-doc
    # pairs, no cross-block pairs
    assert keys == {
        ("acme corp", 1, 2),
        ("acme corp", 1, 3),
        ("acme corp", 2, 3),
        ("alice", 1, 2),
    }
    for r in out:
        assert 0.0 <= r["score"] <= 1.0
        assert r["is_similar"] == (r["score"] >= 0.2)


def test_centered_window_matches_python_reference(spark):
    cases = [
        (10, 12, 100, 6),
        (0, 2, 100, 6),
        (98, 100, 100, 6),
        (1, 3, 4, 10),
        (5, 6, 50, 7),
    ]
    df = spark.createDataFrame(
        cases, "s long, e long, length long, mw int"
    )
    for mw in {c[3] for c in cases}:
        ws, we = centered_window_cols(
            F.col("s"), F.col("e"), F.col("length"), mw
        )
        got = (
            df.where(F.col("mw") == mw)
            .select("s", "e", "length", ws.alias("ws"), we.alias("we"))
            .collect()
        )
        for r in got:
            expect = window_around_slice(
                (r["s"], r["e"]), mw, r["length"]
            )
            assert (r["ws"], r["we"]) == expect


def test_wide_spans_are_skipped_and_auditable(spark):
    m = _mentions(spark)
    out = coref_text_pairs(_docs(spark), m, max_window=6).collect()
    assert all(r["block"] == "alice" for r in out)  # acme corp is 9 chars
    skipped = coref_skipped_spans(m, max_window=6).collect()
    assert {r["surface"] for r in skipped} == {"acme corp"}


def _token_mentions(spark):
    # token-space mentions (tok_end exclusive) for the pooler-scored variant
    rows = [
        (1, 0, 1, "alice"),
        (1, 3, 4, "acme"),
        (2, 0, 1, "acme"),
        (2, 2, 3, "alice"),
        (3, 2, 3, "acme"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, tok_start long, tok_end long, block string"
    )


def test_pooler_scored_matches_numpy_reference(spark):
    """coref_pairs_pooler_scored == a plain-numpy reimplementation of the
    reference model's decision function (max-pool span states, cosine of
    the pooled vectors — SequencePairSimilarityModelWithPooler)."""
    import hashlib

    import numpy as np

    from pytorch_ie_spark.operators.coref import coref_pairs_pooler_scored

    ctx, threshold = 2, 0.9
    docs = {r["doc_id"]: r["text"] for r in _docs(spark).collect()}
    ments = [tuple(r) for r in _token_mentions(spark).collect()]

    def state(tok: str) -> np.ndarray:
        h = hashlib.md5(tok.encode()).hexdigest()
        return np.array(
            [int(h[8 * d : 8 * d + 8], 16) % 1000 for d in range(4)],
            dtype=np.int64,
        )

    def pooled(doc_id: int, s: int, e: int) -> np.ndarray:
        toks = docs[doc_id].split(" ")
        lo, hi = max(s - ctx, 0), min(e + ctx, len(toks))
        return np.max([state(t) for t in toks[lo:hi]], axis=0)

    # first mention per (doc, block), then cross-doc same-block pairs
    firsts = {}
    for doc_id, s, e, block in sorted(ments):
        firsts.setdefault((doc_id, block), (s, e))
    expected = {}
    for (d1, b1), (s1, e1) in firsts.items():
        for (d2, b2), (s2, e2) in firsts.items():
            if b1 == b2 and d1 < d2:
                p, q = pooled(d1, s1, e1), pooled(d2, s2, e2)
                na, nb = float(p @ p), float(q @ q)
                score = (
                    0.0
                    if na == 0 or nb == 0
                    else round(float(p @ q) / (np.sqrt(na) * np.sqrt(nb)), 6)
                )
                expected[(b1, d1, s1, d2, s2)] = (score, score >= threshold)

    out = coref_pairs_pooler_scored(
        _docs(spark), _token_mentions(spark),
        context_tokens=ctx, threshold=threshold,
    ).collect()
    got = {
        (r["block"], r["doc_id"], r["tok_start"], r["doc_id_pair"],
         r["tok_start_pair"]): (r["score"], r["is_similar"])
        for r in out
    }
    assert got == expected
    assert len(got) >= 2  # alice 1-2 and acme pairs 1-2, 1-3, 2-3


def test_pooler_scored_rejects_unknown_pooler(spark):
    import pytest

    from pytorch_ie_spark.operators.coref import coref_pairs_pooler_scored

    with pytest.raises(ValueError, match="pooler"):
        coref_pairs_pooler_scored(
            _docs(spark), _token_mentions(spark), pooler="mean"
        )
