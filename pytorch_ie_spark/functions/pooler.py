"""Argument poolers over per-token hidden states, as JVM array expressions.

Reference analog: models/components/pooler.py —
  - pool_cls (:16): the sequence-start state,
  - AtIndexPooler (:20-73, START_TOKENS): concat of the states AT the
    argument start indices,
  - SpanMaxPooler (:100-171, MENTION_POOLING): elementwise max over each
    argument span, concatenated,
  - SpanMeanPooler (:175-248): same with mean aggregation.

The "hidden states" here are deterministic md5-derived integer vectors
(one md5 per token, dim d reads hex slice [8d, 8d+8)) standing in for
encoder outputs — the POOLING math is the real contract and has a DuckDB
twin (q:kg_pooler). Real encoder states plug in as any array<float>
column. Vectors serialize to '|'-joined strings for engine-exact
comparison (never raw float arrays)."""

from __future__ import annotations

from pyspark.sql import functions as F

HIDDEN_DIM = 4
EMIT_MOD = 1000


def token_state_vecs(toks_col):
    """array<array<long>> of mock hidden states, one md5 per token."""
    hashes = F.transform(toks_col, lambda t: F.md5(t))
    return F.transform(
        hashes,
        lambda h: F.array(
            *[
                (
                    F.conv(F.substring(h, 1 + 8 * d, 8), 16, 10).cast("long")
                    % EMIT_MOD
                )
                for d in range(HIDDEN_DIM)
            ]
        ),
    )


def _join(vec):
    return F.concat_ws("|", F.transform(vec, lambda x: x.cast("string")))


def pool_cls_col(vecs):
    """pool_cls: the state of token 0."""
    return _join(F.element_at(vecs, 1))


def pool_at_index_col(vecs, *indices):
    """AtIndexPooler / START_TOKENS: concat of the states at each 0-based
    index column."""
    return F.concat_ws(
        "|", *[_join(F.element_at(vecs, (i + 1).cast("int"))) for i in indices]
    )


def _span_slice(vecs, start, length):
    return F.slice(vecs, (start + 1).cast("int"), length.cast("int"))


def pool_span_max_vec(vecs, start, length):
    """SpanMaxPooler as a raw array<long> (elementwise max over the span's
    states) — the numeric form downstream similarity heads consume."""
    sl = _span_slice(vecs, start, length)
    return F.aggregate(
        F.slice(sl, 2, F.greatest(F.size(sl) - 1, F.lit(0))),
        F.element_at(sl, 1),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: F.greatest(a, b)),
    )


def pool_span_max_col(vecs, start, length):
    """SpanMaxPooler: elementwise max over the span's states."""
    return _join(pool_span_max_vec(vecs, start, length))


def cosine_sim_col(a, b):
    """Fixed-order cosine of two equal-length numeric arrays, rounded to 6
    decimals (the SequencePairSimilarityModelWithPooler classifier head,
    reference models/sequence_classification_with_pooler.py:315-318 —
    torch.nn.functional.cosine_similarity over the two pooled vectors).

    Integer inputs keep dot and norms exact (left-fold sums of integer
    products); only the final sqrt/divide is floating point, so a SQL twin
    with the same term order reproduces the value bit-for-bit. A zero-norm
    side scores 0.0 (torch's eps-guard analog, made exact)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sq = lambda v: F.aggregate(  # noqa: E731
        F.transform(v, lambda x: x * x), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    na, nb = sq(a), sq(b)
    return F.when(
        (na == 0) | (nb == 0), F.lit(0.0)
    ).otherwise(F.round(dot / (F.sqrt(na) * F.sqrt(nb)), 6))


def pool_span_mean_col(vecs, start, length):
    """SpanMeanPooler: elementwise mean over the span's states, rounded to
    6 decimals (exact vs the SQL twin: integer sums, one double divide)."""
    sl = _span_slice(vecs, start, length)
    sums = F.aggregate(
        F.slice(sl, 2, F.greatest(F.size(sl) - 1, F.lit(0))),
        F.element_at(sl, 1),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )
    n = F.size(sl)
    return F.concat_ws(
        "|",
        F.transform(sums, lambda s: F.round(s / n, 6).cast("string")),
    )
