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


def pool_span_max_col(vecs, start, length):
    """SpanMaxPooler: elementwise max over the span's states."""
    sl = _span_slice(vecs, start, length)
    folded = F.aggregate(
        F.slice(sl, 2, F.greatest(F.size(sl) - 1, F.lit(0))),
        F.element_at(sl, 1),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: F.greatest(a, b)),
    )
    return _join(folded)


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
