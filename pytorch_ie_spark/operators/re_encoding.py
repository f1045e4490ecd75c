"""Relation-classification encode path: token-space distance filter,
window-around-candidate, and the discontinuous two-frame gather — all as
whole-stage-codegen expressions (no UDF).

Reference semantics (re_text_classification_with_indices.py):
  - :922-951  token-space argument-distance filter (inner/outer
    span_distance over the args; candidates over the bound are skipped
    with an observable counter),
  - :1071-1093 windowing: the input is restricted to a max_tokens window
    centered on the REQUIRED slice (first arg start .. last arg end);
    candidates whose required slice exceeds the window are skipped
    ("skipped_too_long"); surviving args shift by -window_start,
  - :1005-1069 discontinuous text: when the args are far apart, each arg
    gets its own frame of max_tokens/n_args (minus glue), overlapping
    frames merge, disjoint frames are concatenated with a glue token
    between, and arg offsets shift by the dropped-token prefix counts plus
    inserted glue. Implemented here in closed form for binary relations
    (two args) — the n-ary general case is the same frame-union logic.

All offsets are TOKEN indices; the same expressions work on char offsets
(the operators only do arithmetic on start/end/seq_len columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.window import centered_window_cols


def token_mentions(documents: DataFrame, vocabulary: list[str]) -> DataFrame:
    """(doc_id, tok_idx, surface) for whitespace tokens in `vocabulary` —
    token-space mention frame (tok span = [tok_idx, tok_idx+1))."""
    return (
        documents.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(F.split("text", " ")).alias("tok_idx", "surface"),
        )
        .where(F.col("surface").isin(vocabulary))
        .select("doc_id", F.col("tok_idx").cast("long").alias("tok_idx"), "surface")
    )


def token_distance_col(
    head_start, head_end, tail_start, tail_end, mode: str = "inner"
):
    """span_distance in any offset space: inner = gap between closer edges
    (0 when overlapping), outer = far-edge extent."""
    if mode == "inner":
        return F.greatest(
            F.lit(0),
            F.greatest(head_start, tail_start) - F.least(head_end, tail_end),
        )
    if mode == "outer":
        return F.greatest(head_end, tail_end) - F.least(head_start, tail_start)
    raise ValueError(f"unknown distance mode: {mode}")


def with_candidate_window(
    pairs: DataFrame,
    max_tokens: int,
    seq_len_col: str = "seq_len",
) -> DataFrame:
    """Adds the window-around-candidate columns to a candidate-pair frame
    with (head_tok_start, head_tok_end, tail_tok_start, tail_tok_end,
    seq_len):

      skipped     — true when the required slice (all args) exceeds
                    max_tokens (the reference's skipped_too_long),
      win_start/win_end — the centered window (null when skipped),
      new_head_start/.../new_tail_end — arg spans shifted by -win_start.
    """
    req_start = F.least("head_tok_start", "tail_tok_start")
    req_end = F.greatest("head_tok_end", "tail_tok_end")
    skipped = (req_end - req_start) > max_tokens
    ws, we = centered_window_cols(
        req_start, req_end, F.col(seq_len_col), max_tokens
    )
    ws = F.when(~skipped, ws)
    we = F.when(~skipped, we)
    return pairs.select(
        "*",
        skipped.alias("skipped"),
        ws.alias("win_start"),
        we.alias("win_end"),
        (F.col("head_tok_start") - ws).alias("new_head_start"),
        (F.col("head_tok_end") - ws).alias("new_head_end"),
        (F.col("tail_tok_start") - ws).alias("new_tail_start"),
        (F.col("tail_tok_end") - ws).alias("new_tail_end"),
    )


def with_discontinuous_frames(
    pairs: DataFrame,
    max_tokens: int,
    glue_len: int = 1,
    seq_len_col: str = "seq_len",
) -> DataFrame:
    """Two-frame discontinuous gather for binary candidates (closed form).

    Per argument: a frame of max_per_arg = max_tokens/2 - glue_len tokens
    centered on the arg (shift-clamped at the sequence bounds; if the
    whole sequence fits in one frame, everything is kept). Overlapping or
    adjacent frames merge into one segment; disjoint frames become two
    segments with `glue_len` glue tokens between. Adds:

      skipped    — an argument alone exceeds max_per_arg,
      f1_start/f1_end/f2_start/f2_end — ordered segment bounds (f2_* null
                   when the frames merged),
      gathered_len — total encoded length (segments + glue),
      new_a_start/new_a_end/new_b_start/new_b_end — the FIRST (a) and
                   SECOND (b) argument by token order, shifted into the
                   gathered sequence.
    """
    mpa = max_tokens // 2 - glue_len
    L = F.col(seq_len_col)
    # order args by start so the segment math is canonical
    a_start = F.least("head_tok_start", "tail_tok_start")
    a_end = F.when(
        F.col("head_tok_start") <= F.col("tail_tok_start"),
        F.col("head_tok_end"),
    ).otherwise(F.col("tail_tok_end"))
    b_start = F.greatest("head_tok_start", "tail_tok_start")
    b_end = F.when(
        F.col("head_tok_start") <= F.col("tail_tok_start"),
        F.col("tail_tok_end"),
    ).otherwise(F.col("head_tok_end"))
    skipped = F.greatest(
        a_end - a_start, b_end - b_start
    ) > F.lit(mpa)

    def frame(s, e):
        # reference frame math: integer center, left-clamp then right-clamp
        center = F.floor((s + e) / 2).cast("long")
        fs = F.greatest(center - mpa // 2, F.lit(0))
        fe = fs + mpa
        fs = F.when(fe > L, F.greatest(L - mpa, F.lit(0))).otherwise(fs)
        fe = F.least(fe, L)
        # whole sequence fits in one frame -> keep everything
        fs = F.when(L <= mpa, F.lit(0)).otherwise(fs)
        fe = F.when(L <= mpa, L).otherwise(fe)
        return fs.cast("long"), fe.cast("long")

    f1s, f1e = frame(a_start, a_end)
    f2s, f2e = frame(b_start, b_end)
    # Stage 1 NAMES the frame bounds once. Every bound is referenced ~6
    # times below, and each is itself a deep when-tree over a/b bounds:
    # inlining them (a single select) duplicates the expression tree
    # multiplicatively — measured 7s -> 0.8s at sf0.1 for the gather query
    # when the bounds are materialized as columns instead.
    stage1 = pairs.select(
        "*",
        a_start.alias("_a_start"),
        a_end.alias("_a_end"),
        b_start.alias("_b_start"),
        b_end.alias("_b_end"),
        f1s.alias("_f1s"),
        f1e.alias("_f1e"),
        f2s.alias("_f2s"),
        f2e.alias("_f2e"),
        skipped.alias("skipped"),
    )
    c = F.col
    f1s, f1e, f2s, f2e = c("_f1s"), c("_f1e"), c("_f2s"), c("_f2e")
    # Frames are ordered by ARG start, not frame start: a nested narrow
    # second arg can have its frame begin LEFT of the first arg's frame
    # (e.g. a=(2,5), b=(2,3) at mpa=3 -> f1s=2, f2s=1).  The merged test
    # must therefore be true interval overlap/adjacency, and the merged
    # segment starts at the union start — matching the reference's
    # mask-union semantics (re_text_classification_with_indices.py
    # :1005-1069).  When the frames are disjoint, frame order follows arg
    # order (f2s > f1e): a "frame 2 entirely left of frame 1" layout would
    # need an arg wider than mpa, which is already `skipped`.
    merged = F.greatest(f1s, f2s) <= F.least(f1e, f2e)
    u_start = F.least(f1s, f2s)
    seg1_start = F.when(merged, u_start).otherwise(f1s)
    seg1_end = F.when(merged, F.greatest(f1e, f2e)).otherwise(f1e)
    gathered_len = F.when(
        merged, seg1_end - seg1_start
    ).otherwise((f1e - f1s) + glue_len + (f2e - f2s))
    # shifts: the first segment drops everything before its start; the
    # second segment additionally drops the gap (f2s - f1e) and gains
    # glue_len glue tokens
    shift_a = F.when(merged, -u_start).otherwise(-f1s)
    shift_b = F.when(merged, -u_start).otherwise(-f1s - (f2s - f1e) + glue_len)
    sk = c("skipped")
    out = stage1.select(
        *pairs.columns,
        sk.alias("skipped"),
        F.when(~sk, seg1_start).alias("f1_start"),
        F.when(~sk, seg1_end).alias("f1_end"),
        F.when(~sk & ~merged, f2s).alias("f2_start"),
        F.when(~sk & ~merged, f2e).alias("f2_end"),
        F.when(~sk, gathered_len).alias("gathered_len"),
        F.when(~sk, c("_a_start") + shift_a).alias("new_a_start"),
        F.when(~sk, c("_a_end") + shift_a).alias("new_a_end"),
        F.when(~sk, c("_b_start") + shift_b).alias("new_b_start"),
        F.when(~sk, c("_b_end") + shift_b).alias("new_b_end"),
    )
    return out


def insert_pair_markers_disjoint_col(tokens_col, hs, he, ts, te):
    """Marker-decorated token array for the common RE case of DISJOINT
    argument spans in order (he <= ts): five array slices + four marker
    singletons concatenated — O(n) array copies instead of the per-token
    transform+flatten of `insert_pair_markers_col`, which costs ~5x more
    in whole-stage codegen (one nested concat per token). Semantically
    identical to the general version on disjoint ordered spans (equality
    property-tested in tests/test_re_encoding.py)."""
    n = F.size(tokens_col).cast("long")

    def seg(start, length):
        # F.slice rejects non-positive length under ANSI; empty segments
        # are real here (e.g. adjacent spans)
        return F.when(
            length > 0, F.slice(tokens_col, (start + 1).cast("int"), length.cast("int"))
        ).otherwise(F.array().cast("array<string>"))

    def mark(m):
        return F.array(F.lit(m))

    hs, he, ts, te = (c.cast("long") for c in (hs, he, ts, te))
    return F.concat(
        seg(F.lit(0).cast("long"), hs),
        mark("[H]"),
        seg(hs, he - hs),
        mark("[/H]"),
        seg(he, ts - he),
        mark("[T]"),
        seg(ts, te - ts),
        mark("[/T]"),
        seg(te, n - te),
    )


def insert_pair_markers_col(tokens_col, hs, he, ts, te):
    """Marker-decorated token array for a candidate pair: [H]/[/H] around
    the head span, [T]/[/T] around the tail (ordered insertion — the §2.6
    'ordered marker insertion' row, as one flatten/transform pass).
    Handles interleaved/overlapping spans; for the common disjoint-ordered
    case prefer insert_pair_markers_disjoint_col (same output, ~5x less
    expression work)."""
    def seg(i):
        tok = F.element_at(tokens_col, (i + 1).cast("int"))
        pre = F.when(i == hs, F.array(F.lit("[H]"))).otherwise(
            F.when(i == ts, F.array(F.lit("[T]"))).otherwise(
                F.array().cast("array<string>")
            )
        )
        post = F.when(i == he - 1, F.array(F.lit("[/H]"))).otherwise(
            F.when(i == te - 1, F.array(F.lit("[/T]"))).otherwise(
                F.array().cast("array<string>")
            )
        )
        return F.concat(pre, F.array(tok), post)

    return F.flatten(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.size(tokens_col).cast("long") - 1),
            seg,
        )
    )
