"""Sliding-window math over token sequences.

Same contracts as the reference (src/pytorch_ie/utils/window.py:4-68):

  - ``enumerate_windows(seq_len, max_size, overlap)``: tile the sequence so
    each position is *labeled* in exactly one window while windows overlap
    by ``overlap`` tokens on each side for context,
  - ``window_around_slice``: center a max-size window on a required slice,
    shifting at sequence boundaries; None if the slice itself doesn't fit.

Fresh implementations (different internals, identical outputs — verified in
tests/test_window.py against the documented behavior).
"""

from __future__ import annotations

from typing import Optional


def enumerate_windows(
    seq_len: int, max_size: int, overlap: int = 0
) -> list[tuple[tuple[int, int], tuple[int, int]]]:
    """Return [(token_slice, label_offset_slice)] covering [0, seq_len).

    token_slice = (tok_start, tok_end) end-exclusive window bounds;
    label_offset_slice = (rel_start, rel_end) *relative to tok_start* marking
    the tokens this window is responsible for labeling. Every token position
    lands in exactly one label slice.
    """
    if max_size <= 2 * overlap:
        raise ValueError("max_size must exceed 2*overlap")
    # short sequences fit a single window (the reference only windows
    # documents longer than the model max; its loop yields nothing for
    # seq_len <= overlap, which would silently drop short docs here)
    if seq_len <= max_size and seq_len > 0:
        return [((0, seq_len), (0, seq_len))]
    windows = []
    # `next_unlabeled` is the absolute index of the first token not yet
    # assigned to any label slice; the loop advances it monotonically so
    # exactly-once coverage holds by construction (no post-hoc clamping,
    # which previously emitted a duplicate trailing window when tok_end
    # hit seq_len one iteration early).
    next_unlabeled = 0
    while next_unlabeled < seq_len:
        tok_start = 0 if not windows else next_unlabeled - overlap
        tok_end = min(tok_start + max_size, seq_len)
        # the final window labels through its last token; interior windows
        # leave `overlap` trailing tokens as context for the next window
        label_end_abs = tok_end if tok_end == seq_len else tok_end - overlap
        windows.append(
            ((tok_start, tok_end), (next_unlabeled - tok_start, label_end_abs - tok_start))
        )
        next_unlabeled = label_end_abs
    return windows


def enumerate_windows_col(seq_len_col, max_size: int, overlap: int = 0):
    """`enumerate_windows` as a JVM-side array expression (one
    array<struct> per row, no Python): window k of a sequence of length L
    has the closed form

        k = 0:  tok_start = 0
        k >= 1: tok_start = (max_size - overlap) + (k-1)*stride - overlap
        tok_end = min(tok_start + max_size, L)
        label_end = L if tok_end == L else tok_end - overlap
        rel_start = 0 if k == 0 else overlap

    with stride = max_size - 2*overlap. The last window is the first k
    whose tok_end reaches L, so for L > max_size
    n = 1 + ceil((L - overlap - (max_size - overlap)) / stride)
      = 1 + ceil((L - max_size) / stride)
    windows (single full window otherwise). Verified against the Python
    loop in tests/test_window.py."""
    from pyspark.sql import functions as F

    if max_size <= 2 * overlap:
        raise ValueError("max_size must exceed 2*overlap")
    stride = max_size - 2 * overlap
    first_adv = max_size - overlap
    L = seq_len_col.cast("long")
    n_extra = F.ceil((L - F.lit(max_size)) / F.lit(stride)).cast("long")
    n = F.when(L <= max_size, F.lit(1)).otherwise(1 + n_extra)

    def win(k):
        tok_start = F.when(k == 0, F.lit(0).cast("long")).otherwise(
            F.lit(first_adv) + (k - 1) * F.lit(stride) - F.lit(overlap)
        )
        tok_end = F.least(tok_start + max_size, L)
        label_end = F.when(tok_end == L, L).otherwise(tok_end - overlap)
        rel_start = F.when(k == 0, F.lit(0).cast("long")).otherwise(
            F.lit(overlap).cast("long")
        )
        return F.struct(
            tok_start.alias("tok_start"),
            tok_end.alias("tok_end"),
            rel_start.alias("rel_start"),
            (label_end - tok_start).alias("rel_end"),
        )

    single = F.array(
        F.struct(
            F.lit(0).cast("long").alias("tok_start"),
            L.alias("tok_end"),
            F.lit(0).cast("long").alias("rel_start"),
            L.alias("rel_end"),
        )
    )
    multi = F.transform(F.sequence(F.lit(0).cast("long"), n - 1), win)
    empty = F.array().cast(
        "array<struct<tok_start:long,tok_end:long,rel_start:long,rel_end:long>>"
    )
    return (
        F.when(L <= 0, empty)
        .when(L <= max_size, single)
        .otherwise(multi)
    )


def hf_overflow_windows(
    seq_len: int, max_length: int, stride: int = 0
) -> list[tuple[int, int]]:
    """Window bounds matching the HF fast-tokenizer
    ``return_overflowing_tokens`` + ``stride`` contract: each window holds
    ``max_length`` tokens and the NEXT window re-includes the last
    ``stride`` tokens of the previous one (HF's stride is an overlap, not
    a step). The last window is shorter; windows are emitted until the
    sequence is consumed."""
    if stride >= max_length:
        raise ValueError("stride must be smaller than max_length")
    if seq_len <= 0:
        return []
    windows = []
    start = 0
    while True:
        end = min(start + max_length, seq_len)
        windows.append((start, end))
        if end >= seq_len:
            return windows
        start = end - stride


def centered_window_cols(start, end, length, max_window: int):
    """`window_around_slice` as JVM-side Column expressions: (win_start,
    win_end) of a max_window-wide window centered on [start, end),
    clamped/shifted at the boundaries. Exact parity with the Python
    function below is asserted in tests/test_coref.py."""
    from pyspark.sql import functions as F

    size = F.least(length, F.lit(max_window))
    raw_start = F.floor((start + end) / 2.0 - size / 2.0).cast("long")
    raw_end = raw_start + size
    # shift left if the window spills past the end, then right if past 0
    over = F.greatest(F.lit(0), raw_end - length)
    s1, e1 = raw_start - over, raw_end - over
    under = F.greatest(F.lit(0), -s1)
    return (s1 + under).cast("long"), (e1 + under).cast("long")


def window_around_slice(
    required: tuple[int, int], max_window_size: int, available_len: int
) -> Optional[tuple[int, int]]:
    """Best-effort centered window of max_window_size containing `required`.

    Returns None when the required slice alone exceeds the window.
    """
    if required[1] - required[0] > max_window_size:
        return None
    size = min(available_len, max_window_size)
    center = (required[0] + required[1]) / 2.0
    start = int(center - size / 2.0)
    end = start + size
    if end > available_len:
        start -= end - available_len
        end = available_len
    if start < 0:
        end += -start
        start = 0
    return start, end
