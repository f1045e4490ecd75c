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
    stride = max_size - 2 * overlap
    windows = []
    for label_start in range(overlap, seq_len, stride):
        tok_start = label_start - overlap
        label_end = min(label_start + stride, seq_len)
        tok_end = min(label_end + overlap, seq_len)
        rel_start = label_start - tok_start
        rel_end = label_end - tok_start
        if tok_start == 0:
            rel_start = 0
        if tok_end == seq_len:
            rel_end = tok_end - tok_start
        windows.append(((tok_start, tok_end), (rel_start, rel_end)))
    return windows


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
