"""BIO/IO tag-sequence <-> span codecs.

Reimplements the *semantics* of the reference decoders
(reference: src/pytorch_ie/utils/span.py:41-118 bio_tags_to_spans,
:121-165 io_tags_to_spans, :168-216 convert_span_annotations_to_tag_sequence)
from scratch. Contract notes preserved exactly:

  - token spans returned are **inclusive** (start_tok, end_tok) pairs,
  - ill-formed spans (an I-X with no open X span) are *included* by default
    so a model can't score perfect F1 while emitting garbage,
  - results are a set (order-free, deduplicated).

These are pure functions used inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from typing import Optional


class InvalidTagSequence(Exception):
    pass


def bio_tags_to_spans(
    tags: list[str],
    classes_to_ignore: Optional[list[str]] = None,
    include_ill_formed: bool = True,
) -> list[tuple[str, tuple[int, int]]]:
    """Decode a BIO tag sequence into (label, (start_tok, end_tok_inclusive))."""
    ignore = set(classes_to_ignore or [])
    out: set[tuple[str, tuple[int, int]]] = set()
    open_label: Optional[str] = None
    open_start = open_end = 0

    def close():
        nonlocal open_label
        if open_label is not None:
            out.add((open_label, (open_start, open_end)))
        open_label = None

    for i, tag in enumerate(tags):
        prefix = tag[0]
        if prefix not in ("B", "I", "O"):
            raise InvalidTagSequence(" ".join(tags))
        label = tag[2:]
        if prefix == "O" or label in ignore:
            close()
        elif prefix == "B":
            close()
            open_label, open_start, open_end = label, i, i
        elif label == open_label:  # I continuing the open span
            open_end = i
        else:  # ill-formed I: closes previous, optionally opens new
            close()
            if include_ill_formed:
                open_label, open_start, open_end = label, i, i
    close()
    return list(out)


def io_tags_to_spans(
    tags: list[str],
    classes_to_ignore: Optional[list[str]] = None,
) -> list[tuple[str, tuple[int, int]]]:
    """Decode an IO tag sequence: maximal runs of the same label become spans
    (reference: src/pytorch_ie/utils/span.py:121-165)."""
    ignore = set(classes_to_ignore or [])
    out: set[tuple[str, tuple[int, int]]] = set()
    open_label: Optional[str] = None
    open_start = open_end = 0
    for i, tag in enumerate(tags):
        label = None if tag == "O" else (tag[2:] if tag[:2] in ("I-", "B-") else tag)
        if label is not None and label in ignore:
            label = None
        if label == open_label and label is not None:
            open_end = i
            continue
        if open_label is not None:
            out.add((open_label, (open_start, open_end)))
        open_label = label
        open_start = open_end = i
    if open_label is not None:
        out.add((open_label, (open_start, open_end)))
    return list(out)


def spans_to_bio_tags(
    spans: list[tuple[str, tuple[int, int]]],
    length: int,
    strict: bool = False,
) -> Optional[list[str]]:
    """Encode (label, (start_tok, end_tok_inclusive)) spans as BIO tags.

    Overlapping spans make the encoding undefined: return None (the
    reference returns None on overlap,
    src/pytorch_ie/utils/span.py:168-216) or raise when strict.
    """
    tags = ["O"] * length
    for label, (s, e) in sorted(spans, key=lambda x: (x[1][0], x[1][1])):
        if s < 0 or e >= length or s > e:
            if strict:
                raise ValueError(f"span out of range: {(label, (s, e))}")
            return None
        if any(t != "O" for t in tags[s : e + 1]):
            if strict:
                raise ValueError(f"overlapping span: {(label, (s, e))}")
            return None
        tags[s] = f"B-{label}"
        for i in range(s + 1, e + 1):
            tags[i] = f"I-{label}"
    return tags


def has_overlap(a: tuple[int, int], b: tuple[int, int]) -> bool:
    """End-exclusive interval overlap (pie_documents.utils.span.have_overlap)."""
    return a[0] < b[1] and b[0] < a[1]


def is_contained_in(inner: tuple[int, int], outer: tuple[int, int]) -> bool:
    """inner fully inside outer, end-exclusive
    (used by the partition containment filter,
    reference: src/pytorch_ie/taskmodules/re_text_classification_with_indices.py:753-758)."""
    return inner[0] >= outer[0] and inner[1] <= outer[1]


def span_distance(
    head: tuple[int, int], tail: tuple[int, int], mode: str = "inner"
) -> int:
    """Distance between two end-exclusive spans.

    inner: gap between the closer edges (0 if overlapping);
    outer: span of the farther edges
    (reference: src/pytorch_ie/taskmodules/re_text_classification_with_indices.py:702-728).
    """
    if mode == "inner":
        return max(0, max(head[0], tail[0]) - min(head[1], tail[1]))
    if mode == "outer":
        return max(head[1], tail[1]) - min(head[0], tail[0])
    raise ValueError(f"unknown span distance mode: {mode}")
