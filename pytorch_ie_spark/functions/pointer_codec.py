"""Pointer-network annotation codec: spans / labeled spans / binary
relations <-> integer id sequences, plus the resumable sequence parser and
the per-step decoding-constraint builder used by constrained generation.

Contract parity with the reference
(src/pytorch_ie/taskmodules/pointer_network/annotation_encoder_decoder.py:35-246,371-398
and pointer_network_for_end2end_re.py:74-79, 505-606), re-expressed as a
table-driven functional module (no class hierarchy):

  - target-id space: [special targets][labels][pointer ids]; a token
    position p is encoded as `offset + p` where offset = #specials+#labels,
  - span encoding [start, end] with exclusive or inclusive end,
  - labeled span = span ids + label id, ordered by `mode`
    ('indices_label' | 'label_indices'),
  - binary relation = 7 ids ordered by `mode` ('tail_head_label' etc.);
    a span participating in no relation is encoded as a loop-dummy
    relation whose second argument + label are the none id,
  - decode errors carry the same identifiers the reference counts:
    'len', 'order', 'label', 'index' (+ 'correct' for successes),
  - `parse_relation_sequence` is resumable: returns (decoded, error
    counts, unconsumed tail) — a truncated generation loses only its tail,
  - `next_step_constraints` returns (allowed, disallowed) id sets for the
    next generation step given a partial 7-tuple (tail_head_label mode).

The codec itself is pure Python (driver/UDF-side); the DataFrame surface
is operators/pointer_ops.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

ERR_CORRECT = "correct"
ERR_LEN = "len"
ERR_ORDER = "order"
ERR_LABEL = "label"
ERR_INDEX = "index"
ERR_OVERLAP = "overlap"


class PointerDecodeError(ValueError):
    """Raised by decode_*; `identifier` is the error-counter bucket."""

    def __init__(self, identifier: str, message: str, encoding: Sequence[int]):
        super().__init__(message)
        self.identifier = identifier
        self.encoding = list(encoding)


@dataclass(frozen=True)
class PointerVocab:
    """Fixed id layout: [specials][none][span labels][relation labels].

    pointer_offset = total number of non-pointer targets; token position p
    encodes as pointer_offset + p.
    """

    span_labels: tuple[str, ...]
    relation_labels: tuple[str, ...]
    none_label: str = "none"
    loop_relation_label: str = "loop"
    specials: tuple[str, ...] = ("<bos>", "<eos>")
    label2id: dict = field(init=False)
    id2label: dict = field(init=False)

    def __post_init__(self):
        targets = list(self.specials) + [self.none_label] + list(
            self.span_labels
        ) + list(self.relation_labels)
        if len(set(targets)) != len(targets):
            raise ValueError(f"duplicate targets in vocab: {targets}")
        object.__setattr__(
            self, "label2id", {t: i for i, t in enumerate(targets)}
        )
        object.__setattr__(
            self, "id2label", {i: t for i, t in enumerate(targets)}
        )

    @property
    def bos_id(self) -> int:
        return 0

    @property
    def eos_id(self) -> int:
        return 1

    @property
    def none_id(self) -> int:
        return self.label2id[self.none_label]

    @property
    def span_ids(self) -> frozenset:
        return frozenset(self.label2id[l] for l in self.span_labels)

    @property
    def relation_ids(self) -> frozenset:
        return frozenset(self.label2id[l] for l in self.relation_labels)

    @property
    def pointer_offset(self) -> int:
        return len(self.label2id)


# --------------------------------------------------------------- span codec

def encode_span(
    start: int, end: int, offset: int = 0, exclusive_end: bool = True
) -> list[int]:
    return [start + offset, (end if exclusive_end else end - 1) + offset]


def decode_span(
    ids: Sequence[int], offset: int = 0, exclusive_end: bool = True
) -> tuple[int, int]:
    if len(ids) != 2:
        raise PointerDecodeError(
            ERR_LEN, f"span needs 2 ids, got {len(ids)}", ids
        )
    start, raw_end = ids[0] - offset, ids[1] - offset
    end = raw_end if exclusive_end else raw_end + 1
    if end < start:
        raise PointerDecodeError(
            ERR_ORDER, f"span end before start: start={start}, end={end}", ids
        )
    if start < 0 or raw_end < 0:
        raise PointerDecodeError(
            ERR_INDEX, f"negative span index after offset {offset}: {ids}", ids
        )
    return start, end


# ------------------------------------------------------- labeled-span codec

def encode_labeled_span(
    start: int,
    end: int,
    label: str,
    vocab: PointerVocab,
    mode: str = "indices_label",
    exclusive_end: bool = False,
) -> list[int]:
    span_ids = encode_span(
        start, end, offset=vocab.pointer_offset, exclusive_end=exclusive_end
    )
    label_id = vocab.label2id[label]
    if mode == "indices_label":
        return span_ids + [label_id]
    if mode == "label_indices":
        return [label_id] + span_ids
    raise ValueError(f"unknown labeled-span mode: {mode}")


def decode_labeled_span(
    ids: Sequence[int],
    vocab: PointerVocab,
    mode: str = "indices_label",
    exclusive_end: bool = False,
) -> tuple[int, int, str]:
    if mode == "indices_label":
        span_ids, label_id = ids[:-1], ids[-1]
    elif mode == "label_indices":
        span_ids, label_id = ids[1:], ids[0]
    else:
        raise ValueError(f"unknown labeled-span mode: {mode}")
    start, end = decode_span(
        span_ids, offset=vocab.pointer_offset, exclusive_end=exclusive_end
    )
    label = vocab.id2label.get(label_id)
    if label is None or label_id not in vocab.span_ids:
        raise PointerDecodeError(
            ERR_LABEL, f"not a span label id: {label_id}", ids
        )
    return start, end, label


# ---------------------------------------------------------- relation codec

def _split_relation_mode(mode: str) -> tuple[str, bool]:
    """-> (argument order 'head_tail'|'tail_head', label_last)."""
    if mode.endswith("_label"):
        return mode[: -len("_label")], True
    if mode.startswith("label_"):
        return mode[len("label_"):], False
    raise ValueError(f"unknown relation mode: {mode}")


def encode_relation(
    head: tuple[int, int, str],
    tail: tuple[int, int, str],
    label: str,
    vocab: PointerVocab,
    mode: str = "tail_head_label",
    exclusive_end: bool = False,
) -> list[int]:
    """head/tail = (start, end, span_label). A loop-dummy relation
    (label == vocab.loop_relation_label, head == tail) encodes the single
    span + three none ids in place of the second argument + none label."""
    arg_order, label_last = _split_relation_mode(mode)
    if label == vocab.loop_relation_label:
        if head != tail:
            raise ValueError(
                f"loop relation requires head == tail, got {head} vs {tail}"
            )
        first = head if arg_order == "head_tail" else tail
        enc_first = encode_labeled_span(
            *first, vocab=vocab, exclusive_end=exclusive_end
        )
        body = enc_first + [vocab.none_id] * 3
        label_id = vocab.none_id
    else:
        enc_head = encode_labeled_span(
            *head, vocab=vocab, exclusive_end=exclusive_end
        )
        enc_tail = encode_labeled_span(
            *tail, vocab=vocab, exclusive_end=exclusive_end
        )
        body = (
            enc_head + enc_tail
            if arg_order == "head_tail"
            else enc_tail + enc_head
        )
        label_id = vocab.label2id[label]
    return body + [label_id] if label_last else [label_id] + body


def decode_relation(
    ids: Sequence[int],
    vocab: PointerVocab,
    mode: str = "tail_head_label",
    exclusive_end: bool = False,
) -> tuple[tuple[int, int, str], tuple[int, int, str], str]:
    """-> (head, tail, label); a none-labeled 7-tuple decodes to the
    loop-dummy relation over its single span."""
    if len(ids) != 7:
        raise PointerDecodeError(
            ERR_LEN, f"relation needs 7 ids, got {len(ids)}", ids
        )
    arg_order, label_last = _split_relation_mode(mode)
    if label_last:
        label_id, args = ids[6], ids[:6]
    else:
        label_id, args = ids[0], ids[1:]
    label = vocab.id2label.get(label_id)
    if label is None or (
        label_id not in vocab.relation_ids and label_id != vocab.none_id
    ):
        raise PointerDecodeError(
            ERR_LABEL, f"not a relation label id: {label_id}", ids
        )
    if label_id == vocab.none_id:
        span = decode_labeled_span(
            args[:3], vocab, exclusive_end=exclusive_end
        )
        return span, span, vocab.loop_relation_label
    first = decode_labeled_span(args[:3], vocab, exclusive_end=exclusive_end)
    second = decode_labeled_span(args[3:], vocab, exclusive_end=exclusive_end)
    head, tail = (
        (first, second) if arg_order == "head_tail" else (second, first)
    )
    return head, tail, label


# ------------------------------------------------------------------- parse

def parse_relation_sequence(
    ids: Sequence[int],
    vocab: PointerVocab,
    mode: str = "tail_head_label",
    exclusive_end: bool = False,
) -> tuple[list, dict, list[int]]:
    """Resumable parse of a generated id stream into relations.

    A chunk is complete when it hits a relation label id, or when it
    contains the none id and reaches length 7 (loop dummy). Malformed
    chunks are counted by error identifier and skipped; the unconsumed
    tail (e.g. a truncated final chunk, or the eos id) is returned so a
    continuation can resume exactly where generation stopped."""
    relation_ids = vocab.relation_ids
    none_id = vocab.none_id
    decoded: list = []
    errors: dict[str, int] = {}
    chunk: list[int] = []
    for t in ids:
        chunk.append(t)
        if t in relation_ids or (t == none_id and len(chunk) == 7):
            try:
                decoded.append(
                    decode_relation(
                        chunk, vocab, mode=mode, exclusive_end=exclusive_end
                    )
                )
                errors[ERR_CORRECT] = errors.get(ERR_CORRECT, 0) + 1
            except PointerDecodeError as e:
                errors[e.identifier] = errors.get(e.identifier, 0) + 1
            chunk = []
    return decoded, errors, chunk


def relation_sort_key(head_start: int, tail_start: int) -> tuple[int, int]:
    """Canonical linearization order: by head start, then tail start
    (reference cmp_src_rel, pointer_network_for_end2end_re.py:74-79)."""
    return (head_start, tail_start)


def linearize_relations(
    relations: Sequence[
        tuple[tuple[int, int, str], tuple[int, int, str], str]
    ],
    vocab: PointerVocab,
    mode: str = "tail_head_label",
    exclusive_end: bool = False,
    append_eos: bool = True,
) -> list[int]:
    """Relations -> one target-id sequence in canonical order (+ eos)."""
    ordered = sorted(
        relations, key=lambda r: relation_sort_key(r[0][0], r[1][0])
    )
    out: list[int] = []
    for head, tail, label in ordered:
        out.extend(
            encode_relation(
                head, tail, label, vocab, mode=mode, exclusive_end=exclusive_end
            )
        )
    if append_eos:
        out.append(vocab.eos_id)
    return out


# ------------------------------------------------------------- constraints

def next_step_constraints(
    partial: Sequence[int], vocab: PointerVocab
) -> tuple[Optional[set], Optional[set]]:
    """(allowed, disallowed) id sets for the next id of a partial 7-tuple
    in tail_head_label mode with inclusive span ends (the constrained-
    generation layout). Either set may be None (= unconstrained side)."""
    none_id = vocab.none_id
    span_ids = set(vocab.span_ids)
    relation_ids = set(vocab.relation_ids)
    offset = vocab.pointer_offset
    has_none = none_id in partial
    step = len(partial)
    if step == 0:
        # first span start: any pointer (labels excluded)
        return None, set(range(offset))
    if step == 1:
        # first span end >= its start; none is not a valid end
        return None, set(range(partial[0])) | {none_id}
    if step == 2:
        return span_ids, None
    if step == 3:
        # second span start: no overlap with the first span, no labels —
        # except none (starts the loop-dummy filler)
        first_start, first_end_incl = partial[0], partial[1]
        dis = set(range(first_start, first_end_incl + 1))
        dis |= span_ids | relation_ids
        dis.discard(none_id)
        return None, dis
    if step == 4:
        if has_none:
            return {none_id}, None
        first_start = partial[0]
        second_start = partial[3]
        if second_start < first_start:
            # second span sits before the first: it must also END before it
            return set(range(second_start, first_start)), None
        return None, set(range(second_start)) | span_ids | relation_ids
    if step == 5:
        return ({none_id} if has_none else span_ids), None
    if step == 6:
        return ({none_id} if has_none else relation_ids), None
    raise ValueError(f"partial relation encoding too long: {len(partial)}")
