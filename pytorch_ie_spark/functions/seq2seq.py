"""Triplet linearization codec for generative (seq2seq) relation extraction.

Reference semantics (src/pytorch_ie/taskmodules/transformer_seq2seq.py):
  - encode (:107-143): relations serialize to
    "<triplet> head_text <subj> tail_text <obj> label" with heads grouped —
    consecutive relations sharing a head emit "<subj> tail <obj> label"
    continuations,
  - decode (:234-277): a resumable state-machine parse over the generated
    string, tolerant of malformed output (drops incomplete triplets),
  - grounding (:176-193): entity surface forms located back in the text via
    case-insensitive first-match search.

Fresh implementation of the same grammar; pure functions usable inside
pandas UDFs.
"""

from __future__ import annotations

TRIPLET = "<triplet>"
SUBJ = "<subj>"
OBJ = "<obj>"


def linearize_triplets(triples: list[tuple[str, str, str]]) -> str:
    """[(head_text, tail_text, label)] -> linearized string; consecutive
    triples with the same head share one <triplet> group."""
    out: list[str] = []
    current_head: str | None = None
    for head, tail, label in triples:
        if head != current_head:
            out.extend([TRIPLET, head])
            current_head = head
        out.extend([SUBJ, tail, OBJ, label])
    return " ".join(out)


def parse_triplets(text: str) -> list[tuple[str, str, str]]:
    """Inverse state-machine parse; incomplete trailing triplets dropped."""
    triples: list[tuple[str, str, str]] = []
    head = tail = label = ""
    state = "start"
    for token in text.split():
        if token == TRIPLET:
            if state == "label" and head and tail and label:
                triples.append((head.strip(), tail.strip(), label.strip()))
            head, tail, label = "", "", ""
            state = "head"
        elif token == SUBJ:
            if state == "label" and head and tail and label:
                triples.append((head.strip(), tail.strip(), label.strip()))
                tail, label = "", ""
            state = "tail"
        elif token == OBJ:
            state = "label"
        elif state == "head":
            head += " " + token
        elif state == "tail":
            tail += " " + token
        elif state == "label":
            label += " " + token
    if state == "label" and head and tail and label:
        triples.append((head.strip(), tail.strip(), label.strip()))
    return triples


def ground_entity(text: str, entity: str) -> tuple[int, int] | None:
    """Case-insensitive first-occurrence span of the entity surface form
    (end-exclusive). Mirrors the reference's lowered `re.search` with the
    same caveat for regex metacharacters, handled here by plain find."""
    pos = text.lower().find(entity.lower())
    if pos < 0:
        return None
    return pos, pos + len(entity)
