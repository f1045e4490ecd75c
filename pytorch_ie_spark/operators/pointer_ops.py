"""Pointer-network codec as DataFrame operators.

Encode (relations -> per-document target-id sequences) is pure arithmetic
on offsets and a label CASE map, so it runs JVM-side with array HOFs —
no Python in the hot path at any scale. Decode/parse is a stateful
sequential machine (resumable chunking + error counters), so it runs the
pure-Python codec (functions/pointer_codec.py) inside one Arrow-batched
mapInPandas.

Reference parity: pointer_network/annotation_encoder_decoder.py:371-398
(parse), pointer_network_for_end2end_re.py:505-606 (target building,
canonical cmp_src_rel order).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.pointer_codec import (
    PointerVocab,
    parse_relation_sequence,
)

PARSED_SCHEMA = (
    "doc_id string, head_start long, head_end long, head_label string, "
    "tail_start long, tail_end long, tail_label string, label string"
)

PARSE_ERRORS_SCHEMA = (
    "doc_id string, n_correct long, n_len long, n_order long, "
    "n_label long, n_index long, n_remaining long"
)


def _label_id_col(col, vocab: PointerVocab):
    expr = None
    for label, idx in vocab.label2id.items():
        expr = (
            F.when(col == label, F.lit(idx))
            if expr is None
            else expr.when(col == label, F.lit(idx))
        )
    return expr


def pointer_target_ids(
    relations: DataFrame,
    vocab: PointerVocab,
    mode: str = "tail_head_label",
    doc_col: str = "doc_id",
    append_eos: bool = True,
) -> DataFrame:
    """(doc_id, target_ids) — one linearized pointer sequence per document.

    `relations` columns: doc_id, head_start, head_end, head_label,
    tail_start, tail_end, tail_label, label (char- or token-space offsets;
    the codec only shifts them by the vocab offset). Everything here is
    whole-stage-codegen expressions: label ids via a CASE map, the 7-tuple
    via array arithmetic (inclusive ends), canonical (head_start,
    tail_start) order via sort_array over a key-prefixed struct, one
    groupBy shuffle total."""
    off = F.lit(vocab.pointer_offset)
    head = [
        F.col("head_start") + off,
        F.col("head_end") - 1 + off,
        _label_id_col(F.col("head_label"), vocab),
    ]
    tail = [
        F.col("tail_start") + off,
        F.col("tail_end") - 1 + off,
        _label_id_col(F.col("tail_label"), vocab),
    ]
    rel_label = _label_id_col(F.col("label"), vocab)
    if mode == "tail_head_label":
        parts = tail + head + [rel_label]
    elif mode == "head_tail_label":
        parts = head + tail + [rel_label]
    elif mode == "label_tail_head":
        parts = [rel_label] + tail + head
    elif mode == "label_head_tail":
        parts = [rel_label] + head + tail
    else:
        raise ValueError(f"unknown relation mode: {mode}")
    enc = F.array(*[p.cast("long") for p in parts])
    keyed = relations.select(
        F.col(doc_col).alias("doc_id"),
        F.struct(
            F.col("head_start").cast("long").alias("k1"),
            F.col("tail_start").cast("long").alias("k2"),
            enc.alias("enc"),
        ).alias("kenc"),
    )
    flat = F.flatten(
        F.transform(
            F.sort_array(F.collect_list("kenc")), lambda x: x["enc"]
        )
    )
    if append_eos:
        flat = F.concat(flat, F.array(F.lit(vocab.eos_id).cast("long")))
    return keyed.groupBy("doc_id").agg(flat.alias("target_ids"))


def _parse_batches(vocab: PointerVocab, mode: str, emit: str):
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ids in zip(pdf["doc_id"], pdf["target_ids"]):
                seq = [int(x) for x in ids]
                # eos terminates generation; everything after is padding
                if vocab.eos_id in seq:
                    seq = seq[: seq.index(vocab.eos_id)]
                decoded, errors, rest = parse_relation_sequence(
                    seq, vocab, mode=mode, exclusive_end=False
                )
                if emit == "relations":
                    for (hs, he, hl), (ts, te, tl), label in decoded:
                        rows.append(
                            (doc_id, hs, he, hl, ts, te, tl, label)
                        )
                else:
                    rows.append(
                        (
                            doc_id,
                            errors.get("correct", 0),
                            errors.get("len", 0),
                            errors.get("order", 0),
                            errors.get("label", 0),
                            errors.get("index", 0),
                            len(rest),
                        )
                    )
            cols = (
                [
                    "doc_id",
                    "head_start",
                    "head_end",
                    "head_label",
                    "tail_start",
                    "tail_end",
                    "tail_label",
                    "label",
                ]
                if emit == "relations"
                else [
                    "doc_id",
                    "n_correct",
                    "n_len",
                    "n_order",
                    "n_label",
                    "n_index",
                    "n_remaining",
                ]
            )
            yield pd.DataFrame(rows, columns=cols)

    return parse


def parse_pointer_targets(
    targets: DataFrame,
    vocab: PointerVocab,
    mode: str = "tail_head_label",
) -> DataFrame:
    """(doc_id, target_ids array<long>) -> one row per decoded relation.
    Malformed chunks are skipped (use `pointer_parse_errors` to audit)."""
    return targets.mapInPandas(
        _parse_batches(vocab, mode, "relations"), schema=PARSED_SCHEMA
    )


def pointer_parse_errors(
    targets: DataFrame,
    vocab: PointerVocab,
    mode: str = "tail_head_label",
) -> DataFrame:
    """Per-document decode-error counters (the reference's errors dict as
    columns) + the unconsumed-tail length for resumability audits."""
    return targets.mapInPandas(
        _parse_batches(vocab, mode, "errors"), schema=PARSE_ERRORS_SCHEMA
    )
