"""Document-level text classification: documents -> one Label(label, score).

Spark realization of the reference's simplest taskmodule family
(src/pytorch_ie/taskmodules/simple_transformer_text_classification.py):

    encode_input  (:113-133)  tokenize the document text, truncate to
                              max_length — here whitespace tokens re-joined,
                              the single-space corpus analog of HF truncation
    collate       (:149-176)  batch the encodings — the Arrow batch IS the
                              collated batch (dynamic padding is moot for a
                              pooled classifier)
    model forward             logits per class (models.py doc_mock_classifier;
                              a real HF sequence-classification head plugs in
                              at the same resolve_model seam)
    unbatch_output (:177-205) softmax over logits, argmax class, probability
                              of the argmax — first index wins ties
    create_annotations_from_output (:207-216) one Label row per document

_prepare (:87-105) is `prepare_label_to_id` below: collect labels from
gold-labeled documents, sort, ids from 1, id 0 reserved for "O".

Scale shape: one mapInPandas over the (parallelism-ensured) document scan —
no shuffle at all; the stage is embarrassingly parallel at 100 TB. The
softmax arithmetic is fixed-order (left-fold sum of exp(l - max)) so the
DuckDB oracle reproduces it bit-for-bit before rounding.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .models import resolve_model

#: default label vocabulary of the mock classifier (sorted, reference
#: _prepare sorts labels before assigning ids)
DOC_LABELS = ["business", "science", "sports", "tech"]

DOC_LABEL_SCHEMA = (
    "doc_id string, label string, score double, n_tokens long"
)


def softmax_argmax(logits: list[float]) -> tuple[int, float]:
    """unbatch_output arithmetic, fixed evaluation order for the oracle:
    m = max, exps = exp(l - m) in label order, z = left-fold sum,
    best = FIRST index of the max logit, probability = exps[best] / z
    (exp(0) == 1.0 exactly, so probability == 1.0 / z)."""
    import math

    m = max(logits)
    exps = [math.exp(x - m) for x in logits]
    z = sum(exps)
    best = logits.index(m)
    return best, exps[best] / z


def classify_documents(
    documents: DataFrame,
    model_name: str = "doc_mock_classifier",
    model_config: dict | None = None,
    max_length: int = 64,
) -> DataFrame:
    """encode -> model.predict -> unbatch, one Label row per document.

    Input: (doc_id string, text string). Output: DOC_LABEL_SCHEMA with
    n_tokens = the PRE-truncation whitespace token count (the reference
    keeps the document untouched; truncation only affects the encoding).
    """

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = resolve_model(model_name, model_config)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids, enc_texts, n_toks = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = (text or "").split(" ")
                doc_ids.append(doc_id)
                n_toks.append(len(toks))
                # encode_input: truncation=True, max_length (reference :124-129)
                enc_texts.append(" ".join(toks[:max_length]))
            logits_batch = model.predict_logits(enc_texts)
            rows = []
            for doc_id, n, logits in zip(doc_ids, n_toks, logits_batch):
                best, prob = softmax_argmax(list(logits))
                rows.append((doc_id, model.labels[best], prob, n))
            yield pd.DataFrame(
                rows, columns=["doc_id", "label", "score", "n_tokens"]
            )

    return documents.select("doc_id", "text").mapInPandas(
        stage, schema=DOC_LABEL_SCHEMA
    )


# _prepare analog: re-exported from the module that owns the label-id
# convention (operators/partitions.py, next to prepare_label_vocabulary)
from .partitions import prepare_label_to_id  # noqa: E402, F401
