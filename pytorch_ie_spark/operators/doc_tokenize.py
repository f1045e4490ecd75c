"""Document-level tokenize round-trip: text documents + char-span
annotations -> token-based windows + token-space annotations -> back to
char spans, with strict missed-annotation accounting.

Mirrors the reference's hardest conversion contract
(src/pytorch_ie/utils/document.py:150-267 tokenize_document +
token_based_document_to_text_based, exercised by
tests/utils/test_document_tokenize.py:243-652):

  - the tokenizer runs ONCE (the encode_documents mapInPandas stage);
    everything downstream is whole-stage-codegen array arithmetic over the
    per-window offset arrays — no second UDF pass,
  - a char span converts inside a window via INWARD alignment
    (get_aligned_token_span, document.py:278-299): the converted token
    slice covers the first..last window tokens overlapping [start, end);
    spans reaching past the window clip to it (exactly what the
    reference's per-encoding char_to_token produces),
  - an annotation is MISSED when NO window has an overlapping token (the
    set strict_span_conversion raises over, document.py:236-267); missed
    rows survive with null window/token coordinates instead of vanishing,
  - the round trip back (token_span_to_char_span) recovers
    (token_starts[first], token_ends[last]); the `exact` flag marks
    annotations the round trip preserves bit-for-bit — the reference's
    span-exact round-trip assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def annotations_to_token_space(
    encodings: DataFrame, annotations: DataFrame
) -> DataFrame:
    """Convert char-span annotations into every token window they overlap.

    encodings: encode_documents output — (doc_id, window_idx, token_starts,
    token_ends, ...) with ABSOLUTE char offsets per window token.
    annotations: (doc_id, start, end, ...) char spans, end-exclusive.

    Returns one row per (annotation, overlapping window) with
    window-relative `tok_start`/`tok_end` (end-exclusive), the
    round-tripped `rt_start`/`rt_end` char span, and `exact`; annotations
    overlapping NO window come back once with null coordinates and
    `missed` = true (LEFT join keeps them).

    Alignment closed form over the sorted window offset arrays:
      first_rel = #window tokens entirely before the span  (te <= start)
      last_rel  = #window tokens starting before span end  (ts < end) - 1
      overlap exists iff first_rel <= last_rel
    which is char_span_to_token_span (functions/tokenize.py:57) as a pair
    of array-filter counts — the same inward-search semantics with no UDF.
    """
    enc = encodings.select(
        F.col("doc_id").alias("_doc_id"),
        "window_idx",
        "token_starts",
        "token_ends",
    )

    def first_rel():
        return F.size(
            F.filter("token_ends", lambda e: e <= F.col("start"))
        ).cast("long")

    def last_rel():
        return (
            F.size(F.filter("token_starts", lambda s: s < F.col("end"))) - 1
        ).cast("long")

    fits = first_rel() <= last_rel()
    joined = annotations.join(
        enc, (F.col("doc_id") == F.col("_doc_id")) & fits, "left"
    )
    converted = F.col("window_idx").isNotNull()
    tok_start = first_rel()
    tok_end = last_rel() + 1
    rt_start = F.element_at("token_starts", (tok_start + 1).cast("int"))
    rt_end = F.element_at("token_ends", tok_end.cast("int"))
    return joined.select(
        *annotations.columns,
        F.col("window_idx"),
        F.when(converted, tok_start).alias("tok_start"),
        F.when(converted, tok_end).alias("tok_end"),
        F.when(converted, rt_start.cast("long")).alias("rt_start"),
        F.when(converted, rt_end.cast("long")).alias("rt_end"),
        F.coalesce(
            (rt_start == F.col("start")) & (rt_end == F.col("end")),
            F.lit(False),
        ).alias("exact"),
        (~converted).alias("missed"),
    )


def text_documents_to_token_documents(
    documents: DataFrame, max_window: int = 128, window_overlap: int = 16
) -> DataFrame:
    """Document-level as_type conversion, text -> token world (reference
    text_based_document_to_token_based inside tokenize_document,
    utils/document.py:150-232): one row per token window with the token
    array and its absolute char offset arrays. Compose with
    sources.readers.as_type for field renames; compose with
    annotations_to_token_space to carry annotation layers across."""
    from .mentions import encode_documents

    return encode_documents(documents, max_window, window_overlap).select(
        "doc_id",
        "window_idx",
        "tokens",
        "token_starts",
        "token_ends",
        "n_tokens",
        "content_sha256",
    )


def token_documents_to_text_documents(token_docs: DataFrame) -> DataFrame:
    """Inverse conversion, token -> text world (reference
    token_based_document_to_text_based, utils/document.py:302-363): the
    text is reconstructed from the token/offset arrays by placing each
    token at its recorded char offset (gaps become spaces), so for
    documents whose tokens carry faithful offsets the reconstruction IS
    the original window text. Pure JVM fold — no UDF."""
    piece = F.aggregate(
        F.zip_with(
            "tokens",
            F.zip_with(
                "token_starts", "token_ends", lambda s, e: F.struct(
                    s.alias("s"), e.alias("e")
                )
            ),
            lambda t, se: F.struct(
                t.alias("tok"), se["s"].alias("s"), se["e"].alias("e")
            ),
        ),
        F.struct(
            F.lit("").alias("acc"),
            F.element_at("token_starts", 1).alias("pos"),
        ),
        lambda acc, x: F.struct(
            F.concat(
                acc["acc"], F.repeat(F.lit(" "), x["s"] - acc["pos"]), x["tok"]
            ).alias("acc"),
            x["e"].alias("pos"),
        ),
        lambda acc: acc["acc"],
    )
    return token_docs.select(
        "doc_id",
        "window_idx",
        F.element_at("token_starts", 1).alias("char_offset"),
        piece.alias("text"),
        "content_sha256",
    )


def tokenize_documents_roundtrip(
    documents: DataFrame,
    annotations: DataFrame,
    max_window: int = 128,
    window_overlap: int = 16,
) -> DataFrame:
    """End-to-end tokenize_document analog: window-tokenize `documents`
    (doc_id, text, content_sha256), then convert `annotations` (doc_id,
    start, end, ...) into token space per window and round-trip them back
    (see annotations_to_token_space for the output contract)."""
    from ..plans.skew import ensure_parallelism
    from .mentions import encode_documents

    # spread the tokenizer UDF across cores when the doc scan planned as a
    # single task (local small-file trap; no-op on a real cluster)
    enc = encode_documents(
        ensure_parallelism(documents), max_window, window_overlap
    )
    return annotations_to_token_space(enc, annotations)
