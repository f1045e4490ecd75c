"""Guided text-to-text taskmodule (generative-QA pattern) as DataFrame
stages.

Reference analog: taskmodules/text_to_text.py with `guidance_layer` set
(exercised by tests/taskmodules/test_text2text_with_guidance.py):

  - encode_input (:311-341): one task encoding per guidance annotation of
    the document (1→N fan-out over the guidance layer, e.g. questions);
    the guidance annotation's text is passed as the tokenizer's
    `source_text`, i.e. prepended to the document text in the encoder
    input,
  - encode_annotations (:216-241): the target annotation is the FIRST one
    whose `guidance_annotation_field` equals this encoding's guidance
    annotation (more than one match -> warn, first wins; zero matches ->
    ValueError),
  - decode_annotations (:262-283): the generated text becomes a new target
    annotation with the guidance annotation attached via
    `guidance_annotation_field`.

Spark-first re-expression: the fan-out is a join of the guidance layer
against the documents, target selection is a min-struct aggregate (never a
window over the full target layer), and the zero-match ValueError is an
observable `has_target=false` row so dropped encodings are auditable
instead of killing the job. The generator itself is a seam — here a
deterministic lead-k echo of the target (mirroring q_text2text's mock),
with a real seq2seq model slotting into the same column via mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INPUT_LEAD_TOKENS = 8


def guided_text2text(
    documents: DataFrame,
    guidance: DataFrame,
    targets: DataFrame,
    guidance_col: str = "guidance_text",
    target_col: str = "target_text",
    order_col: str = "target_idx",
    gen_lead_k: int = 4,
) -> DataFrame:
    """Encode + mock-generate + decode for the guided text-to-text task.

    documents: (doc_id, text); guidance: (doc_id, <guidance_col>);
    targets: (doc_id, <guidance_col>, <order_col>, <target_col>) — the
    target layer, each annotation carrying its guidance annotation in
    `guidance_col` (the reference's guidance_annotation_field).

    Returns one row per (document, guidance annotation) — the reference's
    task-encoding fan-out:
      doc_id, <guidance_col>, input_lead (first INPUT_LEAD_TOKENS tokens of
      the guidance-prepended encoder input), n_src_tokens, n_targets,
      has_target, target_text (first matching target by `order_col`, ties
      broken by text), gen_text (lead-`gen_lead_k` mock generation),
      attached_guidance (the guidance annotation attached to the decoded
      annotation — null when the encoding had no target, i.e. the
      reference's ValueError path, kept observable).
    """
    docs = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("text")
    )
    g = guidance.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(guidance_col).alias("guidance_text"),
    )
    # encode_input: guidance text prepended to the document text
    input_text = F.concat_ws(" ", F.col("guidance_text"), F.col("text"))
    enc = g.join(docs, "doc_id").select(
        "doc_id",
        "guidance_text",
        F.concat_ws(
            " ", F.slice(F.split(input_text, " "), 1, INPUT_LEAD_TOKENS)
        ).alias("input_lead"),
        F.size(F.split(input_text, " ")).cast("long").alias("n_src_tokens"),
    )
    # encode_annotations: first target whose guidance field matches; the
    # min-struct aggregate shuffles one row per (doc, guidance) key
    tsel = (
        targets.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(guidance_col).alias("guidance_text"),
            F.col(order_col).cast("long").alias("_idx"),
            F.col(target_col).alias("_text"),
        )
        .groupBy("doc_id", "guidance_text")
        .agg(
            F.count(F.lit(1)).alias("n_targets"),
            F.min(F.struct("_idx", "_text")).alias("_first"),
        )
        .select(
            "doc_id",
            "guidance_text",
            "n_targets",
            F.col("_first._text").alias("target_text"),
        )
    )
    out = enc.join(tsel, ["doc_id", "guidance_text"], "left")
    gen_text = F.concat_ws(
        " ", F.slice(F.split(F.col("target_text"), " "), 1, gen_lead_k)
    )
    has_target = F.col("n_targets").isNotNull()
    return out.select(
        "doc_id",
        "guidance_text",
        "input_lead",
        "n_src_tokens",
        F.coalesce(F.col("n_targets"), F.lit(0)).cast("long").alias(
            "n_targets"
        ),
        has_target.alias("has_target"),
        "target_text",
        # decode_annotations: generated text + guidance attached via the
        # guidance_annotation_field (null on the no-target path)
        F.when(has_target, gen_text).alias("gen_text"),
        F.when(has_target, F.col("guidance_text")).alias(
            "attached_guidance"
        ),
    )
