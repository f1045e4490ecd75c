"""Precision/Recall/F1 for labeled annotations, as DataFrame aggregations.

Semantics ported from the reference metric
(src/pytorch_ie/taskmodules/metrics/precision_recall_and_f1_for_labeled_annotations.py:53-148):
TP = |gold_set ∩ pred_set| by exact value equality; per-label and micro;
macro = unweighted mean over labels that appear in gold or pred.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pr_f1(
    gold: DataFrame,
    pred: DataFrame,
    key_cols: list[str],
    label_col: str = "label",
    include_macro: bool = True,
) -> DataFrame:
    """Per-label + MICRO + MACRO P/R/F1. `key_cols` defines annotation value
    identity (must include the label column for labeled-annotation counting).
    MACRO = unweighted mean of the per-label precision/recall/f1 over labels
    present in gold or pred, micro excluded (reference
    precision_recall_and_f1_for_labeled_annotations.py:110-148); its count
    columns are null — the reference macro entry carries only the three
    averaged scores."""
    g = gold.select(*key_cols).dropDuplicates(key_cols)
    p = pred.select(*key_cols).dropDuplicates(key_cols)
    tp = g.join(p, key_cols, "inner").groupBy(label_col).agg(
        F.count(F.lit(1)).alias("tp")
    )
    gc = g.groupBy(label_col).agg(F.count(F.lit(1)).alias("gold_count"))
    pc = p.groupBy(label_col).agg(F.count(F.lit(1)).alias("pred_count"))
    per_label = (
        gc.join(pc, label_col, "full_outer")
        .join(tp, label_col, "full_outer")
        .na.fill(0, ["tp", "gold_count", "pred_count"])
        .withColumn(
            "precision",
            F.when(F.col("pred_count") > 0, F.col("tp") / F.col("pred_count")).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "recall",
            F.when(F.col("gold_count") > 0, F.col("tp") / F.col("gold_count")).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
        # pin: referenced by the per-label output AND the micro AND the
        # macro aggregates — the gold⋈pred TP join would otherwise run
        # three times (measured: 36 exchanges in the final plan vs 14)
        .localCheckpoint(eager=False)
    )
    micro = (
        per_label.agg(
            F.sum("gold_count").alias("gold_count"),
            F.sum("pred_count").alias("pred_count"),
            F.sum("tp").alias("tp"),
        )
        .withColumn(label_col, F.lit("MICRO"))
        .withColumn("precision", F.when(F.col("pred_count") > 0, F.col("tp") / F.col("pred_count")).otherwise(F.lit(0.0)))
        .withColumn("recall", F.when(F.col("gold_count") > 0, F.col("tp") / F.col("gold_count")).otherwise(F.lit(0.0)))
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
    )
    out = per_label.unionByName(micro)
    if include_macro:
        macro = (
            per_label.agg(
                F.avg("precision").alias("precision"),
                F.avg("recall").alias("recall"),
                F.avg("f1").alias("f1"),
            )
            .withColumn(label_col, F.lit("MACRO"))
            .withColumn("gold_count", F.lit(None).cast("long"))
            .withColumn("pred_count", F.lit(None).cast("long"))
            .withColumn("tp", F.lit(None).cast("long"))
            # no labels at all -> avg over zero rows is NULL; the reference
            # omits the macro entry entirely in that case, so drop the row
            # in-plan instead of emitting an all-NULL score triple
            .where(F.col("precision").isNotNull())
        )
        out = out.unionByName(macro)
    return out


def micro_pr(gold: DataFrame, pred: DataFrame, key_cols: list[str]) -> tuple[float, float]:
    """Driver-side micro precision/recall pair (the BASELINE P/R gate).

    ONE aggregation job over a full-outer join: each joined row is
    gold-only, pred-only, or both (a TP), so (n_gold, n_pred, tp) come back
    in a single action instead of three jobs over the same inputs."""
    g = gold.select(*key_cols).dropDuplicates(key_cols).withColumn("_g", F.lit(1))
    p = pred.select(*key_cols).dropDuplicates(key_cols).withColumn("_p", F.lit(1))
    row = (
        g.join(p, key_cols, "full_outer")
        .agg(
            F.count("_g").alias("n_gold"),
            F.count("_p").alias("n_pred"),
            F.count(F.when(F.col("_g").isNotNull() & F.col("_p").isNotNull(), 1)).alias("tp"),
        )
        .collect()[0]
    )
    precision = row["tp"] / row["n_pred"] if row["n_pred"] else 0.0
    recall = row["tp"] / row["n_gold"] if row["n_gold"] else 0.0
    return precision, recall
