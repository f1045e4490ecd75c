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
    gold: DataFrame, pred: DataFrame, key_cols: list[str], label_col: str = "label"
) -> DataFrame:
    """Per-label + micro P/R/F1. `key_cols` defines annotation value identity
    (must include the label column for labeled-annotation counting)."""
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
    return per_label.unionByName(micro)


def micro_pr(gold: DataFrame, pred: DataFrame, key_cols: list[str]) -> tuple[float, float]:
    """Driver-side micro precision/recall pair (the BASELINE P/R gate)."""
    g = gold.select(*key_cols).dropDuplicates(key_cols)
    p = pred.select(*key_cols).dropDuplicates(key_cols)
    tp = g.join(p, key_cols, "inner").count()
    n_gold = g.count()
    n_pred = p.count()
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    return precision, recall
