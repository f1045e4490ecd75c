"""pytorch_ie_spark — a PySpark-native knowledge-graph construction engine.

Reimplements the semantics of pytorch-ie's document -> annotation-layer ->
taskmodule pipeline (reference: ArneBinder/pytorch-ie v0.33.0) as Spark
DataFrame stages:

    source files -> documents -> mentions (LabeledSpan) -> candidate pairs
    -> relations (BinaryRelation) -> entity linking / canonicalization
    -> (subj, pred, obj) triples, partitioned on disk, with per-partition
    lineage rows and checkpoint-resume.

Design stance (see SURVEY.md §7): semantics from pytorch-ie, execution 100%
Spark DataFrame + Arrow-vectorized pandas UDFs. No per-row Python in hot
paths; no RDDs; Catalyst plans everything relational.
"""

__version__ = "0.1.0"
