"""Incremental, idempotent KG ingest: only new (repo, path, commit) work
units are processed on each run.

This is the partition-level complement to the stage-level resume in
plans/lineage.py: at 10^12-file scale the corpus grows continuously, and a
failed or partial run must be re-submittable without reprocessing completed
units (north_rule checkpoint-resume). The completed-unit set is derived
from the triples already on disk plus an explicit `processed` marker table
(so documents that legitimately produce zero triples aren't reprocessed
forever).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_triples_fused, fused_triples
from ..sources.readers import documents_from_source_files


def _processed_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_processed_units")


def _triples_path(out_dir: str) -> str:
    return os.path.join(out_dir, "triples")


def pending_source_files(
    spark: SparkSession, source_files: DataFrame, out_dir: str
) -> DataFrame:
    """Anti-join the source against already-processed unit keys."""
    ppath = _processed_path(out_dir)
    if not os.path.exists(ppath):
        return source_files
    done = spark.read.parquet(ppath).select("unit_key")
    keyed = source_files.withColumn(
        "unit_key", F.concat_ws("@", F.concat_ws("/", "repo", "path"), "commit")
    )
    return keyed.join(done, "unit_key", "left_anti").drop("unit_key")


def ingest_increment(
    spark: SparkSession,
    source_files: DataFrame,
    out_dir: str,
    ner_model: str = "gazetteer_ner",
    re_model: str = "cooccurrence_re",
    max_distance: int = 40,
) -> dict:
    """Process only pending units; append triples + mark units processed.

    Returns {'processed_units': n, 'new_triples': n} — zeros when the run is
    a no-op replay (idempotency)."""
    pending = pending_source_files(spark, source_files, out_dir)
    n_units = pending.count()
    if n_units == 0:
        return {"processed_units": 0, "new_triples": 0}
    documents = documents_from_source_files(pending)
    triples = fused_triples(
        extract_triples_fused(
            documents,
            ner_model=ner_model,
            re_model=re_model,
            max_distance=max_distance,
        )
    )
    triples.write.mode("append").partitionBy("pred").parquet(_triples_path(out_dir))
    n_triples = spark.read.parquet(_triples_path(out_dir)).count()
    (
        pending.select(
            F.concat_ws(
                "@", F.concat_ws("/", "repo", "path"), "commit"
            ).alias("unit_key")
        )
        .dropDuplicates(["unit_key"])
        .write.mode("append")
        .parquet(_processed_path(out_dir))
    )
    return {"processed_units": n_units, "new_triples": n_triples}


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(_triples_path(out_dir))
