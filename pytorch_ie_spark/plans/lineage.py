"""Checkpoint-resume + per-partition lineage (BASELINE.json north_rule).

Every pipeline stage runs through ``run_stage``:

  - if the stage's snapshot already exists (``_SUCCESS``), it is *not*
    recomputed — the pipeline resumes from the materialized parquet,
  - otherwise the stage builds, writes an immutable snapshot, and appends
    one lineage row per output partition:
      (stage, partition_id, input_sha256_digest, row_count, triple_count,
       wall_time_s, ts)
    where the digest is an order-independent XOR fold of per-row sha256
    values (60-bit prefixes of the content_sha256 column, or of
    sha2(row, 256) when absent) — a true digest of the sha256 hashes,
    cheap at 100 TB (no sort, no collect).

Reference analog: the statistics mixin counters
(src/pytorch_ie/taskmodules/common/mixins.py:210-297) — promoted from
in-memory Counters to a durable, per-partition audit table.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_lineage(
    df: DataFrame, stage: str, wall_time_s: float, digest_col: str | None = "content_sha256"
) -> DataFrame:
    """One row per Spark partition of `df` with an order-independent digest
    of the partition's sha256 values (XOR of 60-bit sha256 prefixes — the
    column name says sha256, so the fold input really is sha256)."""
    if digest_col and digest_col in df.columns:
        sha = F.col(digest_col)
    else:
        sha = F.sha2(
            F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns]), 256
        )
    with_pid = df.select(
        F.spark_partition_id().alias("partition_id"),
        # first 15 hex chars = 60 bits: sign-safe in a LONG for bit_xor
        F.conv(F.substring(sha, 1, 15), 16, 10).cast("long").alias("_h"),
    )
    ts = datetime.now(timezone.utc).isoformat()
    return (
        with_pid.groupBy("partition_id")
        .agg(
            F.lpad(
                F.conv(F.bit_xor("_h").cast("string"), 10, 16), 15, "0"
            ).alias("input_sha256_digest"),
            F.count(F.lit(1)).alias("row_count"),
        )
        .select(
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int"),
            "input_sha256_digest",
            F.col("row_count").cast("long"),
            F.col("row_count").cast("long").alias("triple_count"),
            F.lit(float(wall_time_s)).alias("wall_time_s"),
            F.lit(ts).alias("ts"),
        )
    )


def stage_path(ckpt_dir: str, stage: str) -> str:
    return os.path.join(ckpt_dir, "stages", stage)


def stage_is_complete(ckpt_dir: str, stage: str) -> bool:
    return os.path.exists(os.path.join(stage_path(ckpt_dir, stage), "_SUCCESS"))


def run_stage(
    spark: SparkSession,
    ckpt_dir: str,
    stage: str,
    build: Callable[[], DataFrame],
    partition_cols: list[str] | None = None,
    force: bool = False,
) -> DataFrame:
    """Build-or-resume a stage snapshot with lineage."""
    path = stage_path(ckpt_dir, stage)
    if not force and stage_is_complete(ckpt_dir, stage):
        return spark.read.parquet(path)
    t0 = time.monotonic()
    df = build()
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
    wall = time.monotonic() - t0
    out = spark.read.parquet(path)
    lineage = partition_lineage(out, stage, wall)
    lineage.write.mode("append").parquet(os.path.join(ckpt_dir, "lineage"))
    return out


def read_lineage(spark: SparkSession, ckpt_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(ckpt_dir, "lineage"))


def resume_pending_partitions(
    input_df: DataFrame, completed: DataFrame, key_col: str
) -> DataFrame:
    """Partition-level resume: drop input rows whose work-unit key is already
    recorded as completed (anti-join — SURVEY.md §7 M5)."""
    return input_df.join(
        completed.select(F.col(key_col)).dropDuplicates([key_col]),
        key_col,
        "left_anti",
    )
