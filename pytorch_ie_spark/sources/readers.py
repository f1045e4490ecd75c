"""Sources and sinks.

Reference equivalents (SURVEY.md §2.1): HF-datasets / JSON fixture sources
become parquet/Iceberg-layout scans; the 'in-place prediction update' sink
becomes an immutable partitioned write (never mutate, always snapshot).

At cluster scale these readers target an Iceberg catalog; in the sandbox
they read the driver-generated parquet under /root/testdata. Column pruning
and predicate pushdown are preserved either way because everything stays a
declarative scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def source_files_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the synthetic documents table to the input_hint shape
    (repo, path, commit, lang, content). `source` plays the repo role so the
    20-source distribution exercises repo-keyed partitioning."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.md5(F.col("text")).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def documents_from_source_files(source_files: DataFrame) -> DataFrame:
    """Ingest stage: source rows -> documents with stable ids and the
    content-sha256 per-row invariant (BASELINE.json input_hint).

    doc_id = repo/path@commit, computed JVM-side (no UDF).
    """
    return source_files.select(
        F.concat_ws(
            "", F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"), F.col("commit")
        ).alias("doc_id"),
        F.col("content").alias("text"),
        F.col("lang"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Iceberg-layout sink: hive-partitioned parquet snapshot.

    On a real cluster this is `df.writeTo(table).partitionedBy(...)` against
    an Iceberg catalog; the sandbox has no Iceberg runtime, so the layout
    (partition dirs + immutable snapshot overwrite) is preserved on plain
    parquet.
    """
    (df.write.mode(mode).partitionBy(*partition_cols).parquet(path))
