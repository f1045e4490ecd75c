"""Bucketed table layout for co-located joins.

At 100 TB the doc-keyed joins (documents x mentions x relations, repeated
by every downstream consumer) dominate shuffle volume. Writing both sides
bucketed + sorted by the join key once lets EVERY later join read
bucket-aligned files and skip the exchange entirely — the classic
pay-the-shuffle-once layout. Spark's bucketing needs a table catalog
(saveAsTable), not bare parquet paths; locally this is the default
in-memory catalog + spark-warehouse dir, on a cluster the metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist `df` bucketed AND sorted by `bucket_col` so equi-joins on
    that column between same-bucket-count tables plan with no Exchange
    (and no Sort, thanks to sortBy)."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def exchanges_in_plan(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan — the
    quantity bucketing exists to eliminate."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
