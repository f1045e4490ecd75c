"""Bucketed co-located joins: same-bucket-count tables joined on the
bucket column must plan with ZERO shuffle exchanges."""

import pytest
from pyspark.sql import functions as F

from pytorch_ie_spark.plans.bucketing import (
    exchanges_in_plan,
    read_table,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force a shuffle-capable join so the exchange count is meaningful."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    stats = docs.select(
        "doc_id", F.length("text").alias("n")
    )
    write_bucketed(docs, "t_docs_bkt", "doc_id", num_buckets=8)
    write_bucketed(stats, "t_stats_bkt", "doc_id", num_buckets=8)
    try:
        a = read_table(spark, "t_docs_bkt")
        b = read_table(spark, "t_stats_bkt")
        joined = a.join(b, "doc_id")
        assert exchanges_in_plan(joined) == 0
        # the same join on plain (unbucketed) frames shuffles both sides
        plain = docs.join(stats, "doc_id")
        assert exchanges_in_plan(plain) >= 1
        # and the result is identical
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_bkt")
        spark.sql("DROP TABLE IF EXISTS t_stats_bkt")
