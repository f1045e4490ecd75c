"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — the full KG-construction pipeline
  (mention detection -> candidate pairs -> relation classification ->
  triples) over the sf0.001 documents corpus.
- ``queries()``: one callable per implemented operator (SURVEY.md §2 +
  training-data-pipeline extensions), delegating to
  ``pytorch_ie_spark.queries``.
- ``oracle_sql()``: the equivalent DuckDB SQL for each query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pytorch_ie_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triples over /root/testdata/sf0.001 documents."""
    from pytorch_ie_spark.pipeline import KgPipelineConfig, run_kg_pipeline
    from pytorch_ie_spark.sources.readers import source_files_from_documents

    src = source_files_from_documents(spark, "/root/testdata/sf0.001")
    cfg = KgPipelineConfig(
        ner_model="gazetteer_ner",
        re_model="cooccurrence_re",
        max_candidate_distance=40,
        canonicalize=True,
    )
    return run_kg_pipeline(spark, src, cfg)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle for name, (_fn, oracle) in QUERIES.items() if oracle is not None
    }
