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


ANNOTATED_JSON_SCHEMA = (
    "data array<struct<"
    "id:string, text:string, "
    "sentences:array<struct<start:int,`end`:int>>, "
    "entities:array<struct<start:int,`end`:int,label:string>>, "
    "relations:array<struct<head:int,tail:int,label:string>>, "
    "metadata:map<string,string>>>"
)


def read_annotated_json_corpus(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """JSON document source in the reference fixture format
    ({"data": [{id, text, sentences, entities, relations, metadata}]},
    tests/conftest.py:22-55) -> (documents, mentions, relations) DataFrames.

    relations.head/tail are indices into the entities array
    (tests/conftest.py:31-33); they are resolved to stable mention ids with
    posexplode + join-free index lookup (element_at on the exploded layer).
    """
    raw = (
        spark.read.option("multiLine", "true")
        .schema(ANNOTATED_JSON_SCHEMA)
        .json(path)
        .select(F.explode("data").alias("d"))
        .select("d.*")
    )
    return _annotated_corpus_frames(raw)


#: one fixture-format document object (the element type of
#: ANNOTATED_JSON_SCHEMA's `data` array)
ANNOTATED_JSON_DOC_SCHEMA = (
    "struct<"
    "id:string, text:string, "
    "sentences:array<struct<start:int,`end`:int>>, "
    "entities:array<struct<start:int,`end`:int,label:string>>, "
    "relations:array<struct<head:int,tail:int,label:string>>, "
    "metadata:map<string,string>>"
)


def annotated_json_from_strings(
    df: DataFrame, json_col: str = "json"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Same parse core as read_annotated_json_corpus over in-plan JSON
    strings (one fixture-format document object per row) — from_json with
    the identical schema, entity index resolution included. Lets the parse
    path be exercised (and oracle-gated) without a disk round trip."""
    raw = df.select(
        F.from_json(F.col(json_col), ANNOTATED_JSON_DOC_SCHEMA).alias("d")
    ).select("d.*")
    return _annotated_corpus_frames(raw)


def _annotated_corpus_frames(
    raw: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(documents, mentions, relations) from the parsed fixture-format rows
    (columns id/text/sentences/entities/relations/metadata)."""
    documents = raw.select(
        F.col("id").alias("doc_id"),
        "text",
        F.lit("en").alias("lang"),
        F.sha2("text", 256).alias("content_sha256"),
        F.col("sentences").cast("array<struct<start:int,end:int>>").alias("sentences"),
    )
    # mention_id = sha256(doc|start|end|label)[:32] (functions/hashing.py)
    mid = lambda s, e, lab: F.substring(  # noqa: E731
        F.sha2(
            F.concat_ws(
                "|", F.col("doc_id"), s.cast("string"), e.cast("string"), lab
            ),
            256,
        ),
        1,
        32,
    )
    ents = raw.select(
        F.col("id").alias("doc_id"),
        "text",
        F.sha2("text", 256).alias("content_sha256"),
        F.posexplode("entities").alias("ent_idx", "ent"),
    )
    mentions = ents.select(
        "doc_id",
        mid(F.col("ent.start"), F.col("ent.end"), F.col("ent.label")).alias(
            "mention_id"
        ),
        F.col("ent.start").alias("start"),
        F.col("ent.end").alias("end"),
        F.col("ent.label").alias("label"),
        F.expr("substring(text, ent.start + 1, ent.end - ent.start)").alias(
            "surface"
        ),
        F.lit(1.0).alias("score"),
        F.lit("gold").alias("source"),
        "content_sha256",
    )
    rels = raw.select(
        F.col("id").alias("doc_id"),
        F.sha2("text", 256).alias("content_sha256"),
        F.col("entities"),
        F.explode("relations").alias("rel"),
    )
    rel_arg = lambda idx_col: F.element_at(  # noqa: E731
        F.col("entities"), idx_col + 1
    )
    relations = rels.select(
        "doc_id",
        mid(
            rel_arg(F.col("rel.head"))["start"],
            rel_arg(F.col("rel.head"))["end"],
            rel_arg(F.col("rel.head"))["label"],
        ).alias("head_mention_id"),
        mid(
            rel_arg(F.col("rel.tail"))["start"],
            rel_arg(F.col("rel.tail"))["end"],
            rel_arg(F.col("rel.tail"))["label"],
        ).alias("tail_mention_id"),
        F.col("rel.label").alias("label"),
        F.lit(1.0).alias("score"),
        F.lit("gold").alias("source"),
        "content_sha256",
    )
    return documents, mentions, relations


def as_type(df: DataFrame, field_mapping: dict[str, str]) -> DataFrame:
    """Document-type conversion: rename/select layers into canonical names
    (reference document.as_type(field_mapping=...),
    labeled_span_extraction_by_token_classification.py:180-206). Columns not
    mentioned pass through unchanged."""
    out = df
    for src, dst in field_mapping.items():
        out = out.withColumnRenamed(src, dst)
    return out


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
