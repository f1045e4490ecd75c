"""Streaming KG extraction: continuously ingest source-file batches and
append triples.

The fused extractor (operators/extract.py) is a stateless mapInPandas
transform, so it lifts onto Structured Streaming unchanged: file source ->
extract -> append sink. Dedup across the stream is the sink's job (Iceberg
MERGE at scale; in tests, a memory sink checked against the batch result).

This is an engine extension — the reference is batch-only (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_triples_fused
from ..sources.readers import documents_from_source_files

SOURCE_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def stream_kg_triples(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "kg_triples_stream",
    ner_model: str = "gazetteer_ner",
    re_model: str = "cooccurrence_re",
    max_distance: int = 40,
    output_path: str | None = None,
    max_files_per_trigger: int = 4,
):
    """parquet file-stream of source rows -> triple rows, append mode.

    With `output_path` the sink is partitioned parquet (Iceberg-layout);
    otherwise an in-memory table named `query_name` (tests)."""
    stream_src = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    documents = documents_from_source_files(stream_src)
    triples = extract_triples_fused(
        documents,
        ner_model=ner_model,
        re_model=re_model,
        max_distance=max_distance,
    )
    writer = (
        triples.writeStream.outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if output_path:
        writer = writer.format("parquet").option("path", output_path).partitionBy(
            "pred"
        )
    else:
        writer = writer.format("memory")
    return writer.start()


def stream_kg_triples_committed(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    **extract_kwargs,
):
    """File-stream -> two-phase-committed triple snapshots.

    Composes the stream with plans/incremental.py: every micro-batch runs
    ingest_increment (stage data under a fresh run_id, THEN write the unit
    markers as the commit point). The unit-key anti-join inside
    ingest_increment makes the sink idempotent under exactly the failure
    Structured Streaming's at-least-once foreachBatch contract allows: a
    batch replayed after a crash-restart (or a lost streaming checkpoint)
    finds its units already marked and is a no-op — no duplicate triples
    become visible, matching the reference's resume-without-reprocessing
    semantics at the pipeline level (engine extension, SURVEY.md §2.9).
    """
    from ..plans.incremental import ingest_increment

    stream_src = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )

    def commit_batch(batch_df: DataFrame, _batch_id: int) -> None:
        ingest_increment(
            batch_df.sparkSession, batch_df, out_dir, **extract_kwargs
        )

    writer = stream_src.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_kg_triples(spark: SparkSession, source_dir: str, **kwargs) -> DataFrame:
    """The same transformation in batch — used to verify stream==batch."""
    src = spark.read.schema(SOURCE_SCHEMA).parquet(source_dir)
    documents = documents_from_source_files(src)
    return extract_triples_fused(documents, **kwargs)


def stream_doc_labels(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "doc_labels_stream",
    model_name: str = "doc_mock_classifier",
    model_config: dict | None = None,
    output_path: str | None = None,
    max_files_per_trigger: int = 4,
):
    """File-stream of source rows -> document-classification Label rows.

    The doc-classification taskmodule (operators/doc_classify.py) is a
    stateless mapInPandas stage, so — like the fused extractor — it lifts
    onto Structured Streaming unchanged: the same encode -> predict ->
    unbatch code path serves batch backfills and the continuous ingest
    feed. Sink: label-partitioned parquet with `output_path`, else an
    in-memory table named `query_name` (tests)."""
    from ..operators.doc_classify import classify_documents

    stream_src = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    documents = documents_from_source_files(stream_src)
    labels = classify_documents(
        documents, model_name=model_name, model_config=model_config or {}
    )
    writer = (
        labels.writeStream.outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if output_path:
        writer = writer.format("parquet").option("path", output_path).partitionBy(
            "label"
        )
    else:
        writer = writer.format("memory")
    return writer.start()


def stream_dedup_documents(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "dedup_stream",
    ts_col: str | None = None,
    horizon: str = "10 minutes",
    output_path: str | None = None,
    max_files_per_trigger: int = 4,
):
    """Exact content dedup ACROSS a stream: only the first arrival of each
    normalized-content key is emitted; later duplicates — in the same or
    any later micro-batch — are suppressed by the engine's state store.

    Spark-first on purpose: this is the built-in streaming
    `dropDuplicates` (state-store keyed by content_key), not a hand-rolled
    applyInPandasWithState — the engine already owns exactly this
    operator. Without `ts_col` the key state is unbounded (fine for
    bounded backfills); at corpus scale pass the ingest-time column and a
    `horizon` so `dropDuplicatesWithinWatermark` bounds state to the
    dedup window, which is how a continuous 100 TB ingest keeps the state
    store finite."""
    from ..operators.dedup import normalize_text

    stream_src = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    documents = documents_from_source_files(stream_src)
    keyed = documents.withColumn(
        "content_key", F.md5(normalize_text(F.col("text")))
    )
    if ts_col is not None:
        deduped = keyed.withWatermark(
            ts_col, horizon
        ).dropDuplicatesWithinWatermark(["content_key"])
    else:
        deduped = keyed.dropDuplicates(["content_key"])
    writer = (
        deduped.writeStream.outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if output_path:
        writer = writer.format("parquet").option("path", output_path)
    else:
        writer = writer.format("memory")
    return writer.start()


def stream_doc_labels_committed(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    model_name: str = "doc_mock_classifier",
):
    """File-stream -> two-phase-committed doc-label snapshots.

    The same composition as stream_kg_triples_committed, through the now
    dataset-generic ingest_increment: each micro-batch stages Label rows
    under a fresh run_id (label-partitioned), then commits by writing the
    unit markers — replayed batches after a crash-restart or a LOST
    streaming checkpoint are committed no-ops. Read back with
    plans/incremental.read_committed_rows(out_dir, 'doc_labels', 'label').
    """
    from ..operators.doc_classify import classify_documents
    from ..plans.incremental import ingest_increment

    stream_src = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )

    def commit_batch(batch_df: DataFrame, _batch_id: int) -> None:
        ingest_increment(
            batch_df.sparkSession,
            batch_df,
            out_dir,
            build_rows=lambda pending: classify_documents(
                documents_from_source_files(pending), model_name=model_name
            ),
            data_name="doc_labels",
            data_partition_col="label",
        )

    writer = stream_src.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_doc_labels(spark: SparkSession, source_dir: str, **kwargs) -> DataFrame:
    """The same classification in batch — used to verify stream==batch."""
    from ..operators.doc_classify import classify_documents

    src = spark.read.schema(SOURCE_SCHEMA).parquet(source_dir)
    documents = documents_from_source_files(src)
    return classify_documents(documents, **kwargs)
