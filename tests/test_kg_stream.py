"""Streaming KG extraction == batch KG extraction on the same files."""

from pytorch_ie_spark.sources.readers import source_files_from_documents
from pytorch_ie_spark.streaming.kg_stream import (
    batch_kg_triples,
    stream_kg_triples,
    stream_kg_triples_committed,
)


def test_stream_triples_match_batch(spark, sf_dir, tmp_path):
    src_dir = tmp_path / "src_files"
    source_files_from_documents(spark, sf_dir).repartition(4).write.parquet(
        str(src_dir)
    )
    q = stream_kg_triples(
        spark,
        str(src_dir),
        str(tmp_path / "ckpt"),
        query_name="t_kg_stream",
        max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
        stream_rows = sorted(
            map(
                tuple,
                spark.sql(
                    "SELECT doc_id, subj, pred, obj FROM t_kg_stream"
                ).collect(),
            )
        )
    finally:
        q.stop()
    batch_rows = sorted(
        map(
            tuple,
            batch_kg_triples(spark, str(src_dir))
            .select("doc_id", "subj", "pred", "obj")
            .collect(),
        )
    )
    assert len(stream_rows) > 0
    assert stream_rows == batch_rows


def test_stream_committed_end_to_end_crash_restart(spark, sf_dir, tmp_path):
    """File source -> fused extract -> two-phase-committed snapshot ->
    compaction, with crash-restart idempotence: replaying the whole stream
    after LOSING the streaming checkpoint adds no duplicate triples,
    because the per-batch unit-marker anti-join already committed every
    unit."""
    from pytorch_ie_spark.plans.incremental import (
        compact_triples,
        orphan_run_ids,
        read_triples,
    )

    src_dir = tmp_path / "src_files"
    all_src = source_files_from_documents(spark, sf_dir)
    first = all_src.limit(30)
    rest = all_src.join(first.select("path"), "path", "left_anti")
    first.repartition(3).write.parquet(str(src_dir))

    out_dir = str(tmp_path / "ingest")

    def run_stream(ckpt: str) -> None:
        q = stream_kg_triples_committed(
            spark, str(src_dir), ckpt, out_dir, max_files_per_trigger=2
        )
        q.awaitTermination(120)
        assert not q.isActive  # availableNow drained and stopped

    run_stream(str(tmp_path / "ckpt1"))
    baseline = sorted(
        map(tuple, read_triples(spark, out_dir).select(
            "doc_id", "subj", "pred", "obj").collect())
    )
    assert len(baseline) > 0
    from pytorch_ie_spark.operators.extract import fused_triples

    expected = sorted(
        map(tuple, fused_triples(batch_kg_triples(spark, str(src_dir))).select(
            "doc_id", "subj", "pred", "obj").collect())
    )
    assert baseline == expected

    # crash-restart with a LOST streaming checkpoint: full source replay,
    # every batch a committed no-op -> byte-identical committed view
    run_stream(str(tmp_path / "ckpt2"))
    replay = sorted(
        map(tuple, read_triples(spark, out_dir).select(
            "doc_id", "subj", "pred", "obj").collect())
    )
    assert replay == baseline
    assert orphan_run_ids(spark, out_dir) == []

    # growth: new files arrive, the SAME checkpoint picks up only them
    rest.repartition(3).write.mode("append").parquet(str(src_dir))
    run_stream(str(tmp_path / "ckpt2"))
    grown = read_triples(spark, out_dir)
    full_expected = sorted(
        map(tuple, fused_triples(batch_kg_triples(spark, str(src_dir))).select(
            "doc_id", "subj", "pred", "obj").collect())
    )
    assert sorted(
        map(tuple, grown.select("doc_id", "subj", "pred", "obj").collect())
    ) == full_expected

    # read-optimized compaction: same rows, bounded file count
    stats = compact_triples(spark, out_dir, str(tmp_path / "compact"))
    assert stats["rows"] == len(full_expected)
    n_preds = grown.select("pred").distinct().count()
    assert stats["files_after"] <= n_preds
    assert stats["files_after"] < stats["files_before"]


def test_stream_doc_labels_match_batch(spark, sf_dir, tmp_path):
    """The doc-classification taskmodule lifts onto Structured Streaming
    unchanged: streamed Label rows == batch Label rows on the same files."""
    from pytorch_ie_spark.streaming.kg_stream import (
        batch_doc_labels,
        stream_doc_labels,
    )

    src_dir = tmp_path / "src_files"
    source_files_from_documents(spark, sf_dir).repartition(4).write.parquet(
        str(src_dir)
    )
    q = stream_doc_labels(
        spark,
        str(src_dir),
        str(tmp_path / "ckpt_labels"),
        query_name="t_doc_label_stream",
        max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
        stream_rows = sorted(
            map(
                tuple,
                spark.sql(
                    "SELECT doc_id, label, score FROM t_doc_label_stream"
                ).collect(),
            )
        )
    finally:
        q.stop()
    batch_rows = sorted(
        map(
            tuple,
            batch_doc_labels(spark, str(src_dir))
            .select("doc_id", "label", "score")
            .collect(),
        )
    )
    assert len(stream_rows) > 0
    assert stream_rows == batch_rows


def test_stream_doc_labels_committed_replay_noop(spark, sf_dir, tmp_path):
    """Generic two-phase commit under streaming: doc-label snapshots become
    visible only when committed, and replaying the whole stream after
    LOSING the streaming checkpoint is a committed no-op."""
    import shutil

    from pytorch_ie_spark.plans.incremental import read_committed_rows
    from pytorch_ie_spark.streaming.kg_stream import (
        batch_doc_labels,
        stream_doc_labels_committed,
    )

    src_dir = tmp_path / "src_files"
    source_files_from_documents(spark, sf_dir).repartition(4).write.parquet(
        str(src_dir)
    )
    out_dir = str(tmp_path / "labels_out")
    ckpt = str(tmp_path / "labels_ckpt")
    q = stream_doc_labels_committed(spark, str(src_dir), ckpt, out_dir)
    q.awaitTermination()
    committed = read_committed_rows(
        spark, out_dir, "doc_labels", "label"
    )
    expected = batch_doc_labels(spark, str(src_dir))
    n1 = committed.count()
    assert n1 == expected.count() > 0
    assert sorted(
        map(tuple, committed.select("doc_id", "label").collect())
    ) == sorted(map(tuple, expected.select("doc_id", "label").collect()))
    # lose the STREAMING checkpoint entirely; the unit markers alone must
    # make the full replay a no-op
    shutil.rmtree(ckpt)
    q2 = stream_doc_labels_committed(spark, str(src_dir), ckpt, out_dir)
    q2.awaitTermination()
    assert read_committed_rows(
        spark, out_dir, "doc_labels", "label"
    ).count() == n1


def test_stream_dedup_suppresses_cross_batch_duplicates(spark, sf_dir, tmp_path):
    """Engine-native streaming dedup: duplicated content arriving in LATER
    micro-batches is suppressed by the state store — output has exactly one
    row per distinct normalized content."""
    from pyspark.sql import functions as F

    from pytorch_ie_spark.streaming.kg_stream import stream_dedup_documents

    src = source_files_from_documents(spark, sf_dir)
    # duplicate every unit under a different path so unit keys differ but
    # content collides; write as separate files so duplicates land in
    # separate micro-batches (maxFilesPerTrigger=1)
    dup = src.withColumn("path", F.concat(F.col("path"), F.lit("-copy")))
    src_dir = tmp_path / "src_dup"
    src.coalesce(1).write.mode("append").parquet(str(src_dir))
    dup.coalesce(1).write.mode("append").parquet(str(src_dir))
    q = stream_dedup_documents(
        spark,
        str(src_dir),
        str(tmp_path / "dedup_ckpt"),
        query_name="t_dedup_stream",
        max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
        out = spark.sql(
            "SELECT content_key, count(*) AS c FROM t_dedup_stream "
            "GROUP BY content_key HAVING count(*) > 1"
        ).collect()
        n_out = spark.sql("SELECT count(*) AS n FROM t_dedup_stream").first()["n"]
    finally:
        q.stop()
    assert out == []  # no key emitted twice, even across micro-batches
    n_distinct = (
        src.unionByName(dup)
        .selectExpr(
            "md5(trim(regexp_replace(lower(content), '\\\\s+', ' '))) AS k"
        )
        .distinct()
        .count()
    )
    assert n_out == n_distinct > 0
