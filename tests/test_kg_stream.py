"""Streaming KG extraction == batch KG extraction on the same files."""

from pytorch_ie_spark.sources.readers import source_files_from_documents
from pytorch_ie_spark.streaming.kg_stream import batch_kg_triples, stream_kg_triples


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
