"""Incremental ingest: idempotent replay + only-new-units processing."""

from pyspark.sql import functions as F

from pytorch_ie_spark.plans.incremental import ingest_increment, read_triples
from pytorch_ie_spark.sources.readers import source_files_from_documents


def test_incremental_ingest_idempotent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "kg")
    src = source_files_from_documents(spark, sf_dir)
    first_half = src.where(F.crc32("path") % 2 == 0)

    r1 = ingest_increment(spark, first_half, out)
    assert r1["processed_units"] > 0
    t1 = read_triples(spark, out).count()

    # replaying the same input is a no-op
    r2 = ingest_increment(spark, first_half, out)
    assert r2 == {"processed_units": 0, "new_triples": 0}
    assert read_triples(spark, out).count() == t1

    # the full corpus only processes the other half
    r3 = ingest_increment(spark, src, out)
    assert 0 < r3["processed_units"] < src.count()
    assert r3["processed_units"] + r1["processed_units"] == src.count()
    t3 = read_triples(spark, out).count()
    assert t3 > t1
