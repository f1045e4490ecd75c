"""Driver-contract smoke + oracle parity at sf0.001 (the full sf0.01 parity
run lives in tests/oracle_check.py and the driver's own harness)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from pytorch_ie_spark.queries import QUERIES
from pytorch_ie_spark.sources.readers import TABLES

from .oracle_check import frame_hash


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"subj", "pred", "obj", "doc_id", "score"}.issubset(set(df.columns))


def test_queries_and_oracles_aligned():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity_sf0001(spark, sf_dir, duck, name):
    fn, oracle = QUERIES[name]
    spark_pdf = fn(spark, sf_dir).toPandas()
    if oracle is None:
        assert len(spark_pdf) >= 0
        return
    duck_pdf = duck.sql(oracle).df()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    assert len(spark_pdf) == len(duck_pdf)
    assert frame_hash(spark_pdf) == frame_hash(duck_pdf)
