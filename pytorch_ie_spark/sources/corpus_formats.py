"""Raw-corpus format readers: BRAT standoff and TACRED JSON.

Closes the SURVEY.md §2.1 'BRAT / TACRED fixture sources' row (reference
fixtures: tests/fixtures/datasets/brat/, tests/fixtures/datasets/tacred/).
Both readers are pure DataFrame pipelines — file scan + line explode +
regexp_extract, no per-row Python — so they scale like any other source:
a directory of N files becomes N scan rows partitioned by Spark's file
splitter, and parsing is whole-stage codegen.

BRAT standoff (https://brat.nlplab.org/standoff.html), the subset the
reference fixtures use:
    T<id>\t<label> <start> <end>\t<surface>     entity (char offsets)
    R<id>\t<label> Arg1:T<i> Arg2:T<j>          binary relation
TACRED (LDC2018T24 public schema): JSON array of examples with `token`,
`subj_start/end`, `obj_start/end` (token indices, end-INCLUSIVE),
`subj_type`, `obj_type`, `relation`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _doc_id_from_file(path_col):
    """'…/dir/42.txt' -> '42' (basename without extension)."""
    return F.regexp_extract(path_col, r"([^/]+)\.[a-z]+$", 1)


def read_brat_documents(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """(doc_id, text) — one row per .txt file."""
    txt = spark.read.text(os.path.join(corpus_dir, "*.txt"), wholetext=True)
    return txt.select(
        _doc_id_from_file(F.input_file_name()).alias("doc_id"),
        F.col("value").alias("text"),
    )


BRAT_ENTITY_PATTERN = r"^(T\d+)\t(\S+) (\d+) (\d+)\t(.*)$"


def brat_entities_from_lines(lines: DataFrame) -> DataFrame:
    """Parse BRAT T-lines from a (doc_id, line) DataFrame — the shared core
    of the file reader, also usable on standoff text from any source
    (Kafka payloads, a column in a lake table, synthesized fixtures)."""
    pat = BRAT_ENTITY_PATTERN
    t = lines.where(F.col("line").rlike(pat))
    return t.select(
        "doc_id",
        F.regexp_extract("line", pat, 1).alias("ann_id"),
        F.regexp_extract("line", pat, 2).alias("label"),
        F.regexp_extract("line", pat, 3).cast("int").alias("start"),
        F.regexp_extract("line", pat, 4).cast("int").alias("end"),
        F.regexp_extract("line", pat, 5).alias("surface"),
    )


def read_brat_entities(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """(doc_id, ann_id, label, start, end, surface) from T lines.

    Discontinuous spans (`start end;start end`) are out of the reference
    fixtures' subset and are dropped here (the regex requires a single
    start/end pair) — observable as a count diff, not silent corruption."""
    ann = spark.read.text(os.path.join(corpus_dir, "*.ann"), wholetext=True)
    lines = ann.select(
        _doc_id_from_file(F.input_file_name()).alias("doc_id"),
        F.explode(F.split(F.col("value"), "\n")).alias("line"),
    )
    return brat_entities_from_lines(lines)


def read_brat_relations(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """(doc_id, rel_id, label, head, tail) from R lines; head/tail are the
    T-ids — resolve with `resolve_brat_relations` (the §2.3 relations→
    entities index join)."""
    ann = spark.read.text(os.path.join(corpus_dir, "*.ann"), wholetext=True)
    lines = ann.select(
        _doc_id_from_file(F.input_file_name()).alias("doc_id"),
        F.explode(F.split(F.col("value"), "\n")).alias("line"),
    )
    pat = r"^(R\d+)\t(\S+) Arg1:(T\d+) Arg2:(T\d+)\s*$"
    r = lines.where(F.col("line").rlike(pat))
    return r.select(
        "doc_id",
        F.regexp_extract("line", pat, 1).alias("rel_id"),
        F.regexp_extract("line", pat, 2).alias("label"),
        F.regexp_extract("line", pat, 3).alias("head"),
        F.regexp_extract("line", pat, 4).alias("tail"),
    )


def resolve_brat_relations(
    relations: DataFrame, entities: DataFrame
) -> DataFrame:
    """Equi-join relation arg ids to entity rows — the same relations→
    entities resolution the json fixture source performs by index
    (reference semantics: BinaryRelation head/tail are refs into the
    entity layer)."""
    heads = entities.select(
        "doc_id",
        F.col("ann_id").alias("head"),
        F.col("label").alias("head_label"),
        F.col("start").alias("head_start"),
        F.col("end").alias("head_end"),
        F.col("surface").alias("head_surface"),
    )
    tails = entities.select(
        "doc_id",
        F.col("ann_id").alias("tail"),
        F.col("label").alias("tail_label"),
        F.col("start").alias("tail_start"),
        F.col("end").alias("tail_end"),
        F.col("surface").alias("tail_surface"),
    )
    return (
        relations.join(heads, ["doc_id", "head"])
        .join(tails, ["doc_id", "tail"])
        .select(
            "doc_id", "rel_id", "label",
            "head_label", "head_start", "head_end", "head_surface",
            "tail_label", "tail_start", "tail_end", "tail_surface",
        )
    )


TACRED_SCHEMA = (
    "id string, docid string, relation string, token array<string>, "
    "subj_start int, subj_end int, obj_start int, obj_end int, "
    "subj_type string, obj_type string"
)


def _tacred_char_offsets(raw: DataFrame) -> DataFrame:
    """Shared core: TACRED-schema rows -> char-offset relation rows.
    Token->char math is a prefix sum over token lengths, done with array
    HOFs — no UDF."""

    # char offset of token i in ' '.join(tokens): sum(len+1 for tokens < i)
    def tok_start(idx_col):
        return F.aggregate(
            F.slice(F.col("token"), 1, idx_col),
            F.lit(0),
            lambda acc, t: acc + F.length(t) + 1,
        )

    def tok_end(idx_col):
        # end-inclusive token index -> end-exclusive char offset
        return tok_start(idx_col + 1) - 1

    return raw.select(
        F.col("id").alias("example_id"),
        F.col("docid").alias("doc_id"),
        F.concat_ws(" ", F.col("token")).alias("text"),
        F.col("relation").alias("label"),
        F.col("subj_type").alias("head_label"),
        tok_start(F.col("subj_start")).alias("head_start"),
        tok_end(F.col("subj_end")).alias("head_end"),
        F.col("obj_type").alias("tail_label"),
        tok_start(F.col("obj_start")).alias("tail_start"),
        tok_end(F.col("obj_end")).alias("tail_end"),
    )


def read_tacred_json(spark: SparkSession, path: str) -> DataFrame:
    """TACRED examples with token-index spans converted to char offsets over
    the space-joined text (end-inclusive token spans -> end-exclusive char
    spans, the reference's offset convention)."""
    raw = spark.read.schema(TACRED_SCHEMA).option("multiLine", "true").json(path)
    return _tacred_char_offsets(raw)


def tacred_from_json_strings(df: DataFrame, json_col: str = "json") -> DataFrame:
    """Parse TACRED examples from a JSON string COLUMN (Kafka payloads, a
    lake-table column, synthesized fixtures) through the same offset core
    as the file reader."""
    raw = df.select(
        F.from_json(F.col(json_col), TACRED_SCHEMA).alias("r")
    ).select("r.*")
    return _tacred_char_offsets(raw)
