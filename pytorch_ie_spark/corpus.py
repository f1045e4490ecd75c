"""Golden fixture corpus + loaders.

The corpus below mirrors the reference test fixtures
(/root/reference/tests/fixtures/datasets/json/{train,val,test}.json, loaded
by tests/conftest.py:15-55): 12 tiny documents with sentence partitions,
PER/ORG entity spans (char offsets, end-exclusive) and binary relations
whose head/tail are indices into the entities list. This is the corpus the
P/R >= 0.95 triple gate is checked against (BASELINE.md).

It is embedded as data (annotations are facts about the gold standard, not
code) so the test suite runs standalone.
"""

from __future__ import annotations

import hashlib
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .functions.hashing import mention_id

# (id, text, sentences, entities[(start,end,label)], relations[(head_idx,tail_idx,label)])
FIXTURE_DOCS: list[dict[str, Any]] = [
    dict(id="train_doc1", text="A single sentence.",
         sentences=[(0, 18)], entities=[], relations=[]),
    dict(id="train_doc2", text="Entity A works at B.",
         sentences=[(0, 20)],
         entities=[(0, 8, "PER"), (18, 19, "ORG")],
         relations=[(0, 1, "per:employee_of")]),
    dict(id="train_doc3", text="Entity C and D.",
         sentences=[(0, 15)],
         entities=[(0, 8, "PER"), (13, 14, "ORG")], relations=[]),
    dict(id="train_doc4", text="First sentence. Entity E and F.",
         sentences=[(0, 15), (16, 31)],
         entities=[(16, 24, "PER"), (29, 30, "ORG")], relations=[]),
    dict(id="train_doc5", text="First sentence. Entity G works at H. And founded I.",
         sentences=[(0, 15), (16, 36), (37, 51)],
         entities=[(16, 24, "PER"), (34, 35, "ORG"), (49, 50, "ORG")],
         relations=[(0, 1, "per:employee_of"), (0, 2, "per:founder"),
                    (2, 1, "org:founded_by")]),
    dict(id="train_doc6", text="Entity J, K, and L.",
         sentences=[(0, 19)],
         entities=[(0, 8, "PER"), (10, 11, "ORG"), (17, 18, "ORG")],
         relations=[]),
    dict(id="train_doc7", text="A single sentence.",
         sentences=[(0, 18)], entities=[], relations=[]),
    dict(id="train_doc8", text="First sentence. Entity M works at N. And it founded O.",
         sentences=[(0, 15), (16, 36), (37, 53)],
         entities=[(16, 24, "PER"), (34, 35, "ORG"), (41, 43, "PER"),
                   (52, 53, "ORG")],
         relations=[(0, 1, "per:employee_of"), (2, 3, "per:founder"),
                    (3, 2, "org:founded_by")]),
    dict(id="val_doc1", text="A single sentence.",
         sentences=[(0, 18)], entities=[], relations=[]),
    dict(id="val_doc2", text="First sentence. Entity M works at N. And founded O.",
         sentences=[(0, 15), (16, 36), (16, 51)],
         entities=[(16, 24, "PER"), (34, 35, "ORG"), (49, 50, "ORG")],
         relations=[(0, 1, "per:employee_of"), (0, 2, "per:founder"),
                    (2, 1, "org:founded_by")]),
    dict(id="test_doc1", text="A single sentence.",
         sentences=[(0, 18)], entities=[], relations=[]),
    dict(id="test_doc2", text="First sentence. Entity M works at N. And founded O.",
         sentences=[(0, 15), (16, 36), (16, 51)],
         entities=[(16, 24, "PER"), (34, 35, "ORG"), (49, 50, "ORG")],
         relations=[(0, 1, "per:employee_of"), (0, 2, "per:founder"),
                    (2, 1, "org:founded_by")]),
]


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def fixture_source_files(spark: SparkSession) -> DataFrame:
    """Fixture corpus in the input_hint source-file shape
    (repo, path, commit, lang, content)."""
    rows = [
        (
            "pie/fixtures",
            f"{d['id']}.txt",
            "0" * 40,
            "en",
            d["text"],
        )
        for d in FIXTURE_DOCS
    ]
    return spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")


def fixture_documents(spark: SparkSession, split: str | None = "train") -> DataFrame:
    """Documents DataFrame with sentence partitions; doc_id keeps the
    reference fixture id so golden assertions line up."""
    docs = [d for d in FIXTURE_DOCS if split is None or d["id"].startswith(split)]
    rows = [
        (
            d["id"],
            d["text"],
            "en",
            _sha256(d["text"]),
            [{"start": s, "end": e} for (s, e) in d["sentences"]],
        )
        for d in docs
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, text string, lang string, content_sha256 string, "
        "sentences array<struct<start:int,end:int>>",
    )


def fixture_gold_mentions(spark: SparkSession, split: str | None = "train") -> DataFrame:
    docs = [d for d in FIXTURE_DOCS if split is None or d["id"].startswith(split)]
    rows = []
    for d in docs:
        for (s, e, label) in d["entities"]:
            rows.append(
                (
                    d["id"],
                    mention_id(d["id"], s, e, label),
                    s,
                    e,
                    label,
                    d["text"][s:e],
                    1.0,
                    "gold",
                    _sha256(d["text"]),
                )
            )
    return spark.createDataFrame(
        rows,
        "doc_id string, mention_id string, start int, end int, label string, "
        "surface string, score double, source string, content_sha256 string",
    )


def fixture_gold_relations(spark: SparkSession, split: str | None = "train") -> DataFrame:
    docs = [d for d in FIXTURE_DOCS if split is None or d["id"].startswith(split)]
    rows = []
    for d in docs:
        ents = d["entities"]
        for (h, t, label) in d["relations"]:
            hs, he, hl = ents[h]
            ts, te, tl = ents[t]
            rows.append(
                (
                    d["id"],
                    mention_id(d["id"], hs, he, hl),
                    mention_id(d["id"], ts, te, tl),
                    label,
                    1.0,
                    "gold",
                    _sha256(d["text"]),
                )
            )
    return spark.createDataFrame(
        rows,
        "doc_id string, head_mention_id string, tail_mention_id string, "
        "label string, score double, source string, content_sha256 string",
    )
