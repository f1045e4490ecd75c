"""JSON document source in the reference fixture format (SURVEY.md §2.1):
round-trips the golden corpus through disk and matches the embedded fixture
loaders exactly (incl. relation head/tail index resolution)."""

import json

from pytorch_ie_spark.corpus import (
    FIXTURE_DOCS,
    fixture_documents,
    fixture_gold_mentions,
    fixture_gold_relations,
)
from pytorch_ie_spark.sources.readers import as_type, read_annotated_json_corpus


def _write_fixture_json(tmp_path):
    data = [
        {
            "id": d["id"],
            "text": d["text"],
            "sentences": [{"start": s, "end": e} for s, e in d["sentences"]],
            "entities": [
                {"start": s, "end": e, "label": lab} for s, e, lab in d["entities"]
            ],
            "relations": [
                {"head": h, "tail": t, "label": lab} for h, t, lab in d["relations"]
            ],
            "metadata": {},
        }
        for d in FIXTURE_DOCS
        if d["id"].startswith("train")
    ]
    path = tmp_path / "corpus.json"
    path.write_text(json.dumps({"data": data}))
    return str(path)


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_json_corpus_matches_embedded_fixtures(spark, tmp_path):
    path = _write_fixture_json(tmp_path)
    docs, mentions, relations = read_annotated_json_corpus(spark, path)

    exp_docs = fixture_documents(spark, split="train")
    assert _rows(docs, ["doc_id", "text", "content_sha256"]) == _rows(
        exp_docs, ["doc_id", "text", "content_sha256"]
    )

    exp_m = fixture_gold_mentions(spark, split="train")
    cols = ["doc_id", "mention_id", "start", "end", "label", "surface"]
    assert _rows(mentions, cols) == _rows(exp_m, cols)

    exp_r = fixture_gold_relations(spark, split="train")
    cols = ["doc_id", "head_mention_id", "tail_mention_id", "label"]
    assert _rows(relations, cols) == _rows(exp_r, cols)


def test_as_type_field_mapping(spark):
    docs = fixture_documents(spark)
    converted = as_type(docs, {"sentences": "labeled_partitions", "text": "content"})
    assert "labeled_partitions" in converted.columns
    assert "content" in converted.columns
    assert "sentences" not in converted.columns
    assert converted.count() == docs.count()
