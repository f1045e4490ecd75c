"""BRAT standoff + TACRED JSON sources (SURVEY.md §2.1 fixture-source row).

Fixtures are authored here (standard public formats), not copied from the
reference repo."""

import json
import os

from pytorch_ie_spark.sources.corpus_formats import (
    read_brat_documents,
    read_brat_entities,
    read_brat_relations,
    read_tacred_json,
    resolve_brat_relations,
)

BRAT_DOCS = {
    "10": "Ada Lovelace wrote programs in London.",
    "11": "Turing founded a lab. It thrived.",
}
BRAT_ANNS = {
    "10": (
        "T1\tperson 0 12\tAda Lovelace\n"
        "T2\tcity 31 37\tLondon\n"
        "R1\tlives_in Arg1:T1 Arg2:T2\n"
    ),
    "11": "T1\tperson 0 6\tTuring\nT2\torg 17 20\tlab\nR1\tfounded Arg1:T1 Arg2:T2\n",
}


def _write_brat(tmp_path):
    d = tmp_path / "brat"
    d.mkdir()
    for doc_id, text in BRAT_DOCS.items():
        (d / f"{doc_id}.txt").write_text(text)
        (d / f"{doc_id}.ann").write_text(BRAT_ANNS[doc_id])
    return str(d)


def test_brat_documents_and_entities(spark, tmp_path):
    d = _write_brat(tmp_path)
    docs = {r["doc_id"]: r["text"] for r in read_brat_documents(spark, d).collect()}
    assert docs == BRAT_DOCS
    ents = read_brat_entities(spark, d).collect()
    by_key = {(r["doc_id"], r["ann_id"]): r for r in ents}
    ada = by_key[("10", "T1")]
    assert (ada["label"], ada["start"], ada["end"], ada["surface"]) == (
        "person", 0, 12, "Ada Lovelace"
    )
    # offsets actually slice the text (the reference's char-offset invariant)
    for r in ents:
        assert BRAT_DOCS[r["doc_id"]][r["start"] : r["end"]] == r["surface"]


def test_brat_relations_resolve_to_entity_rows(spark, tmp_path):
    d = _write_brat(tmp_path)
    rels = resolve_brat_relations(
        read_brat_relations(spark, d), read_brat_entities(spark, d)
    ).collect()
    got = {
        (r["doc_id"], r["label"], r["head_surface"], r["tail_surface"])
        for r in rels
    }
    assert got == {
        ("10", "lives_in", "Ada Lovelace", "London"),
        ("11", "founded", "Turing", "lab"),
    }


def test_tacred_token_spans_to_char_offsets(spark, tmp_path):
    examples = [
        {
            "id": "ex1",
            "docid": "D1",
            "relation": "per:city_of_birth",
            "token": ["Ada", "was", "born", "in", "London", "."],
            "subj_start": 0, "subj_end": 0,
            "obj_start": 4, "obj_end": 4,
            "subj_type": "PERSON", "obj_type": "CITY",
        },
        {
            "id": "ex2",
            "docid": "D2",
            "relation": "per:title",
            "token": ["Chief", "Officer", "Flint", "resigned"],
            "subj_start": 2, "subj_end": 2,
            "obj_start": 0, "obj_end": 1,
            "subj_type": "PERSON", "obj_type": "TITLE",
        },
    ]
    p = tmp_path / "tacred.json"
    p.write_text(json.dumps(examples))
    rows = {r["example_id"]: r for r in read_tacred_json(spark, str(p)).collect()}
    r1 = rows["ex1"]
    assert r1["text"] == "Ada was born in London ."
    assert r1["text"][r1["head_start"] : r1["head_end"]] == "Ada"
    assert r1["text"][r1["tail_start"] : r1["tail_end"]] == "London"
    r2 = rows["ex2"]
    # multi-token object: end-inclusive token span -> exclusive char span
    assert r2["text"][r2["tail_start"] : r2["tail_end"]] == "Chief Officer"
    assert r2["text"][r2["head_start"] : r2["head_end"]] == "Flint"
    assert r2["label"] == "per:title"


def test_model_save_pretrained_roundtrip(spark, tmp_path):
    """save_pretrained -> from_pretrained resolves the same registry model;
    the spec (not the artifact) is what ships to executors."""
    from pytorch_ie_spark.operators.models import (
        from_pretrained,
        load_spec,
        resolve_model,
        save_pretrained,
    )

    d = str(tmp_path / "model_artifact")
    save_pretrained(d, "gazetteer_ner", {"gazetteer": {"spark": "ENGINE"}})
    name, cfg = load_spec(d)
    assert (name, cfg) == ("gazetteer_ner", {"gazetteer": {"spark": "ENGINE"}})
    m1 = from_pretrained(d)
    m2 = resolve_model(name, cfg)
    assert m1 is m2  # per-worker singleton cache hit
