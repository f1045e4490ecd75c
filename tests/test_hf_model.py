"""HF model seam: the load->tokenize->forward->argmax->align path of
HFTokenClassificationModel runs for real against a fake transformers/torch
pair (tests/fake_hf), driver-side AND inside Spark workers via addPyFile.
The fake model poisons continuation-subword and padding logits, so any
alignment mistake in the wrapper diverges from rule_ner instead of
silently passing (reference contract: pipeline.py:409-417, model.py:37-40,
transformer_token_classification.py:288-292)."""

import importlib.util
import os
import sys

import pytest

FAKE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fake_hf")


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def fake_hf(monkeypatch):
    monkeypatch.setitem(
        sys.modules, "torch", _load("torch", os.path.join(FAKE_DIR, "torch.py"))
    )
    monkeypatch.setitem(
        sys.modules,
        "transformers",
        _load("transformers", os.path.join(FAKE_DIR, "transformers.py")),
    )


def test_hf_wrapper_matches_rule_ner_tags(fake_hf):
    """Unit drive: ragged lengths (dynamic padding), batch_size smaller than
    the input (chunking), multi-subword words (first-subword alignment)."""
    from pytorch_ie_spark.operators.models import (
        HFTokenClassificationModel,
        RuleNerModel,
    )

    batches = [
        ["Entity", "G", "works", "at", "H"],
        ["A", "short", "one"],
        ["Entity", "M", "founded", "N", "and", "it", "grew"],
        ["O"] * 1,
        ["longwordhere", "Entity", "Q"],
    ]
    hf = HFTokenClassificationModel("fake/checkpoint", batch_size=2)
    assert hf.predict_tags(batches) == RuleNerModel().predict_tags(batches)


def test_hf_wrapper_loads_once_per_spec(fake_hf):
    from pytorch_ie_spark.operators.models import resolve_model

    a = resolve_model(
        "hf_token_classification", {"model_name_or_path": "fake/x"}
    )
    b = resolve_model(
        "hf_token_classification", {"model_name_or_path": "fake/x"}
    )
    assert a is b


def test_detect_mentions_with_hf_wrapper_matches_rule_ner(spark):
    """End-to-end through Spark: ship the fakes to python workers with
    addPyFile, then the HF-backed mention stage must reproduce the rule_ner
    mentions on the fixture corpus exactly."""
    from pytorch_ie_spark.corpus import fixture_documents
    from pytorch_ie_spark.operators.mentions import detect_mentions

    spark.sparkContext.addPyFile(os.path.join(FAKE_DIR, "torch.py"))
    spark.sparkContext.addPyFile(os.path.join(FAKE_DIR, "transformers.py"))

    docs = fixture_documents(spark, split=None)
    cols = ["doc_id", "mention_id", "start", "end", "label", "surface"]
    hf = detect_mentions(
        docs,
        model_name="hf_token_classification",
        model_config={"model_name_or_path": "fake/checkpoint", "batch_size": 4},
    )
    rule = detect_mentions(docs, model_name="rule_ner")
    hf_rows = sorted(map(tuple, hf.select(*cols).collect()))
    rule_rows = sorted(map(tuple, rule.select(*cols).collect()))
    assert hf_rows == rule_rows and len(hf_rows) > 0
