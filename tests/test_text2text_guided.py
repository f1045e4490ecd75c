"""Guided text-to-text: fan-out over the guidance layer, guidance-prepended
encoder input, first-matching-target selection, and guidance attachment on
decode — mirroring the reference's
tests/taskmodules/test_text2text_with_guidance.py assertions (one task
encoding per question, metadata carries the guidance annotation, the decoded
GenerativeAnswer has .question set)."""

from pytorch_ie_spark.operators.text2text import guided_text2text


def _fixtures(spark):
    # the reference fixture shape: doc + question + answer-with-question
    docs = spark.createDataFrame(
        [
            (1, "This is a test document"),
            (2, "This is another test document which is a bit longer."),
        ],
        "doc_id long, text string",
    )
    guidance = spark.createDataFrame(
        [
            (1, "What is this?"),
            (2, "And what is this?"),
            (2, "Unanswered question?"),
        ],
        "doc_id long, guidance_text string",
    )
    targets = spark.createDataFrame(
        [
            (1, "What is this?", 0, "a document"),
            (2, "And what is this?", 1, "a longer document"),
            # second target for the same guidance: first by order wins
            (2, "And what is this?", 2, "the wrong answer"),
        ],
        "doc_id long, guidance_text string, target_idx long, "
        "target_text string",
    )
    return docs, guidance, targets


def test_fanout_one_encoding_per_guidance(spark):
    docs, guidance, targets = _fixtures(spark)
    out = guided_text2text(docs, guidance, targets).collect()
    # len(encodings) == number of guidance annotations, not documents
    assert len(out) == 3
    assert sorted((r["doc_id"], r["guidance_text"]) for r in out) == [
        (1, "What is this?"),
        (2, "And what is this?"),
        (2, "Unanswered question?"),
    ]


def test_guidance_text_prepended_to_input(spark):
    docs, guidance, targets = _fixtures(spark)
    rows = {
        (r["doc_id"], r["guidance_text"]): r
    for r in guided_text2text(docs, guidance, targets).collect()}
    r1 = rows[(1, "What is this?")]
    assert r1["input_lead"].startswith("What is this? This is a")
    # question tokens + document tokens
    assert r1["n_src_tokens"] == 3 + 5


def test_first_matching_target_selected_and_guidance_attached(spark):
    docs, guidance, targets = _fixtures(spark)
    rows = {
        (r["doc_id"], r["guidance_text"]): r
    for r in guided_text2text(docs, guidance, targets).collect()}
    r2 = rows[(2, "And what is this?")]
    assert r2["n_targets"] == 2
    assert r2["target_text"] == "a longer document"  # first by target_idx
    assert r2["has_target"]
    # decode_annotations: the new annotation carries the guidance
    # annotation in the guidance_annotation_field
    assert r2["attached_guidance"] == "And what is this?"
    assert r2["gen_text"] == "a longer document"


def test_zero_target_path_observable(spark):
    docs, guidance, targets = _fixtures(spark)
    rows = {
        (r["doc_id"], r["guidance_text"]): r
    for r in guided_text2text(docs, guidance, targets).collect()}
    r3 = rows[(2, "Unanswered question?")]
    # the reference raises ValueError('contains no annotation'); the Spark
    # stage keeps the row with has_target=false and no attachment
    assert not r3["has_target"]
    assert r3["n_targets"] == 0
    assert r3["target_text"] is None
    assert r3["gen_text"] is None
    assert r3["attached_guidance"] is None


def test_target_for_other_guidance_not_selected(spark):
    docs, guidance, _ = _fixtures(spark)
    # the only target is attached to a DIFFERENT question -> not selected
    targets = spark.createDataFrame(
        [(1, "Some other question?", 0, "a document")],
        "doc_id long, guidance_text string, target_idx long, "
        "target_text string",
    )
    rows = {
        (r["doc_id"], r["guidance_text"]): r
    for r in guided_text2text(docs, guidance, targets).collect()}
    assert not rows[(1, "What is this?")]["has_target"]
