"""Document tokenize round-trip: the closed-form (array-filter) alignment
in operators/doc_tokenize.py must agree with the direct Python
char_span_to_token_span / token_span_to_char_span per window, including
clipping at window boundaries, whitespace-only misses, and the exact
round-trip flag (reference contract: utils/document.py:150-299)."""

from pyspark.sql import functions as F

from pytorch_ie_spark.functions.tokenize import (
    char_span_to_token_span,
    token_span_to_char_span,
    tokenize_with_offsets,
)
from pytorch_ie_spark.functions.window import enumerate_windows
from pytorch_ie_spark.operators.doc_tokenize import (
    tokenize_documents_roundtrip,
)

DOCS = [
    ("d1", "alpha beta gamma delta epsilon zeta eta theta"),
    ("d2", "one two three"),
    ("d3", "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
]


def _expected(doc_id, text, start, end, max_window, overlap):
    toks = tokenize_with_offsets(text)
    starts = [t[1] for t in toks]
    ends = [t[2] for t in toks]
    rows = []
    for widx, ((ws, we), _) in enumerate(
        enumerate_windows(len(toks), max_window, overlap)
    ):
        span = char_span_to_token_span(starts[ws:we], ends[ws:we], start, end)
        if span is None:
            continue
        ts, te = span
        rs, re_ = token_span_to_char_span(starts[ws:we], ends[ws:we], ts, te)
        rows.append(
            (doc_id, start, end, widx, ts, te, rs, re_,
             rs == start and re_ == end, False)
        )
    if not rows:
        rows.append((doc_id, start, end, None, None, None, None, None, False, True))
    return rows


def test_alignment_matches_python_reference(spark):
    max_window, overlap = 6, 2
    docs = spark.createDataFrame(
        [(d, t, "sha") for d, t in DOCS],
        "doc_id string, text string, content_sha256 string",
    )
    # every span over a char grid: aligned, misaligned, whitespace, straddling
    anns_rows = []
    expected = []
    for doc_id, text in DOCS:
        n = len(text)
        for start in range(0, n, 3):
            for width in (1, 2, 7, 15):
                end = min(start + width, n + 1)
                if end <= start:
                    continue
                anns_rows.append((doc_id, start, end))
                expected.extend(
                    _expected(doc_id, text, start, end, max_window, overlap)
                )
    anns = spark.createDataFrame(
        anns_rows, "doc_id string, start long, end long"
    )
    out = tokenize_documents_roundtrip(docs, anns, max_window, overlap)
    def key(x):
        return tuple((v is None, v) for v in x)

    got = sorted(
        (
            (
                r["doc_id"], r["start"], r["end"], r["window_idx"],
                r["tok_start"], r["tok_end"], r["rt_start"], r["rt_end"],
                r["exact"], r["missed"],
            )
            for r in out.collect()
        ),
        key=key,
    )
    assert got == sorted(expected, key=key)


def test_missed_and_exact_flags(spark):
    docs = spark.createDataFrame(
        [("d", "alpha beta", "s")],
        "doc_id string, text string, content_sha256 string",
    )
    anns = spark.createDataFrame(
        [
            ("d", 0, 5),    # exact token
            ("d", 0, 10),   # exact multi-token
            ("d", 1, 5),    # inner -> clips back to (0,5), inexact
            ("d", 5, 6),    # the space -> missed
        ],
        "doc_id string, start long, end long",
    )
    out = {
        (r["start"], r["end"]): r
        for r in tokenize_documents_roundtrip(docs, anns, 8, 2).collect()
    }
    assert out[(0, 5)]["exact"] and not out[(0, 5)]["missed"]
    assert out[(0, 10)]["exact"] and out[(0, 10)]["tok_end"] == 2
    r = out[(1, 5)]
    assert not r["exact"] and (r["rt_start"], r["rt_end"]) == (0, 5)
    assert out[(5, 6)]["missed"] and out[(5, 6)]["tok_start"] is None


def test_text_token_text_conversion_roundtrip(spark):
    """as_type-style document conversion: text -> token docs -> text
    reconstructs each window's exact text slice (reference
    text_based_document_to_token_based / token_based_document_to_text_based,
    utils/document.py:150-363)."""
    from pytorch_ie_spark.operators.doc_tokenize import (
        text_documents_to_token_documents,
        token_documents_to_text_documents,
    )

    texts = {
        "d1": "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "d2": "one two three",
    }
    docs = spark.createDataFrame(
        [(k, v, "s") for k, v in texts.items()],
        "doc_id string, text string, content_sha256 string",
    )
    # max_window 4 forces multi-window docs (char_offset > 0 windows)
    td = text_documents_to_token_documents(docs, max_window=4, window_overlap=1)
    back = token_documents_to_text_documents(td).collect()
    assert any(r["char_offset"] > 0 for r in back)
    for r in back:
        original = texts[r["doc_id"]]
        assert r["text"] == original[r["char_offset"] : r["char_offset"] + len(r["text"])]
        # window text starts and ends on token boundaries (no stray spaces)
        assert not r["text"].startswith(" ") and not r["text"].endswith(" ")


def test_unicode_offsets_roundtrip(spark):
    """Char offsets are codepoint-based on both sides of the conversion:
    multi-byte text must round-trip exactly (the reference operates on
    Python str indices; so do we)."""
    from pytorch_ie_spark.operators.doc_tokenize import (
        text_documents_to_token_documents,
        token_documents_to_text_documents,
    )

    text = "café naïve 日本語 tokens über"
    docs = spark.createDataFrame(
        [("u1", text, "s")], "doc_id string, text string, content_sha256 string"
    )
    td = text_documents_to_token_documents(docs, 128, 16)
    back = token_documents_to_text_documents(td).collect()
    assert len(back) == 1 and back[0]["text"] == text

    anns = spark.createDataFrame(
        [("u1", 0, 4), ("u1", 5, 10), ("u1", 11, 14)],
        "doc_id string, start long, end long",
    )
    out = {
        (r["start"], r["end"]): r
        for r in tokenize_documents_roundtrip(docs, anns, 128, 16).collect()
    }
    assert out[(0, 4)]["exact"]      # café
    assert out[(5, 10)]["exact"]     # naïve
    assert out[(11, 14)]["exact"]    # 日本語


def test_alignment_fuzz_hypothesis(spark):
    """Randomized spans/window shapes vs the Python reference functions —
    complements the systematic grid with adversarial shapes."""
    import random

    from pytorch_ie_spark.operators.doc_tokenize import (
        tokenize_documents_roundtrip as rt,
    )

    rng = random.Random(20260816)
    words = ["alpha", "b", "gamma", "dd", "epsilon", "zz", "eta", "x"]
    docs_rows = []
    anns_rows = []
    expected = []
    max_window, overlap = 5, 2
    for d in range(12):
        n_words = rng.randint(1, 14)
        text = " ".join(rng.choice(words) for _ in range(n_words))
        doc_id = f"f{d}"
        docs_rows.append((doc_id, text, "s"))
        for _ in range(8):
            start = rng.randint(0, max(0, len(text) - 1))
            end = rng.randint(start + 1, min(len(text) + 1, start + 12))
            anns_rows.append((doc_id, start, end))
            expected.extend(
                _expected(doc_id, text, start, end, max_window, overlap)
            )
    docs = spark.createDataFrame(
        docs_rows, "doc_id string, text string, content_sha256 string"
    )
    anns = spark.createDataFrame(anns_rows, "doc_id string, start long, end long")
    out = rt(docs, anns, max_window, overlap)

    def key(x):
        return tuple((v is None, v) for v in x)

    got = sorted(
        (
            (
                r["doc_id"], r["start"], r["end"], r["window_idx"],
                r["tok_start"], r["tok_end"], r["rt_start"], r["rt_end"],
                r["exact"], r["missed"],
            )
            for r in out.collect()
        ),
        key=key,
    )
    assert got == sorted(expected, key=key)
