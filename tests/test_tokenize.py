"""Tokenization + char<->token alignment (reference contract:
utils/document.py:278-299, taskmodule offset mappings)."""

from pytorch_ie_spark.functions.tokenize import (
    char_span_to_token_span,
    sentence_spans,
    token_span_to_char_span,
    tokenize_with_offsets,
)


def test_tokenize_offsets_roundtrip():
    text = "Entity A works at B."
    toks = tokenize_with_offsets(text)
    assert [t[0] for t in toks] == ["Entity", "A", "works", "at", "B", "."]
    for tok, s, e in toks:
        assert text[s:e] == tok


def test_tokenize_punctuation_split():
    text = "Entity J, K, and L."
    toks = tokenize_with_offsets(text)
    assert [t[0] for t in toks] == ["Entity", "J", ",", "K", ",", "and", "L", "."]


def test_char_to_token_alignment_exact():
    text = "Entity A works at B."
    toks = tokenize_with_offsets(text)
    starts = [t[1] for t in toks]
    ends = [t[2] for t in toks]
    # "Entity A" = chars 0..8 -> tokens 0..2 (exclusive)
    assert char_span_to_token_span(starts, ends, 0, 8) == (0, 2)
    # roundtrip
    assert token_span_to_char_span(starts, ends, 0, 2) == (0, 8)


def test_char_to_token_alignment_partial():
    text = "hello world"
    toks = tokenize_with_offsets(text)
    starts = [t[1] for t in toks]
    ends = [t[2] for t in toks]
    # span covering part of 'world' aligns inward to the whole token
    assert char_span_to_token_span(starts, ends, 7, 9) == (1, 2)


def test_char_to_token_alignment_none_on_whitespace():
    text = "a  b"
    toks = tokenize_with_offsets(text)
    starts = [t[1] for t in toks]
    ends = [t[2] for t in toks]
    assert char_span_to_token_span(starts, ends, 1, 2) is None


def test_sentence_spans():
    text = "First sentence. Entity G works at H. And founded I."
    assert sentence_spans(text) == [(0, 15), (16, 36), (37, 51)]


def test_char_to_token_mapper_out_of_window_codes():
    from pytorch_ie_spark.functions.tokenize import (
        char_to_token_mapper,
        get_token_slice,
        tokenize_with_offsets,
    )

    text = "alpha beta gamma"
    toks = tokenize_with_offsets(text)
    starts = [t[1] for t in toks]
    ends = [t[2] for t in toks]
    m = char_to_token_mapper(starts, ends, window=(6, 10))
    assert m(3) == -1          # before the window
    assert m(12) == -2         # at/after the window end
    assert m(6) == 1           # 'beta' inside the window
    assert m(5) == -1          # whitespace before window -> window code wins
    # unwindowed: whitespace maps to None
    m2 = char_to_token_mapper(starts, ends)
    assert m2(5) is None and m2(0) == 0
    # get_token_slice treats negative codes as misses, never slices wrong
    assert get_token_slice((6, 10), m) == (1, 2)
    assert get_token_slice((0, 5), m) is None       # out-of-window
    assert get_token_slice((0, 5), m2) == (0, 1)
    assert get_token_slice((4, 6), m2) is None      # boundary on whitespace
