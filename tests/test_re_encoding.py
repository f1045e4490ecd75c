"""RE encode path: window-around-candidate skip/shift semantics and the
discontinuous two-frame gather, validated against a direct mask+cumsum
simulation of the reference algorithm
(re_text_classification_with_indices.py:1005-1093)."""

from pyspark.sql import functions as F

from pytorch_ie_spark.functions.window import window_around_slice
from pytorch_ie_spark.operators.re_encoding import (
    insert_pair_markers_col,
    with_candidate_window,
    with_discontinuous_frames,
)

PAIR_SCHEMA = (
    "doc_id long, head_tok_start long, head_tok_end long, "
    "tail_tok_start long, tail_tok_end long, seq_len long"
)


def _reference_gather(a, b, L, max_tokens, glue_len=1):
    """Direct simulation of the reference's mask/cumsum/glue algorithm for
    two args a=(s,e), b=(s,e) sorted by start."""
    mpa = max_tokens // 2 - glue_len
    if (a[1] - a[0]) > mpa or (b[1] - b[0]) > mpa:
        return None  # skipped
    mask = [0] * L
    for (s, e) in (a, b):
        if L <= mpa:
            mask = [1] * L
            break
        fs = max((s + e) // 2 - mpa // 2, 0)
        fe = fs + mpa
        if fe > L:
            fe = L
            fs = fe - mpa
        for i in range(fs, fe):
            mask[i] = 1
    offsets = []
    acc = 0
    for i in range(L):
        acc += mask[i] != 1
        offsets.append(acc)
    clusters = []
    new_spans = []
    for (s, e) in (a, b):
        off = offsets[s]
        if off not in clusters:
            clusters.append(off)
        glues = len(clusters) - 1
        new_spans.append((s - off + glues * glue_len, e - off + glues * glue_len))
    gathered = sum(mask) + (len(set(clusters)) - 1) * glue_len
    return new_spans, gathered


def test_gather_matches_reference_simulation(spark):
    cases = []
    did = 0
    for L in (6, 10, 16, 25, 40):
        for a in range(0, L - 1, 3):
            for b in range(a + 1, L, 4):
                # variable argument widths (clipped to the sequence and to
                # mpa=3 so nothing is skipped), not just single tokens
                aw = min(1 + (a % 3), b - a, L - a)
                bw = min(1 + (b % 3), L - b)
                if aw < 1 or bw < 1:
                    continue
                cases.append((did, a, a + aw, b, b + bw, L))
                did += 1
    df = spark.createDataFrame(cases, PAIR_SCHEMA)
    out = {
        r["doc_id"]: r
        for r in with_discontinuous_frames(df, 8, glue_len=1).collect()
    }
    for (did, hs, he, ts, te, L) in cases:
        r = out[did]
        ref = _reference_gather((hs, he), (ts, te), L, 8, 1)
        assert ref is not None and not r["skipped"]
        (na, nb), gathered = ref
        assert (r["new_a_start"], r["new_a_end"]) == na, (did, hs, ts, L)
        assert (r["new_b_start"], r["new_b_end"]) == nb, (did, hs, ts, L)
        assert r["gathered_len"] == gathered, (did, hs, ts, L)


def test_gather_skips_too_long_argument(spark):
    # arg width 5 > mpa=3
    df = spark.createDataFrame([(1, 0, 5, 10, 11, 20)], PAIR_SCHEMA)
    r = with_discontinuous_frames(df, 8).collect()[0]
    assert r["skipped"] and r["gathered_len"] is None


def test_candidate_window_matches_python(spark):
    cases = [
        (i, s, s + 1, t, t + 1, L)
        for i, (s, t, L) in enumerate(
            [(0, 3, 30), (5, 9, 12), (0, 9, 40), (20, 24, 25), (2, 18, 30)]
        )
    ]
    df = spark.createDataFrame(cases, PAIR_SCHEMA)
    out = {r["doc_id"]: r for r in with_candidate_window(df, 8).collect()}
    for (i, hs, he, ts, te, L) in cases:
        r = out[i]
        req = (min(hs, ts), max(he, te))
        expect = window_around_slice(req, 8, L)
        if expect is None:
            assert r["skipped"] and r["win_start"] is None
        else:
            assert not r["skipped"]
            assert (r["win_start"], r["win_end"]) == expect
            assert r["new_head_start"] == hs - expect[0]
            assert r["new_tail_start"] == ts - expect[0]


def test_marker_insertion_ordered(spark):
    df = spark.createDataFrame(
        [("a b c d e", 1, 2, 3, 4)],
        "text string, hs long, he long, ts long, te long",
    )
    out = df.select(
        insert_pair_markers_col(
            F.split("text", " "),
            F.col("hs"),
            F.col("he"),
            F.col("ts"),
            F.col("te"),
        ).alias("toks")
    ).collect()[0]["toks"]
    assert list(out) == ["a", "[H]", "b", "[/H]", "c", "[T]", "d", "[/T]", "e"]


def test_disjoint_marker_fast_path_equals_general(spark):
    """insert_pair_markers_disjoint_col (slice-based) must produce exactly
    the general transform version's output on every disjoint ordered span
    layout, including adjacency and sequence edges."""
    from pytorch_ie_spark.operators.re_encoding import (
        insert_pair_markers_disjoint_col,
    )

    toks = "a b c d e f g h".split(" ")
    cases = []
    n = len(toks)
    for hs in range(0, n - 1):
        for he in range(hs + 1, n):
            for ts in range(he, n):
                for te in range(ts + 1, n + 1):
                    cases.append((hs, he, ts, te))
    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        "i long, hs long, he long, ts long, te long",
    ).withColumn("toks", F.split(F.lit(" ".join(toks)), " "))
    both = df.select(
        "i",
        insert_pair_markers_col(
            F.col("toks"), F.col("hs"), F.col("he"), F.col("ts"), F.col("te")
        ).alias("general"),
        insert_pair_markers_disjoint_col(
            F.col("toks"), F.col("hs"), F.col("he"), F.col("ts"), F.col("te")
        ).alias("fast"),
    ).collect()
    for r in both:
        assert list(r["general"]) == list(r["fast"]), (r["i"], cases[r["i"]])


def test_gather_nested_arguments(spark):
    """A narrow second arg nested inside the first can have its frame begin
    LEFT of the first arg's frame (frame order != arg order).  The merged
    segment must start at the frame-union start, not f1_start — verified
    against the reference mask simulation with wide windows."""
    # (doc_id, hs, he, ts, te, L, max_tokens)
    cases = [
        (0, 100, 300, 105, 110, 400, 512),  # ADVICE example: len must be 328
        (1, 2, 5, 2, 3, 20, 8),             # tight mpa=3 nesting
        (2, 2, 5, 3, 4, 20, 8),             # interior nesting
        (3, 50, 200, 55, 60, 1000, 512),    # nested far from bounds
        (4, 0, 150, 1, 4, 300, 512),        # nesting at the left clamp
        (5, 280, 400, 390, 395, 400, 512),  # nesting at the right clamp
    ]
    for (did, hs, he, ts, te, L, mt) in cases:
        df = spark.createDataFrame([(did, hs, he, ts, te, L)], PAIR_SCHEMA)
        r = with_discontinuous_frames(df, mt, glue_len=1).collect()[0]
        # match the operator's ordering: head is "a" on equal starts
        a, b = ((hs, he), (ts, te)) if hs <= ts else ((ts, te), (hs, he))
        ref = _reference_gather(a, b, L, mt, 1)
        assert ref is not None and not r["skipped"], did
        (na, nb), gathered = ref
        assert (r["new_a_start"], r["new_a_end"]) == na, (did, r)
        assert (r["new_b_start"], r["new_b_end"]) == nb, (did, r)
        assert r["gathered_len"] == gathered, (did, r)
    # the ADVICE case specifically: spans keep their absolute positions
    df = spark.createDataFrame([(9, 100, 300, 105, 110, 400)], PAIR_SCHEMA)
    r = with_discontinuous_frames(df, 512, glue_len=1).collect()[0]
    assert (r["new_a_start"], r["new_a_end"]) == (100, 300)
    assert (r["new_b_start"], r["new_b_end"]) == (105, 110)
    assert r["gathered_len"] == 328


def test_gather_overlapping_arguments(spark):
    """Candidate args can overlap (inner distance 0); frames must merge and
    shifts must match the reference mask simulation."""
    cases = [
        (0, 4, 7, 5, 8, 20),    # partial overlap
        (1, 4, 6, 4, 7, 20),    # same start, different ends
        (2, 10, 12, 11, 12, 15) # nested-ish
    ]
    # clip widths to mpa=3: all above are <= 3 wide
    df = spark.createDataFrame(cases, PAIR_SCHEMA)
    out = {r["doc_id"]: r for r in with_discontinuous_frames(df, 8, glue_len=1).collect()}
    for (did, hs, he, ts, te, L) in cases:
        a, b = sorted([(hs, he), (ts, te)])
        ref = _reference_gather(a, b, L, 8, 1)
        assert ref is not None
        (na, nb), gathered = ref
        r = out[did]
        assert not r["skipped"]
        assert (r["new_a_start"], r["new_a_end"]) == na
        assert (r["new_b_start"], r["new_b_end"]) == nb
        assert r["gathered_len"] == gathered
