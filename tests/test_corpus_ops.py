"""Corpus-preparation operators: decontamination, TF-IDF, deterministic
stratified sampling, greedy sequence packing."""

import math

from pyspark.sql import functions as F

from pytorch_ie_spark.operators.corpus_ops import (
    ngram_contamination,
    pack_sequences,
    stratified_sample,
    tfidf_top_terms,
)


def test_contamination_flags_only_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words appear in here now"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps far away")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_contamination(
        corpus, bench, n=4).collect()}
    assert out[1]["contaminated"]  # shares 'the quick brown fox' etc.
    assert out[1]["n_hits"] >= 1
    assert not out[2]["contaminated"]
    assert out[2]["n_hits"] == 0
    assert out[2]["contamination_frac"] == 0.0


def test_tfidf_scores_and_ranking(spark):
    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["rank"]): r for r in tfidf_top_terms(
        docs, k=2).collect()}
    n = 3

    def idf(df):
        return math.log((n + 1) / (df + 1)) + 1

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert out[(1, 1)]["term"] == "apple"
    assert out[(1, 1)]["score"] == round(2 * idf(1), 6)
    assert out[(1, 2)]["term"] == "banana"
    assert out[(1, 2)]["score"] == round(1 * idf(2), 6)
    # doc 2: equal scores? banana df=2, cherry df=2, both tf=1 -> tie
    # broken by term (banana < cherry)
    assert out[(2, 1)]["term"] == "banana"
    assert out[(2, 2)]["term"] == "cherry"


def test_stratified_sample_deterministic_and_nested(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(500)],
        "doc_id long, lang string",
    )
    low = {r["doc_id"] for r in stratified_sample(
        docs, {"en": 0.2, "de": 0.1}).where("keep").collect()}
    # repartitioning must not change the decision
    low2 = {r["doc_id"] for r in stratified_sample(
        docs.repartition(7), {"en": 0.2, "de": 0.1}).where("keep").collect()}
    assert low == low2
    # raising rates keeps every previously sampled doc (nested samples)
    high = {r["doc_id"] for r in stratified_sample(
        docs, {"en": 0.6, "de": 0.5}).where("keep").collect()}
    assert low <= high
    # rates are roughly honored per stratum
    n_en = sum(1 for d in high if d % 2 == 0)
    assert 0.4 * 250 < n_en < 0.8 * 250
    # unknown stratum -> default_rate=0 -> dropped
    other = spark.createDataFrame([(1, "xx")], "doc_id long, lang string")
    assert stratified_sample(other, {"en": 1.0}).where("keep").count() == 0


def test_pack_sequences_matches_reference_fold(spark):
    # doc i has i*10 tokens
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(i * 10))) for i in range(1, 8)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(
        docs, budget_tokens=64, group_width=1000).collect()}

    # pure-python reference fold over ids in order
    bin_idx, fill = 0, None
    expect = {}
    for i in range(1, 8):
        n = i * 10
        if fill is None or fill + n > 64:
            bin_idx += 1
            fill = n
        else:
            fill += n
        expect[i] = (bin_idx, fill)
    for i, (b, f) in expect.items():
        assert (out[i]["bin_idx"], out[i]["bin_fill"]) == (b, f)
    # all docs landed in one group
    assert {r["group_id"] for r in out.values()} == {0}


def test_pack_oversize_doc_gets_own_bin(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(["x"] * 10)),
            (2, " ".join(["y"] * 100)),  # > budget: own bin
            (3, " ".join(["z"] * 10)),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(
        docs, budget_tokens=32, group_width=1000).collect()}
    assert out[1]["bin_idx"] == 1
    assert out[2]["bin_idx"] == 2 and out[2]["bin_fill"] == 100
    assert out[3]["bin_idx"] == 3  # the oversize bin is closed


def test_pack_groups_are_independent(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in (0, 1, 100, 101)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(
        docs, budget_tokens=1000, group_width=100).collect()}
    assert out[0]["group_id"] == 0 and out[100]["group_id"] == 1
    # packing restarts per group
    assert out[100]["bin_idx"] == 1 and out[100]["bin_fill"] == 10
    assert out[101]["bin_fill"] == 20


def test_boilerplate_fraction_flags_shared_grams(spark):
    from pytorch_ie_spark.operators.corpus_ops import boilerplate_fraction

    boiler = "all rights reserved no warranty of any kind"
    docs = spark.createDataFrame(
        [(i, f"{boiler} unique tail {i}") for i in range(5)]
        + [(10, "entirely novel words appear only here once")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in boilerplate_fraction(
        docs, n=4, min_docs=5).collect()}
    # the 5 boiler docs share every gram inside the boiler block
    assert out[0]["n_boiler_grams"] >= 4
    assert out[0]["boiler_frac"] > 0.3
    # the novel doc has zero corpus-frequent grams
    assert out[10]["n_boiler_grams"] == 0
    assert out[10]["boiler_frac"] == 0.0


def test_pack_fold_properties():
    """Hypothesis: the greedy fold's invariants hold for arbitrary inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pytorch_ie_spark.operators.corpus_ops import pack_fold

    @given(
        st.lists(st.integers(min_value=0, max_value=200), max_size=60),
        st.integers(min_value=1, max_value=120),
    )
    @settings(max_examples=200, deadline=None)
    def check(lengths, budget):
        out = pack_fold(lengths, budget)
        assert len(out) == len(lengths)
        prev_idx, prev_fill = 0, None
        for (idx, fill), n in zip(out, lengths):
            # bin indices advance by at most one and never go back
            assert idx in (prev_idx, prev_idx + 1)
            if idx == prev_idx:
                # same bin: fill accumulates and stays within budget
                assert fill == prev_fill + n and fill <= budget
            else:
                # new bin: starts with exactly this item; only oversize
                # items may exceed the budget, and then they sit alone
                assert fill == n
                assert n <= budget or True  # oversize allowed, alone
            prev_idx, prev_fill = idx, fill
        # bins partition the items and every bin's final fill is the sum
        # of its items
        sums: dict[int, int] = {}
        for (idx, _), n in zip(out, lengths):
            sums[idx] = sums.get(idx, 0) + n
        finals = {idx: fill for (idx, fill) in out}
        assert finals == {i: s for i, s in sums.items()}
        # no two consecutive bins could have been merged (greedy is tight):
        # the first item of bin k+1 did not fit into bin k
        firsts: dict[int, int] = {}
        for (idx, _), n in zip(out, lengths):
            firsts.setdefault(idx, n)
        for k in range(1, len(sums)):
            assert sums[k] + firsts[k + 1] > budget

    check()


def test_mixture_rates_hit_target_proportions(spark):
    from pytorch_ie_spark.operators.corpus_ops import mixture_rates

    # en: 1000 tokens, de: 100 tokens; target 50/50 -> de is scarcest
    docs = spark.createDataFrame(
        [(1, "en", " ".join(["w"] * 1000)), (2, "de", " ".join(["w"] * 100)),
         (3, "xx", "ignored untargeted stratum")],
        "doc_id long, lang string, text string",
    )
    out = {r["stratum"]: r for r in mixture_rates(
        docs, {"en": 0.5, "de": 0.5}).collect()}
    assert set(out) == {"en", "de"}  # untargeted stratum excluded
    assert out["de"]["rate"] == 1.0  # scarcest-vs-target keeps everything
    assert out["en"]["rate"] == 0.1  # downsampled to match
    assert out["en"]["expected_tokens"] == 100.0
    assert out["de"]["current_share"] == round(100 / 1100, 6)


def test_mixture_rates_compose_with_sampler(spark):
    from pytorch_ie_spark.operators.corpus_ops import (
        mixture_rates,
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i < 800 else "de", "w w w w") for i in range(1000)],
        "doc_id long, lang string, text string",
    )
    rates = {
        r["stratum"]: r["rate"]
    for r in mixture_rates(docs, {"en": 0.5, "de": 0.5}).collect()}
    kept = stratified_sample(docs, rates).where("keep")
    n = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    # post-sample counts approximately balanced (Bernoulli noise allowed)
    assert n["de"] == 200  # rate 1.0 keeps all
    assert 120 < n["en"] < 280  # ~200 expected at rate 0.25
