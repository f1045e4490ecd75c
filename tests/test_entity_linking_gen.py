"""GENRE-style trie-constrained generative linking (reference models/genre/,
pointer_network/logits_processor.py:9-57)."""

import pytest

from pytorch_ie_spark.operators.entity_linking_gen import (
    ENTITY_KB,
    EOS,
    EntityTrie,
    constrained_beam_decode,
    constrained_greedy_decode,
    link_entities_generative,
    md5_step_score,
    trie_edges,
)


def path_score(key, name):
    """Brute-force total score of one full entity path (EOS step included)."""
    toks = name.split(" ")
    total = 0
    for i, t in enumerate(toks):
        total += md5_step_score(key, toks[:i], t)
    return total + md5_step_score(key, toks, EOS)


def test_trie_allowed_children_and_terminals():
    trie = EntityTrie(ENTITY_KB)
    assert trie.allowed([]) == sorted(
        {n.split(" ")[0] for n in ENTITY_KB}
    )
    # 'spark' is both terminal and a prefix: EOS plus continuations
    assert trie.allowed(["spark"]) == [EOS, "sql", "structured"]
    # leaf: EOS only
    assert trie.allowed(["merge", "sort", "buffer"]) == [EOS]


def test_allowed_raises_off_trie():
    trie = EntityTrie(ENTITY_KB)
    with pytest.raises(ValueError, match="left the candidate trie"):
        trie.allowed(["not", "a", "prefix"])


def test_adversarial_prefix_never_escapes_trie():
    """A scorer that hugely rewards an out-of-trie token must not break the
    constraint: candidates are masked BEFORE scoring (logits_processor
    semantics), so the poison token is never emitted."""
    trie = EntityTrie(["spark sql", "spark streaming"])

    def poison(key, prefix, cand):
        if cand == "POISON":
            return 10**9
        return md5_step_score(key, prefix, cand)

    for key in ("k1", "k2", "adversary"):
        entity, _ = constrained_greedy_decode(trie=trie, key=key, score_fn=poison)
        assert entity in ("spark sql", "spark streaming")
        entity_b, _ = constrained_beam_decode(
            trie=trie, key=key, beam_size=3, score_fn=poison
        )
        assert entity_b in ("spark sql", "spark streaming")


def test_greedy_always_emits_kb_entity():
    trie = EntityTrie(ENTITY_KB)
    for i in range(200):
        entity, score = constrained_greedy_decode(f"key{i}", trie)
        assert entity in ENTITY_KB
        assert score > 0


def test_wide_beam_equals_brute_force_argmax():
    """With beam_size >= |KB| the set-aside-EOS beam search is exact: it
    returns the full path maximizing the total step score."""
    trie = EntityTrie(ENTITY_KB)
    greedy_differs = 0
    for i in range(120):
        key = f"bkey{i}"
        best = max(ENTITY_KB, key=lambda n: (path_score(key, n), [-ord(c) for c in n]))
        entity, score = constrained_beam_decode(
            key, trie, beam_size=len(ENTITY_KB) + 1
        )
        assert entity == best
        assert score == path_score(key, best)
        if constrained_greedy_decode(key, trie)[0] != best:
            greedy_differs += 1
    # the beam must actually matter on this KB: greedy commits to the best
    # first token and cannot recover, exact search sometimes disagrees
    assert greedy_differs > 0


def test_link_entities_generative_spark(spark):
    mentions = spark.createDataFrame(
        [(1, 0, "spark"), (1, 10, "join"), (2, 5, "merge")],
        "doc_id long, start long, surface string",
    )
    rows = link_entities_generative(mentions, kb=ENTITY_KB).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["entity"] in ENTITY_KB
        # matches the driver-side greedy decode exactly
        key = f"{r['surface']}#{r['doc_id']}#{r['start']}"
        ent, sc = constrained_greedy_decode(key, EntityTrie(ENTITY_KB))
        assert (r["entity"], r["gen_score"]) == (ent, sc)


def test_trie_edges_flat_form():
    edges = dict()
    for p, n in trie_edges(["a b", "a"]):
        edges.setdefault(p, []).append(n)
    assert edges == {"": ["a"], "a": [EOS, "b"], "a b": [EOS]}
