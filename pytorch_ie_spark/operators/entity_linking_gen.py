"""GENRE-style generative entity linking: constrained beam decode over an
entity-candidate trie.

Reference analog: the GENRE model family (src/pytorch_ie/models/genre/) and
the prefix-constrained decode machinery the reference uses for generative
heads (taskmodules/pointer_network/logits_processor.py:9-57
PrefixConstrainedLogitsProcessorWithMaximum — at every generation step the
allowed-token set is computed from the prefix, everything else is masked to
-inf, and an EMPTY allowed set raises). Here the allowed-set function is an
entity-name trie (De Cao et al. 2021, "Autoregressive Entity Retrieval"):
at each step the decoder may only emit a child of the current trie node, or
EOS when the node is a complete entity name.

No torch in the container, so the per-step scorer is a deterministic md5
mock — score(key, prefix, candidate) = int(md5(key|prefix|cand)[:8],16) %
1000 — but the DECODER is the real algorithm: beam search where the
candidate set at every step is trie-constrained BEFORE scoring (an
out-of-trie token can never be emitted no matter its score). Greedy
(beam_size=1) decode is step-unrollable in SQL, which gives the stage a
DuckDB oracle; wider beams are equality-tested against brute-force path
enumeration in tests/test_entity_linking_gen.py.

Scale shape: the trie is built once from the KB on the driver and shipped
inside the (name, config) model spec — a broadcast dictionary, the GENRE
candidate-trie pattern; the decode itself is a shuffle-free mapInPandas
over the mention table.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .models import register_model, resolve_model

EOS = "</s>"

#: canonical entity names over the synthetic-corpus vocabulary; shared
#: prefixes ("spark" / "spark sql" / ..., "sort" / "sort merge") make the
#: terminal-vs-continue choice real at several nodes
ENTITY_KB = [
    "spark",
    "spark sql",
    "spark structured streaming",
    "hash join",
    "hash aggregate",
    "merge join",
    "merge sort buffer",
    "sort",
    "sort merge",
    "scan",
    "filter pushdown",
    "customer support",
    "supplier",
]

class EntityTrie:
    """Prefix trie over tokenized entity names. `allowed(prefix)` is the
    reference's prefix_allowed_tokens_fn: trie children of the prefix, plus
    EOS when the prefix is itself a complete name; empty -> ValueError
    (logits_processor.py:44-50)."""

    def __init__(self, names: list[str]):
        self.root: dict = {}
        for name in names:
            node = self.root
            for tok in name.split(" "):
                node = node.setdefault(tok, {})
            node[EOS] = None  # terminal marker

    def _node(self, prefix: list[str]) -> dict | None:
        node = self.root
        for tok in prefix:
            nxt = node.get(tok)
            if not isinstance(nxt, dict):
                return None
            node = nxt
        return node

    def allowed(self, prefix: list[str]) -> list[str]:
        node = self._node(prefix)
        cands = sorted(node.keys()) if node else []
        if not cands:
            raise ValueError(
                f"no allowed continuation for prefix {prefix!r} — the decode "
                "left the candidate trie (constraint bug)"
            )
        return cands


def md5_step_score(key: str, prefix: list[str], cand: str) -> int:
    """Deterministic mock per-step logit, identical arithmetic in DuckDB:
    ('0x' || substr(md5(key || '|' || prefix || '|' || cand), 1, 8)) % 1000."""
    import hashlib

    raw = f"{key}|{' '.join(prefix)}|{cand}"
    return int(hashlib.md5(raw.encode()).hexdigest()[:8], 16) % 1000


def constrained_greedy_decode(
    key: str,
    trie: EntityTrie,
    max_steps: int = 8,
    score_fn: Callable[[str, list[str], str], int] = md5_step_score,
) -> tuple[str, int]:
    """Strict greedy decode (the num_beams=1 semantics of HF generate):
    at every step take the argmax over the trie-allowed candidates (EOS
    included); emitting EOS ends the decode. Ties break toward the
    lexicographically smaller candidate. Always terminates: at a trie leaf
    the only allowed candidate is EOS. This is the variant the step-unrolled
    DuckDB oracle reproduces."""
    prefix: list[str] = []
    total = 0
    for _ in range(max_steps):
        best_cand, best_sc = None, None
        for cand in trie.allowed(prefix):  # sorted -> lexicographic ties
            sc = score_fn(key, prefix, cand)
            if best_sc is None or sc > best_sc:
                best_cand, best_sc = cand, sc
        total += best_sc
        if best_cand == EOS:
            return " ".join(prefix), total
        prefix.append(best_cand)
    raise ValueError(f"greedy decode for {key!r} exceeded max_steps")


def constrained_beam_decode(
    key: str,
    trie: EntityTrie,
    beam_size: int = 1,
    max_steps: int = 8,
    score_fn: Callable[[str, list[str], str], int] = md5_step_score,
) -> tuple[str, int]:
    """Beam search where ONLY trie-allowed continuations are ever scored.

    Returns (entity_name, total_score) of the best FINISHED beam: the path
    maximizing the sum of step scores including the terminal EOS step.
    Ties break toward the lexicographically smaller token sequence (the
    deterministic analog of the reference's stable argmax)."""
    beams: list[tuple[list[str], int]] = [([], 0)]
    finished: list[tuple[int, tuple, str]] = []
    for _ in range(max_steps):
        if not beams:
            break
        expansions: list[tuple[int, tuple, list[str]]] = []
        for prefix, total in beams:
            for cand in trie.allowed(prefix):
                sc = total + score_fn(key, prefix, cand)
                if cand == EOS:
                    finished.append((sc, tuple(prefix), " ".join(prefix)))
                else:
                    expansions.append((sc, tuple(prefix + [cand]), prefix + [cand]))
        expansions.sort(key=lambda e: (-e[0], e[1]))
        beams = [(toks, sc) for sc, _key, toks in expansions[:beam_size]]
    if not finished:
        raise ValueError(f"decode for {key!r} exhausted max_steps unfinished")
    finished.sort(key=lambda e: (-e[0], e[1]))
    return finished[0][2], finished[0][0]


@register_model("genre_linker")
class GenreLinkerModel:
    """Generative linker resolved through the same per-worker model seam as
    every other model: the KB rides in the config (broadcast-dict pattern),
    the trie is built once per python worker."""

    def __init__(self, kb: list[str] | None = None, beam_size: int = 1):
        self.kb = list(kb) if kb else list(ENTITY_KB)
        self.trie = EntityTrie(self.kb)
        self.beam_size = int(beam_size)

    def predict_entities(self, keys: list[str]) -> list[tuple[str, int]]:
        if self.beam_size == 1:
            return [constrained_greedy_decode(k, self.trie) for k in keys]
        return [
            constrained_beam_decode(k, self.trie, self.beam_size) for k in keys
        ]


def link_entities_generative(
    mentions: DataFrame,
    kb: list[str] | None = None,
    beam_size: int = 1,
    model_name: str = "genre_linker",
    id_col: str | None = None,
) -> DataFrame:
    """Mentions (doc_id, start, surface [, id_col]) -> generated canonical
    entity.

    The decode key is surface#doc_id#start so distinct mentions condition
    the scorer differently (the mention-context analog of GENRE's encoder
    conditioning). `id_col` (e.g. mention_id) is carried through untouched
    so the result joins back to annotation layers without re-keying. The
    output schema mirrors the input's doc_id/start types (long in the
    synthetic bench tables, string in the pipeline's path-based doc ids)."""
    cols = ["doc_id", "start", "surface"] + ([id_col] if id_col else [])
    selected = mentions.select(*cols)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in selected.schema.fields
    ) + ", entity string, gen_score long"

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the python worker unpickles this closure with operators.models
        # imported but NOT this module — import it so @register_model has
        # run before the registry lookup
        import pytorch_ie_spark.operators.entity_linking_gen  # noqa: F401

        model = resolve_model(
            model_name, {"kb": kb or ENTITY_KB, "beam_size": beam_size}
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = [
                f"{s}#{d}#{st}"
                for s, d, st in zip(pdf["surface"], pdf["doc_id"], pdf["start"])
            ]
            decoded = model.predict_entities(keys)
            out = pdf.copy()
            out["entity"] = [e for e, _ in decoded]
            out["gen_score"] = [s for _, s in decoded]
            yield out

    return selected.mapInPandas(stage, schema=out_schema)


def trie_edges(kb: list[str]) -> list[tuple[str, str]]:
    """(prefix-string, next-token) edge list of the KB trie, EOS edges
    included — the flat form the SQL oracle consumes as a VALUES list."""
    edges: set[tuple[str, str]] = set()
    for name in kb:
        toks = name.split(" ")
        for i in range(len(toks)):
            edges.add((" ".join(toks[:i]), toks[i]))
        edges.add((name, EOS))
    return sorted(edges)
