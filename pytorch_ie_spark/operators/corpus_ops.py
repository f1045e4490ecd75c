"""Corpus-preparation operators for large-scale training-data pipelines:
benchmark decontamination, TF-IDF keyword extraction, deterministic
stratified sampling, and greedy sequence packing.

These extend the reference's document-processing surface the way a 100 TB
pretraining pipeline needs (the dedup/similarity families live in
operators/dedup.py and operators/similarity.py):

  - decontamination is the standard eval-set n-gram overlap check
    (Brown et al. 2020 appendix C / Gao et al. 2021): the benchmark's
    n-gram index is tiny next to the corpus, so it broadcasts and the
    corpus-side cost is one scan + one map-side join,
  - TF-IDF runs as two keyed aggregations plus one broadcastable
    document-frequency join — no per-row Python,
  - sampling is hash-deterministic (re-runnable on any cluster layout:
    the keep decision depends only on doc id + salt, never on partitioning
    or row order),
  - packing is the greedy first-fit-in-order bin packer training loaders
    use to fill fixed token budgets; sequential within a shard by
    construction, parallel across shards (applyInPandas per group — the
    only per-row Python here, and the order-dependence is exactly why).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup import _distinct_grams, normalize_text


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_overlap: int = 1,
) -> DataFrame:
    """Per corpus document: overlap with the benchmark's token n-gram set.

    Returns (doc_id, n_grams, n_hits, contamination_frac, contaminated):
    a document is contaminated when >= `min_overlap` of its distinct
    n-grams appear anywhere in the benchmark — the decontamination rule
    applied before training. The benchmark gram index is deduplicated and
    BROADCAST (eval sets are thousands of docs; the corpus is the big
    side), so the corpus scan never shuffles on gram.
    """
    from ..plans.skew import ensure_parallelism

    # fan the scan out and pin: the sizes aggregation and the hit join
    # both read the corpus gram table
    grams = (
        _distinct_grams(
            ensure_parallelism(corpus), id_col, text_col, n, None
        )
        .drop("block")
        .localCheckpoint(eager=False)
    )
    bgrams = (
        _distinct_grams(benchmark, id_col, text_col, n, None)
        .select("gram")
        .dropDuplicates(["gram"])
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        grams.join(F.broadcast(bgrams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    out = sizes.join(hits, "doc_id", "left")
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        n_hits.alias("n_hits"),
        F.round(n_hits / F.col("n_grams"), 6).alias("contamination_frac"),
        (n_hits >= min_overlap).alias("contaminated"),
    )


def boilerplate_fraction(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_docs: int = 5,
) -> DataFrame:
    """Per document: the fraction of its distinct token n-grams that are
    corpus-frequent (appear in >= `min_docs` documents) — the standard
    boilerplate/template signal for corpus cleaning (license headers,
    navigation chrome, generated scaffolding score high).

    One map-side-combinable document-frequency aggregation; the frequent
    set joins back into the gram stream WITHOUT a forced broadcast: with
    an absolute `min_docs` on a billion-doc corpus the "frequent" set is
    most of natural language, not boilerplate-sized, and a forced
    broadcast of it is the scale-killer — the join is keyed on gram and
    AQE picks a broadcast at runtime only when the aggregated side is
    actually small. Returns (doc_id, n_grams, n_boiler_grams, boiler_frac).
    """
    from ..plans.skew import ensure_parallelism

    # fan the scan out and pin the gram table: the frequency aggregation,
    # the per-doc sizes, and the hit join all read it (3 explode passes
    # otherwise)
    grams = (
        _distinct_grams(
            ensure_parallelism(documents), id_col, text_col, n, None
        )
        .drop("block")
        .localCheckpoint(eager=False)
    )
    frequent = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= min_docs)
        .select("gram")
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        grams.join(frequent, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    out = sizes.join(hits, "doc_id", "left")
    n_boiler = F.coalesce(F.col("n_boiler"), F.lit(0)).cast("long")
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        n_boiler.alias("n_boiler_grams"),
        F.round(n_boiler / F.col("n_grams"), 6).alias("boiler_frac"),
    )


def tfidf_top_terms(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (idf = ln((N + 1) / (df + 1)) + 1, the sklearn smooth_idf formula),
    ties broken by term so ranking is total.

    Returns (doc_id, rank, term, tf, score). Two keyed aggregations (term
    counts per doc, document frequency per term) + one gram-keyed join +
    one per-doc top-k window. The document-frequency table is NOT force-
    broadcast: a web corpus's distinct-term vocabulary (typos, ids,
    hashes) is billions of rows, so the join is keyed and AQE upgrades it
    to a broadcast at runtime only when the aggregate is actually small.
    N is counted once on the driver — a single scalar, the one
    intentionally-bounded action here.
    """
    from ..plans.skew import ensure_parallelism

    toks = ensure_parallelism(documents).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "term"
        ),
    ).where(F.length("term") > 0)
    # pin: the df aggregation and the scored join both read tf
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_tbl = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = documents.select(F.col(id_col)).distinct().count()
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
    scored = tf.join(df_tbl, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(F.col("tf") * idf, 6).alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            "score",
        )
    )


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "lang",
    salt: str = "sample-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: a document is kept iff
    md5(id || '|' || salt)'s first 8 hex digits, as a fraction of 2^32,
    fall under its stratum's rate.

    The decision is a pure function of (id, salt) — independent of
    partitioning, task order, and cluster size, so a 100 TB sample is
    reproducible and composable (raising a stratum's rate keeps every
    previously sampled doc: nested samples for data-mixture ablations).
    Returns the input rows + (sample_u, keep).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col(id_col).cast("string"), F.lit(salt)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(2**32))
    )
    rate = None
    for stratum, r in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        rate = (
            F.when(cond, F.lit(float(r)))
            if rate is None
            else rate.when(cond, F.lit(float(r)))
        )
    rate = (
        rate.otherwise(F.lit(float(default_rate)))
        if rate is not None
        else F.lit(float(default_rate))
    )
    return documents.withColumn("sample_u", F.round(u, 9)).withColumn(
        "keep", F.col("sample_u") < rate
    )


def mixture_rates(
    documents: DataFrame,
    targets: dict[str, float],
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Static data-mixture rebalancing: per stratum, the Bernoulli sampling
    rate that makes post-sample token counts proportional to the target
    shares while keeping as many tokens as possible (the stratum that is
    scarcest relative to its target keeps rate 1.0; everything else is
    downsampled to match). rate_s = (min_u T_u/share_u) * share_s / T_s.

    Returns one row per TARGETED stratum:
      (stratum, current_tokens, current_share, target_share, rate,
       expected_tokens). Feed `rate` into stratified_sample for the
    deterministic keep decision. One map-side-combinable aggregation; the
    normalization window runs over the stratum-cardinality frame (tiny by
    definition), never over rows.
    """
    from pyspark.sql import Window as W

    targeted = sorted(targets)
    tok = documents.where(
        F.col(strata_col).isin(targeted)
    ).groupBy(F.col(strata_col).alias("stratum")).agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).cast("long").alias(
            "current_tokens"
        )
    )
    share = None
    for s in targeted:
        cond = F.col("stratum") == s
        share = (
            F.when(cond, F.lit(float(targets[s])))
            if share is None
            else share.when(cond, F.lit(float(targets[s])))
        )
    w = W.partitionBy()  # stratum-cardinality frame only
    scaled = tok.withColumn("target_share", share).withColumn(
        "_k",
        F.min(F.col("current_tokens") / F.col("target_share")).over(w),
    )
    total = F.sum("current_tokens").over(w)
    rate = F.round(
        F.col("_k") * F.col("target_share") / F.col("current_tokens"), 9
    )
    return scaled.select(
        "stratum",
        "current_tokens",
        F.round(F.col("current_tokens") / total, 6).alias("current_share"),
        F.col("target_share"),
        rate.alias("rate"),
        F.round(rate * F.col("current_tokens"), 3).alias(
            "expected_tokens"
        ),
    )


def pack_fold(lengths: list[int], budget: int) -> list[tuple[int, int]]:
    """The pure greedy first-fit fold: for each length, (1-based bin index,
    bin token count after this item). A new bin opens when the current one
    cannot take the item; an item longer than the budget occupies a bin
    alone. Property-tested in tests/test_corpus_ops.py."""
    out: list[tuple[int, int]] = []
    bin_idx, fill = 0, None
    for n in lengths:
        if fill is None or fill + n > budget:
            bin_idx += 1
            fill = n
        else:
            fill += n
        out.append((bin_idx, fill))
    return out


def pack_sequences(
    documents: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col=None,
    group_width: int = 100,
) -> DataFrame:
    """Greedy first-fit-in-order sequence packing into fixed token budgets
    (the training-loader example-packing step): within each group, docs
    are taken in id order and appended to the current bin while the bin's
    token count stays <= budget; otherwise a new bin starts. A document
    longer than the budget occupies a bin alone (truncation is the
    tokenizer stage's concern, not the packer's).

    Groups are the parallelism unit (default: doc_id div `group_width`,
    i.e. shard-sized slices of the id space; pass `group_col` for real
    shard ids). Packing is sequential WITHIN a group by definition — the
    running fill depends on every earlier doc — so this is applyInPandas
    per group: parallel across shards, imperative inside, the same shape
    a 10^12-doc loader uses.

    Returns (group_id, doc_id, n_tokens, bin_idx, bin_fill) where bin_idx
    is 1-based within the group and bin_fill is the bin's running token
    count AFTER this doc.
    """
    import pandas as pd

    gcol = (
        group_col
        if group_col is not None
        # integer DIV, not double /: id spaces past 2^53 would lose
        # precision in a float divide
        else F.expr(f"CAST({id_col} AS BIGINT) DIV {int(group_width)}")
    )
    base = documents.select(
        gcol.alias("group_id"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        idxs, fills = zip(
            *pack_fold([int(n) for n in pdf["n_tokens"]], budget_tokens)
        ) if len(pdf) else ((), ())
        pdf["bin_idx"] = list(idxs)
        pdf["bin_fill"] = list(fills)
        return pdf

    return base.groupBy("group_id").applyInPandas(
        pack,
        "group_id long, doc_id long, n_tokens long, bin_idx long, "
        "bin_fill long",
    )
