"""Adversarial-shape wall-clock evidence for the dedup family.

Builds a skewed variant of the synthetic corpus (one viral boilerplate
block shared by ~30% of documents — the license-header / template
mega-cluster every web corpus has) and measures, at the same input size:

  - MinHash-LSH pairs EXACT vs max_bucket-capped: wall time, pair count,
    and the dropped-bucket audit rows the cap writes,
  - n-gram Jaccard EXACT vs max_gram_freq-capped: wall time, pair count,
    and the dropped-gram audit rows.

The exact variants go quadratic in the mega-cluster (C(n_viral, 2) pairs);
the capped variants drop the degenerate buckets/grams inside the same
shuffle and stay bounded. Results are recorded in BASELINE.md.

Usage: python scripts/bench_dedup_skew.py [sf_dir]  (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

BOILER = (
    "all rights reserved this document is provided as is without warranty "
    "of any kind either express or implied including fitness for a "
    "particular purpose and noninfringement in no event shall the authors "
    "be liable for any claim damages or other liability"
)
VIRAL_MOD = 10  # doc_id % 10 < 3  ->  30% viral
VIRAL_HITS = 3
MAX_BUCKET = 1000
MAX_GRAM_FREQ = 1000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from pytorch_ie_spark.operators.dedup import (
        lsh_dropped_buckets,
        minhash_lsh_pairs,
        ngram_dropped_grams,
        ngram_jaccard_pairs,
    )
    from pytorch_ie_spark.session import get_spark

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    skewed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            F.col("doc_id") % VIRAL_MOD < VIRAL_HITS,
            # boilerplate dominates the shingle/gram set; a tiny unique tail
            # keeps the docs distinct (near- not exact-dups)
            F.concat(F.lit(BOILER + " tail "), F.col("doc_id").cast("string")),
        ).otherwise(F.col("text")).alias("text"),
    ).localCheckpoint()  # pin: measure the operators, not the synthesis
    n_docs = skewed.count()
    n_viral = skewed.where(F.col("doc_id") % VIRAL_MOD < VIRAL_HITS).count()

    def timed(fn):
        t0 = time.monotonic()
        out = fn()
        return out, round(time.monotonic() - t0, 2)

    results: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "n_viral": n_viral}

    mh_exact, t = timed(
        lambda: minhash_lsh_pairs(skewed, "doc_id", "text").count()
    )
    results["minhash_exact"] = {"pairs": mh_exact, "sec": t}
    mh_capped, t = timed(
        lambda: minhash_lsh_pairs(
            skewed, "doc_id", "text", max_bucket=MAX_BUCKET
        ).count()
    )
    audit = lsh_dropped_buckets(
        skewed, "doc_id", "text", max_bucket=MAX_BUCKET
    ).agg(
        F.count(F.lit(1)).alias("buckets"),
        F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("rows"),
    ).first()
    results["minhash_capped"] = {
        "pairs": mh_capped,
        "sec": t,
        "max_bucket": MAX_BUCKET,
        "dropped_buckets": audit["buckets"],
        "dropped_rows": int(audit["rows"]),
    }

    ng_exact, t = timed(
        lambda: ngram_jaccard_pairs(skewed, "doc_id", "text").count()
    )
    results["ngram_exact"] = {"pairs": ng_exact, "sec": t}
    ng_capped, t = timed(
        lambda: ngram_jaccard_pairs(
            skewed, "doc_id", "text", max_gram_freq=MAX_GRAM_FREQ
        ).count()
    )
    gaudit = ngram_dropped_grams(
        skewed, "doc_id", "text", max_gram_freq=MAX_GRAM_FREQ
    ).agg(
        F.count(F.lit(1)).alias("grams"),
        F.coalesce(F.sum("freq"), F.lit(0)).alias("rows"),
    ).first()
    results["ngram_capped"] = {
        "pairs": ng_capped,
        "sec": t,
        "max_gram_freq": MAX_GRAM_FREQ,
        "dropped_grams": gaudit["grams"],
        "dropped_rows": int(gaudit["rows"]),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
