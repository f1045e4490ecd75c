"""Benchmark harness: runs the KG pipeline + the full query suite and prints
ONE JSON line:

  {"metric": "suite_wall_seconds", "value": <total>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>,
   "kg_triples": N, "triples_per_sec": T, "cpus": C}

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] threads (default 32)

Scaling-efficiency evidence (BASELINE.md): run twice —
  SPARK_GRAFT_CPUS=8 python bench.py
  SPARK_GRAFT_CPUS=32 python bench.py
and compare triples_per_sec (efficiency = (T32/T8)/4).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pytorch_ie_spark.pipeline import KgPipelineConfig, run_kg_pipeline
    from pytorch_ie_spark.queries import QUERIES
    from pytorch_ie_spark.session import get_spark
    from pytorch_ie_spark.sources.readers import source_files_from_documents

    from pytorch_ie_spark.operators.extract import extract_triples_fused, fused_triples
    from pytorch_ie_spark.sources.readers import documents_from_source_files

    spark = get_spark(app_name="bench", cpus=cpus)
    timings: dict[str, float] = {}

    # full staged pipeline (materialized layers + canonicalization)
    t0 = time.monotonic()
    src = source_files_from_documents(spark, sf_dir)
    cfg = KgPipelineConfig(
        ner_model="gazetteer_ner",
        re_model="cooccurrence_re",
        max_candidate_distance=40,
        canonicalize=True,
    )
    n_triples = run_kg_pipeline(spark, src, cfg).count()
    timings["kg_pipeline"] = round(time.monotonic() - t0, 3)

    # headline throughput: the fused single-pass extractor
    t0 = time.monotonic()
    docs = documents_from_source_files(src)
    n_fused = fused_triples(
        extract_triples_fused(
            docs,
            ner_model="gazetteer_ner",
            re_model="cooccurrence_re",
            max_distance=40,
        )
    ).count()
    kg_time = time.monotonic() - t0
    timings["kg_extract_fused"] = round(kg_time, 3)

    for name, (fn, _oracle) in QUERIES.items():
        t0 = time.monotonic()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            # noop sink unavailable -> fall back to count()
            fn(spark, sf_dir).count()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
                "kg_triples": n_triples,
                "triples_per_sec": round(n_fused / kg_time, 2) if kg_time else None,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
