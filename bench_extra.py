"""Round-6 measurement harness (bench.py is frozen for the driver; this file
is the builder's instrument — guide §1.4 noop-sink isolation, §1.5 labels).

Usage:
  python bench_extra.py [query ...]          # time the named queries (all if none)
  python bench_extra.py --plans [query ...]  # also dump .explain("formatted")
                                             # to plans/r06/<query>_<tag>.txt
Env:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf1.0 — the driver's scale)
  SPARK_GRAFT_CPUS     (default 32)
  SPARK_GRAFT_BENCH_RUNS  best-of-N (default 2)
  PLAN_TAG             suffix for plan files (default "before")
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:]]
    dump_plans = "--plans" in args
    if dump_plans:
        args.remove("--plans")
    tag = os.environ.get("PLAN_TAG", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pytorch_ie_spark.queries import QUERIES
    from pytorch_ie_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cpus=cpus)
    names = args or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    os.makedirs("plans/r06", exist_ok=True)
    timings: dict[str, float] = {}

    def drop_persisted_blocks() -> None:
        try:
            for r in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                r.unpersist(False)
        except Exception:
            pass

    for name in names:
        fn, _oracle = QUERIES[name]
        if dump_plans:
            df = fn(spark, sf_dir)
            plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(plan)
            drop_persisted_blocks()
        best = None
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"{name}")
            t0 = time.monotonic()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            if best is None or dt < best:
                best = dt
            drop_persisted_blocks()
        timings[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", flush=True)

    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "runs": runs, "queries": timings}))


if __name__ == "__main__":
    main()
