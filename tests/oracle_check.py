"""Mini-driver: run every queries() entry on Spark AND its DuckDB oracle,
compare row count, column names, and an order-insensitive value hash —
the same comparison shape the grading driver applies at sf0.01.

Usage: python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd


def norm_cell(v):
    if v is None or v != v:  # NaN
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = ["|".join(norm_cell(r[c]) for c in cols) for _, r in pdf[cols].iterrows()]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    sys.path.insert(0, ".")
    from pytorch_ie_spark.queries import QUERIES
    from pytorch_ie_spark.session import get_spark
    from pytorch_ie_spark.sources.readers import TABLES

    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_fail = 0
    record: dict[str, dict] = {}
    for name, (fn, oracle) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            record[name] = {"status": "spark_error"}
            n_fail += 1
            continue
        if oracle is None:
            print(f"OK*   {name}: rows={len(spark_pdf)} (no oracle, rows-only)")
            record[name] = {"status": "rows_only", "rows": len(spark_pdf)}
            continue
        try:
            duck_pdf = con.sql(oracle).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            record[name] = {"status": "duckdb_error"}
            n_fail += 1
            continue
        problems = []
        if len(spark_pdf) != len(duck_pdf):
            problems.append(f"rows {len(spark_pdf)} vs {len(duck_pdf)}")
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            problems.append(
                f"cols {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
            )
        if not problems:
            h1, h2 = frame_hash(spark_pdf), frame_hash(duck_pdf)
            if h1 != h2:
                problems.append("value-hash mismatch")
                # show first differing rows for debugging
                cols = sorted(spark_pdf.columns)
                a = set(
                    "|".join(norm_cell(r[c]) for c in cols)
                    for _, r in spark_pdf[cols].iterrows()
                )
                b = set(
                    "|".join(norm_cell(r[c]) for c in cols)
                    for _, r in duck_pdf[cols].iterrows()
                )
                only_a = list(a - b)[:3]
                only_b = list(b - a)[:3]
                problems.append(f"spark-only={only_a} duck-only={only_b}")
        if problems:
            print(f"MISMATCH {name}: " + "; ".join(problems))
            record[name] = {"status": "mismatch", "detail": problems[:1]}
            n_fail += 1
        else:
            print(f"OK    {name}: rows={len(spark_pdf)}")
            record[name] = {
                "status": "ok",
                "rows": len(spark_pdf),
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
            }
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_fail": n_fail, "queries": record},
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
