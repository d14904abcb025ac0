"""Local mirror of the driver's t2 correctness gate: run every declared
query on Spark AND its DuckDB oracle over the same parquet tables, compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "|".join(_canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from vector_search_question_answer_api_spark.operators import dedup
    from vector_search_question_answer_api_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        spark_cols = df.columns
        spark_rows = [tuple(r) for r in df.collect()]
        dedup.unpersist_all()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:32s} rows={len(spark_rows):6d} (rows-only, no oracle) "
                  f"[{t_spark:.1f}s]")
            if not spark_rows:
                failures.append((name, "empty result"))
            continue
        t0 = time.time()
        rel = con.sql(oracles[name])
        duck_cols = [c for c in rel.columns]
        duck_rows = rel.fetchall()
        t_duck = time.time() - t0
        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols {spark_cols} vs {duck_cols}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        hs = value_hash(spark_cols, spark_rows)
        hd = value_hash(duck_cols, duck_rows)
        if hs != hd:
            problems.append(f"hash {hs} vs {hd}")
        status = "OK " if not problems else "FAIL"
        print(f"  {name:32s} {status} rows={len(spark_rows):6d} "
              f"[spark {t_spark:.1f}s, duck {t_duck:.2f}s]")
        if problems:
            failures.append((name, "; ".join(problems)))
            # show a few mismatching rows for debugging
            ss = set("|".join(_canon_cell(c) for c in r) for r in spark_rows)
            dd = set("|".join(_canon_cell(c) for c in r) for r in duck_rows)
            for x in list(ss - dd)[:3]:
                print(f"      spark-only: {x}")
            for x in list(dd - ss)[:3]:
                print(f"      duck-only:  {x}")
    spark.stop()
    if failures:
        print("\nFAILURES:")
        for n, p in failures:
            print(f"  {n}: {p}")
        return 1
    print("\nall parity checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
