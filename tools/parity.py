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


def value_hash(pdf) -> str:
    """Order-insensitive hash of a pandas DataFrame, mirroring the driver's
    canonicalization: columns reordered by name, rows sorted by every
    column via DataFrame.sort_values, cells stringified dtype-faithfully.

    Going through pandas on purpose reproduces two driver-visible hazards
    the raw-row path used to hide: array cells make sort_values raise
    TypeError (unhashable list), and DuckDB HUGEINT sums arrive as float64
    so an un-cast oracle ``sum(BIGINT)`` hashes as ``99111.0`` against
    Spark's ``99111``."""
    import math

    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    h = hashlib.sha256()
    for row in pdf.itertuples(index=False, name=None):
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append("NULL" if v is None else "NaN")
            else:
                cells.append(_canon_cell(v))
        h.update("|".join(cells).encode("utf-8"))
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
        pdf_s = df.toPandas()
        dedup.unpersist_all()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:32s} rows={len(pdf_s):6d} (rows-only, no oracle) "
                  f"[{t_spark:.1f}s]")
            if not len(pdf_s):
                failures.append((name, "empty result"))
            continue
        t0 = time.time()
        pdf_d = con.sql(oracles[name]).df()
        t_duck = time.time() - t0
        problems = []
        if sorted(pdf_s.columns) != sorted(pdf_d.columns):
            problems.append(f"cols {list(pdf_s.columns)} vs {list(pdf_d.columns)}")
        if len(pdf_s) != len(pdf_d):
            problems.append(f"rowcount {len(pdf_s)} vs {len(pdf_d)}")
        try:
            hs = value_hash(pdf_s)
            hd = value_hash(pdf_d)
            if hs != hd:
                problems.append(f"hash {hs} vs {hd}")
        except TypeError as exc:  # the driver dies the same way on array cells
            problems.append(f"canonicalization error: {exc}")
        status = "OK " if not problems else "FAIL"
        print(f"  {name:32s} {status} rows={len(pdf_s):6d} "
              f"[spark {t_spark:.1f}s, duck {t_duck:.2f}s]")
        if problems:
            failures.append((name, "; ".join(problems)))
            # show a few mismatching rows for debugging
            ss = set(
                "|".join(_canon_cell(c) for c in r)
                for r in pdf_s.itertuples(index=False, name=None)
            )
            dd = set(
                "|".join(_canon_cell(c) for c in r)
                for r in pdf_d.itertuples(index=False, name=None)
            )
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
