#!/usr/bin/env python
"""Dump `.explain("formatted")` for every declared query to
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files
(the judge checks plan claims against these).

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] [query ...]
e.g.   python tools/dump_plans.py r15 before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])

    from vector_search_question_answer_api_spark import inventory
    from vector_search_question_answer_api_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    # Audit the primary production plan, not the twin-check wrapper
    # (same rationale as tools/explain_audit.py / bench.py).
    inventory.RUN_TWIN_CHECKS = False

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    jvm = spark.sparkContext._jvm
    for name, fn in inventory.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            txt = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n\n{txt}")
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
