#!/usr/bin/env python
"""Measure the sharded profile rebuild's cost-vs-churn curve (r14 —
VERDICT r13 missing #2 done-criterion: "rebuild cost scales with churn").

Fixture: the sf0.1 documents table replicated 8x with distinct doc_ids
(~40k docs) so the sketch work dominates the job floor, sharded 16 ways.
Measured: incremental ``rebuild_profile(n_shards=16, churned_ids=...)``
wall time at churn levels of 1 / 2 / 4 / 8 / 16 dirty shards, plus the
full unsharded one-shot rebuild for contrast, and the resulting
``recommended_profile_rebuild_every`` re-derived with the cheaper
(churn-sized) C — the cadence re-size the sharded rebuild buys.

Write the JSON line to ``measurements/r14_sharded_rebuild_curve.json``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.session import get_spark
from vector_search_question_answer_api_spark.sources.tables import load_table
from vector_search_question_answer_api_spark.streaming import stats_stream as STS

N_SHARDS = 16
N_ATTEMPTS = 3
REPS = 8


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sharded_rebuild_curve")
    root = tempfile.mkdtemp(prefix="shard_curve_")
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    docs = (
        base.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(REPS)]))
        )
        .select(
            (F.col("doc_id") * REPS + F.col("rep")).alias("doc_id"),
            "text",
            "n_chars",
        )
        .persist()
    )
    n = docs.count()
    sharded = docs.withColumn("shard", STS.profile_shard_expr(N_SHARDS))

    # ---- full passes: unsharded one-shot vs full sharded ---------------
    def _timed(f):
        runs = []
        for _ in range(N_ATTEMPTS):
            t0 = time.perf_counter()
            f()
            runs.append(round(time.perf_counter() - t0, 3))
        return min(runs), runs

    p_flat = f"{root}/prof_flat"
    STS.write_profile_batch(docs.limit(10), p_flat, 0)
    cov = [1]

    def flat():
        STS.rebuild_profile(spark, p_flat, docs, covered_up_to=cov[0])
        cov[0] += 1

    full_flat, flat_runs = _timed(flat)

    p_sh = f"{root}/prof_sh"
    STS.write_profile_batch(docs.limit(10), p_sh, 0)
    scov = [1]

    def full_sharded():
        STS.rebuild_profile(
            spark, p_sh, docs, covered_up_to=scov[0], n_shards=N_SHARDS
        )
        scov[0] += 1

    full_sh, full_sh_runs = _timed(full_sharded)

    # ---- incremental cost vs dirty-shard count --------------------------
    curve: dict[str, dict] = {}
    for n_dirty in (1, 2, 4, 8, 16):
        shards = list(range(n_dirty))
        churned = (
            sharded.filter(F.col("shard").isin(shards))
            .select("doc_id")
            .limit(40 * n_dirty)
        )

        def incr():
            STS.rebuild_profile(
                spark, p_sh, docs, covered_up_to=scov[0],
                n_shards=N_SHARDS, churned_ids=churned,
            )
            scov[0] += 1

        best, runs = _timed(incr)
        curve[str(n_dirty)] = {"sec": best, "runs": runs}
        print(json.dumps({f"dirty_{n_dirty}": curve[str(n_dirty)]}),
              flush=True)

    # cadence re-size: same read premium as r13's measured 0.0112 s/batch,
    # C now the 1-shard incremental cost instead of the full pass
    m_read = 0.01123
    rec = {
        f"r={r}": {
            "full_pass_C": STS.recommended_profile_rebuild_every(
                r, full_flat, m_read
            ),
            "one_shard_C": STS.recommended_profile_rebuild_every(
                r, curve["1"]["sec"], m_read
            ),
        }
        for r in (0.1, 1, 10)
    }
    out = {
        "metric": "sharded_rebuild_curve",
        "sf": sf_dir,
        "n_docs": int(n),
        "n_shards": N_SHARDS,
        "attempts": N_ATTEMPTS,
        "full_unsharded_sec": full_flat,
        "full_sharded_sec": full_sh,
        "incremental_sec_by_dirty_shards": curve,
        "read_premium_sec_per_batch": m_read,
        "recommended_profile_rebuild_every": rec,
    }
    print(json.dumps(out))
    docs.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
