#!/usr/bin/env python
"""Float32-cast equivalence evidence for the replay attach columns (r16,
guide §2.3 "narrower types — only when provably safe").

The session fold consumes ``q_vec``/``cand_vec`` in exactly one decision:
the topic gate ``sim < topic_similarity_threshold``.  Casting the two
vectors to float32 for the attach-join + session shuffle perturbs each
evaluated sim by at most ~2*2^-24 (the operands were float32 embeddings
to begin with; the float64 payload was just their re-normalization in
double, so the cast costs one rounding step per component).  This tool
measures the ACTUAL margin |sim - threshold| of every topic-gate
evaluation of the driver fixtures — the gate's 200-event replay and the
bench's 20k-event replay — at each SF, by running the fold DRIVER-SIDE
over the collected prepared rows with a recording ``np`` proxy.  The cast
is safe when min-margin >> 1e-6; the number is recorded in
OPTIMIZATION_r16.md.

Also prints a canonical hash of the full replay output so the same
invocation on the pre-change tree proves output identity directly.

Usage: python -m tools.replay_gate_margin [--events 20000]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark import caching
from vector_search_question_answer_api_spark.config import DEFAULT_CONFIG
from vector_search_question_answer_api_spark.operators import sessions as S
from vector_search_question_answer_api_spark.operators.index_build import build_index
from vector_search_question_answer_api_spark.session import get_spark
from vector_search_question_answer_api_spark.sources.tables import load_table


class _RecordingNP:
    """np proxy: records |dot - threshold| for every fold topic check."""

    def __init__(self, real, threshold: float):
        self._real = real
        self._thr = threshold
        self.margins: list[float] = []

    def dot(self, a, b):
        v = self._real.dot(a, b)
        self.margins.append(abs(float(v) - self._thr))
        return v

    def __getattr__(self, name):
        return getattr(self._real, name)


def _fixture(spark, sf_dir: str, n_events: int):
    docs = load_table(spark, sf_dir, "documents")
    index = build_index(docs).persist()
    n_docs = index.count()
    qa_events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < n_events)
        .select(
            "event_id",
            "ts",
            F.col("user_id").cast("string").alias("session_id"),
            ((F.col("event_id") * 13 + 1) % n_docs).alias("q_doc"),
        )
        .join(
            F.broadcast(
                docs.select(
                    F.col("doc_id").alias("q_doc"),
                    F.col("text").alias("question"),
                )
            ),
            "q_doc",
        )
        .select("event_id", "ts", "session_id", "question")
    )
    return index, qa_events


def _margins_and_hash(spark, sf_dir: str, n_events: int) -> dict:
    index, qa_events = _fixture(spark, sf_dir, n_events)
    with caching.cache_scope():
        prepared = S.prepare_qa_events(qa_events, index).collect()
    # driver-side fold with the recording proxy (same code, same rows)
    rec = _RecordingNP(np, DEFAULT_CONFIG.topic_similarity_threshold)
    real_np = S.np
    S.np = rec
    out_rows = []
    try:
        by_session: dict = {}
        for r in prepared:
            by_session.setdefault(r["session_id"], []).append(r.asDict())
        for sid in sorted(by_session):
            rows = sorted(
                by_session[sid], key=lambda r: (r["ts"], r["event_id"])
            )
            out, _ = S._fold_session_rows(rows, DEFAULT_CONFIG)
            for o in out:
                out_rows.append(
                    (
                        sid,
                        o["event_id"],
                        o["context_doc_id"],
                        o["context_changed"],
                        o["is_new_topic"],
                        o["used_fallback"],
                        o["answer"],
                        o["history_len"],
                        o["expired_before"],
                    )
                )
    finally:
        S.np = real_np
    canon = hashlib.sha256(
        "\n".join(repr(t) for t in sorted(out_rows)).encode()
    ).hexdigest()
    dist_margins = [
        abs(float(r["cand_dist"]) - DEFAULT_CONFIG.retrieval_max_distance)
        for r in prepared
        if r["cand_dist"] is not None
    ]
    index.unpersist()
    return {
        "events": len(prepared),
        "topic_checks": len(rec.margins),
        "min_sim_margin": min(rec.margins) if rec.margins else None,
        "min_dist_margin": min(dist_margins) if dist_margins else None,
        "fold_output_sha256": canon,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=20_000)
    args = ap.parse_args()
    spark = get_spark(app_name="replay_gate_margin")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        out[f"{sf}:gate200"] = _margins_and_hash(spark, sf_dir, 200)
        print(json.dumps({f"{sf}:gate200": out[f"{sf}:gate200"]}), flush=True)
    out["sf0.1:bench"] = _margins_and_hash(spark, "/root/testdata/sf0.1", args.events)
    print(json.dumps({"sf0.1:bench": out["sf0.1:bench"]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
