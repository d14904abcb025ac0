#!/usr/bin/env python
"""Measure the tombstone-mass trade-off behind the incremental graph
refresh's ``max_dead_frac`` backstop (r13): dead nodes stay in the link
structure as traversal connectors, so they cost WALK TIME (the beam
traverses them without counting them toward the ef result budget) but
never recall — in fact recall RISES slightly with dead mass, because
each live result forces a wider explored frontier.  The backstop is
therefore purely a walk-efficiency bound; this probe measures the
premium curve that justifies the 0.2 default (≈ +30% walk time at the
threshold).  Pure python/numpy — no Spark session.  Write the JSON line
to ``measurements/r13_dead_frac_curve.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_search_question_answer_api_spark.operators.hnsw_numpy import (
    NumpyHNSW,
)

N, DIM, Q, K, EF = 2000, 64, 200, 5, 50
FRACS = (0.0, 0.05, 0.1, 0.2, 0.3, 0.5)
ATTEMPTS = 3


def main() -> None:
    rng = np.random.RandomState(3)
    mat = rng.standard_normal((N, DIM))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    qs = rng.standard_normal((Q, DIM))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    def exact_sets(live_mask):
        d = 1.0 - mat[live_mask] @ qs.T
        labs = np.arange(N)[live_mask]
        return [
            set(labs[np.argsort(d[:, c], kind="stable")[:K]])
            for c in range(Q)
        ]

    rows = {}
    base = None
    for frac in FRACS:
        g = NumpyHNSW(DIM)
        g.add_items(mat, np.arange(N))
        n_dead = int(N * frac)
        dead = (
            rng.choice(N, size=n_dead, replace=False) if n_dead else []
        )
        for lab in dead:
            g.mark_deleted(int(lab))
        live_mask = np.ones(N, bool)
        live_mask[list(dead)] = False
        runs = []
        for _ in range(ATTEMPTS):
            t0 = time.perf_counter()
            L, _D = g.knn_query(qs, k=K, ef=EF)
            runs.append(time.perf_counter() - t0)
        ex = exact_sets(live_mask)
        hits = sum(
            len(set(int(x) for x in L[i] if x >= 0) & ex[i])
            for i in range(Q)
        )
        sec = min(runs)
        if frac == 0.0:
            base = sec
        rows[str(frac)] = {
            "walk_sec": round(sec, 3),
            "walk_premium": round(sec / base - 1.0, 3),
            "recall_at_k": round(hits / (Q * K), 4),
        }
    print(
        json.dumps(
            {
                "metric": "dead_frac_curve",
                "n": N, "dim": DIM, "queries": Q, "k": K, "ef": EF,
                "attempts": ATTEMPTS,
                "by_dead_frac": rows,
                "note": "dead connectors cost walk time ~linearly and "
                "never recall (it rises with dead mass — wider frontier "
                "per live result); max_dead_frac=0.2 caps the premium at "
                "~+30% before a cell-local rebuild resets it",
            }
        )
    )


if __name__ == "__main__":
    main()
