#!/usr/bin/env python
"""Materialize the realistic-geometry 384-dim embedding fixture as a
checked-in parquet (VERDICT r8 #5, sandbox-compatible half-step).

Real sentence-transformer embeddings cannot be produced in this
environment (no model weights, no network); the r8 ask — "a frozen
fixture of REAL embeddings generated out-of-band" — therefore ships as
two pieces:

1. this SYNTHETIC stand-in at the real model shape (384-dim, the
   all-MiniLM-L6-v2 width the reference loads,
   services/embedding_service.py:7-10), reproducing the published
   geometric properties of ST embeddings — low intrinsic dimension,
   Zipf-sized topic clusters, anisotropic spread, outliers, and 10%
   near-duplicate pairs — frozen at tests/fixtures/ so the recall audit
   and sizing rules run against a FIXED artifact (not a generator that
   could drift);
2. the ``tools/recall_audit.py --fixture path`` seam, which audits ANY
   external embeddings parquet (vec_id long, embedding array<float>)
   the moment a real-model fixture is supplied out-of-band.

The math here is IDENTICAL to recall_audit._realistic_384 (same RNG,
same seed): regenerating this file is byte-stable.

Usage::

    python -m tools.make_realistic_fixture [--out tests/fixtures/realistic_embeddings_384.parquet]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def generate(n=2000, dim=384, n_modes=40, seed=29) -> np.ndarray:
    rng = np.random.RandomState(seed)
    basis = np.linalg.qr(rng.standard_normal((dim, 16)))[0]
    cents = (rng.standard_normal((n_modes, 16)) @ basis.T
             + 0.05 * rng.standard_normal((n_modes, dim)))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    weights = 1.0 / np.arange(1, n_modes + 1)
    n_base = n - n // 10
    assign = rng.choice(n_modes, size=n_base, p=weights / weights.sum())
    scales = 0.05 + 0.2 * rng.rand(n_modes)
    pts = cents[assign] + scales[assign][:, None] * rng.standard_normal(
        (n_base, dim)
    )
    out = rng.rand(n_base) < 0.05
    pts[out] = rng.standard_normal((int(out.sum()), dim))
    dup_src = rng.choice(n_base, size=n - n_base, replace=False)
    dups = pts[dup_src] + 0.01 * rng.standard_normal((n - n_base, dim))
    pts = np.vstack([pts, dups])
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts[rng.permutation(n)].astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "fixtures", "realistic_embeddings_384.parquet",
        ),
    )
    args = ap.parse_args()
    pts = generate()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    table = pa.table({
        "vec_id": pa.array(range(len(pts)), pa.int64()),
        "embedding": pa.array(
            [row.tolist() for row in pts], pa.list_(pa.float32())
        ),
    })
    pq.write_table(table, args.out, compression="zstd")
    print(args.out, os.path.getsize(args.out), "bytes,", len(pts), "rows")


if __name__ == "__main__":
    main()
