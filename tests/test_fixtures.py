"""The frozen realistic-geometry embedding fixture (tools/
make_realistic_fixture.py): shape, determinism, and the geometric
properties the recall audit depends on."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "realistic_embeddings_384.parquet",
)


def _load() -> np.ndarray:
    t = pq.read_table(FIXTURE)
    assert t.column_names == ["vec_id", "embedding"]
    ids = t.column("vec_id").to_numpy()
    assert list(ids) == list(range(2000))
    return np.array(t.column("embedding").to_pylist(), dtype=np.float32)


def test_fixture_shape_and_norms():
    pts = _load()
    assert pts.shape == (2000, 384)
    norms = np.linalg.norm(pts, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_fixture_matches_generator():
    """Regenerating via the documented generator is value-stable — the
    checked-in artifact IS the generator's output (same RNG, seed 29)."""
    from tools.make_realistic_fixture import generate

    assert np.allclose(_load(), generate(), atol=1e-6)


def test_fixture_has_near_dup_tail():
    """10% of rows are near-duplicates (cos > 0.99 to some other row) —
    the property that stresses refine/ef at small k and that the other
    synthetic fixtures lack."""
    pts = _load().astype(np.float64)
    sims = pts @ pts.T
    np.fill_diagonal(sims, -1.0)
    near_dup = (sims.max(axis=1) > 0.99).sum()
    assert near_dup >= 2 * (len(pts) // 10)  # each pair flags both ends
