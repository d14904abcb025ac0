"""sources/horizon.py — the shared fold-horizon protocol (pure file IO)."""

from __future__ import annotations

import os

from vector_search_question_answer_api_spark.sources.horizon import (
    batch_id_of,
    read_horizon,
    stamp_horizon,
)


def test_roundtrip_and_atomicity(tmp_path):
    p = str(tmp_path)
    assert read_horizon(p, "H") is None
    stamp_horizon(p, "H", 7)
    assert read_horizon(p, "H") == 7
    stamp_horizon(p, "H", 9)  # overwrite, atomic replace
    assert read_horizon(p, "H") == 9
    # no tmp residue after a clean stamp
    assert not [f for f in os.listdir(p) if f.endswith(".tmp")]


def test_batch_id_of_parses_log_dirs():
    assert batch_id_of("/a/b/postings_log/batch=42") == 42
    assert batch_id_of("batch=0") == 0
