"""Engine configuration — the reference's tuning constants as explicit config.

Every constant cites where the reference hard-codes it (see BASELINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # Top-k bounds: k in [1, 20], default 3 (reference
    # controllers/search_controller.py:13).
    default_k: int = 3
    max_k: int = 20

    # Retrieval accept gate: cosine distance < 0.4, i.e. similarity > 0.6
    # (reference services/qa_service.py:157). Strict '<'.
    retrieval_max_distance: float = 0.4

    # Topic-switch gate: cosine similarity < 0.75 triggers re-retrieval
    # (reference services/qa_service.py:8, 189). Strict '<'.
    topic_similarity_threshold: float = 0.75

    # Query length cap (reference controllers/search_controller.py:22).
    max_query_chars: int = 500

    # Session semantics (reference utils/session_manager.py:9, 43-44).
    session_ttl_minutes: int = 30
    history_max_exchanges: int = 5

    # QA retrieval depth (reference services/qa_service.py:154).
    qa_retrieval_k: int = 1

    # Deterministic test embedder dimensionality — matches the driver's
    # embeddings.parquet (64-dim float vectors).
    embedding_dim: int = 64

    # Generic fallback context when retrieval yields nothing
    # (reference services/qa_service.py:67-73).
    fallback_context: str = "No specific product information is available."


DEFAULT_CONFIG = EngineConfig()
