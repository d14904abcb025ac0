"""Approx tier B: partitioned HNSW (SURVEY.md §2.4 V3/V4 "Approx tier B").

The reference holds ONE hnswlib graph in process memory
(services/index_service.py:87-96: cosine space, M=16, ef_construction=200,
search ef=50).  That design cannot shard; the Spark-native generalization
keeps the graph idea but makes it per-partition:

- BUILD: ``applyInPandas`` over hash-partitioned vectors builds one small
  HNSW graph per partition and emits it as a serialized binary row —
  the "index" is a table of (partition_id, graph_blob, ids).
- QUERY: broadcast the query matrix; each partition deserializes its graph
  once per task, answers top-k locally (graph walk, ef=50), and emits
  ≤ queries × k candidates; a global window merge keeps the true top-k —
  identical merge shape to ``knn_exact_partitioned``, so the shuffle is
  candidates-only, never the corpus.
- Recall: each partition answers exactly over its shard, so the merge loses
  nothing the per-partition graphs didn't; recall equals single-graph HNSW
  recall at the same ef.

Two interchangeable graph backends behind one surface (r5):

- ``numpy`` (always available): :class:`operators.hnsw_numpy.NumpyHNSW`,
  a from-scratch implementation of the HNSW algorithm itself —
  hierarchical layers, greedy descent, ef-bounded beam search,
  bidirectional M-links.  The tier is no longer environment-gated.
- ``hnswlib`` (optional fast path): the C++ library the reference vendors,
  used automatically when importable; tests assert both backends meet the
  same recall bar.
"""

from __future__ import annotations

import pickle
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.search import topk_per_query

try:  # pragma: no cover - not installed in this environment
    import hnswlib  # type: ignore

    HNSW_AVAILABLE = True
except ImportError:
    hnswlib = None
    HNSW_AVAILABLE = False


def _resolve_backend(backend: str | None) -> str:
    if backend is None:
        return "hnswlib" if HNSW_AVAILABLE else "numpy"
    if backend == "hnswlib" and not HNSW_AVAILABLE:
        raise NotImplementedError(
            "hnswlib is not installed; use backend='numpy' (the built-in "
            "HNSW implementation) or the LSH/IVF/PQ tiers"
        )
    if backend not in ("hnswlib", "numpy"):
        raise ValueError(f"unknown hnsw backend {backend!r}")
    return backend


def build_partitioned_hnsw(
    index: DataFrame,
    dim: int,
    m: int = 16,
    ef_construction: int = 200,
    vec_col: str = "norm_embedding",
    id_col: str = "doc_id",
    backend: str | None = None,
) -> DataFrame:
    """(n, graph): one serialized HNSW graph per partition.  Reference
    build constants preserved (M=16, ef_construction=200,
    services/index_service.py:89-92).  ``backend``: 'hnswlib' | 'numpy' |
    None (auto: hnswlib when importable, else the built-in numpy
    implementation)."""
    backend = _resolve_backend(backend)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list[int] = []
        mats: list[np.ndarray] = []
        for pdf in batches:
            if pdf.empty:
                continue
            ids.extend(int(x) for x in pdf[id_col])
            mats.append(np.array(list(pdf[vec_col]), dtype=np.float32))
        if not ids:
            return
        mat = np.vstack(mats)
        if backend == "hnswlib":
            g = hnswlib.Index(space="cosine", dim=dim)
            g.init_index(
                max_elements=len(ids), M=m, ef_construction=ef_construction
            )
            g.add_items(mat, np.asarray(ids, dtype=np.int64))
        else:
            from vector_search_question_answer_api_spark.operators.hnsw_numpy import (
                NumpyHNSW,
            )

            g = NumpyHNSW(dim, m=m, ef_construction=ef_construction)
            g.add_items(mat, np.asarray(ids, dtype=np.int64))
        yield pd.DataFrame(
            {
                "n": [len(ids)],
                "graph": [pickle.dumps(g)],
            }
        )

    return index.select(id_col, vec_col).mapInPandas(
        build, schema="n long, graph binary"
    )


def hnsw_topk(
    spark: SparkSession,
    graphs: DataFrame,
    queries: DataFrame,
    k: int = 3,
    ef: int = 50,
    query_vec_col: str = "qvec",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Per-partition graph walk + global candidate merge.  Search breadth
    ef=50 preserved from the reference (services/index_service.py:72).
    Works with graphs from either backend (the serialized object answers
    the same set_ef/knn_query/get_current_count surface)."""
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float32)

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["graph"]:
                g = pickle.loads(bytes(blob))
                g.set_ef(max(ef, k + 1))
                labels, dists = g.knn_query(q_mat, k=min(k, g.get_current_count()))
                out_q, out_id, out_d = [], [], []
                for qi in range(labels.shape[0]):
                    out_q.extend([q_ids[qi]] * labels.shape[1])
                    out_id.extend(labels[qi].tolist())
                    out_d.extend(dists[qi].tolist())
                yield pd.DataFrame(
                    {"query_id": out_q, "doc_id": out_id, "distance": out_d}
                )

    candidates = graphs.mapInPandas(
        search, schema="query_id long, doc_id long, distance double"
    )
    top = topk_per_query(candidates, k)
    return top.select(
        "query_id",
        "doc_id",
        "distance",
        (F.lit(1.0) - F.col("distance")).alias("score"),
        "rank",
    )
