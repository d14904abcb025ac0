"""ANN quality monitoring: distributed recall@k of an approximate top-k
relation against an exact one.

The approximate tiers (LSH `operators/ann.py`, IVF `operators/ivf.py`, PQ
`operators/pq.py`) trade recall for pruning, and their recall depends on
the CORPUS GEOMETRY — a parameter set validated on yesterday's data can
silently degrade after an embedding-model change or a domain shift.  The
production guard is cheap: run the exact kNN for a small query SAMPLE next
to the approximate tier (exact cost is bounded by the sample size — the
same asymmetry every kNN entry point exploits), and alert on the measured
recall.  The reference has no such monitor (hnswlib recall is assumed);
this is the operational piece a 100 TB deployment needs.

Both inputs are any DataFrames with (query_id, doc_id) — typically the
outputs of ``knn_exact_expr`` and one approximate tier over the same
queries.  All aggregation is distributed (semi-join + hash-agg); only the
k-row summary ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_per_query(
    exact: DataFrame,
    approx: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, hits, want, recall): |exact ∩ approx| / |exact| per
    query.  Queries the approximate tier missed entirely count 0, not
    NULL; queries absent from ``exact`` are (correctly) absent here."""
    e = exact.select(F.col(query_col).alias("query_id"), F.col(id_col).alias("doc_id"))
    a = approx.select(
        F.col(query_col).alias("query_id"), F.col(id_col).alias("doc_id")
    )
    want = e.groupBy("query_id").agg(F.count("*").alias("want"))
    hits = (
        e.join(a, ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        want.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            "want",
        )
        .withColumn("recall", F.col("hits") / F.col("want"))
    )


def recall_summary(
    exact: DataFrame,
    approx: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> dict:
    """One-row summary for alerting: micro recall (total hits / total
    wanted), macro recall (mean of per-query recalls), worst query, and
    the query count.  Executes one Spark job."""
    per = recall_per_query(exact, approx, query_col, id_col)
    row = per.agg(
        (F.sum("hits") / F.sum("want")).alias("micro"),
        F.avg("recall").alias("macro"),
        F.min("recall").alias("worst"),
        F.count("*").alias("n_queries"),
    ).first()
    return {
        "micro_recall": float(row["micro"]),
        "macro_recall": float(row["macro"]),
        "worst_query_recall": float(row["worst"]),
        "n_queries": int(row["n_queries"]),
    }


# ---------------------------------------------------------------------------
# Cell-store health: is the coarse quantizer still fitting the data?


def cell_balance(assigned: DataFrame, cell_col: str = "cell") -> DataFrame:
    """``(cell, n_rows)`` — one hash-agg, at most n_cells rows.  Input is
    any relation carrying a cell assignment: the in-memory assignment of
    ``ivf.assign_cells``, or ``sources.cell_store.open_cell_table`` over a
    managed IVFPQ/celled-graph store (the resolved view reads only live
    generations, so the balance reflects what serving actually scans)."""
    return assigned.groupBy(F.col(cell_col).alias("cell")).agg(
        F.count("*").alias("n_rows")
    )


def cell_health_report(
    assigned: DataFrame,
    n_cells: int,
    cell_col: str = "cell",
    target_max_rows: int | None = None,
    skew_alert: float = 8.0,
    empty_alert: float = 0.5,
) -> dict:
    """Operational health summary of a cell-partitioned index — the
    serving-side counterpart of :func:`recall_summary`.

    Every ANN knob in this engine assumes the coarse quantizer spreads the
    corpus: per-cell graph builds bound task memory by cell size, SemDeDup
    blocks BLAS work per cell, nprobe's measured sizing rule ("constant
    corpus fraction", SCALE.md) assumes cells hold comparable fractions.
    Domain shift or an embedding-model change breaks that silently — this
    report is the cheap standing check (one hash-agg; the per-cell counts,
    at most ``n_cells`` rows, are the only thing collected).

    Returns: row/cell totals, ``empty_cell_fraction``, occupancy quantiles
    over USED cells, ``skew_ratio`` (max cell / mean over configured
    cells), the 5 hottest cells, and two actionables —

    - ``recommended_cell_salts``: the global graph-shard factor that
      bounds the hottest cell's shard under ``target_max_rows``
      (``ceil(max / target)``; 1 = no salting needed) — feeds
      ``ann_hnsw.build_celled_hnsw_index(cell_salts=...)`` and the
      SemDeDup ``max_cell_rows`` guard;
    - ``retrain_recommended``: True when ``skew_ratio > skew_alert`` or
      ``empty_cell_fraction > empty_alert`` — the quantizer no longer fits
      the distribution; re-run ``ivf.train_centroids`` and refresh via the
      managed per-cell store.
    """
    import math

    rows = [
        (int(r["cell"]), int(r["n_rows"]))
        for r in cell_balance(assigned, cell_col).collect()
    ]
    counts = sorted(c for _, c in rows)
    n_rows = sum(counts)
    used = len(counts)
    mean = n_rows / n_cells if n_cells else 0.0
    mx = counts[-1] if counts else 0

    def _q(q: float) -> int:
        if not counts:
            return 0
        return counts[min(int(q * (len(counts) - 1) + 0.5), len(counts) - 1)]

    salts = 1
    if target_max_rows and mx > target_max_rows:
        salts = math.ceil(mx / target_max_rows)
    empty_frac = 1.0 - used / n_cells if n_cells else 0.0
    skew = (mx / mean) if mean > 0 else 0.0
    top = sorted(rows, key=lambda t: (-t[1], t[0]))[:5]
    return {
        "n_rows": n_rows,
        "n_cells": int(n_cells),
        "n_cells_used": used,
        "empty_cell_fraction": empty_frac,
        "mean_rows_per_cell": mean,
        "p50_rows": _q(0.5),
        "p99_rows": _q(0.99),
        "max_rows": mx,
        "skew_ratio": skew,
        "hot_cells": top,
        "recommended_cell_salts": salts,
        "retrain_recommended": bool(skew > skew_alert or empty_frac > empty_alert),
    }
