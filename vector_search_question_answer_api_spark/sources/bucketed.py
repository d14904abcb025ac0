"""Bucketed table layout — shuffle-free co-located joins.

At 100 TB the single biggest repeated cost in this engine's join-heavy
paths (doc attach, postings scoring, pair verification) is re-shuffling
the same corpus on the same key query after query.  Spark's answer is
bucketing: write the table hash-partitioned AND sorted by the join key
(``DataFrameWriter.bucketBy``), and every subsequent equi-join or
aggregation on that key reads co-located buckets with NO exchange.

This module wraps the write/read pair the way the rest of ``sources``
wraps plain parquet.  Bucketed tables must live in the session catalog
(``saveAsTable`` — bucket metadata is catalog state, not parquet
metadata); the default in-memory catalog + ``spark.sql.warehouse.dir``
works without any Hive dependency.

The scale contract is pinned by tests/test_bucketing.py: a self-join of
a bucketed table on its bucket key has NO Exchange in the executed plan
(per-bucket sort-merge directly over the scan), and results are
identical to the plain-parquet join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table,
    replacing any previous version."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; joins/aggs on the bucket key skip the
    exchange when ``spark.sql.sources.bucketing.enabled`` (default on)."""
    return spark.table(table)
