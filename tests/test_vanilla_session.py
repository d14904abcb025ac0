"""Regression for the round-1 driver failure (VERDICT.md r1, What's wrong #1).

The driver's correctness harness supplies a *vanilla* SparkSession — built
without :func:`session.get_spark` — so no inventory query may depend on a
conf that is only set at session-build time.  ``load_table`` must set
``spark.sql.legacy.parquet.nanosAsLong`` itself (it is runtime-settable)
before reading the TIMESTAMP(NANOS) events parquet.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from vector_search_question_answer_api_spark.sources.tables import load_table


def test_load_table_without_prebuilt_nanos_conf(spark, sf_dir):
    # Simulate the driver harness: the conf is absent on the session.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        # Prove the simulation is real: a raw read still fails without it.
        with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL"):
            spark.read.parquet(f"{sf_dir}/events.parquet")
        # load_table must self-heal on any session.
        df = load_table(spark, sf_dir, "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_ensure_parallelism_noop_on_multifile_input(spark, tmp_path):
    """SCALE.md claims the parallelizing repartition is a NO-OP on real
    multi-file data — pin it: a table already split into >= parallelism/2
    files must come back without a round-robin exchange in its plan."""
    import pyspark.sql.functions as F

    from vector_search_question_answer_api_spark.sources.tables import load_table

    src = str(tmp_path / "events.parquet")
    spark.range(0, 10_000).select(
        F.col("id").alias("event_id"),
        F.timestamp_millis(F.lit(1704067200000) + F.col("id")).alias("ts"),
        (F.col("id") % 50).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.rand(7).alias("value"),
        F.lit("{}").alias("props"),
    ).repartition(8).write.parquet(src)
    df = load_table(spark, str(tmp_path), "events")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" not in plan
    assert df.count() == 10_000
