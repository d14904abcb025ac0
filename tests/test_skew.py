"""Salted top-k (operators/skew.py): exact equivalence with the direct
window under hot keys, determinism, and k >= group size."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators.skew import salted_topk_per_key


def _direct_topk(df, keys, order, k):
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def test_salted_topk_matches_direct_on_hot_key(spark):
    # key 0 is hot (10k rows), keys 1-9 small
    df = (
        spark.range(10_000)
        .select(
            F.lit(0).alias("key"),
            F.col("id").alias("row_id"),
            (F.col("id") % 997).alias("score"),
        )
        .unionByName(
            spark.range(900).select(
                (F.col("id") % 9 + 1).alias("key"),
                (F.col("id") + 100_000).alias("row_id"),
                (F.col("id") % 97).alias("score"),
            )
        )
    )
    order = [F.col("score").asc(), F.col("row_id").asc()]
    for n_salts in (4, 16):
        got = {
            (r["key"], r["rank"]): r["row_id"]
            for r in salted_topk_per_key(
                df, ["key"], order, k=5, n_salts=n_salts
            ).collect()
        }
        exp = {
            (r["key"], r["rank"]): r["row_id"]
            for r in _direct_topk(df, ["key"], order, 5).collect()
        }
        assert got == exp and len(exp) == 50


def test_salted_topk_k_exceeds_group(spark):
    df = spark.createDataFrame(
        [(1, 10, 0.5), (1, 11, 0.2), (2, 20, 0.9)],
        ["key", "row_id", "score"],
    )
    order = [F.col("score").desc(), F.col("row_id").asc()]
    rows = salted_topk_per_key(df, ["key"], order, k=10, n_salts=8).collect()
    assert len(rows) == 3
    got = {(r["key"], r["rank"]): r["row_id"] for r in rows}
    assert got[(1, 1)] == 10 and got[(1, 2)] == 11 and got[(2, 1)] == 20


def test_salted_topk_deterministic_with_salt_col(spark):
    df = spark.range(5_000).select(
        (F.col("id") % 3).alias("key"),
        F.col("id").alias("row_id"),
        (F.col("id") * 37 % 1009).alias("score"),
    )
    order = [F.col("score").desc(), F.col("row_id").asc()]
    a = sorted(
        (r["key"], r["rank"], r["row_id"])
        for r in salted_topk_per_key(
            df, ["key"], order, k=7, n_salts=8, salt_col="row_id"
        ).collect()
    )
    b = sorted(
        (r["key"], r["rank"], r["row_id"])
        for r in salted_topk_per_key(
            df, ["key"], order, k=7, n_salts=8, salt_col="row_id"
        ).collect()
    )
    exp = sorted(
        (r["key"], r["rank"], r["row_id"])
        for r in _direct_topk(df, ["key"], order, 7).collect()
    )
    assert a == b == exp
