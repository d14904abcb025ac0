"""Bucketed layout (sources/bucketed.py): the co-located join contract —
no exchange on the bucketed key, identical results to plain parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from vector_search_question_answer_api_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    write_bucketed(docs, "bucketed_documents", "doc_id", n_buckets=4)
    yield "bucketed_documents"
    spark.sql("DROP TABLE IF EXISTS bucketed_documents")


def test_bucketed_self_join_has_no_exchange(spark, bucketed_docs):
    t = read_bucketed(spark, bucketed_docs)
    a = t.select("doc_id", "n_chars")
    b = t.select("doc_id", "source")
    # disable broadcast so the join would otherwise be a shuffled SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "doc_id")
        joined.collect()
        plan = _plan(joined)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_agg_has_no_exchange(spark, bucketed_docs):
    t = read_bucketed(spark, bucketed_docs)
    agg = t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    plan = _plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_join_results_match_plain(spark, sf_dir, bucketed_docs):
    docs = load_table(spark, sf_dir, "documents")
    plain = {
        (r["doc_id"], r["source"], r["n_chars"])
        for r in docs.select("doc_id", "source", "n_chars").collect()
    }
    t = read_bucketed(spark, bucketed_docs)
    via_join = {
        (r["doc_id"], r["source"], r["n_chars"])
        for r in t.select("doc_id", "n_chars")
        .join(t.select("doc_id", "source"), "doc_id")
        .collect()
    }
    assert via_join == plain
