"""Fixed StructType schemas for every engine table (SURVEY.md §1, FIXTURES.md).

The reference is schemaless (MongoDB + duck typing; its only type check is
``isinstance(text, str)`` at services/index_service.py:23).  The engine is
schema-on-write throughout — explicit StructTypes subsume that check and give
Catalyst exact column pruning.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The product/text corpus (reference: MongoDB `products` collection projected
# to {_id, description} at services/index_service.py:53-55).
DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

# The materialized vector index (reference: the HNSW matrix + positional id
# list, services/index_service.py:64-96; positional labels replaced by an
# explicit vec_id key).
EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Engine-built index table (index_build.build_index output): embeddings keyed
# by doc_id with pre-normalized vectors so search is dot-product-only.
INDEX = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("norm_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("norm", T.DoubleType(), True),
    ]
)

# Batch search requests (reference: GET /search params,
# controllers/search_controller.py:11-13).
QUERIES = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("q", T.StringType(), True),
        T.StructField("k", T.IntegerType(), True),
    ]
)

# Session question stream (reference: POST /qa traffic,
# controllers/qa_controller.py:12-25).
QA_EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("question", T.StringType(), True),
    ]
)

# Conversation history entry (reference: utils/session_manager.py:36-44).
HISTORY_ENTRY = T.StructType(
    [
        T.StructField("question", T.StringType(), True),
        T.StructField("answer", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Session state snapshot (reference: utils/session_manager.py:6-26).
SESSION_STATE = T.StructType(
    [
        T.StructField("session_id", T.StringType(), False),
        T.StructField("last_updated", T.TimestampType(), True),
        T.StructField("context_doc_id", T.LongType(), True),
        T.StructField("history", T.ArrayType(HISTORY_ENTRY), True),
    ]
)

# Driver-provided TPC-H-ish tables (TESTDATA.md) — explicit schemas so reads
# never infer and pruning/pushdown are exact.
REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

TABLE_SCHEMAS = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
