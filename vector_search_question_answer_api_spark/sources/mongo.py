"""Production document source — the reference's MongoDB scan (S1/S2,
SURVEY.md §2.1) as a Spark connector seam.

Reference: ``find({}, {"_id": 1, "description": 1})`` with a 5 s scan cap
and client timeouts (services/index_service.py:53-55,
services/database_service.py:8-26).  The Spark shape is the official
MongoDB Spark connector with the same projection — Catalyst pushes the
column pruning into the connector's pipeline — and the timeouts carried as
client options.  The connector jar is not present in this environment, so
construction is gated: the testbed reads the same logical table from
parquet via ``sources.tables.load_table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents_mongo(
    spark: SparkSession,
    uri: str,
    database: str = "products_db",
    collection: str = "products",
    server_selection_timeout_ms: int = 5000,
    connect_timeout_ms: int = 10000,
    socket_timeout_ms: int = 30000,
) -> DataFrame:
    """Scan the products collection, projecting only key + description
    (the reference's exact projection), normalized to the engine's
    ``documents`` schema (doc_id, text)."""
    try:
        reader = (
            spark.read.format("mongodb")
            .option(
                "connection.uri",
                f"{uri}?serverSelectionTimeoutMS={server_selection_timeout_ms}"
                f"&connectTimeoutMS={connect_timeout_ms}"
                f"&socketTimeoutMS={socket_timeout_ms}",
            )
            .option("database", database)
            .option("collection", collection)
        )
        raw = reader.load()
    except Exception as e:  # connector jar absent in this environment
        raise NotImplementedError(
            "mongodb spark connector not available; use "
            "sources.tables.load_table against the parquet testbed"
        ) from e
    return raw.select(
        F.col("_id").cast("string").alias("doc_id"),
        F.col("description").alias("text"),
    )
