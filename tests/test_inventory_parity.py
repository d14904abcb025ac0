"""Local mirror of the driver's t2 gate at sf0.001: every declared query
with an oracle must hash-match DuckDB (SURVEY.md §5.2)."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.parity import TABLES, value_hash


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_parity(spark, sf_dir, duck, name):
    fn = entrymod.queries()[name]
    df = fn(spark, sf_dir)
    spark_cols = df.columns
    spark_pdf = df.toPandas()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(spark_pdf) > 0, f"{name}: rows-only check, empty result"
        return
    rel = duck.sql(oracles[name])
    duck_cols = list(rel.columns)
    duck_pdf = rel.df()
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_pdf) == len(duck_pdf)
    assert value_hash(spark_pdf) == value_hash(duck_pdf)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None
