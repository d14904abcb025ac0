"""Cell-store health report (operators/quality.cell_health_report): the
standing check that the coarse quantizer still spreads the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_question_answer_api_spark.operators import quality as Q


def _assigned(spark, counts: dict[int, int]):
    rows = [(c,) for c, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, ["cell"])


def test_balanced_store_is_healthy(spark):
    rep = Q.cell_health_report(
        _assigned(spark, {c: 10 for c in range(8)}), n_cells=8
    )
    assert rep["n_rows"] == 80
    assert rep["n_cells_used"] == 8
    assert rep["empty_cell_fraction"] == 0.0
    assert rep["skew_ratio"] == 1.0
    assert rep["recommended_cell_salts"] == 1
    assert rep["retrain_recommended"] is False
    assert rep["p50_rows"] == 10 and rep["max_rows"] == 10


def test_skewed_store_triggers_retrain_and_salts(spark):
    counts = {0: 900} | {c: 10 for c in range(1, 6)}  # 5 cold, 2 empty of 8
    rep = Q.cell_health_report(
        _assigned(spark, counts), n_cells=8, target_max_rows=200, skew_alert=4.0
    )
    assert rep["n_rows"] == 950
    assert rep["n_cells_used"] == 6
    assert abs(rep["empty_cell_fraction"] - 2 / 8) < 1e-9
    assert rep["max_rows"] == 900
    assert rep["skew_ratio"] == 900 / (950 / 8)
    assert rep["hot_cells"][0] == (0, 900)
    # ceil(900/200) = 5 shards bound the hot cell's graph build
    assert rep["recommended_cell_salts"] == 5
    assert rep["retrain_recommended"] is True  # skew 7.58 > alert 4.0
    # at the default alert the same distribution is borderline-pass
    rep_default = Q.cell_health_report(_assigned(spark, counts), n_cells=8)
    assert rep_default["retrain_recommended"] is False


def test_mostly_empty_store_triggers_retrain(spark):
    rep = Q.cell_health_report(
        _assigned(spark, {0: 5, 1: 5}), n_cells=16
    )
    assert rep["empty_cell_fraction"] == 1 - 2 / 16
    assert rep["retrain_recommended"] is True


def test_report_over_managed_store_view(spark, tmp_path):
    """The report composes with the managed cell store's resolved view:
    counts reflect live generations only (a refresh replacing one cell's
    rows changes that cell's count, not others)."""
    from vector_search_question_answer_api_spark.sources import cell_store as CS

    df = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], ["doc_id", "cell"]
    )
    CS.cell_store_write_full(df, str(tmp_path / "store"), partition_col="cell")
    view = CS.open_cell_table(spark, str(tmp_path / "store"))
    rep = Q.cell_health_report(view, n_cells=4)
    assert rep["n_rows"] == 40 and rep["max_rows"] == 10

    # refresh cell 2 with twice the rows (new generation)
    repl = spark.createDataFrame(
        [(1000 + i, 2) for i in range(20)], ["doc_id", "cell"]
    )
    CS.cell_store_refresh(spark, str(tmp_path / "store"), repl, dirty_cells=[2])
    rep2 = Q.cell_health_report(
        CS.open_cell_table(spark, str(tmp_path / "store")), n_cells=4
    )
    assert rep2["n_rows"] == 50
    assert rep2["hot_cells"][0] == (2, 20)
