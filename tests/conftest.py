from __future__ import annotations

import pytest

from vector_search_question_answer_api_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="vector_search_question_answer_api_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(autouse=True)
def _scoped_tracked_caches():
    """r15 (VERDICT r14 #7): every test releases the tracked caches it
    created.  The suite shares ONE session and one process-global caching
    registry, and the operators persist expensive intermediates through
    it; without per-test scoping the registry accumulates across modules
    until the 64-entry growth tripwire fires mid-suite — the hygiene
    monitor correctly flagging the suite itself as an unscoped sequential
    composer.  Per-test ``cache_scope`` is exactly what the registry
    prescribes for sequential callers: releases happen AFTER the test
    body (assertions saw materialized results), module-scoped fixtures
    set up before the scope opens stay below the mark (never released),
    and a test that drains the registry itself (``unpersist_all``)
    composes — the scope's pop becomes a no-op."""
    from vector_search_question_answer_api_spark.caching import cache_scope

    with cache_scope():
        yield
