"""Property-based tests (SURVEY.md §5.6, hypothesis): algebraic invariants
of the scalar function layer, checked via pure-Python equivalents where the
Spark expression semantics must match (preprocess) and via numpy for vector
math.  Spark round-trips are sampled (bounded examples) to keep runtime sane.
"""

from __future__ import annotations

import math
import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# Pure-Python twin of preprocess_text (reference services/index_service.py:
# 14-47) — used to check idempotence + the Spark golden tests' assumptions.

_RULES = [
    (re.compile(r"thc:?\s*(\d+\.?\d*)%?"), r"thc \1%"),
    (re.compile(r"cbd:?\s*(\d+\.?\d*)%?"), r"cbd \1%"),
    (re.compile(r"hybrid[ -]?dominant"), "hybrid"),
    (re.compile(r"indica[ -]?dominant"), "indica"),
    (re.compile(r"sativa[ -]?dominant"), "sativa"),
]


def preprocess_py(text: str) -> str:
    out = text.lower()
    for pat, repl in _RULES:
        out = pat.sub(repl, out)
    out = re.sub(r"[^\w\s%]", " ", out)
    return " ".join(out.split())


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_preprocess_idempotent(s):
    once = preprocess_py(s)
    assert preprocess_py(once) == once


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_preprocess_output_charset(s):
    out = preprocess_py(s)
    # only word chars, single spaces, '%' survive; no leading/trailing space
    assert out == out.strip()
    assert "  " not in out
    assert re.fullmatch(r"[\w%]*( [\w%]+)*", out) is not None


# ---------------------------------------------------------------------------
# Vector math invariants (numpy twin of functions/vector.py semantics)


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.sqrt((v * v).sum())
    return v * 0.0 if n == 0 else v / n


# Engine embeddings are array<float> (float32): magnitudes below ~1.2e-38
# cannot occur in the data, and naive sum-of-squares genuinely loses
# precision once x*x underflows to a subnormal double (hypothesis found
# x=5.6e-162 -> norm off by 3%).  Flush sub-float32 magnitudes to zero so
# the generator matches the engine's value domain.
vecs = st.lists(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False).map(
        lambda x: 0.0 if abs(x) < 1e-30 else x
    ),
    min_size=2,
    max_size=16,
)


@settings(max_examples=300, deadline=None)
@given(vecs, vecs)
def test_cosine_distance_bounds(a, b):
    n = min(len(a), len(b))
    va, vb = _normalize(np.array(a[:n])), _normalize(np.array(b[:n]))
    d = 1.0 - float(va @ vb)
    assert -1e-9 <= d <= 2.0 + 1e-9


@settings(max_examples=300, deadline=None)
@given(vecs)
def test_normalize_unit_or_zero(a):
    v = _normalize(np.array(a))
    n = float(np.sqrt((v * v).sum()))
    assert math.isclose(n, 1.0, abs_tol=1e-9) or n == 0.0


@settings(max_examples=200, deadline=None)
@given(vecs, vecs)
def test_normalized_dot_equals_cosine(a, b):
    n = min(len(a), len(b))
    va, vb = np.array(a[:n]), np.array(b[:n])
    na, nb = float(np.linalg.norm(va)), float(np.linalg.norm(vb))
    dot_normed = float(_normalize(va) @ _normalize(vb))
    if na == 0 or nb == 0:
        assert dot_normed == 0.0
    else:
        assert math.isclose(dot_normed, float(va @ vb) / (na * nb), rel_tol=1e-9, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# Top-k invariants over the deterministic tiebreak (dist ASC, id ASC)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.floats(0, 2, allow_nan=False)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 10),
)
def test_topk_subset_and_order(rows, k):
    ranked = sorted(set(rows), key=lambda r: (r[1], r[0]))
    topk = ranked[:k]
    topk1 = ranked[: k + 1]
    assert set(topk) <= set(topk1)  # top-k ⊆ top-(k+1)
    assert all(
        (topk[i][1], topk[i][0]) <= (topk[i + 1][1], topk[i + 1][0])
        for i in range(len(topk) - 1)
    )


# ---------------------------------------------------------------------------
# Largest-remainder quota apportionment (operators/pipeline.mixture_quotas)

@given(
    weights=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=8,
    ),
    total=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_mixture_quotas_properties(weights, total):
    from vector_search_question_answer_api_spark.operators.pipeline import (
        mixture_quotas,
    )

    if sum(weights.values()) <= 0:
        return  # rejected by the validator, covered in test_pipeline
    q = mixture_quotas(weights, total)
    # quotas exhaust the budget exactly and are never negative
    assert sum(q.values()) == total
    assert all(v >= 0 for v in q.values())
    assert set(q) == set(weights)
    # each quota is within 1 of its exact proportional share (the
    # largest-remainder guarantee)
    wsum = sum(weights.values())
    for d, v in q.items():
        exact = total * weights[d] / wsum
        assert exact - 1 < v < exact + 1
    # determinism
    assert mixture_quotas(dict(weights), total) == q
