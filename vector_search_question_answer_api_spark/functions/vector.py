"""Vector scalar functions V5-V7 (SURVEY.md §2.4) as Catalyst higher-order
functions — pure JVM expressions, no UDF, so cosine scoring stays inside
whole-stage codegen.

Reference semantics: hnswlib cosine space (services/index_service.py:67)
normalizes vectors on insert; distances are ``1 - cos``; reported score is
``1 - dist`` (controllers/search_controller.py:37).

Zero-vector edge case (SURVEY.md §7): norm 0 would divide by zero — we define
similarity = 0 for zero vectors (normalized form = zero vector).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nested_array_lit(rows) -> Column:
    """array<array<double>> literal from a nested Python float sequence,
    parsed JVM-side in ONE call.  ``F.lit(nested_list)`` builds the same
    literal element-by-element over py4j (one round trip per scalar —
    ~3s of driver time for a 16x64 centroid table); a single ``F.expr``
    string is ~6x faster to construct and value-identical (``repr`` of a
    double round-trips exactly)."""
    body = ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in row) + ")" for row in rows
    )
    return F.expr(f"array({body})")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def l2_normalize(a: Column) -> Column:
    """V7: L2 normalize; zero vector maps to itself (all zeros).

    r16 (optimization round): the divisor is hoisted OUT of the per-element
    lambda.  Catalyst re-evaluates a lambda's captured child expression on
    every element (the same pathology ``text.word_shingles_from_tokens``
    documents), so ``transform(a, x -> x / n)`` with ``n`` an O(dim)
    aggregate cost O(dim^2) interpreted lambda evals per ROW — measured
    2.81 s -> 0.21 s on a 200k x 64 noop scan (x13).  ``array_repeat``
    evaluates the norm once per row; ``zip_with`` then divides each
    element by the same double — arithmetic unchanged, results
    bit-identical (pinned in tests/test_vector.py)."""
    n = l2_norm(a)
    return F.when(n == 0.0, F.transform(a, lambda x: x.cast("double") * 0.0)).otherwise(
        F.zip_with(
            a, F.array_repeat(n, F.size(a)), lambda x, nn: x.cast("double") / nn
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """V5/V6: cos(a,b); 0 when either vector is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_distance(a: Column, b: Column) -> Column:
    """V5: ``1 - cos`` (hnswlib cosine-space distance)."""
    return F.lit(1.0) - cosine_similarity(a, b)
