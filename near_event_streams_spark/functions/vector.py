"""Vector math over ``array<float>`` columns — pure built-in expressions.

No UDFs: ``zip_with`` + ``aggregate`` run inside whole-stage codegen, so
similarity math stays JVM-side and vectorizable. Accumulation is in DOUBLE
in strict index order (deterministic — required by the oracle harness).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """cos = dot / (||a|| * ||b||) — formula order matters for bit-equality
    with the oracle; keep sqrt(na)*sqrt(nb), not sqrt(na*nb)."""
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))
