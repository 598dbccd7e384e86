"""Vector similarity primitives over array<float> embedding columns.

Dot products stay JVM-side: ``zip_with`` + ``aggregate`` fold in
element order with a DOUBLE accumulator, which matches DuckDB's
``list_dot_product`` on DOUBLE[] bit-for-bit in practice; similarity
values are still rounded before ranking so a 1-ulp divergence can
never flip a top-k cutoff (deterministic tie-break on id).

For hot paths where the JVM expression is too slow (very high dim,
billions of pairs) the scale path is a Pandas-UDF batch matmul —
see ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double-precision dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine similarity rounded for hash-stable ranking."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), digits)


def cosine_with_norms(a: Column, b: Column, norm_a: Column, norm_b: Column,
                      digits: int = 6) -> Column:
    """Cosine from pre-projected norms: inside a pair join, norm(a)
    and norm(b) would otherwise be re-evaluated PER PAIR (O(pairs*dim)
    extra work — half the join's compute). Computing them once per
    vector in the projection is bit-identical: same sqrt, same
    product, same division, same rounding."""
    return F.round(dot(a, b) / (norm_a * norm_b), digits)
