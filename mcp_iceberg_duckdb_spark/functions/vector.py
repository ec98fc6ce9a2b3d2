"""Vector math over array columns — all JVM-side higher-order
functions (zip_with / aggregate / transform), no Python in the row
path. These are the building blocks for similarity search and
embedding dedup (SURVEY.md §2.11).

Everything computes in float64: the fixture embeddings are
array<float>, and casting up front makes results deterministic and
bit-comparable with the DuckDB oracle (which also computes cosine in
double over DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    return F.col(v).cast("array<double>") if isinstance(v, str) else v.cast(
        "array<double>"
    )


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — sequential fold, deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def sq_l2_dist(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² — squared euclidean distance, sequential fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
