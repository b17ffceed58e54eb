"""Vector column expressions (embedding math over ``array<float>``).

Built-in higher-order functions only -- ``zip_with`` for elementwise product,
``aggregate`` for the sequential sum -- so the math runs JVM-side inside
codegen. Accumulation is in DOUBLE and strictly sequential over the array,
which makes results bit-deterministic (required for the DuckDB oracle
comparison) and independent of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-sum dot product in double precision."""
    products = F.zip_with(
        _as_col(a), _as_col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
