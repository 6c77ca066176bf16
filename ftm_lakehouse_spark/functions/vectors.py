"""Vector math over ``array<float>`` columns — pure JVM higher-order
functions (zip_with + aggregate), no Python in the hot path.

All arithmetic is done in float64 with a sequential left-fold, which is
deterministic and matches DuckDB's list_dot_product over DOUBLE[] for
oracle comparison. At 100 TB these expressions run inside whole-stage
codegen; the Pandas-UDF variants in operators/similarity.py exist only
for batch-matrix shapes (top-k via numpy) where per-row folds lose.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two numeric array columns."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
