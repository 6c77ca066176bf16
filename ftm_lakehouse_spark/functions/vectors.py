"""Vector math over ``array<float>`` columns — pure JVM higher-order
functions (zip_with + aggregate), no Python in the hot path.

All arithmetic is done in float64 with a sequential left-fold, which is
deterministic and matches DuckDB's list_dot_product over DOUBLE[] for
oracle comparison. At 100 TB these expressions run inside whole-stage
codegen; the Pandas-UDF variants in operators/similarity.py exist only
for batch-matrix shapes (top-k via numpy) where per-row folds lose.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_doubles(xs) -> Column:
    """``array<double>`` literal built as ONE SQL expression string —
    a single py4j round trip however long the vector (round-13, guide
    §1.2): the per-element ``F.array(*[F.lit(x) ...])`` form costs one
    driver⇄JVM round trip PER element (~0.5 ms each), which put 1–2 s
    of pure Python/py4j chatter in front of every centroid/hyperplane
    gate run. ``repr(float)`` round-trips exactly and Java's double
    parsing is correctly rounded, so the literal values are
    bit-identical to the ``F.lit`` form (verified over randoms,
    denormals, and both double extremes)."""
    vals = [float(x) for x in xs]
    if not vals or not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])  # pragma: no cover
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal as ONE SQL expression string —
    the 2-D companion of :func:`lit_doubles` for centroid/plane/codebook
    matrices (k×dim ``F.lit`` calls collapse to one py4j round trip)."""
    mat = [[float(x) for x in row] for row in rows]
    if not mat or not all(math.isfinite(v) for row in mat for v in row):
        return F.array(  # pragma: no cover
            *[F.array(*[F.lit(v) for v in row]) for row in mat]
        )
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{v!r}D" for v in row) + ")" for row in mat
        )
        + ")"
    )


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


def quantize_int8(v: Column) -> Column:
    """Symmetric per-vector int8 quantization — the storage-side op
    that turns a 100 TB float32 embedding corpus into ~25 TB:
    ``scale = max(|v|)/127``, ``q_i = floor(v_i/scale + 0.5)``.

    Returns ``struct<scale:double, q:array<int>>``. The explicit
    floor(+0.5) rounding (not round()) makes the quantized values
    reproducible across engines regardless of their round-half
    convention. The scale is bound once via a one-element transform so
    the max-abs fold runs once per row, not once per element."""

    def make(scale: Column) -> Column:
        q = F.transform(
            v, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int")
        )
        return F.struct(scale.alias("scale"), q.alias("q"))

    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.greatest(max_abs / F.lit(127.0), F.lit(1e-12))
    return F.transform(F.array(scale), make)[0]
