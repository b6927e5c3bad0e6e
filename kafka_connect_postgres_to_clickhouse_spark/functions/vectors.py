"""Vector math over array<float> embedding columns.

Exactness discipline: every dot product / squared norm is computed as
a SUM of per-element ``round(x*y * 1e9)`` BIGINTs — the per-element
double product is bit-identical in Spark and DuckDB, the rounded
integer is therefore identical, and integer sums are order-independent
— so cosine scores hash-match the oracle exactly.  The 1e9 scale
cancels in the cosine ratio.

All of it is built-in JVM expressions (``aggregate``/``zip_with``) —
no Python in the scoring loop; a Pandas-UDF variant lives in
``q_udf_scalar`` to cover the UDF surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # 1e9: fits 64-dim gaussian dots in int64 comfortably


def np_round_half_away(p):
    """numpy replica of Spark/DuckDB ``round()`` (half away from zero)
    over a float64 array — the worker-side twin of the scaled-integer
    discipline for the mapInPandas scorers.

    A bare ``floor(|p| + 0.5)`` misrounds doubles within 1 ulp of .5
    (e.g. 0.49999999999999994 + 0.5 == 1.0 in IEEE).  The correction
    must NOT be phrased as ``(r - ap) > 0.5``: that subtraction itself
    rounds back to exactly 0.5 on the trap values (1.0 -
    0.49999999999999994 == 0.5 under ties-to-even), silently skipping
    the fix.  Instead compare ``ap < r - 0.5`` — r is integral with
    ulp <= 0.5, so ``r - 0.5`` is EXACT, and the strict inequality
    keeps true ties rounded up (half-away behavior).  Returns float64
    (integral values); callers cast/sum as int64."""
    import numpy as np

    ap = np.abs(p)
    r = np.floor(ap + 0.5)
    r -= ap < (r - 0.5)
    return np.sign(p) * r


def dot_scaled(a: Column, b: Column) -> Column:
    """SUM(round(a[i]*b[i]*1e9)) as BIGINT — exact, order-independent."""
    prods = F.zip_with(
        a, b, lambda x, y: F.round(x.cast("double") * y.cast("double") * SCALE).cast("long")
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def norm2_scaled(a: Column) -> Column:
    return dot_scaled(a, a)


def sqdist_scaled(a: Column, b: Column) -> Column:
    """SUM(round((a[i]-b[i])^2 * 1e9)) as BIGINT — exact squared L2.

    Same discipline as dot_scaled: the per-element double difference
    and product are bit-identical across engines, the rounded BIGINT
    terms sum order-independently.  DuckDB twin spells the square as
    (dx)*(dx), never pow(), to keep the IEEE sequence identical.
    """
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.round(
            (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
            * SCALE
        ).cast("long"),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def cosine(dot_s: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """Cosine from scaled integers; identical IEEE sequence everywhere."""
    return dot_s.cast("double") / (
        F.sqrt(norm2_a.cast("double")) * F.sqrt(norm2_b.cast("double"))
    )


# --- DuckDB twins (positional unnest composition happens in the query) ------

DOT_SCALED_SQL = (
    "SUM(CAST(round(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1000000000) AS BIGINT))"
)

COSINE_SQL = (
    "CAST({dot} AS DOUBLE) / (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)))"
)
