"""Vector distance functions (JVM-side column expressions).

Mirrors the reference's metrics with identical edge semantics
(/root/reference/lsh/helpers.go:132-145 L2, 218-234 angular):

* cosine distance = 1 - cos(a, b); returns exactly 1.0 when either norm is
  <= tol (zero-vector guard), and clamps results < tol to 0.0;
* L2 = sqrt(sum (a_i - b_i)^2);
* tol = 1e-6 (/root/reference/lsh/helpers.go:13-15).

All sums are written as left-to-right sequential ``aggregate`` folds so the
DuckDB oracle (same fold order) produces bit-identical doubles — floating
addition is order-sensitive, identical order ⇒ identical bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lsh_search_go_spark.config import TOL


def _dot(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
            f"cast(0.0 as double), (s, v) -> s + v)")


def _sqnorm(a: str) -> str:
    return _dot(a, a)


def cosine_dist_expr(a: str, b: str) -> Column:
    """1 - cosine similarity, with the reference's zero-norm and clamp guards."""
    expr = (
        f"case when sqrt({_sqnorm(a)}) <= {TOL} or sqrt({_sqnorm(b)}) <= {TOL} then cast(1.0 as double) "
        f"else (case when 1.0 - {_dot(a, b)} / (sqrt({_sqnorm(a)}) * sqrt({_sqnorm(b)})) < {TOL} "
        f"then cast(0.0 as double) "
        f"else 1.0 - {_dot(a, b)} / (sqrt({_sqnorm(a)}) * sqrt({_sqnorm(b)})) end) end"
    )
    return F.expr(expr)


def l2_dist_expr(a: str, b: str) -> Column:
    expr = (f"sqrt(aggregate(zip_with({a}, {b}, "
            f"(x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
            f"cast(0.0 as double), (s, v) -> s + v))")
    return F.expr(expr)


def dist_udf(metric: str):
    """Arrow-batched pairwise distance: (vec_a, vec_b) columns → double.

    The numpy fast path for candidate verification at benchmark scale — the
    JVM ``aggregate`` folds above are kept for the DuckDB-mirrored gate
    queries (bit-identical fold order); this path matches them to ~1e-12
    (summation order differs) and is ~50× faster per element.
    Implements the same reference edge semantics (tol guard, clamp).
    """
    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")

    @F.pandas_udf(T.DoubleType())
    def udf(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype=float)
        A = np.array([np.asarray(x, dtype=np.float64) for x in va])
        B = np.array([np.asarray(x, dtype=np.float64) for x in vb])
        if metric == "l2":
            d = np.linalg.norm(A - B, axis=1)
        else:
            na = np.linalg.norm(A, axis=1)
            nb = np.linalg.norm(B, axis=1)
            denom = na * nb
            safe = denom > 0
            cos = np.zeros(len(A))
            cos[safe] = np.einsum("ij,ij->i", A, B)[safe] / denom[safe]
            d = 1.0 - cos
            d[(na <= TOL) | (nb <= TOL)] = 1.0   # zero-vector guard (helpers.go:224-231)
            d[d < TOL] = 0.0                      # clamp (helpers.go:232-233)
        return pd.Series(d)

    return udf


def angular_to_cosine_dist(a: Column | str) -> Column:
    """a²/2 (/root/reference/lsh/helpers.go:240-242)."""
    c = F.col(a) if isinstance(a, str) else a
    return (c * c) / 2.0


def cosine_dist_to_angular(c: Column | str) -> Column:
    """sqrt(2c) (/root/reference/lsh/helpers.go:244-246)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sqrt(col * 2.0)


# --- DuckDB mirrors (same fold order → same bits) --------------------------

def duck_dot(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(len({a})), i -> {a}[i+1]::DOUBLE * {b}[i+1]::DOUBLE)), "
            f"(s, v) -> s + v)")


def duck_cosine_dist(a: str, b: str) -> str:
    sqa, sqb = duck_dot(a, a), duck_dot(b, b)
    return (
        f"case when sqrt({sqa}) <= {TOL} or sqrt({sqb}) <= {TOL} then 1.0 "
        f"else (case when 1.0 - {duck_dot(a, b)} / (sqrt({sqa}) * sqrt({sqb})) < {TOL} then 0.0 "
        f"else 1.0 - {duck_dot(a, b)} / (sqrt({sqa}) * sqrt({sqb})) end) end"
    )


def duck_l2_dist(a: str, b: str) -> str:
    return (f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(len({a})), i -> ({a}[i+1]::DOUBLE - {b}[i+1]::DOUBLE) "
            f"* ({a}[i+1]::DOUBLE - {b}[i+1]::DOUBLE))), (s, v) -> s + v))")
