"""Vector similarity metrics as pure-codegen column functions.

Reference: ``poincare_distance`` / ``wasserstein_metric`` /
``kl_divergence`` (/root/reference/bluegraph/downstream/similarity.py:
41-66) — numpy/scipy scalar helpers the reference plugs into its
similarity indices. Spark-side each is a single expression over two
``array<double>`` columns (zip_with / aggregate, whole-stage codegen, no
UDF), so they drop into joins and window ranking at any scale:

- Poincaré: ``arccosh(1 + 2·|u−v|² / ((1−|u|²)(1−|v|²)))`` — defined for
  vectors inside the unit ball (same domain contract as the reference).
- Wasserstein (W1 on the common integer support 0..n−1, the reference's
  ``wasserstein_distance(elements, elements, u/Σu, v/Σv)``): equals the
  sum of |cumsum differences| of the normalized vectors — computed with
  one left-fold carrying (cum_u, cum_v, total) so the association order
  matches a serial replica exactly.
- KL divergence ``Σ rel_entr(u/Σu, v/Σv)`` with the rel_entr conventions:
  terms with u_i = 0 contribute 0; u_i > 0, v_i = 0 yields +inf.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dot(u: Column, v: Column) -> Column:
    return F.aggregate(
        F.zip_with(u, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm_sq(u: Column) -> Column:
    return F.aggregate(u, F.lit(0.0), lambda acc, x: acc + x * x)


def _total(u: Column) -> Column:
    return F.aggregate(u, F.lit(0.0), lambda acc, x: acc + x)


def poincare_distance_col(u: Column, v: Column) -> Column:
    """Poincaré-ball distance (reference similarity.py:41-50)."""
    diff_sq = F.aggregate(
        F.zip_with(u, v, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    val = F.lit(1.0) + F.lit(2.0) * diff_sq / (
        (F.lit(1.0) - _norm_sq(u)) * (F.lit(1.0) - _norm_sq(v))
    )
    return F.acosh(val)


def wasserstein_1d_col(
    u: Column, v: Column, total_u: Column | None = None,
    total_v: Column | None = None,
) -> Column:
    """W1 on common support 0..n−1 of the sum-normalized vectors
    (reference similarity.py:52-58). One fold: the accumulator carries
    the two running cumulative sums and the distance so far.

    Pass ``total_u`` / ``total_v`` (e.g. columns precomputed in an earlier
    projection) to keep the totals out of the fold lambda: higher-order
    functions are interpreted, and a scalar subexpression referenced
    inside the lambda body is re-evaluated per element — an O(d²) cost
    per row for a d-element fold that the precomputed form avoids. Values
    are identical either way (same expression over the same inputs)."""
    su = total_u if total_u is not None else _total(u)
    sv = total_v if total_v is not None else _total(v)
    pairs = F.zip_with(u, v, lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    acc0 = F.struct(
        F.lit(0.0).alias("cu"), F.lit(0.0).alias("cv"), F.lit(0.0).alias("d")
    )

    def step(acc, x):
        cu = acc["cu"] + x["a"] / su
        cv = acc["cv"] + x["b"] / sv
        # the final pair contributes |1−1| = 0, so folding every element
        # (instead of n−1) changes nothing while keeping the fold uniform
        return F.struct(
            cu.alias("cu"), cv.alias("cv"),
            (acc["d"] + F.abs(cu - cv)).alias("d"),
        )

    return F.aggregate(pairs, acc0, step, lambda acc: acc["d"])


def kl_divergence_col(
    u: Column, v: Column, total_u: Column | None = None,
    total_v: Column | None = None,
) -> Column:
    """Σ rel_entr(u/Σu, v/Σv) (reference similarity.py:61-66): 0 where
    u_i = 0; +inf where u_i > 0 and v_i = 0. ``total_u`` / ``total_v``:
    see :func:`wasserstein_1d_col` — keeps the totals out of the
    per-element lambda re-evaluation."""
    su = total_u if total_u is not None else _total(u)
    sv = total_v if total_v is not None else _total(v)
    terms = F.zip_with(
        u,
        v,
        lambda a, b: F.when(a == 0.0, F.lit(0.0)).otherwise(
            F.when(b == 0.0, F.lit(float("inf"))).otherwise(
                (a / su) * F.log((a / su) / (b / sv))
            )
        ),
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
