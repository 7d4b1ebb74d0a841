"""Mutual-information edge statistics as Spark column expressions.

Semantics match the reference kernel exactly
(/root/reference/bluegraph/preprocess/generators.py:27-73
``mutual_information``), including:

- ``co_freq == 0``  => 0
- ``mitype="normalized"`` (NPMI): ``alpha = -log2(co/N)``; result is
  ``pmi/alpha`` unless ``alpha == 0`` (i.e. the pair co-occurs in *every*
  instance), in which case 0.
- final clamp: anything <= 0 becomes 0 (the reference returns
  ``mi if mi > 0 else 0``).

All arithmetic is IEEE-754 double on both sides (Python ``math.log2`` vs
Spark ``log2``), so values agree to well under the 1e-6 tolerance required
by the north rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MITYPES = ("expected", "normalized", "pmi2", "pmi3")


def mutual_information_col(
    co_freq: Column,
    s_freq: Column,
    t_freq: Column,
    total_instances: Column,
    mitype: str | None = None,
) -> Column:
    """Column-expression version of the reference ``mutual_information``.

    All inputs are numeric columns (cast to double internally); returns a
    double column. ``mitype=None`` is positive PMI.
    """
    co = co_freq.cast("double")
    s = s_freq.cast("double")
    t = t_freq.cast("double")
    n = total_instances.cast("double")

    pmi = F.log2(n * co / (s * t))
    if mitype is None:
        mi = pmi
    elif mitype == "expected":
        mi = pmi * (co / n)
    elif mitype == "normalized":
        alpha = -F.log2(co / n)
        mi = F.when(alpha != F.lit(0.0), pmi / alpha).otherwise(F.lit(0.0))
    elif mitype == "pmi2":
        mi = F.log2((co * co) / (s * t))
    elif mitype == "pmi3":
        mi = F.log2((co * co * co) / (s * t * n))
    else:
        raise ValueError(
            "Provided Mutual information score type (mitype) is not "
            f"supported. Provide one value from the following list {list(MITYPES)}"
        )
    # co_freq == 0 => 0; clamp negatives (and NaN from log of <=0 inputs) to 0.
    clamped = F.when(mi > F.lit(0.0), mi).otherwise(F.lit(0.0))
    return F.when(co > F.lit(0.0), clamped).otherwise(F.lit(0.0))


def ppmi_col(co_freq, s_freq, t_freq, total_instances) -> Column:
    """PPMI (reference ``_compute_ppmi``, generators.py:108-118)."""
    return mutual_information_col(co_freq, s_freq, t_freq, total_instances, None)


def npmi_col(co_freq, s_freq, t_freq, total_instances) -> Column:
    """NPMI (reference ``_compute_npmi``, generators.py:121-131)."""
    return mutual_information_col(
        co_freq, s_freq, t_freq, total_instances, "normalized"
    )


def npmi_distance_col(npmi: Column) -> Column:
    """1/npmi with +inf at 0 (reference cord19kg/utils.py:613-614, 669-671)."""
    return F.when(npmi > F.lit(0.0), F.lit(1.0) / npmi).otherwise(
        F.lit(float("inf"))
    )
