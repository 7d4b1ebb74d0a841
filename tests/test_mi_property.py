"""Property-based check of the MI kernel against a pure-Python model of the
reference ``mutual_information`` (semantics of
/root/reference/bluegraph/preprocess/generators.py:27-73: pmi/npmi variants,
alpha==0 guard, final <=0 clamp)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bluegraph_spark.functions.mi import mutual_information_col

MITYPES = (None, "expected", "normalized", "pmi2", "pmi3")


def mi_model(co, s, t, n, mitype):
    if co == 0:
        return 0.0
    pmi = math.log2(n * co / (s * t))
    if mitype is None:
        mi = pmi
    elif mitype == "expected":
        mi = pmi * (co / n)
    elif mitype == "normalized":
        alpha = -math.log2(co / n)
        mi = pmi / alpha if alpha != 0 else 0.0
    elif mitype == "pmi2":
        mi = math.log2((co * co) / (s * t))
    elif mitype == "pmi3":
        mi = math.log2((co * co * co) / (s * t * n))
    return mi if mi > 0 else 0.0


# Constraint from the generator: co <= min(s, t) <= max(s, t) <= n.
cases = st.tuples(
    st.integers(0, 50), st.integers(1, 100), st.integers(1, 100), st.integers(1, 1000)
).map(lambda q: (min(q[0], q[1], q[2]), q[1], q[2], max(q[3], q[1], q[2])))


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(cases, min_size=1, max_size=24))
def test_mi_matches_reference_model(spark, batch):
    df = spark.createDataFrame(batch, "co long, s long, t long, n long")
    cols = [
        mutual_information_col(
            F.col("co"), F.col("s"), F.col("t"), F.col("n"), mt
        ).alias(f"m{i}")
        for i, mt in enumerate(MITYPES)
    ]
    rows = df.select("co", "s", "t", "n", *cols).collect()
    for r in rows:
        for i, mt in enumerate(MITYPES):
            expected = mi_model(r["co"], r["s"], r["t"], r["n"], mt)
            assert r[f"m{i}"] == pytest.approx(expected, abs=1e-9), (
                r["co"], r["s"], r["t"], r["n"], mt,
            )
