"""Derived-measure (a/b ratio KPI) end-to-end: the D-dataset path of the
reference (run_utils.py:75-86) through riskloc and adtributor."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from riskloc_spark.functions.scores import add_explanatory_power, add_surprise
from riskloc_spark.operators.adtributor import adtributor
from riskloc_spark.operators.riskloc import riskloc


@pytest.fixture(scope="module")
def derived_pdf():
    """Success-rate KPI: real = real_a/real_b crashes for a=a1 leaves."""
    rng = np.random.default_rng(17)
    rows = []
    for a in [f"a{i}" for i in range(5)]:
        for b in [f"b{i}" for i in range(6)]:
            total = float(rng.integers(800, 1200))
            rate = 0.96 + rng.uniform(-0.01, 0.01)
            ok = total * rate
            if a == "a1":
                ok = total * (0.35 + rng.uniform(0, 0.02))
            rows.append((a, b, ok, total * 0.96, total, total))
    pdf = pd.DataFrame(
        rows, columns=["a", "b", "real_a", "predict_a", "real_b", "predict_b"]
    )
    pdf["real"] = pdf["real_a"] / pdf["real_b"]
    pdf["predict"] = pdf["predict_a"] / pdf["predict_b"]
    return pdf


def test_derived_ep_sums_to_one(spark, derived_pdf):
    df = add_explanatory_power(spark.createDataFrame(derived_pdf), derived=True)
    total = df.agg(F.sum("ep")).first()[0]
    assert abs(total - 1.0) < 1e-9


def test_derived_surprise_finite(spark, derived_pdf):
    df = add_surprise(
        spark.createDataFrame(derived_pdf), derived=True, merged_divide=1
    )
    vals = [r[0] for r in df.select("surprise").collect()]
    assert all(np.isfinite(v) for v in vals)


def test_riskloc_derived_finds_cause(spark, derived_pdf):
    causes = riskloc(
        spark.createDataFrame(derived_pdf), ["a", "b"],
        derived=True, risk_threshold=0.3,
    )
    assert causes, "no root cause found on derived measures"
    flat = {v for rc in causes for e in rc["elements"] for v in e}
    assert "a1" in flat


def test_adtributor_derived_finds_cause(spark, derived_pdf):
    out = adtributor(
        spark.createDataFrame(derived_pdf), ["a", "b"],
        teep=0.05, tep=0.1, derived=True,
    )
    assert out, "no candidate set"
    top = out[0]
    assert top["dimension"] == "a"
    assert "a1" in top["elements"]


def test_riskloc_derived_driver_vs_distributed_parity(spark, derived_pdf):
    df = spark.createDataFrame(derived_pdf)
    drv = riskloc(df, ["a", "b"], derived=True, risk_threshold=0.3)
    dist = riskloc(
        df, ["a", "b"], derived=True, risk_threshold=0.3, driver_rows=None
    )
    key = lambda c: (tuple(c["cuboid"]), tuple(map(tuple, c["elements"])))
    assert sorted(map(key, drv)) == sorted(map(key, dist))


def test_rev_rec_derived_driver_vs_distributed_parity(spark, derived_pdf):
    """Exercises the fused recursion's derived branch (window-summed EP
    normalization + two-term surprise) against the pandas path."""
    from riskloc_spark.operators.adtributor import rev_rec_adtributor

    df = spark.createDataFrame(derived_pdf)
    drv = rev_rec_adtributor(df, ["a", "b"], derived=True, driver_rows=10**9)
    dist = rev_rec_adtributor(df, ["a", "b"], derived=True, driver_rows=None)
    key = lambda cs: (cs["dimension"], tuple(map(tuple, cs["elements"])))
    assert sorted(map(key, drv)) == sorted(map(key, dist))
