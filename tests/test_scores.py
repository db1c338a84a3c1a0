"""Score primitives vs hand-computed numpy (formulas from the paper /
reference utils/element_scores.py)."""
import numpy as np
import pandas as pd
import pytest

from riskloc_spark.functions.scores import (
    add_deviation_score,
    add_explanatory_power,
    add_partition,
    add_surprise,
    add_weight,
    get_cutoff,
)


@pytest.fixture(scope="module")
def small(spark):
    pdf = pd.DataFrame(
        {
            "a": ["x", "x", "y", "y", "z"],
            "b": ["1", "2", "1", "2", "1"],
            "real": [10.0, 20.0, 5.0, 0.0, 40.0],
            "predict": [12.0, 18.0, 9.0, 0.0, 30.0],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_explanatory_power(spark, small):
    df, pdf = small
    out = add_explanatory_power(df).orderBy("a", "b").toPandas()
    A, Fv = pdf["real"].sum(), pdf["predict"].sum()
    expected = (pdf["real"] - pdf["predict"]) / (A - Fv)
    np.testing.assert_allclose(
        np.sort(out["ep"].values), np.sort(expected.values), rtol=1e-9
    )
    assert abs(out["ep"].sum() - 1.0) < 1e-9


def test_deviation(spark, small):
    df, pdf = small
    out = add_deviation_score(df).orderBy("a", "b").toPandas()
    pdf = pdf.sort_values(["a", "b"])
    denom = pdf["predict"] + pdf["real"]
    expected = np.where(denom == 0, 0.0, 2 * (pdf["predict"] - pdf["real"]) / denom)
    np.testing.assert_allclose(out["deviation"].values, expected, rtol=1e-9)
    assert (out["deviation"].abs() <= 2.0).all()


def test_surprise(spark, small):
    df, pdf = small
    out = add_surprise(df).orderBy("a", "b").toPandas()
    pdf = pdf.sort_values(["a", "b"])
    Fv, A = pdf["predict"].sum(), pdf["real"].sum()
    p, q = pdf["predict"] / Fv, pdf["real"] / A
    with np.errstate(divide="ignore", invalid="ignore"):
        p_term = np.nan_to_num(p * np.log(2 * p / (p + q)))
        q_term = np.nan_to_num(q * np.log(2 * q / (p + q)))
    expected = 0.5 * (p_term + q_term)
    np.testing.assert_allclose(out["surprise"].values, expected, rtol=1e-9)


def test_cutoff_partition_weight(spark):
    pdf = pd.DataFrame(
        {
            "real": np.arange(20, dtype=float) + 1,
            "predict": np.concatenate([np.arange(15, dtype=float) + 1.5, [30, 40, 50, 60, 70]]),
        }
    )
    df = spark.createDataFrame(pdf)
    df = add_deviation_score(df)
    cutoff = get_cutoff(df, n_remove=2)

    devs = (
        add_deviation_score(spark.createDataFrame(pdf)).toPandas()["deviation"].drop_duplicates()
    )
    min_val = devs.nsmallest(3).max()
    max_val = devs.nlargest(3).min()
    expected = -min(min_val, max_val, key=abs)
    assert abs(cutoff - expected) < 1e-12

    out = add_weight(add_partition(df, cutoff), cutoff).toPandas()
    anomaly_right = cutoff >= 0
    exp_part = (
        (out["deviation"] > cutoff) if anomaly_right else (out["deviation"] < cutoff)
    ).astype(int)
    assert (out["partition"] == exp_part).all()
    w = (cutoff - out["deviation"]).abs()
    w[(out["real"] == 0) & (out["predict"] == 0)] = 0
    w = np.where(out["partition"] == 1, out["deviation"].abs(), w)
    w = np.minimum(w, 1.0)
    np.testing.assert_allclose(out["weight"].values, w, rtol=1e-9)
