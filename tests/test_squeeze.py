"""Squeeze end-to-end on instances with injected causes, plus unit checks
of the driver-side 1-D machinery."""
import itertools

import numpy as np
import pandas as pd

from riskloc_spark.operators.squeeze import (
    SqueezeOptions,
    density_cluster_1d,
    kneedle_knee,
    squeeze,
)


def make_instance(seed=21, anomaly=("a1", "b2"), severity=0.75):
    rng = np.random.default_rng(seed)
    rows = []
    for a, b, c in itertools.product(
        [f"a{i}" for i in range(4)], [f"b{i}" for i in range(4)], [f"c{i}" for i in range(6)]
    ):
        predict = float(rng.uniform(80, 120))
        real = predict * (1 + rng.uniform(-0.02, 0.02))
        if (a, b) == anomaly:
            real = predict * (1 - severity - rng.uniform(0, 0.05))
        rows.append((a, b, c, real, predict))
    return pd.DataFrame(rows, columns=["a", "b", "c", "real", "predict"])


def test_kneedle_knee_simple():
    x = np.linspace(0, 1, 100)
    y = np.sqrt(x)  # concave increasing, knee in the lower range
    knee = kneedle_knee(x, y)
    assert knee is not None and 0.0 < knee < 0.5


def test_density_cluster_separates_anomalies():
    rng = np.random.default_rng(1)
    normal = rng.normal(0, 0.01, 300)
    anom = rng.normal(0.8, 0.02, 30)
    ranges = density_cluster_1d(
        np.concatenate([normal, anom]), SqueezeOptions()
    )
    assert ranges, "no clusters found"
    assert any(lo > 0.5 for lo, hi in ranges)
    # the near-zero normal mass must NOT form a cluster
    assert all(abs((lo + hi) / 2) > 0.2 for lo, hi in ranges)


def test_squeeze_finds_injected_cause(spark):
    pdf = make_instance()
    df = spark.createDataFrame(pdf)
    causes = squeeze(df, ["a", "b", "c"])
    assert causes, "no root cause found"
    joined = ";".join(causes)
    assert "a=a1" in joined and "b=b2" in joined


def test_squeeze_multiple_causes(spark):
    pdf = make_instance()
    # second, opposite-direction anomaly
    mask = (pdf["a"] == "a3") & (pdf["b"] == "b0")
    pdf.loc[mask, "real"] = pdf.loc[mask, "predict"] * 1.9
    df = spark.createDataFrame(pdf)
    causes = squeeze(df, ["a", "b", "c"])
    joined = ";".join(causes)
    assert "a=a1" in joined and "a=a3" in joined


def test_squeeze_driver_vs_distributed_parity(spark):
    """Adaptive driver fast-path must match the distributed path."""
    pdf = make_instance(seed=33, anomaly=("a1", "b0"))
    df = spark.createDataFrame(pdf)
    fast = squeeze(df, ["a", "b", "c"])
    dist = squeeze(df, ["a", "b", "c"], driver_rows=None)
    assert fast == dist


def test_squeeze_derived_ratio_input(spark):
    """Derived measures enter squeeze as ratio columns (the reference's
    Squeeze(data_list=[a,b], op=divide) computes v=a/b, f=a_f/b_f and
    proceeds identically) — verify localization still works."""
    rng = np.random.default_rng(8)
    rows = []
    for a in [f"a{i}" for i in range(4)]:
        for b in [f"b{i}" for i in range(5)]:
            total = float(rng.integers(500, 1500))
            ok = total * (0.95 + rng.uniform(-0.01, 0.01))
            if a == "a2":
                ok = total * 0.3
            # ratio KPI columns as produced by read_rca_csv_derived
            rows.append((a, b, ok / total, 0.95))
    pdf = pd.DataFrame(rows, columns=["a", "b", "real", "predict"])
    causes = squeeze(spark.createDataFrame(pdf), ["a", "b"])
    assert causes and "a=a2" in ";".join(causes)
