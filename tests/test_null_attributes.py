"""NULL-valued attribute dimensions must round-trip through every search.

concat_ws silently drops NULL parts, so before elem_expr (plans/cuboid.py)
a NULL dimension value collapsed distinct tuples into the same element key
and misaligned elem.split against the cuboid list. These tests plant the
root cause ON a NULL-valued element and require each search to localize it
(rendered as 'None', matching the driver paths' str() output).
"""
import itertools

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import types as T

from riskloc_spark.operators.autoroot import autoroot
from riskloc_spark.operators.hotspot import hotspot
from riskloc_spark.operators.riskloc import riskloc
from riskloc_spark.operators.squeeze import squeeze


SCHEMA = T.StructType(
    [
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.StringType()),
        T.StructField("real", T.DoubleType()),
        T.StructField("predict", T.DoubleType()),
    ]
)


def make_null_instance(seed=7, severity=(0.7, 0.9)):
    """3-dim frame where dimension b includes a NULL value and the
    injected cause is (a=a1, b=NULL)."""
    rng = np.random.default_rng(seed)
    rows = []
    b_vals = [f"b{i}" for i in range(4)] + [None]
    for a, b, c in itertools.product(
        [f"a{i}" for i in range(5)], b_vals, [f"c{i}" for i in range(10)]
    ):
        predict = float(rng.uniform(50, 150))
        real = predict * (1 + rng.uniform(-0.02, 0.02))
        if a == "a1" and b is None:
            real = predict * (1 - rng.uniform(*severity))
        rows.append((a, b, c, real, predict))
    return pd.DataFrame(rows, columns=["a", "b", "c", "real", "predict"])


@pytest.fixture(scope="module")
def null_df(spark):
    return spark.createDataFrame(make_null_instance(), schema=SCHEMA).cache()


def _riskloc_found(causes):
    return {
        "&".join(sorted(f"{d}={v}" for d, v in zip(rc["cuboid"], rc["elements"][0])))
        for rc in causes
    }


def test_riskloc_distributed_null_dim(null_df):
    causes = riskloc(null_df, ["a", "b", "c"], driver_rows=None)
    assert "a=a1&b=None" in _riskloc_found(causes)


def test_riskloc_driver_vs_distributed_parity_null(null_df):
    drv = riskloc(null_df, ["a", "b", "c"], driver_rows=10**9)
    dist = riskloc(null_df, ["a", "b", "c"], driver_rows=None)
    key = lambda c: (tuple(c["cuboid"]), tuple(map(tuple, c["elements"])))
    assert sorted(map(key, drv)) == sorted(map(key, dist))
    for d_rc, x_rc in zip(
        sorted(drv, key=key), sorted(dist, key=key)
    ):
        assert abs(d_rc["risk score"] - x_rc["risk score"]) < 1e-6


def test_autoroot_distributed_null_dim(null_df):
    causes = autoroot(null_df, ["a", "b", "c"], driver_rows=None)
    flat = {v for rc in causes for e in rc["elements"] for v in e}
    assert "None" in flat, causes


def test_squeeze_distributed_null_dim(null_df):
    out = squeeze(null_df, ["a", "b", "c"], driver_rows=None)
    assert any("None" in rc for rc in out), out


def test_hotspot_null_dim(null_df):
    best = hotspot(null_df, ["a", "b", "c"], max_elements=None)
    elems = best["elements"]
    flat = "&".join("&".join(e) if isinstance(e, (list, tuple)) else e for e in elems)
    assert "None" in flat, best
