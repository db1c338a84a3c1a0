"""Histogram quantiles (functions/stats.py): Type-1 inverse-CDF
parity with numpy on integer lattices, keyed cuts, NULL exclusion,
lattice rounding."""
import numpy as np

from riskloc_spark.functions.stats import histogram_quantiles


def test_histogram_quantiles_match_type1_exact_on_integers(spark):
    vals = [int(v) for v in np.random.default_rng(7).integers(0, 500, 3000)]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    got = {
        r["q"]: r["value"]
        for r in histogram_quantiles(df, "x", qs).collect()
    }
    arr = np.sort(np.array(vals))
    n = len(arr)
    for q in qs:
        # Type 1: smallest x with cum >= ceil(q*n)
        want = float(arr[int(np.ceil(q * n)) - 1])
        assert got[q] == want, (q, got[q], want)


def test_histogram_quantiles_keyed_nulls_and_resolution(spark):
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", 10.0), ("b", 20.0), ("b", None)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        (r["g"], r["q"]): r["value"]
        for r in histogram_quantiles(
            df, "x", [0.5, 1.0], key_cols=["g"], resolution=10.0
        ).collect()
    }
    # g=a: lattice cells floor(x/10)*10; median of 100 values -> cell
    # holding the 50th value (x=50 -> cell 50.0)
    assert got[("a", 0.5)] == 50.0
    assert got[("a", 1.0)] == 100.0
    # g=b: NULL excluded, n=2 -> q=0.5 needs 1 value -> 10.0
    assert got[("b", 0.5)] == 10.0
    assert got[("b", 1.0)] == 20.0
