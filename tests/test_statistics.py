"""dataset_statistics parity: label setting and significance summaries
vs hand-computed pandas values."""
import numpy as np
import pandas as pd
import pytest

from riskloc_spark.statistics import (
    analyze_folder_info,
    analyze_folder_leaves,
    instance_significance,
    set_label,
)


@pytest.fixture(scope="module")
def labeled_pdf():
    rng = np.random.default_rng(17)
    rows = []
    for a in [f"a{i}" for i in range(4)]:
        for b in [f"b{i}" for i in range(4)]:
            predict = float(rng.uniform(50, 150))
            real = predict * (1 + rng.uniform(-0.05, 0.05))
            rows.append((a, b, real, predict))
    return pd.DataFrame(rows, columns=["a", "b", "real", "predict"])


def test_set_label_matches_reference_semantics(spark, labeled_pdf):
    """Later causes overwrite earlier ones; non-matching rows stay
    'normal' (ref set_label's sequential assignments)."""
    label = "a=a1&b=b2;a=a1&b=b1;a=a3"
    df = set_label(spark.createDataFrame(labeled_pdf), label)
    got = {(r["a"], r["b"]): r["label"] for r in df.collect()}
    for (a, b), lab in got.items():
        if a == "a3":
            assert lab == "a=a3"
        elif (a, b) == ("a1", "b2"):
            assert lab == "a=a1&b=b2"
        elif (a, b) == ("a1", "b1"):
            assert lab == "a=a1&b=b1"
        else:
            assert lab == "normal"


def test_set_label_overwrite_order(spark, labeled_pdf):
    """A row matched by two causes gets the LAST one, like the
    reference's loop of df.loc assignments."""
    df = set_label(spark.createDataFrame(labeled_pdf), "a=a2;a=a2&b=b0")
    got = {(r["a"], r["b"]): r["label"] for r in df.collect()}
    assert got[("a2", "b0")] == "a=a2&b=b0"
    assert got[("a2", "b1")] == "a=a2"


def test_instance_significance_matches_pandas(spark, labeled_pdf):
    label = "a=a1&b=b2;a=a3"
    stats = instance_significance(
        set_label(spark.createDataFrame(labeled_pdf), label)
    )

    pdf = labeled_pdf.copy()
    mask = ((pdf["a"] == "a1") & (pdf["b"] == "b2")) | (pdf["a"] == "a3")
    want_npa = pdf.loc[~mask, "predict"].sum()
    want_npe = (pdf.loc[~mask, "real"] - pdf.loc[~mask, "predict"]).abs().sum()
    want_ape = (pdf.loc[mask, "real"] - pdf.loc[mask, "predict"]).abs().sum()
    want_sig = want_ape / pdf["predict"].sum()

    assert abs(stats["normal_predict_amount"] - want_npa) < 1e-9
    assert abs(stats["normal_predict_error"] - want_npe) < 1e-9
    assert abs(stats["abnormal_predict_error"] - want_ape) < 1e-9
    assert abs(stats["significance"] - want_sig) < 1e-12


def test_folder_summaries_info_vs_leaves(spark, tmp_path):
    """The metadata-based and leaf-recomputed folder summaries agree on a
    generated dataset (note: generator metadata uses |predict| for the
    normal amount; reals here are non-negative so both coincide)."""
    from riskloc_spark.generator import write_rca_dataset

    out = tmp_path / "S"
    write_rca_dataset(
        spark, str(out), preset="S", num_instances=2,
        dimensions={"a": 4, "b": 4, "c": 3},
        zero_rate=(0.0, 0.0), noise_level=(0.0, 0.05),
        anomaly_severity=(0.7, 0.9), num_anomaly=(1, 1),
        num_anomaly_elements=(1, 1),
    )
    from_info = analyze_folder_info(str(out))
    from_leaves = analyze_folder_leaves(spark, str(out))
    assert from_info["num_files"] == 2  # injection_info.csv excluded
    assert from_leaves["num_files"] == 2
    # metadata rounds to 2 decimals; compare loosely
    assert from_info["normal_predict_amount"] == pytest.approx(
        from_leaves["normal_predict_amount"], rel=1e-3
    )
    assert from_info["mean_significance"] == pytest.approx(
        from_leaves["mean_significance"], abs=0.01
    )
