"""Dataset analysis / statistics tooling.

Parity: reference utils/dataset_statistics.py — label setting over leaf
frames, per-instance anomaly significance, and per-folder residual /
significance summaries used when characterizing the S/L/H/A/B/D/RS
evaluation datasets.

Spark-first notes: ``set_label`` is a WHEN-chain (later causes overwrite
earlier ones row-wise, matching the reference's sequential
``df.loc[cond] = label`` assignments); ``instance_significance`` is ONE
aggregation over the labeled frame — the reference scans the pandas
frame four times per instance.
"""
from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def set_label(df: DataFrame, label: str) -> DataFrame:
    """Add a ``label`` column: each row gets the last cause of ``label``
    ('d=v&d=v;...') whose predicates it satisfies, else 'normal' (ref
    dataset_statistics.py:8-21)."""
    expr = F.lit("normal")
    for cause in label.split(";"):
        cond = None
        for pred in cause.split("&"):
            d, v = pred.split("=", 1)
            eq = F.col(d).cast("string") == F.lit(v)
            cond = eq if cond is None else (cond & eq)
        # later causes overwrite earlier ones -> wrap the previous chain
        expr = F.when(cond, F.lit(cause)).otherwise(expr)
    return df.withColumn("label", expr)


def instance_significance(df: DataFrame) -> dict[str, float]:
    """Normal/abnormal prediction amounts + anomaly significance of one
    labeled frame in ONE aggregation (ref dataset_statistics.py:118-133:
    normal amount/error over label == 'normal', significance =
    abnormal |real-predict| / total predict)."""
    normal = F.col("label") == "normal"
    err = F.abs(F.col("real") - F.col("predict"))
    row = df.agg(
        F.sum(F.when(normal, F.col("predict"))).alias("npa"),
        F.sum(F.when(normal, err)).alias("npe"),
        F.sum(F.when(~normal, err)).alias("ape"),
        F.sum("predict").alias("tp"),
    ).first()
    tp = row["tp"] or 0.0
    return {
        "normal_predict_amount": float(row["npa"] or 0.0),
        "normal_predict_error": float(row["npe"] or 0.0),
        "abnormal_predict_error": float(row["ape"] or 0.0),
        "significance": float((row["ape"] or 0.0) / tp) if tp else 0.0,
    }


def analyze_folder_info(path: str, significance_column: str = "anomaly_significance") -> dict[str, Any]:
    """Folder summary from the injection_info.csv metadata alone (ref
    analyze_single_B_folder / analyze_synthetic_data): total normal
    amounts, residual %, and significance statistics."""
    import csv

    rows = list(
        csv.DictReader(
            open(os.path.join(path, "injection_info.csv"), encoding="utf-8")
        )
    )
    npa = sum(float(r["normal_predict_amount"]) for r in rows)
    npe = sum(float(r["normal_predict_error"]) for r in rows)
    sig = [float(r[significance_column]) for r in rows]
    residuals = [
        float(r["normal_predict_error"]) / float(r["normal_predict_amount"]) * 100
        for r in rows
        if float(r["normal_predict_amount"])
    ]
    case_files = [
        f
        for f in os.listdir(path)
        if f not in ("injection_info.csv", "truth_prediction.csv")
        and not f.startswith(".")
    ]
    return {
        "normal_predict_amount": npa,
        "normal_predict_error": npe,
        "residual_pct": (npe / npa * 100) if npa else 0.0,
        "max_residual_pct": max(residuals, default=0.0),
        "min_residual_pct": min(residuals, default=0.0),
        "mean_significance": sum(sig) / len(sig) if sig else 0.0,
        "significance_values": sig,
        "num_files": len(case_files),
    }


def analyze_folder_leaves(
    spark: SparkSession, path: str, derived: bool = False
) -> dict[str, Any]:
    """Folder summary recomputed from the leaf frames (ref
    analyze_A_D_data's inner loop): per instance, label the leaves from
    injection_info.csv and aggregate significance distributed."""
    import csv

    from riskloc_spark.sources import read_rca_csv, read_rca_csv_derived

    labels = {
        str(r["timestamp"]): r["set"]
        for r in csv.DictReader(
            open(os.path.join(path, "injection_info.csv"), encoding="utf-8")
        )
    }
    stems = sorted(
        {
            f.split(".")[0]
            for f in os.listdir(path)
            if f not in ("injection_info.csv", "truth_prediction.csv")
            and not f.startswith(".")
        }
    )
    npa = npe = 0.0
    sig: list[float] = []
    for stem in stems:
        if derived:
            base = os.path.join(path, stem)
            df, _ = read_rca_csv_derived(spark, base + ".a.csv", base + ".b.csv")
        else:
            df, _ = read_rca_csv(spark, os.path.join(path, stem + ".csv"))
        stats = instance_significance(set_label(df, labels[stem]))
        npa += stats["normal_predict_amount"]
        npe += stats["normal_predict_error"]
        sig.append(stats["significance"])
    return {
        "normal_predict_amount": npa,
        "normal_predict_error": npe,
        "residual_pct": (npe / npa * 100) if npa else 0.0,
        "mean_significance": sum(sig) / len(sig) if sig else 0.0,
        "significance_values": sig,
        "num_files": len(stems),
    }
