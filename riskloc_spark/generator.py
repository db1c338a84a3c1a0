"""Synthetic RCA instance generator, Spark-side.

Parity target: reference generate_dataset.py (S/L/H datasets) — Weibull
reals, zero rows, relative forecast noise, real/predict swap, and
anomalies injected into randomly chosen cuboids with severity/deviation
scaling. The *leaf frame construction is fully distributed*: the
dimension cross-product is derived arithmetically from ``spark.range``
(no driver materialization), all randomness is column-level
``rand``/``randn`` with fixed seeds, and only the anomaly *locations*
(a handful of (dim, element) choices) live on the driver.
"""
from __future__ import annotations

import math
import random
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dimension_columns(dimensions: dict[str, int]) -> list:
    """id -> one attribute value per dimension via mixed-radix decode."""
    cols = []
    stride = 1
    for dim, size in dimensions.items():
        v = (F.col("id") / stride).cast("long") % size + 1
        cols.append(F.concat(F.lit(dim), v.cast("string")).alias(dim))
        stride *= size
    return cols


def _pick_anomalies(
    dimensions: dict[str, int],
    rng: random.Random,
    num_anomaly: tuple[int, int],
    num_anomaly_elements: tuple[int, int],
    only_last_layer: bool,
) -> list[dict[str, Any]]:
    """Anomaly locations (ref generate_dataset.py:102-162): per anomaly a
    sorted dim subset (cuboid) and element tuples, non-overlapping with
    earlier anomalies on shared dimensions."""
    n_anom = rng.randint(*num_anomaly)
    anomalies: list[dict[str, Any]] = []
    dims = list(dimensions)
    for _ in range(n_anom):
        level = len(dims) if only_last_layer else rng.randint(1, len(dims))
        n_elements = rng.randint(*num_anomaly_elements)
        for _attempt in range(50):
            anomaly_dims = sorted(rng.sample(dims, level))
            lowest = level == len(dims)
            if not lowest and anomaly_dims in [a["dimensions"] for a in anomalies]:
                continue
            per_dim: list[list[str]] = []
            ok = True
            for ad in anomaly_dims:
                avail = set(range(1, dimensions[ad] + 1))
                for a in anomalies:
                    if ad in a["dimensions"]:
                        idx = a["dimensions"].index(ad)
                        avail -= {int(c[idx][len(ad):]) for c in a["cuboids"]}
                if not avail:
                    ok = False
                    break
                per_dim.append(
                    [ad + str(rng.choice(sorted(avail))) for _ in range(n_elements)]
                )
            if not ok:
                continue
            cuboids = list(zip(*per_dim))
            if len(set(cuboids)) < n_elements:
                continue
            anomalies.append({"dimensions": anomaly_dims, "cuboids": cuboids})
            break
    return anomalies


def _mask(anomaly: dict[str, Any]):
    dims = anomaly["dimensions"]
    m = None
    for cuboid in anomaly["cuboids"]:
        c = None
        for d, v in zip(dims, cuboid):
            eq = F.col(d) == F.lit(v)
            c = eq if c is None else (c & eq)
        m = c if m is None else (m | c)
    return m


def generate_labels(anomalies: list[dict[str, Any]]) -> str:
    """ref generate_dataset.py:192-201."""
    labels = []
    for anomaly in anomalies:
        dims = anomaly["dimensions"]
        for element in anomaly["cuboids"]:
            labels.append(
                "&".join(sorted(f"{d}={v}" for d, v in zip(dims, element)))
            )
    return ";".join(labels)


def generate_rca_instance(
    spark: SparkSession,
    dimensions: dict[str, int],
    seed: int = 123,
    weibull_alpha: tuple[float, float] = (0.5, 1.0),
    zero_rate: tuple[float, float] = (0.0, 0.25),
    noise_level: tuple[float, float] = (0.0, 0.25),
    anomaly_severity: tuple[float, float] = (0.2, 1.0),
    anomaly_deviation: tuple[float, float] = (0.0, 0.1),
    num_anomaly: tuple[int, int] = (1, 3),
    num_anomaly_elements: tuple[int, int] = (1, 3),
    only_last_layer: bool = False,
) -> tuple[DataFrame, str, dict[str, Any]]:
    """One synthetic instance (ref generate_dataset.py:232-284). Returns
    (leaf DataFrame, label string, properties dict).

    The frame has prod(dimensions) rows — at dims like the reference's H
    config that is bounded, but nothing here requires it to be: scaling
    the dimension sizes up produces an arbitrarily large distributed
    frame with no driver involvement.
    """
    rng = random.Random(seed)
    zr = rng.uniform(*zero_rate)
    nl = rng.uniform(*noise_level)
    alpha = rng.uniform(*weibull_alpha)

    n = math.prod(dimensions.values())
    df = spark.range(n).select(*_dimension_columns(dimensions))

    # Weibull(alpha) * 100 via inverse transform of U(0,1)
    u = F.rand(seed)
    real = 100.0 * F.pow(-F.log(1.0 - u), 1.0 / alpha)
    real = F.when(F.rand(seed + 1) > zr, real).otherwise(F.lit(0.0))
    df = df.withColumn("real", real)
    predict = F.col("real") * (1.0 + F.randn(seed + 2) * nl)
    df = df.withColumn("predict", predict)

    # swap half for symmetric error distribution (ref :252-259)
    swap = F.rand(seed + 3) >= 0.5
    df = df.select(
        *dimensions,
        F.when(swap, F.col("predict")).otherwise(F.col("real")).alias("real"),
        F.when(swap, F.col("real")).otherwise(F.col("predict")).alias("predict"),
    ).withColumn(
        "predict", F.when(F.col("predict") < 0, F.lit(0.0)).otherwise(F.col("predict"))
    )

    anomalies = _pick_anomalies(
        dimensions, rng, num_anomaly, num_anomaly_elements, only_last_layer
    )
    properties = []
    for _ in anomalies:
        properties.append(
            {
                "severity": rng.uniform(*anomaly_severity) + nl,
                "deviation": rng.uniform(*anomaly_deviation),
            }
        )

    # direction from the normal-data error sign (ref :264-268)
    sums = df.agg(F.sum("real").alias("r"), F.sum("predict").alias("p")).first()
    direction = 1 if (sums["r"] or 0.0) > (sums["p"] or 0.0) else 0

    for i, anomaly in enumerate(anomalies):
        props = properties[i]
        scale = F.greatest(
            F.lit(1.0) - (F.randn(seed + 10 + i) * props["deviation"] + props["severity"]),
            F.lit(0.0),
        )
        m = _mask(anomaly)
        if direction == 0:
            df = df.withColumn(
                "real", F.when(m, F.col("predict") * scale).otherwise(F.col("real"))
            )
        else:
            df = df.withColumn(
                "predict", F.when(m, F.col("real") * scale).otherwise(F.col("predict"))
            )

    label = generate_labels(anomalies)
    meta = {
        "zero_rate": zr,
        "noise_level": nl,
        "direction": direction,
        "anomalies": anomalies,
        "properties": properties,
    }
    return df, label, meta


# --------------------------------------------------------------------------
# named presets + dataset persistence (ref generate_dataset.py:30-67 and
# the __main__ writer at :287-313)
# --------------------------------------------------------------------------

# The S/L/H configurations published in the reference's comments
# (generate_dataset.py:34-58): dimension sizes, seed, and the parameter
# ranges that differ from the defaults.
PRESETS: dict[str, dict[str, Any]] = {
    "S": {
        "dimensions": {"a": 10, "b": 12, "c": 10, "d": 8, "e": 5},
        "seed": 121,
        "noise_level": (0.0, 0.25),
        "anomaly_severity": (0.2, 1.0),
        "anomaly_deviation": (0.0, 0.1),
        "num_anomaly": (1, 3),
        "num_anomaly_elements": (1, 3),
        "only_last_layer": False,
    },
    "L": {
        "dimensions": {"a": 10, "b": 24, "c": 10, "d": 15},
        "seed": 122,
        "noise_level": (0.0, 0.1),
        "anomaly_severity": (0.5, 1.0),
        "anomaly_deviation": (0.0, 0.0),
        "num_anomaly": (1, 5),
        "num_anomaly_elements": (1, 1),
        "only_last_layer": True,
    },
    "H": {
        "dimensions": {"a": 10, "b": 5, "c": 250, "d": 20, "e": 8, "f": 12},
        "seed": 123,
        "noise_level": (0.0, 0.25),
        "anomaly_severity": (0.2, 1.0),
        "anomaly_deviation": (0.0, 0.1),
        "num_anomaly": (1, 3),
        "num_anomaly_elements": (1, 3),
        "only_last_layer": False,
    },
}


def preset_config(preset: str, **overrides) -> dict[str, Any]:
    """A copy of a named preset with overrides applied (e.g. scaled-down
    ``dimensions`` for tests)."""
    cfg = {k: v for k, v in PRESETS[preset].items()}
    cfg.update(overrides)
    return cfg


def instance_metadata(
    df: DataFrame, meta: dict[str, Any]
) -> dict[str, Any]:
    """The reference's per-instance metadata row (create_metadata,
    generate_dataset.py:203-229) as ONE distributed aggregation."""
    from functools import reduce as _reduce

    masks = [_mask(a) for a in meta["anomalies"]]
    m = _reduce(lambda a, b: a | b, masks)
    err = F.abs(F.col("real") - F.col("predict"))
    row = df.agg(
        F.sum("real").alias("tr"),
        F.sum("predict").alias("tp"),
        F.sum(F.when(~m, F.abs(F.col("predict")))).alias("npa"),
        F.sum(F.when(~m, err)).alias("npe"),
        F.sum(F.when(m, F.abs(F.col("predict")))).alias("apa"),
        F.sum(F.when(m, err)).alias("ape"),
    ).first()
    tp = row["tp"] or 0.0
    props = meta["properties"]
    return {
        "total_real_amount": round(row["tr"] or 0.0, 2),
        "total_predict_amount": round(tp, 2),
        "normal_predict_amount": round(row["npa"] or 0.0, 2),
        "normal_predict_error": round(row["npe"] or 0.0, 2),
        "abnormal_predict_amount": round(row["apa"] or 0.0, 2),
        "abnormal_predict_error": round(row["ape"] or 0.0, 2),
        "anomaly_significance": round((row["ape"] or 0.0) / tp if tp else 0.0, 2),
        "zero_rate": round(meta["zero_rate"], 2),
        "noise_level": round(meta["noise_level"], 2),
        "elements_per_anomaly": ";".join(
            str(len(a["cuboids"])) for a in meta["anomalies"]
        ),
        "anomaly_severity": ";".join(str(round(p["severity"], 2)) for p in props),
        "anomaly_deviation": ";".join(str(round(p["deviation"], 2)) for p in props),
        "anomaly_direction": meta["direction"],
    }


def _write_single_csv(df: DataFrame, path: str) -> None:
    """Write a frame as ONE csv file (the reference's on-disk format is a
    single csv per instance). coalesce(1) keeps the write streaming
    through one task instead of materializing on the driver."""
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(dir=os.path.dirname(path) or ".")
    try:
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
        shutil.move(part, path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_rca_dataset(
    spark: SparkSession,
    out_dir: str,
    preset: str | None = None,
    num_instances: int = 1,
    **overrides,
) -> list[str]:
    """Generate and persist a labeled dataset directory (ref
    generate_dataset.py:297-313): one <name>.csv per instance plus an
    injection_info.csv with the label ('set') and metadata columns. The
    output is directly consumable by the CLI's directory batch mode.
    Returns the instance file names."""
    import csv
    import os

    cfg = preset_config(preset, **overrides) if preset else dict(overrides)
    seed0 = cfg.pop("seed", 123)
    rng = random.Random(seed0)
    os.makedirs(out_dir, exist_ok=True)

    used: set[str] = set()
    names: list[str] = []
    info_rows: list[dict[str, Any]] = []
    for i in range(num_instances):
        name = str(rng.randint(10**5, 10**6 - 1))
        while name in used:
            name = str(rng.randint(10**5, 10**6 - 1))
        used.add(name)
        names.append(name)

        df, label, meta = generate_rca_instance(spark, seed=seed0 + i, **cfg)
        df = df.persist()
        try:
            md = instance_metadata(df, meta)
            _write_single_csv(df, os.path.join(out_dir, name + ".csv"))
        finally:
            df.unpersist()
        info_rows.append({"timestamp": name, "set": label, **md})

    with open(
        os.path.join(out_dir, "injection_info.csv"), "w", newline="", encoding="utf-8"
    ) as fh:
        w = csv.DictWriter(fh, fieldnames=list(info_rows[0].keys()))
        w.writeheader()
        w.writerows(info_rows)
    return names
