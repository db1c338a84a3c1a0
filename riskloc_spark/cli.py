"""CLI mirroring the reference's run.py: algorithm + data path (+label).

Usage:
    python -m riskloc_spark.cli <algorithm> <data> [options]

Algorithms: riskloc, autoroot, squeeze, hotspot, adtributor,
r_adtributor, robustspot (ref run.py / utils/run_utils.py:14-56).

Data forms:
  plain      <case>.csv with attr columns + real + predict
  derived    <case> with <case>.a.csv / <case>.b.csv next to it
  robustspot --rs-data: minute-grain csv (needs --timestamp)
"""
from __future__ import annotations

import argparse
import json


def run_method(df, dfs, attributes, algorithm, derived, spark, args):
    """Dispatch (ref utils/run_utils.py:14-56)."""
    if algorithm == "riskloc":
        from riskloc_spark.operators.riskloc import riskloc

        return riskloc(df, attributes, derived=derived, risk_threshold=args.risk_threshold)
    if algorithm == "autoroot":
        from riskloc_spark.operators.autoroot import autoroot

        return autoroot(df, attributes)
    if algorithm == "squeeze":
        from riskloc_spark.operators.squeeze import squeeze

        return squeeze(df, attributes)
    if algorithm == "hotspot":
        from riskloc_spark.operators.hotspot import hotspot

        return [hotspot(df, attributes)]
    if algorithm == "adtributor":
        from riskloc_spark.operators.adtributor import adtributor

        return adtributor(df, attributes, derived=derived)
    if algorithm == "r_adtributor":
        from riskloc_spark.operators.adtributor import rev_rec_adtributor

        return rev_rec_adtributor(df, attributes, derived=derived)
    if algorithm == "robustspot":
        from riskloc_spark.operators.robustspot import robustspot

        # RS-format frames already carry failure counts in the a measure;
        # skip the reference's success->failure flip (see adapt_frame)
        return robustspot(
            df, attributes, derived=derived, flip_derived=not args.rs_data
        )
    raise ValueError(f"method {algorithm} not implemented")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="riskloc_spark runner")
    p.add_argument("algorithm", choices=[
        "riskloc", "autoroot", "squeeze", "hotspot",
        "adtributor", "r_adtributor", "robustspot",
    ])
    p.add_argument("data", help="csv path (plain), case base path (derived/rs)")
    p.add_argument("--derived", action="store_true")
    p.add_argument("--rs-data", action="store_true")
    p.add_argument("--timestamp", type=int, help="anomalous minute for --rs-data")
    p.add_argument("--label", help="ground-truth 'd=v&d=v;...' for F1 scoring")
    p.add_argument("--risk-threshold", type=float, default=0.5)
    p.add_argument("--cpus", default=None, help="local parallelism override")
    args = p.parse_args(argv)

    from riskloc_spark.session import get_spark

    spark = get_spark("riskloc-spark-cli", master=f"local[{args.cpus}]" if args.cpus else None)
    spark.sparkContext.setLogLevel("ERROR")

    from riskloc_spark.sources import (
        read_rca_csv,
        read_rca_csv_derived,
        read_robustspot_csv,
    )

    if args.rs_data:
        if args.timestamp is None:
            p.error("--rs-data requires --timestamp")
        df, attributes = read_robustspot_csv(spark, args.data, args.timestamp)
        derived = True
    elif args.derived:
        df, attributes = read_rca_csv_derived(
            spark, args.data + ".a.csv", args.data + ".b.csv"
        )
        derived = True
    else:
        df, attributes = read_rca_csv(spark, args.data)
        derived = False

    root_causes = run_method(df, None, attributes, args.algorithm, derived, spark, args)

    from riskloc_spark.evaluation import root_cause_postprocessing, score_root_causes

    preds = root_cause_postprocessing(root_causes, args.algorithm)
    out = {"algorithm": args.algorithm, "root_causes": list(preds)}
    if args.label:
        tp, fp, fn, _ = score_root_causes(preds, args.label)
        denom = 2 * tp + fp + fn
        out |= {"tp": tp, "fp": fp, "fn": fn, "f1": 2 * tp / denom if denom else 0.0}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
