"""Root-cause evaluation: F1 vs ground-truth labels.

Parity: reference utils/evaluation.py:4-60. Labels are strings of the
form 'd1=v1&d2=v2;d3=v3' — ';' separates causes, '&' joins the
dim=value predicates of one cause (sorted for canonical comparison).
"""
from __future__ import annotations

from typing import Any, Iterable


def canonical(cause: str) -> str:
    return "&".join(sorted(cause.split("&")))


def score_root_causes(
    root_cause_predictions: Iterable[str], label: str
) -> tuple[int, int, int, list[str]]:
    """TP/FP/FN of predicted cause strings vs a label string
    (ref utils/evaluation.py:4-28)."""
    true_labels = sorted({canonical(tl) for tl in label.split(";")})
    preds = list(root_cause_predictions)
    if len(preds) == 0:
        return 0, 0, len(true_labels), true_labels

    tp = sum(1 for tl in true_labels if tl in preds)
    fn = len(true_labels) - tp
    fp = max(len(preds) - tp, 0)
    return tp, fp, fn, true_labels


def root_cause_postprocessing(
    root_causes: Any, algorithm: str
) -> list[str]:
    """Unify per-algorithm output shapes into sorted 'd=v&d=v' strings
    (ref utils/evaluation.py:31-60)."""
    preds: list[str] = []
    if algorithm == "adtributor":
        for rc in root_causes:
            rc["elements"] = [[e] for e in rc["elements"]]
            rc["cuboid"] = [rc["dimension"]]

    if algorithm == "robustspot":
        for rc in root_causes:
            preds.extend(
                "&".join(f"{c}={v}" for c, v in cause) for cause in rc
            )
    elif algorithm == "squeeze":
        preds = list(root_causes)
    else:
        for rc in root_causes:
            for element in rc["elements"]:
                preds.append(
                    "&".join(f"{d}={v}" for d, v in zip(rc["cuboid"], element))
                )

    # reference order of operations (utils/evaluation.py:57-60):
    # np.unique on the RAW strings FIRST, then canonicalize each — two
    # orderings of the same cause ('a=1&b=2' vs 'b=2&a=1') survive the
    # unique and canonicalize to DUPLICATE predictions, which
    # score_root_causes counts as extra FPs (len(preds) - tp).
    # Deduping after canonicalization would silently improve F1 in that
    # corner; mirrored bug-for-bug instead.
    return [canonical(p) for p in sorted(set(preds))]


def f1(tp: int, fp: int, fn: int) -> float:
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def evaluate_batch(
    results: Iterable[tuple[Iterable[str], str]]
) -> dict[str, float]:
    """Aggregate F1 over (predictions, label) pairs — the reference's
    dataset-level protocol (run.py aggregates per-file TP/FP/FN)."""
    TP = FP = FN = 0
    for preds, label in results:
        tp, fp, fn, _ = score_root_causes(preds, label)
        TP, FP, FN = TP + tp, FP + fp, FN + fn
    return {"tp": TP, "fp": FP, "fn": FN, "f1": f1(TP, FP, FN)}


def evaluate_df(
    preds,
    labels,
    case_col: str = "case_id",
    pred_col: str = "pred",
    label_col: str = "label",
    with_total: bool = True,
):
    """Distributed ``score_root_causes`` + ``evaluate_batch``: per-case
    TP/FP/FN/F1 as set algebra over DataFrames (ref utils/evaluation.py:
    4-28 + run.py's TP/FP/FN aggregation), parity-tested against the
    driver functions.

    ``labels``: one row per case — (case_col, label) with the reference
    label grammar ';' between causes, '&' between a cause's dim=value
    predicates (unordered; canonicalized here exactly like
    ``canonical``). ``preds``: (case_col, pred) — one row per predicted
    cause string, already canonical ('d=v' sorted, the form
    ``root_cause_postprocessing`` emits), duplicates allowed and
    counted as FPs exactly as the reference's ``len(preds) - tp`` does.
    The label frame defines the case set (a case with no pred rows
    scores tp=0, fp=0, fn=n_true — the reference's empty-prediction
    branch). ``with_total`` appends a '__total__' row aggregating
    TP/FP/FN before the F1 (the reference's dataset-level protocol).

    Scale shape: labels/preds are RESULT-sized (a handful of causes per
    case), so every join here is tiny; one explode + three small
    groupBys, no window.
    """
    from pyspark.sql import functions as F

    canon = (
        labels.select(
            case_col, F.explode(F.split(F.col(label_col), ";")).alias("c")
        )
        .select(
            case_col,
            F.array_join(F.array_sort(F.split("c", "&")), "&").alias("tl"),
        )
        .distinct()
    )
    n_true = canon.groupBy(case_col).agg(F.count(F.lit(1)).alias("n_true"))
    n_pred = preds.groupBy(case_col).agg(F.count(F.lit(1)).alias("n_pred"))
    # tp = true labels present in the pred list (string equality against
    # the canonical true label; preds are NOT canonicalized — reference
    # semantics)
    hits = (
        canon.join(
            preds.select(case_col, F.col(pred_col).alias("tl")).distinct(),
            [case_col, "tl"],
            "left_semi",
        )
        .groupBy(case_col)
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    per = (
        n_true.join(n_pred, case_col, "left")
        .join(hits, case_col, "left")
        .select(
            F.col(case_col),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.greatest(
                F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp", F.lit(0)),
                F.lit(0),
            ).cast("long").alias("fp"),
            (F.col("n_true") - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fn"),
        )
    )
    if with_total:
        # `per` feeds two plan branches (the per-case rows and the
        # '__total__' aggregate): without a checkpoint the whole
        # canon/preds/hits join tree executes once per branch.  The
        # frame is RESULT-sized (one row per case), so the
        # materialization is bounded (r16; same rule as the rca frames).
        from riskloc_spark.operators.dedup import reuse_checkpoint

        per = reuse_checkpoint(per)
        total = per.agg(
            F.sum("tp").alias("tp"),
            F.sum("fp").alias("fp"),
            F.sum("fn").alias("fn"),
        ).select(F.lit("__total__").alias(case_col), "tp", "fp", "fn")
        per = per.unionByName(total)
    denom = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    return per.withColumn(
        "f1",
        F.round(
            F.when(denom > 0, 2.0 * F.col("tp") / denom).otherwise(F.lit(0.0)),
            6,
        ),
    )
