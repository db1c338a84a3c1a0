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

    return sorted({canonical(p) for p in preds})


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
