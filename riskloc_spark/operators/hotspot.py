"""HotSpot: MCTS search over element subsets with ripple-effect scoring.

Parity: reference algorithms/hotspot.py:218-260 (MCTS :172-200, scores
:29-63). Spark-first decomposition: ps and gps scores of ANY element
subset are exact functions of per-element sufficient statistics
(plans/cuboid.element_stats), because the ripple ratio V_e/F_e is
per-element. So each cuboid costs ONE distributed pass; the MCTS runs on
the driver over a compact stats table and never touches leaf data.

Scale note: stats rows per cuboid = #elements. ``max_elements`` caps the
driver transfer per cuboid (default 20k, ranked by |V-F| — the anomaly
magnitude; un-anomalous elements can't contribute to a ps/gps score), so
the collect is bounded regardless of cuboid cardinality."""
from __future__ import annotations

import math
import random
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from riskloc_spark.plans.cuboid import (
    ELEM_SEP,
    cuboids_of_layer,
    element_stats_all,
)


class _SetScorer:
    """Exact ps/gps of an element subset from per-element stats."""

    def __init__(self, stats: dict[tuple, dict[str, float]], totals: dict[str, float]):
        self.stats = stats
        self.totals = totals  # N, B_tot, Q_tot

    def gps(self, selected: list[tuple]) -> float:
        # ref hotspot.py:40-63: a,b means over selected leaves, c over rest
        n = sum(self.stats[e]["n_e"] for e in selected)
        A = sum(self.stats[e]["A_e"] for e in selected)
        B = sum(self.stats[e]["B_e"] for e in selected)
        a = A / n if n else 0.0
        b = B / n if n else 0.0
        n_rest = self.totals["N"] - n
        c = (self.totals["B_tot"] - B) / n_rest if n_rest > 0 else 0.0
        denom = b + c
        return 1 - ((a + c) / denom) if denom != 0 else 0.0

    def ps(self, selected: list[tuple]) -> float:
        # ref hotspot.py:29-37: euclidean distance over the full leaf
        # vector; replaced leaves contribute P_e, untouched ones Q_e
        P = sum(self.stats[e]["P_e"] for e in selected)
        Q = sum(self.stats[e]["Q_e"] for e in selected)
        q_tot = self.totals["Q_tot"]
        if q_tot == 0:
            return 0.0
        return max(1 - math.sqrt(q_tot - Q + P) / math.sqrt(q_tot), 0.0)


class _Node:
    __slots__ = ("parent", "state", "children", "fully_expanded", "Q", "N")

    def __init__(self):
        self.parent = None
        self.state: list[tuple] = []
        self.children: list[_Node] = []
        self.fully_expanded = False
        self.Q = 0.0
        self.N = 0


def _ucb(node: _Node, C: float = math.sqrt(2.0)) -> _Node | None:
    best, best_score = None, -1.0
    for child in node.children:
        if child.N > 0 and not child.fully_expanded:
            score = child.Q + C * math.sqrt(math.log(node.N) / child.N)
            if score > best_score:
                best, best_score = child, score
    return best


def _mcts(
    elements: list[tuple],
    scorer,
    pt: float,
    m: int,
    rng: random.Random,
) -> tuple[list[tuple], float]:
    """Monte-Carlo tree search over element subsets (ref hotspot.py:108-200).
    States are element lists; expansion is guided by single-element scores."""
    element_scores = {e: scorer([e]) for e in elements}
    root = _Node()
    max_q = -1.0
    best_state: list[tuple] = []

    def select(node: _Node) -> _Node:
        while len(node.state) < len(elements):
            if not node.children:
                for e in elements:
                    if e not in set(node.state):
                        child = _Node()
                        child.state = node.state + [e]
                        child.parent = node
                        node.children.append(child)
                return node
            q_max, all_visit = 0.0, True
            for child in node.children:
                q_max = max(q_max, child.Q)
                if child.N == 0:
                    all_visit = False
            if not all_visit and rng.random() > q_max:
                return node
            nxt = _ucb(node)
            if nxt is None:
                if all_visit:
                    node.fully_expanded = True
                    if node.parent is None:
                        return node
                    node = node.parent
                else:
                    return node
            else:
                node = nxt
        node.fully_expanded = True
        return node

    def expand(node: _Node) -> _Node | None:
        best, best_score = None, -1.0
        for child in node.children:
            if child.N == 0:
                s = element_scores[child.state[-1]]
                if s > best_score:
                    best, best_score = child, s
        return best

    for _ in range(m):
        node = select(root)
        if not node.fully_expanded:
            expanded = expand(node)
            if expanded is not None:
                node = expanded
        if root.fully_expanded:
            break
        new_q = scorer(node.state)
        walker = node
        while walker is not None:
            walker.N += 1
            walker.Q = max(walker.Q, new_q)
            walker = walker.parent
        if new_q > max_q:
            max_q = root.Q
            best_state = list(node.state)
        elif (
            new_q == max_q
            and not set(node.state) <= set(best_state)
            and len(node.state) < len(best_state)
        ):
            max_q = root.Q
            best_state = list(node.state)
        if max_q >= pt:
            break
    return best_state, max_q


_STAT_KEYS = ("n_e", "V_e", "F_e", "A_e", "B_e", "P_e", "Q_e")


def _collect_stats_all(
    df: DataFrame, cuboids: list[list[str]], max_elements: int | None
) -> list[dict[tuple, dict[str, float]]]:
    """Stats for EVERY cuboid in one fused job (element_stats_all)."""
    stats_df = element_stats_all(df, cuboids)
    if max_elements is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("cid").orderBy(
            F.abs(F.col("V_e") - F.col("F_e")).desc(), F.col("elem").asc()
        )
        stats_df = (
            stats_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_elements)
            .drop("__rn")
        )
    out: list[dict[tuple, dict[str, float]]] = [dict() for _ in cuboids]
    for r in stats_df.collect():
        out[r["cid"]][tuple(r["elem"].split(ELEM_SEP))] = {
            k: float(r[k]) for k in _STAT_KEYS
        }
    return out


def hotspot(
    df: DataFrame,
    dimensions: list[str],
    pt: float = 0.67,
    m: int = 200,
    scoring: str = "gps",
    max_elements: int | None = 20_000,
    seed: int = 0,
) -> dict[str, Any]:
    """Reference hotspot.py:218-260. Returns the best candidate dict.

    ``max_elements`` bounds the per-cuboid driver transfer (default 20k):
    elements are ranked by |V_e - F_e| — the anomaly magnitude that alone
    determines whether an element can contribute to a ps/gps score — and
    only the top slice reaches the MCTS. ``None`` restores the unbounded
    collect (test/debug only; at scale a cuboid can exceed driver memory)."""
    assert scoring in ("ps", "gps")
    use_pruning = scoring != "gps"

    # string-normalize attribute values once so driver-side set logic is
    # type-stable (reference operates on raw numpy tuples)
    for d in dimensions:
        df = df.withColumn(
            d, F.coalesce(F.col(d).cast("string"), F.lit("None"))
        )
    df = df.persist()

    # x*x instead of pow(x, 2): exactly-rounded IEEE multiply, matching
    # element_stats_all's Q_e terms and the DuckDB twin bitwise (libm
    # pow may differ by 1 ulp per engine)
    _qd = F.col("real") - F.col("predict")
    totals_row = df.agg(
        F.count(F.lit(1)).alias("N"),
        F.sum(F.abs(F.col("real") - F.col("predict"))).alias("B_tot"),
        F.sum(_qd * _qd).alias("Q_tot"),
    ).first()
    totals = {k: float(totals_row[k]) for k in ("N", "B_tot", "Q_tot")}

    rng = random.Random(seed)
    candidate_set: list[dict[str, Any]] = []
    try:
        # ALL cuboid stats in one fused job — pruning only filters the
        # driver-side element lists, so precollection is semantics-free
        all_cuboids = [
            c
            for layer in range(1, len(dimensions) + 1)
            for c in cuboids_of_layer(dimensions, layer)
        ]
        all_stats = _collect_stats_all(df, all_cuboids, max_elements)
        stats_of = dict(zip(map(tuple, all_cuboids), all_stats))

        for layer in range(1, len(dimensions) + 1):
            for cuboid in cuboids_of_layer(dimensions, layer):
                stats = stats_of[tuple(cuboid)]
                elements = list(stats.keys())

                if use_pruning and layer > 1:
                    # hierarchical pruning (ref hotspot.py:203-209): keep
                    # elements refining some previous-layer candidate
                    prev = [
                        c["elements"]
                        for c in candidate_set
                        if c["layer"] == layer - 1 and set(c["cuboid"]) < set(cuboid)
                    ]
                    for parent_sel in prev:
                        elements = [
                            e
                            for e in elements
                            if any(set(pe) < set(e) for pe in parent_sel)
                        ]

                scorer_obj = _SetScorer(stats, totals)
                score_fn = scorer_obj.ps if scoring == "ps" else scorer_obj.gps
                selected, score = _mcts(elements, score_fn, pt, m, rng)

                candidate = {
                    "layer": layer,
                    "cuboid": list(cuboid),
                    "score": score,
                    "elements": [list(e) for e in selected],
                }
                if candidate["score"] >= pt:
                    return candidate
                candidate_set.append(candidate)
    finally:
        df.unpersist()

    # best by (score, -layer, -len(elements)) (ref hotspot.py:212-215)
    return sorted(
        candidate_set,
        key=lambda c: (c["score"], -c["layer"], -len(c["elements"])),
        reverse=True,
    )[0]
