"""RobustSpot: contrast-pattern mining for root-cause localization.

Parity: reference algorithms/robustspot/ (robustspot.py:39-113,
select_expand.py:21-85, ID_CA.py:12-71, mining.py:76-106, final.py:5-70).

Spark-first split of the work:

* Per-leaf scoring — influence degree (ID) and contribution ability (CA)
  — is pure column algebra over global sums: one ``agg`` reduce broadcast
  back with a crossJoin, every row scored partition-parallel. This is the
  part that touches all data and must scale; it is exposed declaratively
  (``robustspot_scores``) and oracle-checked.
* The mining loop operates on *compact state only*: the knee of the
  positive-ID CDF (a bounded driver sample), the anomalous rows that
  survive the ID/CA filter (small by construction — they are the
  anomaly), and per-iteration frequent itemsets over at most
  ``len(attributes)`` items. That state is collected once per iteration
  and mined driver-side, mirroring the reference's rule generation
  exactly. Association-rule confidences use *weighted* counts instead of
  physically expanding each row ``int(ID * lambda)`` times
  (select_expand.py:73-81) — identical arithmetic, no row explosion.
* Support deltas are computed on the leaf frame with one aggregation per
  iteration using an item-match bitmask groupBy, so the driver only ever
  sees <= 2^|itemset| compact counts, never leaves.
* When even the ID/CA-filtered anomalous set is too large to collect
  (a weak-contrast case where the knee threshold admits most rows),
  the mining round itself runs distributed: weighted modes and the
  2^d signature-bucket table are Spark aggregations and the driver
  sees only <= d + 2^d compact rows (round 8; removes the former
  anomalous-set ValueError).
"""
from __future__ import annotations

from itertools import chain, combinations
import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from riskloc_spark.data import local_rows_df

from riskloc_spark.operators.squeeze import kneedle_knee


def adapt_frame(df: DataFrame, derived: bool, flip_derived: bool = True) -> DataFrame:
    """Reference robustspot.py:15-36: normalize to k/cnt/value measures.

    ``flip_derived=True`` is the reference behavior: value = b - a ("fix
    k to be 1 - success rate", robustspot.py:30-32) — correct when the a
    measure counts successes (the D dataset). For frames whose a measure
    is ALREADY the failure count (the RobustSpot minute format after
    read_robustspot_csv, robustspot_data_utils.py:21), the reference
    applies the same flip anyway and inverts the measure; pass
    ``flip_derived=False`` to keep k as the failure rate there."""
    if derived:
        df = df.filter(
            (F.col("real_a") > 0)
            | (F.col("predict_a") > 0)
            | (F.col("real_b") > 0)
            | (F.col("predict_b") > 0)
        )
        if flip_derived:
            value_real = F.col("real_b") - F.col("real_a")
            value_predict = F.col("predict_b") - F.col("predict_a")
        else:
            value_real = F.col("real_a")
            value_predict = F.col("predict_a")
        return (
            df.withColumn("value_real", value_real)
            .withColumn("value_predict", value_predict)
            .withColumn("cnt_real", F.col("real_b"))
            .withColumn("cnt_predict", F.col("predict_b"))
            .withColumn("k_real", F.col("value_real") / F.col("cnt_real"))
            .withColumn("k_predict", F.col("value_predict") / F.col("cnt_predict"))
        )
    df = df.filter((F.col("real") > 0) | (F.col("predict") > 0))
    return (
        df.withColumn("k_real", F.col("real"))
        .withColumn("k_predict", F.col("predict"))
        .withColumn("cnt_real", F.lit(1.0))
        .withColumn("cnt_predict", F.lit(1.0))
        .withColumn("value_real", F.lit(1.0))
        .withColumn("value_predict", F.lit(1.0))
    )


def add_influence_degree(df: DataFrame) -> DataFrame:
    """ID column (ref ID_CA.py:12-26): leave-one-out average contrast.

    ID = 1 - 1/(|(v - f) / (avg_v_S2 - avg_f_S2)| + 1) with the S2
    averages excluding the row itself — (sum - x)/(n - 1).
    """
    totals = df.agg(
        F.sum("k_real").alias("__sv"),
        F.sum("k_predict").alias("__sf"),
        F.count(F.lit(1)).alias("__n"),
    )
    out = df.crossJoin(F.broadcast(totals))
    avg_v = (F.col("__sv") - F.col("k_real")) / (F.col("__n") - 1)
    avg_f = (F.col("__sf") - F.col("k_predict")) / (F.col("__n") - 1)
    ratio = (F.col("k_real") - F.col("k_predict")) / (avg_v - avg_f)
    return out.withColumn(
        "ID", 1.0 - 1.0 / (F.abs(ratio) + 1.0)
    ).drop("__sv", "__sf", "__n")


def add_contribution_ability(df: DataFrame) -> DataFrame:
    """CA column (ref ID_CA.py:42-71); NaN -> 0 like the reference."""
    totals = df.agg(
        F.sum("value_predict").alias("__fm"),
        F.sum("cnt_predict").alias("__fd"),
    )
    out = df.crossJoin(F.broadcast(totals))
    rate1 = F.col("__fd") / F.col("__fm")
    rate2 = (
        F.col("value_real") + (F.col("__fm") - F.col("value_predict"))
    ) / (F.col("cnt_real") + (F.col("__fd") - F.col("cnt_predict")))
    ca = rate1 * rate2 - 1.0
    return out.withColumn(
        "CA", F.when(F.isnan(ca) | ca.isNull(), F.lit(0.0)).otherwise(ca)
    ).drop("__fm", "__fd")


def score_id_ca(df: DataFrame) -> DataFrame:
    """ID + CA in ONE totals aggregation (round 8): the two scorers each
    pulled their own global-sum broadcast, so every mining round paid
    two full scans of the (cached) frame; fusing the five sums into one
    ``agg`` + one broadcast crossJoin halves the per-round scan count.
    The per-row algebra is copied verbatim from add_influence_degree /
    add_contribution_ability (same float ops, same order) — parity-
    locked by test_fused_score_matches_composed."""
    totals = df.agg(
        F.sum("k_real").alias("__sv"),
        F.sum("k_predict").alias("__sf"),
        F.count(F.lit(1)).alias("__n"),
        F.sum("value_predict").alias("__fm"),
        F.sum("cnt_predict").alias("__fd"),
    )
    out = df.crossJoin(F.broadcast(totals))
    avg_v = (F.col("__sv") - F.col("k_real")) / (F.col("__n") - 1)
    avg_f = (F.col("__sf") - F.col("k_predict")) / (F.col("__n") - 1)
    ratio = (F.col("k_real") - F.col("k_predict")) / (avg_v - avg_f)
    rate1 = F.col("__fd") / F.col("__fm")
    rate2 = (
        F.col("value_real") + (F.col("__fm") - F.col("value_predict"))
    ) / (F.col("cnt_real") + (F.col("__fd") - F.col("cnt_predict")))
    ca = rate1 * rate2 - 1.0
    return (
        out.withColumn("ID", 1.0 - 1.0 / (F.abs(ratio) + 1.0))
        .withColumn(
            "CA", F.when(F.isnan(ca) | ca.isNull(), F.lit(0.0)).otherwise(ca)
        )
        .drop("__sv", "__sf", "__n", "__fm", "__fd")
    )


def _id_threshold(pos_ids: np.ndarray) -> float:
    """Knee of the positive-ID CDF (ref select_expand.py:39-62); 0.5 when
    no knee is found."""
    threshold = 0.5
    if len(pos_ids):
        xs = np.sort(pos_ids)
        cdf = (np.arange(len(xs)) + 1) / len(xs)
        knee = kneedle_knee(xs, cdf)
        if knee is not None:
            threshold = float(knee)
    return threshold


def _id_threshold_weighted(values: np.ndarray, counts: np.ndarray) -> float:
    """_id_threshold over (distinct ID, count) pairs — exact vs the
    expanded raw array. The raw path runs kneedle on n CDF points with
    y in [1/n, 1]; within a duplicated value only the LAST raw row (max
    cumulative y at that x) can attain the max of yn - xn, so evaluating
    at cumulative counts is exact — PROVIDED the normalization uses the
    raw extremes (y.min = 1/n, y.max = 1, len gate on n rows), not the
    distinct-pair extremes (counts[0]/n would shift the knee on ~20% of
    duplicate-heavy samples). Inlined kneedle so the raw normalization is
    reproduced bit-for-bit (kneedle_knee would use distinct extremes)."""
    n = int(counts.sum())
    if n == 0:
        return 0.5
    if n < 3:  # raw kneedle_knee returns None below 3 rows
        return 0.5
    order = np.argsort(values, kind="stable")
    xs, cs = values[order], counts[order]
    xn = (xs - xs[0]) / (xs[-1] - xs[0] + 1e-300)
    cdf = np.cumsum(cs) / n
    yn = (cdf - 1.0 / n) / (1.0 - 1.0 / n + 1e-300)
    diff = yn - xn
    i = int(np.argmax(diff))
    if diff[i] <= 0:
        return 0.5
    return float(xs[i])


def _match_mask(pdf: pd.DataFrame, cause) -> pd.Series:
    m = pd.Series(True, index=pdf.index)
    for col, val in cause:
        m &= pdf[col] == val
    return m


def _support(pdf: pd.DataFrame, cause) -> float:
    """Fraction of rows matching cause (ref mining.py:33-52); a list of
    causes sums member supports."""
    if len(pdf) == 0:
        return 0.0
    if isinstance(cause, list):
        return float(sum(_match_mask(pdf, c).sum() for c in cause)) / len(pdf)
    return float(_match_mask(pdf, cause).sum()) / len(pdf)


def _weighted_mode(pdf: pd.DataFrame, col: str, w: pd.Series):
    agg = w.groupby(pdf[col]).sum().sort_index(kind="stable")
    return agg.idxmax()


def _subset_sums(
    pdf: pd.DataFrame, causes: list, weights: np.ndarray | None = None
) -> np.ndarray:
    """Matching-row count (or weight sum) for MANY causes drawn from a
    small shared (col, val) item set — mining causes are always subsets
    of the <= #attributes frequent items. One signature pass over the
    frame (bit i set iff the row matches item i) + a 2^d-bucket
    aggregation replaces a full per-cause boolean mask: this was the
    driver-side hotspot at 562k leaves (64 CPU-seconds of masks -> one
    O(n*d) pass). Counts and the integer-valued amplified weights sum
    exactly under any order, so results are bit-identical to the
    per-cause masks (the round gates stay green)."""
    items = sorted({it for c in causes for it in c})
    counter = _subset_counter(pdf, items, weights)
    return np.array([counter(c) for c in causes])


# Above this many items the 2^d bincount table stops paying for itself
# (2^20 doubles = 8 MB; 25+ would be multi-GB, and >= 64 would silently
# overflow the int64 bit shifts) — fall back to per-cause masks.
_SUBSET_ITEM_BOUND = 20


def _subset_counter(
    pdf: pd.DataFrame, items: list, weights: np.ndarray | None = None
):
    """Compile the signature pass once; the returned callable sums the
    matching count/weight for any cause whose items are in ``items``."""
    if len(items) > _SUBSET_ITEM_BOUND:
        # per-cause mask fallback: O(#causes * n) instead of a 2^d table
        masks = {
            item: (pdf[item[0]].to_numpy() == item[1]) for item in items
        }
        w = None if weights is None else np.asarray(weights, float)

        def count_masked(cause) -> float:
            m = np.ones(len(pdf), dtype=bool)
            for it in cause:
                m &= masks[it]
            return float(m.sum()) if w is None else float(w[m].sum())

        return count_masked
    sig = np.zeros(len(pdf), dtype=np.int64)
    for bit, (col, val) in enumerate(items):
        sig |= (pdf[col].to_numpy() == val).astype(np.int64) << bit
    n_groups = 1 << len(items)
    gsum = np.bincount(sig, weights=weights, minlength=n_groups).astype(float)
    idx = np.arange(n_groups)
    bit_of = {item: 1 << i for i, item in enumerate(items)}

    def count(cause) -> float:
        bits = 0
        for it in cause:
            bits |= bit_of[it]
        return float(gsum[(idx & bits) == bits].sum())

    return count


def _subset_supports(pdf: pd.DataFrame, causes: list) -> np.ndarray:
    """_support for causes sharing a small item set (see _subset_sums)."""
    if len(pdf) == 0:
        return np.zeros(len(causes))
    return _subset_sums(pdf, causes) / len(pdf)


def _powerset(items, lo, hi):
    return chain.from_iterable(combinations(items, r) for r in range(lo, hi))


def _rules_from_frequent(
    frequent: list, wcount, confidence_threshold: float
) -> list[tuple]:
    """Association-rule candidate generation given the per-attribute
    frequent items and a weighted-count oracle over the anomalous frame
    (ref mining.py:76-99). Shared verbatim by the pandas path and the
    distributed-after path — only where ``wcount`` comes from differs
    (pandas signature bincount vs a Spark signature groupBy)."""
    rules = set()
    for itemset in _powerset(frequent, 2, 4):
        s = set(itemset)
        for r in range(1, len(itemset)):
            for lhs in combinations(itemset, r):
                rules.add((lhs, tuple(s - set(lhs))))

    cross: list[set] = []
    # sorted: Python set iteration order is hash-randomized across
    # interpreter runs, which made the candidate order (and thus the
    # delta-tie ranking downstream) nondeterministic run-to-run
    for lhs, rhs in sorted(rules):
        denom = wcount(lhs)
        conf = wcount(lhs + rhs) / denom if denom > 0 else 0.0
        if conf > confidence_threshold:
            c = set(lhs + rhs)
            if c not in cross:
                cross.append(c)
    causes = [tuple(c) for c in cross]
    causes.extend(_powerset(frequent, 1, 2))
    return causes


def _mine_candidates(
    after: pd.DataFrame,
    weights: pd.Series,
    attributes: list[str],
    confidence_threshold: float,
) -> list[tuple]:
    """Candidate generation half of the rule mining (ref mining.py:76-99):
    frequent items + association rules over the (weight-expanded)
    anomalous frame. Only touches ``after`` — delta ranking against the
    full frame is the caller's job (local or distributed)."""
    if len(after) == 0 or weights.sum() <= 0:
        return []
    # frequent item per column = weighted mode (pandas .mode() of the
    # expanded frame == max total weight; ties -> smallest value, matching
    # pandas mode()[0])
    frequent = [(c, _weighted_mode(after, c, weights)) for c in attributes]

    # every rule cause is a subset of ``frequent``: one signature pass
    # replaces a boolean mask per rule (see _subset_counter — exact)
    wcount = _subset_counter(after, frequent, np.asarray(weights, float))
    return _rules_from_frequent(frequent, wcount, confidence_threshold)


def _rank_by_delta(causes: list[tuple], deltas: np.ndarray) -> list[tuple]:
    """Top-5 causes by support delta, ascending. Delta ties break first
    on source group — cross-rule causes (len >= 2) before single-item
    powerset causes, the deterministic part of the reference's
    positional order (mining.py appends cross first, stable sort keeps
    it) — then on canonical cause content (col-sorted). Content replaces
    the reference's WITHIN-group positional order, which is downstream
    of Python set-iteration noise and varies across interpreter runs;
    the two-level key makes results reproducible (and SQL-expressible
    for the round-0 gate) while preserving the reproducible half of the
    reference's tie ordering."""
    canon = [tuple(sorted(c, key=lambda it: it[0])) for c in causes]
    order = sorted(
        range(len(causes)),
        key=lambda i: (deltas[i], 0 if len(causes[i]) >= 2 else 1, canon[i]),
    )
    return [canon[i] for i in order[:5]]


def _mine(
    before: pd.DataFrame,
    after: pd.DataFrame,
    weights: pd.Series,
    attributes: list[str],
    confidence_threshold: float,
) -> list[tuple]:
    """Rule mining on the (weight-expanded) anomalous frame
    (ref mining.py:76-106). Weighted counts replace physical row
    expansion: count(X) over the expanded frame == sum of weights of rows
    matching X."""
    causes = _mine_candidates(after, weights, attributes, confidence_threshold)
    if not causes:
        return []
    # subset-signature supports: one pass over each frame (the per-cause
    # masks over the full `before` frame were quadratic-ish driver cost)
    deltas = _subset_supports(before, causes) - _subset_supports(after, causes)
    return _rank_by_delta(causes, deltas)


def _id_local(p: pd.DataFrame) -> pd.Series:
    """pandas mirror of add_influence_degree — parity-tested against it."""
    n = len(p)
    sv, sf = p["k_real"].sum(), p["k_predict"].sum()
    avg_v = (sv - p["k_real"]) / (n - 1)
    avg_f = (sf - p["k_predict"]) / (n - 1)
    ratio = (p["k_real"] - p["k_predict"]) / (avg_v - avg_f)
    return 1.0 - 1.0 / (ratio.abs() + 1.0)


def _ca_local(p: pd.DataFrame) -> pd.Series:
    """pandas mirror of add_contribution_ability."""
    fm, fd = p["value_predict"].sum(), p["cnt_predict"].sum()
    rate1 = fd / fm
    rate2 = (p["value_real"] + (fm - p["value_predict"])) / (
        p["cnt_real"] + (fd - p["cnt_predict"])
    )
    return (rate1 * rate2 - 1.0).fillna(0.0)


def _select_frame(
    pdf: pd.DataFrame, attributes: list[str], derived: bool,
    contribution_ability_threshold: float, lambda_amplification: float,
):
    """One select_expand step (ref select_expand.py:21-84): ID/CA are
    recomputed on the round's frame (leave-one-out sums change as rows are
    dropped between rounds). Returns (before, after, weights)."""
    pdf = pdf.assign(ID=_id_local(pdf), CA=_ca_local(pdf))
    threshold = _id_threshold(pdf.loc[pdf["ID"] > 0, "ID"].to_numpy())
    after = pdf[(pdf["ID"] > threshold) & (pdf["CA"] > contribution_ability_threshold)]
    if derived:
        w = (after["ID"] * after["CA"] * lambda_amplification).astype(int)
    else:
        w = (after["ID"] * lambda_amplification).astype(int)
    return pdf, after, w.astype(float)


def _match_pred(cause):
    """Spark predicate for one cause tuple ((col, val), ...)."""
    cond = None
    for col, val in cause:
        eq = F.col(col) == F.lit(val)
        cond = eq if cond is None else (cond & eq)
    return cond if cond is not None else F.lit(True)


def _supports_dist(frame: DataFrame, causes: list) -> np.ndarray:
    """_support for MANY causes (or cause-lists) in ONE aggregation:
    each cause becomes a conditional count, so the driver sees
    len(causes) numbers, never rows."""
    if not causes:
        return np.zeros(0)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(causes):
        members = c if isinstance(c, list) else [c]
        expr = None
        for m in members:
            t = F.when(_match_pred(m), 1).otherwise(0)
            expr = t if expr is None else (expr + t)
        aggs.append(F.sum(expr).alias(f"__c{i}"))
    row = frame.agg(*aggs).first()
    n = row["__n"] or 0
    if n == 0:
        return np.zeros(len(causes))
    return np.array(
        [float(row[f"__c{i}"] or 0) / n for i in range(len(causes))]
    )


def _weighted_mode_dist(
    frame: DataFrame, attributes: list[str], w_col: str
) -> list[tuple]:
    """Per-attribute weighted mode of a Spark frame — the distributed
    twin of ``[(c, _weighted_mode(after, c, w)) for c in attributes]``.
    One melt (explode to (attr, val) pairs) + one groupBy + a tiny
    top-1-per-attribute window; the driver sees d rows. Ties break to
    the smallest value (pandas sort_index + idxmax semantics); weight
    sums are integer-valued so any aggregation order is exact."""
    from pyspark.sql import Window

    pairs = frame.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(a).alias("attr"), F.col(a).alias("val"))
                    for a in attributes
                ]
            )
        ).alias("p"),
        F.col(w_col).alias("__w"),
    )
    # pandas groupby drops NaN keys, so a null attribute value must not
    # become a candidate mode on the distributed path
    pairs = pairs.filter(F.col("p.val").isNotNull())
    agg = pairs.groupBy("p.attr", "p.val").agg(F.sum("__w").alias("ws"))
    wnd = Window.partitionBy("attr").orderBy(
        F.col("ws").desc(), F.col("val").asc()
    )
    rows = (
        agg.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") == 1)
        .collect()
    )
    mode = {r["attr"]: r["val"] for r in rows}
    return [(a, mode[a]) for a in attributes if a in mode]


def _bucket_counters(frame: DataFrame, items: list, w_col: str):
    """Signature-bucket aggregation of a Spark frame over a small item
    set: bit i of the signature = row matches ``items[i]``; ONE
    groupBy(signature) collects <= 2^d rows, from which exact
    count/weight sums for ANY cause drawn from ``items`` follow (the
    distributed twin of ``_subset_counter`` — same bincount math, the
    rows never leave the executors). Returns (wcount, ccount, total_w,
    n_rows)."""
    if len(items) > _SUBSET_ITEM_BOUND:
        raise ValueError(
            f"distributed robustspot mining needs <= {_SUBSET_ITEM_BOUND} "
            f"attributes (got {len(items)}); the 2^d signature table and "
            "the reference's rule powerset are both exponential in d"
        )
    sig = F.lit(0).cast("long")
    for bit, (col, val) in enumerate(items):
        sig = sig + F.shiftleft(
            (F.col(col) == F.lit(val)).cast("long"), bit
        )
    rows = (
        frame.groupBy(sig.alias("__sig"))
        .agg(F.count(F.lit(1)).alias("c"), F.sum(w_col).alias("ws"))
        .collect()
    )
    n_groups = 1 << len(items)
    gsum_c = np.zeros(n_groups)
    gsum_w = np.zeros(n_groups)
    for r in rows:
        gsum_c[int(r["__sig"])] = float(r["c"])
        gsum_w[int(r["__sig"])] = float(r["ws"] or 0.0)
    idx = np.arange(n_groups)
    bit_of = {item: 1 << i for i, item in enumerate(items)}

    def make_count(gsum):
        def count(cause) -> float:
            bits = 0
            for it in cause:
                bits |= bit_of[it]
            return float(gsum[(idx & bits) == bits].sum())

        return count

    return (
        make_count(gsum_w),
        make_count(gsum_c),
        float(gsum_w.sum()),
        int(gsum_c.sum()),
    )


def _final_merge(mined, support_before0, support_after0, k: int):
    """Cross-iteration merge + rank (ref final.py:5-70,
    robustspot.py:71-97), shared by the driver and distributed paths.
    ``support_before0(causes)`` / ``support_after0(causes)`` return
    supports over the round-0 full / anomalous frame — local _support
    when the frame sits on the driver, one conditional-count
    aggregation when it does not (round 8: the anomalous frame is no
    longer required to fit on the driver)."""

    def merge2(a: list[tuple], b: list[tuple]) -> list[list[tuple]]:
        out = []
        for c1 in a:
            for c2 in b:
                if len(c1) == len(c2):
                    same_col = all(x[0] == y[0] for x, y in zip(c1, c2))
                    diff_val = any(x[1] != y[1] for x, y in zip(c1, c2))
                    if same_col and diff_val:
                        out.append([c1, c2])
        return out

    def merge3(a, b, c) -> list[list[tuple]]:
        out = []
        for c1 in a:
            for c2 in b:
                for c3 in c:
                    if len(c1) == len(c2) == len(c3):
                        same_col = all(
                            x[0] == y[0] == z[0] for x, y, z in zip(c1, c2, c3)
                        )
                        diff_val = any(
                            x[1] != y[1] and x[1] != z[1] and y[1] != z[1]
                            for x, y, z in zip(c1, c2, c3)
                        )
                        if same_col and diff_val:
                            out.append([c1, c2, c3])
        return out

    def get_merge_res(groups: list[list[tuple]]) -> list[list[tuple]]:
        g0, g1, g2 = groups
        return (
            merge2(g0, g1) + merge2(g0, g2) + merge2(g1, g2) + merge3(g0, g1, g2)
        )

    top0 = mined[0] or []
    merge_res: list[list[tuple]] = []
    merge_res += get_merge_res([top0[:1], (mined[1] or [])[:1], mined[2] or []])
    merge_res += get_merge_res([top0[1:2], (mined[3] or [])[:1], mined[4] or []])
    merge_res += get_merge_res([top0[2:3], (mined[5] or [])[:1], mined[6] or []])
    merge_res += [[item] for item in top0]

    # NOTE: the reference hard-codes a 'p2p'-dimension discard here
    # (robustspot.py:80-88, marked TODO upstream); on datasets without a
    # p2p column it is a no-op, so it is intentionally not generalized.

    # merge_larger_dimension (final.py:52-70) — batch the needed supports
    # into one call so the distributed path runs one aggregation
    merge_checks = []
    for idx, mc in enumerate(merge_res):
        if len(mc) > 1:
            record: dict[str, list] = {}
            for cause in mc:
                for col, val in cause:
                    record.setdefault(col, [])
                    if val not in record[col]:
                        record[col].append(val)
            keep = [(c, v[0]) for c, v in record.items() if len(v) == 1]
            if keep:
                merge_checks.append((idx, mc, tuple(keep)))
    if merge_checks:
        queries = [list(mc) for _, mc, _ in merge_checks] + [
            kp for _, _, kp in merge_checks
        ]
        sups = support_before0(queries)
        m = len(merge_checks)
        for j, (idx, mc, keep) in enumerate(merge_checks):
            before_support, after_support = sups[j], sups[m + j]
            if after_support > 0 and before_support / after_support >= 0.9:
                merge_res[idx] = [keep]

    seen: list = []
    out_res: list[list[tuple]] = []
    for mc in merge_res:
        s = set(map(tuple, mc))
        if s not in seen:
            seen.append(s)
            out_res.append(mc)

    if not out_res:
        return []
    queries = [list(mc) for mc in out_res]
    deltas = support_before0(queries) - support_after0(queries)
    order = np.argsort(deltas, kind="stable")[:k]
    return [out_res[i] for i in order]


def robustspot(
    df: DataFrame,
    attributes: list[str],
    k: int = 3,
    derived: bool = False,
    contribution_ability_threshold: float = 0.0,
    confidence_threshold: float = 0.8,
    lambda_amplification: float = 100,
    driver_rows: int = 2_000_000,
    flip_derived: bool = True,
    after_rows: int = 2_000_000,
) -> list[list[tuple]]:
    """Full RobustSpot (ref robustspot.py:39-113).

    The adapted leaf frame is computed distributed, then collected for
    the 7-round mining schedule (the frame is the *leaf aggregate* of the
    RCA case — bounded by the attribute-cardinality product, and the
    reference algorithm is defined over exactly this compact frame).
    ID/CA are recomputed per round on the round's subset, matching the
    reference's leave-one-out semantics. ``driver_rows`` guards the
    collect; past it the distributed mirror runs, where ``after_rows``
    is the collect threshold for each round's anomalous set (beyond it
    the mining itself runs distributed — see _robustspot_distributed).
    """
    if not derived:
        contribution_ability_threshold = -1  # ref robustspot.py:45

    base = adapt_frame(df, derived, flip_derived)
    for d in attributes:
        base = base.withColumn(
            d, F.coalesce(F.col(d).cast("string"), F.lit("None"))
        )
    sel = base.select(
        *attributes,
        "k_real",
        "k_predict",
        "cnt_real",
        "cnt_predict",
        "value_real",
        "value_predict",
    )
    pdf0 = sel.limit(driver_rows + 1).toPandas()
    if len(pdf0) > driver_rows:
        # wide-cardinality case: the full leaf frame cannot sit on the
        # driver — run the distributed mirror (ID/CA column algebra +
        # bounded knee pairs + conditional-count supports; only the
        # anomalous rows ever collect)
        return _robustspot_distributed(
            sel,
            attributes,
            derived,
            contribution_ability_threshold,
            confidence_threshold,
            lambda_amplification,
            k,
            after_rows=after_rows,
        )

    def drop_top(p: pd.DataFrame, cause) -> pd.DataFrame:
        return p[~_match_mask(p, cause)]

    # mining schedule (ref robustspot.py:54-69): round 0 on the full
    # frame; rounds (dim1 in 1..3, dim2 in 1..2) drop earlier top causes
    before_list: list[pd.DataFrame | None] = [None] * 7
    after_list: list[pd.DataFrame | None] = [None] * 7
    mined: list[list[tuple] | None] = [None] * 7

    def run(index: int, before_pdf: pd.DataFrame):
        before, after, w = _select_frame(
            before_pdf, attributes, derived,
            contribution_ability_threshold, lambda_amplification,
        )
        before_list[index] = before
        after_list[index] = after
        mined[index] = _mine(before, after, w, attributes, confidence_threshold)

    run(0, pdf0)
    for dim1 in (1, 2, 3):
        i1 = 2 * dim1 - 1  # dim2 == 1
        tops = mined[0] or []
        if len(tops) >= dim1:
            run(i1, drop_top(before_list[0], tops[dim1 - 1]))
        else:
            mined[i1], before_list[i1], after_list[i1] = [], before_list[0], before_list[0].iloc[0:0]
        i2 = 2 * dim1  # dim2 == 2
        if mined[i1]:
            run(i2, drop_top(before_list[i1], mined[i1][0]))
        else:
            mined[i2] = []

    # cross-iteration merge (ref final.py:5-49, robustspot.py:71-97)
    def support_before0(causes):
        return np.array(
            [
                _support(
                    before_list[0], list(c) if isinstance(c, list) else c
                )
                for c in causes
            ]
        )

    def support_after0(causes):
        return np.array(
            [
                _support(
                    after_list[0], list(c) if isinstance(c, list) else c
                )
                for c in causes
            ]
        )

    return _final_merge(mined, support_before0, support_after0, k)


def _robustspot_distributed(
    sel: DataFrame,
    attributes: list[str],
    derived: bool,
    contribution_ability_threshold: float,
    confidence_threshold: float,
    lambda_amplification: float,
    k: int,
    max_pairs: int = 200_000,
    after_rows: int = 2_000_000,
) -> list[list[tuple]]:
    """robustspot beyond driver-sized leaf frames: the full frame never
    leaves the executors — and since round 8, neither must the
    anomalous set.

    Per round: ID/CA are the same global-sum column algebra
    (add_influence_degree / add_contribution_ability) on the round's
    filtered frame; the knee threshold fits on DISTINCT (ID, count)
    pairs (bounded by ``max_pairs``, histogram fallback past it — ID is
    in [0,1)). Rows passing the ID/CA filter collect only while they
    fit ``after_rows``; past that the round mines DISTRIBUTED: the
    weighted mode per attribute (melt + groupBy + top-1 window) and a
    signature groupBy whose <= 2^d bucket rows replay every rule
    count/support exactly (_bucket_counters — the Spark twin of
    _subset_counter), so the kneedle threshold selecting most of a
    5.4M-leaf frame no longer kills the operator. Support deltas and
    the final merge run as conditional-count aggregations (one job,
    len(causes) numbers). Dropped-cause rounds become predicate
    pushdowns instead of pandas row drops. Parity-tested against the
    driver path in both after-collect regimes."""
    sel = sel.persist()
    # round-0 anomalous frame as a SPARK handle when it does not fit the
    # driver (the final merge needs its supports — one conditional-count
    # aggregation, never a collect)
    after0_frame: list = [None]
    try:
        before_pred: list = [None] * 7  # Spark predicate; None = full frame
        after_list: list = [None] * 7
        mined: list = [None] * 7

        def frame_of(pred):
            return sel.filter(pred) if pred is not None else sel

        def run(index: int, pred) -> None:
            # persist the scored frame for the round: the knee probe AND
            # the anomalous-row collect both scan it, and ID/CA each pull
            # a scalar-total broadcast — uncached, the whole scoring ran
            # twice per round (3 actions x 7 rounds was the wall-clock)
            scored = score_id_ca(frame_of(pred)).persist()
            # ONE aggregation decides exact-vs-histogram AND doubles as
            # the histogram: buckets partition the ID domain (bucket is
            # a function of ID), so the per-bucket EXACT distinct
            # counts sum to the exact global distinct count — no
            # sketch, and no separate max_pairs-row limit probe that
            # existed only to detect overflow. The small case pays one
            # extra collect of the true (ID, count) pairs, bounded by
            # the just-proven distinct count <= max_pairs.
            try:
                B = max_pairs
                b = F.least(F.floor(F.col("ID") * B), F.lit(B - 1))
                hrows = (
                    scored.filter(F.col("ID") > 0)
                    .groupBy(b.alias("__b"))
                    .agg(
                        F.count(F.lit(1)).alias("c"),
                        F.countDistinct("ID").alias("d"),
                    )
                    .collect()
                )
                n_distinct = sum(r["d"] for r in hrows)
                if n_distinct <= max_pairs:
                    rows = (
                        scored.filter(F.col("ID") > 0)
                        .groupBy("ID")
                        .agg(F.count(F.lit(1)).alias("c"))
                        .collect()
                    )
                    vals = np.array([float(r[0]) for r in rows])
                    cnts = np.array([float(r[1]) for r in rows])
                else:
                    vals = np.array([(r["__b"] + 0.5) / B for r in hrows])
                    cnts = np.array([float(r["c"]) for r in hrows])
                thr = _id_threshold_weighted(vals, cnts)

                filt = (F.col("ID") > thr) & (
                    F.col("CA") > contribution_ability_threshold
                )
                n_after = int(scored.filter(filt).count())
                after = None
                frequent: list = []
                wcount = ccount = None
                total_w = 0.0
                if n_after <= after_rows:
                    # driver-sized anomalous set: collect and mine in
                    # pandas (exact, battle-tested; after_rows is now a
                    # COLLECT threshold, not an operator limit)
                    after = (
                        scored.filter(filt)
                        .select(*attributes, "ID", "CA")
                        .toPandas()
                    )
                else:
                    # round 8: the anomalous set stays distributed. The
                    # whole mining round needs only (a) the weighted
                    # mode per attribute and (b) count/weight sums for
                    # causes drawn from those <= d frequent items — a
                    # melt+groupBy and ONE signature groupBy whose
                    # <= 2^d bucket rows are all the driver sees
                    # (ref mining.py:76-106 semantics unchanged).
                    if derived:
                        wexpr = (
                            F.col("ID")
                            * F.col("CA")
                            * F.lit(lambda_amplification)
                        )
                    else:
                        wexpr = F.col("ID") * F.lit(lambda_amplification)
                    # cast('long') truncates toward zero, matching the
                    # pandas path's .astype(int) (ref select_expand.py:75
                    # uses int() semantics); F.floor would diverge on
                    # negative ID*CA products (floor(-0.5) = -1, not 0)
                    af = scored.filter(filt).select(
                        *attributes,
                        wexpr.cast("long").cast("double").alias("__w"),
                    )
                    if index == 0:
                        # the final merge re-reads round 0's anomalous
                        # supports: persist while `scored` is still
                        # cached (both stats actions materialize it)
                        af = af.persist()
                        after0_frame[0] = af
                    frequent = _weighted_mode_dist(af, attributes, "__w")
                    if frequent:
                        wcount, ccount, total_w, _ = _bucket_counters(
                            af, frequent, "__w"
                        )
            finally:
                scored.unpersist()

            before_pred[index] = pred
            after_list[index] = after
            if after is not None:
                if derived:
                    w = (
                        after["ID"] * after["CA"] * lambda_amplification
                    ).astype(int)
                else:
                    w = (after["ID"] * lambda_amplification).astype(int)
                w = w.astype(float)
                causes = _mine_candidates(
                    after, w, attributes, confidence_threshold
                )
                if not causes:
                    mined[index] = []
                    return
                deltas = _supports_dist(
                    frame_of(pred), causes
                ) - _subset_supports(after, causes)
            else:
                if not frequent or total_w <= 0:
                    mined[index] = []
                    return
                causes = _rules_from_frequent(
                    frequent, wcount, confidence_threshold
                )
                if not causes:
                    mined[index] = []
                    return
                deltas = _supports_dist(frame_of(pred), causes) - np.array(
                    [ccount(c) for c in causes]
                ) / n_after
            mined[index] = _rank_by_delta(causes, deltas)

        def and_pred(base_pred, cause):
            p = ~_match_pred(cause)
            return p if base_pred is None else (base_pred & p)

        run(0, None)
        # The round schedule has exactly two dependency waves: rounds
        # 1/3/5 each depend only on round 0's top causes, and rounds
        # 2/4/6 each depend only on their wave-1 partner. Each round is
        # ~3 tiny sequential actions on the persisted frame —
        # job-count-bound, not data-bound — so the independent rounds
        # of a wave submit their jobs CONCURRENTLY (Spark schedules
        # concurrent actions on one context fine; rounds write disjoint
        # indices). Same per-round code, same results, ~1/3 the
        # sequential job-gap wall-clock.
        from concurrent.futures import ThreadPoolExecutor

        tops = mined[0] or []
        wave1 = []
        for dim1 in (1, 2, 3):
            i1 = 2 * dim1 - 1  # dim2 == 1
            if len(tops) >= dim1:
                wave1.append((i1, and_pred(before_pred[0], tops[dim1 - 1])))
            else:
                mined[i1] = []
                before_pred[i1] = before_pred[0]
                after_list[i1] = (
                    after_list[0].iloc[0:0] if after_list[0] is not None else None
                )
        if wave1:
            with ThreadPoolExecutor(len(wave1)) as ex:
                list(ex.map(lambda t: run(*t), wave1))
        wave2 = []
        for dim1 in (1, 2, 3):
            i1, i2 = 2 * dim1 - 1, 2 * dim1  # dim2 == 2
            if mined[i1]:
                wave2.append((i2, and_pred(before_pred[i1], mined[i1][0])))
            else:
                mined[i2] = []
        if wave2:
            with ThreadPoolExecutor(len(wave2)) as ex:
                list(ex.map(lambda t: run(*t), wave2))

        def support_before0(causes):
            return _supports_dist(sel, causes)

        def support_after0(causes):
            if after0_frame[0] is not None:
                return _supports_dist(after0_frame[0], causes)
            return np.array(
                [
                    _support(
                        after_list[0], list(c) if isinstance(c, list) else c
                    )
                    for c in causes
                ]
            )

        return _final_merge(mined, support_before0, support_after0, k)
    finally:
        if after0_frame[0] is not None:
            after0_frame[0].unpersist()
        sel.unpersist()


def robustspot_df(spark, df: DataFrame, attributes: list[str], **kwargs) -> DataFrame:
    """Root causes as the engine's canonical DataFrame form: each result
    row is one cause conjunction ('d=v&d=v'), grouped by result rank."""
    causes = robustspot(df, attributes, **kwargs)
    rows = []
    for rank, mc in enumerate(causes):
        for cause in mc:
            s = "&".join(f"{c}={v}" for c, v in sorted(cause))
            rows.append((s, rank))
    return local_rows_df(spark, rows, "root_cause string, rank int")
