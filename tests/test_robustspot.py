"""RobustSpot: ID/CA scoring parity (Spark vs local mirror) and
end-to-end contrast-anomaly localization."""
import numpy as np
import pandas as pd
import pytest

from riskloc_spark.operators.robustspot import (
    _ca_local,
    _id_local,
    adapt_frame,
    add_contribution_ability,
    add_influence_degree,
    robustspot,
    robustspot_df,
)


@pytest.fixture(scope="module")
def derived_pdf():
    """Derived-measure RCA case: success/total pairs per leaf; leaves with
    a=a1 have a crashed success rate."""
    rng = np.random.default_rng(5)
    rows = []
    for a in [f"a{i}" for i in range(4)]:
        for b in [f"b{i}" for i in range(4)]:
            for c in [f"c{i}" for i in range(3)]:
                total = float(rng.integers(500, 1500))
                ok_rate = 0.95 + rng.uniform(-0.01, 0.01)
                real_ok = total * ok_rate
                if a == "a1":
                    real_ok = total * 0.30
                rows.append((a, b, c, real_ok, total * 0.95, total, total))
    return pd.DataFrame(
        rows,
        columns=["a", "b", "c", "real_a", "predict_a", "real_b", "predict_b"],
    )


def test_id_ca_spark_vs_local(spark, derived_pdf):
    df = adapt_frame(spark.createDataFrame(derived_pdf), derived=True)
    got = (
        add_contribution_ability(add_influence_degree(df))
        .select("a", "b", "c", "ID", "CA")
        .toPandas()
        .sort_values(["a", "b", "c"])
        .reset_index(drop=True)
    )

    p = derived_pdf.assign(
        value_real=derived_pdf["real_b"] - derived_pdf["real_a"],
        value_predict=derived_pdf["predict_b"] - derived_pdf["predict_a"],
        cnt_real=derived_pdf["real_b"],
        cnt_predict=derived_pdf["predict_b"],
    )
    p = p.assign(
        k_real=p["value_real"] / p["cnt_real"],
        k_predict=p["value_predict"] / p["cnt_predict"],
    )
    want_id = _id_local(p)
    want_ca = _ca_local(p)
    p = p.assign(ID=want_id, CA=want_ca).sort_values(["a", "b", "c"]).reset_index(drop=True)

    np.testing.assert_allclose(got["ID"].to_numpy(), p["ID"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(got["CA"].to_numpy(), p["CA"].to_numpy(), rtol=1e-9)


def test_robustspot_finds_contrast_anomaly(spark, derived_pdf):
    df = spark.createDataFrame(derived_pdf)
    causes = robustspot(df, ["a", "b", "c"], k=3, derived=True)
    assert causes, "no root cause returned"
    flat = {item for mc in causes for cause in mc for item in cause}
    assert ("a", "a1") in flat


def test_robustspot_df_shape(spark, derived_pdf):
    out = robustspot_df(spark, spark.createDataFrame(derived_pdf), ["a", "b", "c"], derived=True)
    assert out.columns == ["root_cause", "rank"]
    assert out.count() >= 1


def test_robustspot_plain_measures(spark):
    rng = np.random.default_rng(9)
    rows = []
    for a in [f"a{i}" for i in range(4)]:
        for b in [f"b{i}" for i in range(5)]:
            predict = float(rng.uniform(50, 150))
            real = predict * (1 + rng.uniform(-0.02, 0.02))
            if a == "a2":
                real = predict * 3.0
            rows.append((a, b, real, predict))
    pdf = pd.DataFrame(rows, columns=["a", "b", "real", "predict"])
    causes = robustspot(spark.createDataFrame(pdf), ["a", "b"], k=3, derived=False)
    flat = {item for mc in causes for cause in mc for item in cause}
    assert ("a", "a2") in flat


def test_robustspot_distributed_parity(spark, derived_pdf):
    """A frame over driver_rows routes to the distributed path and must
    return the same causes as the driver path (same knee, same mining,
    same merge — only the execution substrate differs)."""
    df = spark.createDataFrame(derived_pdf)
    drv = robustspot(df, ["a", "b", "c"], derived=True)
    dist = robustspot(df, ["a", "b", "c"], derived=True, driver_rows=10)
    assert drv == dist
    flat = {f"{c}={v}" for mc in dist for cause in mc for c, v in cause}
    assert "a=a1" in flat


def test_robustspot_distributed_after_mining_parity(spark, derived_pdf):
    """Round 8: when a round's ID/CA-filtered anomalous set exceeds
    after_rows, the mining itself runs distributed (weighted-mode
    aggregation + 2^d signature-bucket groupBy) instead of raising.
    Forcing after_rows=1 routes EVERY round through that path — the
    causes must be identical to the driver path (counts and
    integer-valued weights sum exactly under any order, and the rule
    iteration is shared code)."""
    df = spark.createDataFrame(derived_pdf)
    drv = robustspot(df, ["a", "b", "c"], derived=True)
    dist = robustspot(
        df, ["a", "b", "c"], derived=True, driver_rows=10, after_rows=1
    )
    assert drv == dist
    flat = {f"{c}={v}" for mc in dist for cause in mc for c, v in cause}
    assert "a=a1" in flat


def test_robustspot_distributed_after_mining_parity_plain(spark):
    """Plain-measure twin of the distributed-after parity (the weight
    expression differs: ID*lambda, no CA factor)."""
    rng = np.random.default_rng(11)
    rows = []
    for a in [f"a{i}" for i in range(4)]:
        for b in [f"b{i}" for i in range(5)]:
            for c in [f"c{i}" for i in range(3)]:
                predict = float(rng.integers(80, 120))
                real = predict * (1.0 + rng.uniform(-0.03, 0.03))
                if b == "b3":
                    real = predict * 0.4
                rows.append((a, b, c, real, predict))
    pdf = pd.DataFrame(rows, columns=["a", "b", "c", "real", "predict"])
    df = spark.createDataFrame(pdf)
    drv = robustspot(df, ["a", "b", "c"])
    dist = robustspot(df, ["a", "b", "c"], driver_rows=10, after_rows=1)
    assert drv == dist
    flat = {f"{c}={v}" for mc in dist for cause in mc for c, v in cause}
    assert "b=b3" in flat


def test_robustspot_distributed_negative_weight_parity(spark, derived_pdf):
    """Round 9 (ADVICE): a negative contribution_ability_threshold lets
    rows with negative ID*CA products into the anomalous set; the
    distributed weight must use truncation-toward-zero (cast to long,
    matching pandas .astype(int)), not floor — floor(-0.5) = -1 vs
    int(-0.5) = 0 would break driver/distributed parity exactly here."""
    df = spark.createDataFrame(derived_pdf)
    kw = dict(derived=True, contribution_ability_threshold=-5.0)
    drv = robustspot(df, ["a", "b", "c"], **kw)
    dist = robustspot(
        df, ["a", "b", "c"], driver_rows=10, after_rows=1, **kw
    )
    assert drv == dist


def test_weighted_mode_dist_drops_null_keys(spark):
    """Round 9 (ADVICE): pandas groupby drops NaN keys, so a null
    attribute value must never become the distributed 'frequent item'
    even when its weight sum dominates."""
    from riskloc_spark.operators.robustspot import _weighted_mode_dist

    df = spark.createDataFrame(
        [(None, "b1", 100.0), (None, "b1", 100.0), ("a2", "b2", 1.0)],
        "a string, b string, w double",
    )
    got = dict(_weighted_mode_dist(df, ["a", "b"], "w"))
    assert got["a"] == "a2"  # not None, despite weight 200 vs 1
    assert got["b"] == "b1"


def test_robustspot_wide_cardinality_localizes(spark):
    """A wide-cardinality instance that previously raised (leaf frame >
    driver_rows) now localizes via the distributed path."""
    rng = np.random.default_rng(17)
    rows = []
    for u in range(3000):
        total = float(rng.integers(500, 1500))
        ok_rate = 0.95 + rng.uniform(-0.01, 0.01)
        real_ok = total * ok_rate
        region = f"r{u % 5}"
        if region == "r2":
            real_ok = total * 0.25
        rows.append((f"u{u:04d}", region, real_ok, total * 0.95, total, total))
    pdf = pd.DataFrame(
        rows,
        columns=["user", "region", "real_a", "predict_a", "real_b", "predict_b"],
    )
    df = spark.createDataFrame(pdf)
    # CA scales as 1/n_leaves, so int(ID*CA*lambda) needs a larger
    # lambda at this cardinality for nonzero expansion weights
    causes = robustspot(
        df, ["user", "region"], derived=True, driver_rows=1000,
        lambda_amplification=1e5,
    )
    flat = {f"{c}={v}" for mc in causes for cause in mc for c, v in cause}
    assert "region=r2" in flat, causes


def test_id_threshold_weighted_parity_with_duplicates():
    """_id_threshold_weighted over (distinct value, count) pairs must be
    bit-identical to _id_threshold over the count-expanded raw array —
    including duplicate-heavy samples, where the CDF extremes of the
    distinct pairs (counts[0]/n) differ from the raw extremes (1/n) and
    the len>=3 gate must count rows, not distinct values."""
    from riskloc_spark.operators.robustspot import (
        _id_threshold,
        _id_threshold_weighted,
    )

    rng = np.random.default_rng(11)
    for trial in range(200):
        n_distinct = int(rng.integers(1, 12))
        vals = np.round(rng.uniform(0.0, 1.0, n_distinct), 1)
        vals = np.unique(vals)
        cnts = rng.integers(1, 6, len(vals)).astype(float)
        raw = np.repeat(vals, cnts.astype(int))
        assert _id_threshold_weighted(vals, cnts) == _id_threshold(raw), (
            vals, cnts,
        )
    # row-count gate: 1 distinct value repeated >=3 times runs kneedle
    assert _id_threshold_weighted(np.array([0.7]), np.array([5.0])) == (
        _id_threshold(np.repeat(0.7, 5))
    )
    # <3 rows total: no knee either way
    assert _id_threshold_weighted(np.array([0.2, 0.9]), np.array([1.0, 1.0])) == 0.5
    assert _id_threshold_weighted(np.array([]), np.array([])) == 0.5


def test_rank_by_delta_tie_groups_cross_before_powerset():
    """Delta ties: cross-rule causes (multi-item) must precede
    single-item powerset causes — the deterministic half of the
    reference's positional tie order (mining.py appends cross first;
    Python's stable sort keeps them ahead). Within a group, ties break
    on canonical content (round-6 ADVICE)."""
    import numpy as np

    from riskloc_spark.operators.robustspot import _rank_by_delta

    causes = [
        (("hr", "9"),),                       # single-item, delta 0.5
        (("ub", "2"), ("event_type", "x")),   # cross,       delta 0.5
        (("event_type", "a"),),               # single-item, delta 0.5
        (("hr", "1"), ("ub", "7")),           # cross,       delta 0.5
        (("ub", "3"),),                       # delta -1.0: lowest first
    ]
    ranked = _rank_by_delta(causes, np.array([0.5, 0.5, 0.5, 0.5, -1.0]))
    assert ranked[0] == (("ub", "3"),)
    # all cross causes before any single-item cause on the tied delta,
    # each group internally content-ordered
    assert ranked[1:3] == [
        (("event_type", "x"), ("ub", "2")),
        (("hr", "1"), ("ub", "7")),
    ]
    assert ranked[3:] == [(("event_type", "a"),), (("hr", "9"),)]


def test_subset_counter_bit_equal_to_masks():
    """The signature-pass support/weight computation must be BIT-equal
    to the per-cause boolean masks it replaced (round-6 perf work) —
    integer counts and integer-valued weights sum exactly under any
    order, so even the hash gates must not move."""
    import numpy as np
    import pandas as pd

    from riskloc_spark.operators.robustspot import (
        _match_mask,
        _subset_counter,
        _subset_sums,
        _subset_supports,
        _support,
    )

    rng = np.random.default_rng(11)
    n = 5000
    pdf = pd.DataFrame(
        {
            "a": rng.choice([f"a{i}" for i in range(5)], n),
            "b": rng.choice([f"b{i}" for i in range(4)], n),
            "c": rng.choice([f"c{i}" for i in range(3)], n),
        }
    )
    w = rng.integers(1, 200, n).astype(float)
    items = [("a", "a1"), ("b", "b2"), ("c", "c0")]
    causes = [
        (items[0],),
        (items[1],),
        (items[0], items[1]),
        (items[1], items[2]),
        (items[0], items[1], items[2]),
    ]
    counter = _subset_counter(pdf, items, w)
    for c in causes:
        assert counter(c) == float(w[_match_mask(pdf, c).to_numpy()].sum())
    got = _subset_sums(pdf, causes)
    want = np.array([float(_match_mask(pdf, c).sum()) for c in causes])
    assert np.array_equal(got, want)
    sup = _subset_supports(pdf, causes)
    want_sup = np.array([_support(pdf, c) for c in causes])
    assert np.array_equal(sup, want_sup)


def test_subset_counter_wide_item_fallback():
    """Past _SUBSET_ITEM_BOUND items the 2^d bincount table would be
    multi-GB (and >= 64 items would overflow the bit shifts): the
    counter must switch to per-cause masks and return identical sums."""
    import numpy as np
    import pandas as pd

    from riskloc_spark.operators.robustspot import (
        _SUBSET_ITEM_BOUND,
        _match_mask,
        _subset_counter,
    )

    rng = np.random.default_rng(5)
    n = 2000
    cols = [f"d{i}" for i in range(6)]
    pdf = pd.DataFrame(
        {c: rng.choice([f"{c}v{j}" for j in range(5)], n) for c in cols}
    )
    # 24 (col, val) items > the 20-item bound -> mask fallback
    items = [(c, f"{c}v{j}") for c in cols for j in range(4)]
    assert len(items) > _SUBSET_ITEM_BOUND
    w = rng.integers(1, 100, n).astype(float)
    causes = [
        (items[0],),
        (items[0], items[5]),
        (items[2], items[9], items[13]),
        tuple(items[i] for i in (1, 6, 11, 16)),
    ]
    counter = _subset_counter(pdf, items, w)
    for c in causes:
        assert counter(c) == float(w[_match_mask(pdf, c).to_numpy()].sum())
    # unweighted path too
    counter0 = _subset_counter(pdf, items)
    for c in causes:
        assert counter0(c) == float(_match_mask(pdf, c).sum())


def test_fused_score_matches_composed(spark, derived_pdf):
    """score_id_ca (one totals aggregation) must be bit-identical to
    add_contribution_ability(add_influence_degree(df)) — the fused form
    is what the distributed mining rounds run (round 8)."""
    from riskloc_spark.operators.robustspot import score_id_ca

    df = adapt_frame(spark.createDataFrame(derived_pdf), derived=True)
    a = (
        add_contribution_ability(add_influence_degree(df))
        .select("a", "b", "c", "ID", "CA")
        .toPandas()
        .sort_values(["a", "b", "c"])
        .reset_index(drop=True)
    )
    b = (
        score_id_ca(df)
        .select("a", "b", "c", "ID", "CA")
        .toPandas()
        .sort_values(["a", "b", "c"])
        .reset_index(drop=True)
    )
    assert (a["ID"].to_numpy() == b["ID"].to_numpy()).all()
    assert (a["CA"].to_numpy() == b["CA"].to_numpy()).all()
