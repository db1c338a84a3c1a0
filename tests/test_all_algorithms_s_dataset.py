"""Capstone: a reference-S-config-scale instance (dims 10x12x10x8x5 =
48,000 leaves, generated like generate_dataset.py) through every RCA
algorithm — the full engine surface at the reference's own data scale."""
import pytest

from riskloc_spark.evaluation import root_cause_postprocessing, score_root_causes
from riskloc_spark.generator import generate_rca_instance

DIMS = {"a": 10, "b": 12, "c": 10, "d": 8, "e": 5}


@pytest.fixture(scope="module")
def instance(spark):
    df, label, meta = generate_rca_instance(
        spark,
        DIMS,
        seed=101,
        zero_rate=(0.0, 0.05),
        noise_level=(0.0, 0.05),
        anomaly_severity=(0.6, 0.9),
        num_anomaly=(1, 1),
        num_anomaly_elements=(1, 1),
        only_last_layer=False,
    )
    df = df.persist()
    df.count()
    yield df, label
    df.unpersist()


def test_riskloc_on_s_scale(spark, instance):
    from riskloc_spark.operators.riskloc import riskloc

    df, label = instance
    preds = root_cause_postprocessing(
        riskloc(df, list(DIMS), risk_threshold=0.3), "riskloc"
    )
    tp, fp, fn, _ = score_root_causes(preds, label)
    assert tp >= 1, f"label={label} preds={preds}"


def test_adtributor_on_s_scale(spark, instance):
    from riskloc_spark.operators.adtributor import adtributor

    df, _ = instance
    out = adtributor(df, list(DIMS), teep=0.05, tep=0.1)
    assert isinstance(out, list)


def test_r_adtributor_on_s_scale(spark, instance):
    from riskloc_spark.operators.adtributor import rev_rec_adtributor

    df, _ = instance
    out = rev_rec_adtributor(df, list(DIMS), teep=0.05)
    assert isinstance(out, list)


def test_autoroot_on_s_scale(spark, instance):
    from riskloc_spark.operators.autoroot import autoroot

    df, label = instance
    preds = root_cause_postprocessing(autoroot(df, list(DIMS)), "autoroot")
    # autoroot is recall-oriented: the injected cause's values appear
    flat = {p for cause in preds for p in cause.split("&")}
    wanted = {p for cause in label.split(";") for p in cause.split("&")}
    assert preds, "no causes"
    assert flat & wanted, f"label={label} preds={preds}"


def test_hotspot_on_s_scale(spark, instance):
    from riskloc_spark.operators.hotspot import hotspot

    df, _ = instance
    best = hotspot(df, list(DIMS), pt=0.6, m=60)
    assert best["elements"]


def test_squeeze_on_s_scale(spark, instance):
    from riskloc_spark.operators.squeeze import squeeze

    df, _ = instance
    causes = squeeze(df, list(DIMS))
    assert isinstance(causes, list)


def test_robustspot_on_s_scale(spark, instance):
    from riskloc_spark.operators.robustspot import robustspot

    df, _ = instance
    causes = robustspot(df, list(DIMS), k=3)
    assert isinstance(causes, list)
