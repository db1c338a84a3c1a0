"""CLI end-to-end: the reference run.py workflow — load case, localize,
score F1 against the label."""
import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def case_csv(tmp_path_factory):
    rng = np.random.default_rng(4)
    rows = []
    for a in [f"a{i}" for i in range(5)]:
        for b in [f"b{i}" for i in range(5)]:
            for c in [f"c{i}" for i in range(4)]:
                predict = float(rng.uniform(50, 150))
                real = predict * (1 + rng.uniform(-0.02, 0.02))
                if a == "a3" and b == "b1":
                    real = predict * (1 - 0.8 - rng.uniform(0, 0.1))
                rows.append((a, b, c, real, predict))
    pdf = pd.DataFrame(rows, columns=["a", "b", "c", "real", "predict"])
    p = tmp_path_factory.mktemp("cli") / "case.csv"
    pdf.to_csv(p, index=False)
    return str(p)


def test_cli_riskloc_with_label(case_csv):
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "riskloc", case_csv,
            "--label", "a=a3&b=b1", "--risk-threshold", "0.3", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["algorithm"] == "riskloc"
    assert "a=a3&b=b1" in out["root_causes"]
    assert out["tp"] == 1
    assert out["f1"] > 0


@pytest.fixture(scope="module")
def derived_case(tmp_path_factory):
    rng = np.random.default_rng(6)
    rows_a, rows_b = [], []
    for a in [f"a{i}" for i in range(4)]:
        for b in [f"b{i}" for i in range(4)]:
            total = float(rng.integers(500, 1500))
            ok = total * (0.95 + rng.uniform(-0.01, 0.01))
            if a == "a2":
                ok = total * 0.3
            rows_a.append((a, b, ok, total * 0.95))
            rows_b.append((a, b, total, total))
    base = tmp_path_factory.mktemp("cli_derived") / "case"
    pd.DataFrame(rows_a, columns=["a", "b", "real", "predict"]).to_csv(
        str(base) + ".a.csv", index=False
    )
    pd.DataFrame(rows_b, columns=["a", "b", "real", "predict"]).to_csv(
        str(base) + ".b.csv", index=False
    )
    return str(base)


def test_cli_adtributor_derived(derived_case):
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "adtributor",
            derived_case, "--derived", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert any("a=a2" in rc for rc in out["root_causes"]), out


def test_cli_robustspot_rs_data(tmp_path):
    ts = 1_700_000_000
    rng = np.random.default_rng(12)
    rows = []
    for i in range(6):
        t = ts - i * 60
        for cdn in ["cdn1", "cdn2", "cdn3"]:
            for bitrate in ["hd", "sd"]:
                total = 100.0
                ok = total * (0.95 + rng.uniform(-0.01, 0.01))
                if cdn == "cdn2" and i == 0:  # anomaly at current minute
                    ok = total * 0.2
                rows.append((t, cdn, bitrate, round(ok, 2), total))
    p = tmp_path / "rs.csv"
    pd.DataFrame(rows, columns=["min", "cdn", "bitrate", "value", "cnt"]).to_csv(
        p, index=False
    )
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "robustspot",
            str(p), "--rs-data", "--timestamp", str(ts), "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert any("cdn=cdn2" in rc for rc in out["root_causes"]), out
