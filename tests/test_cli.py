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
