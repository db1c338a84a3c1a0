"""Interleaved A/B of the squeeze rung2 explode-persist regime (r15).

Generates the exact bench rung2 instance (5.4M leaves, seed 13), then
alternates squeeze() runs with spark.riskloc.squeeze.persistExplode
on/off (pattern A B A B ...), asserting identical root causes each run.
Interleaving in ONE session means both regimes see the same box state.

Usage: python tools/ab_squeeze_rung2.py [--rounds 2] [--dims small]
"""
import json
import os
import sys
import time

# repo root derived from this file, not cwd: running the tool from
# outside the repo root must import THIS tree's riskloc_spark (ADVICE r15)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    rounds = 2
    dims = {"a": 60, "b": 50, "c": 45, "d": 40}  # 5.4M — bench rung2
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    if "--dims" in sys.argv and sys.argv[sys.argv.index("--dims") + 1] == "small":
        dims = {"a": 30, "b": 25, "c": 25, "d": 30}  # 562k — rung1

    from riskloc_spark.generator import generate_rca_instance
    from riskloc_spark.operators.squeeze import squeeze
    from riskloc_spark.session import get_spark

    spark = get_spark("riskloc-ab-squeeze")
    spark.sparkContext.setLogLevel("ERROR")
    df, label, _ = generate_rca_instance(
        spark, dims, seed=13,
        zero_rate=(0.0, 0.0), noise_level=(0.0, 0.05),
        anomaly_severity=(0.7, 0.9), num_anomaly=(1, 1),
        num_anomaly_elements=(1, 1),
    )
    df = df.persist()
    df.count()
    attrs = list(dims)

    results = {"true": [], "false": []}
    causes_by = {}
    for r in range(rounds):
        for flag in ("true", "false"):
            spark.conf.set("spark.riskloc.squeeze.persistExplode", flag)
            t0 = time.perf_counter()
            causes = squeeze(df, attrs)
            dt = round(time.perf_counter() - t0, 3)
            results[flag].append(dt)
            key = json.dumps(causes, sort_keys=True, default=str)
            causes_by.setdefault(flag, key)
            assert causes_by[flag] == key, f"nondeterministic causes ({flag})"
            print(f"round {r} persistExplode={flag}: {dt}s", flush=True)
    assert causes_by["true"] == causes_by["false"], "REGIME CHANGED RESULTS"
    print("causes identical across regimes:", causes_by["true"][:200])
    print("JSON " + json.dumps(
        {k: {"samples": v, "min": min(v)} for k, v in results.items()}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
