"""Focused per-query timer for optimization A/B runs (guide §1).

Replicates bench.py methodology — get_spark session, standard warmup,
min-of-N of (build + count) per query — without the sentinel rounds or
scale blocks, so a single query's before/after can be measured in
seconds instead of a full bench run.

Usage: python tools/time_queries.py [--n 3] [--sf DIR] name [name ...]
Names are exact query keys (not substrings).  Prints one line per query
and a final JSON dict.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    args = sys.argv[1:]
    n = 3
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i:i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]

    import __spark_entry__ as E
    from riskloc_spark.session import get_spark

    queries = E.queries()
    spark = get_spark("riskloc-spark-timer")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py warmup: JVM + parquet footers + Python worker pool
    queries["q6_forecast_revenue"](spark, sf_dir).count()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    out = {}
    for name in args:
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.count()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = min(samples)
        print(f"{name}: min={min(samples)} samples={samples}",
              flush=True)
    print("JSON " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
