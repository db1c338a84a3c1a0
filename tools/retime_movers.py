"""Quiet-box re-time of the round-11 >2x movers (VERDICT r11 #2):
fresh warmed session, min-of-2 per query, three sessions — the r10
methodology.  Rungs (spans2, graph) run once per session (they are
internally multi-stage; a 20-180s block's min-of-3-sessions is the
steady state).  Prints one JSON line."""
import json
import sys
import time

sys.path.insert(0, ".")

import bench
import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.1"
QUERIES = [
    "adtributor_elements_derived",
    "riskloc_rca",
    "riskloc_two_pass",
    "media_frames",
    "knn_lsh",
]
RUNGS = sys.argv[1:] if len(sys.argv) > 1 else ["spans2", "graph"]

qmap = E.queries()
results = {name: [] for name in QUERIES}
rung_results = {r: [] for r in RUNGS}
for session in range(3):
    spark = bench._fresh_session(SF_DIR, qmap)
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qmap[name](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        results[name].append(round(best, 2))
    for r in RUNGS:
        t0 = time.perf_counter()
        if r == "spans2":
            blk = bench._span_scale(spark, n_docs=1_000_000)
        else:
            blk = bench._graph_scale(spark)
        rung_results[r].append(
            {"wall": round(time.perf_counter() - t0, 1), "block": blk}
        )
    spark.stop()

print(json.dumps({"queries": results, "rungs": rung_results}))
