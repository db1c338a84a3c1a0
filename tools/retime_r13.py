"""Quiet-box re-time of the round-12 >2x movers on UNCHANGED code
(VERDICT r12 Wrong #2): the `ann` rung (IVF-PQ serving 4.76->21.77s)
and the `dedup2` rung (42.8->89.4s).  Three fresh sessions, one run
of each rung per session (both are internally multi-stage blocks;
min-of-3-sessions is the steady state) — the tools/retime_movers.py
methodology.  Prints one JSON line."""
import json
import sys
import time

sys.path.insert(0, ".")

import bench
import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.1"

qmap = E.queries()
out = {"ann": [], "dedup2": []}
for session in range(3):
    spark = bench._fresh_session(SF_DIR, qmap)
    t0 = time.perf_counter()
    blk = bench._ann_scale(spark)
    out["ann"].append(
        {"wall": round(time.perf_counter() - t0, 1), "block": blk}
    )
    t0 = time.perf_counter()
    blk = bench._dedup_scale(spark, n_base=500_000)
    out["dedup2"].append(
        {"wall": round(time.perf_counter() - t0, 1), "block": blk}
    )
    spark.stop()

print(json.dumps(out))
