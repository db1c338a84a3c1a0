"""Plan-shape audit for the optimization rounds (guide §1/§7.2).

For every matching declared query, build the DataFrame and capture
``explain("formatted")`` to plans/<tag>/<name>_<suffix>.txt, plus print
a one-line shape summary: Exchange count, join strategies,
Python-boundary nodes (BatchEvalPython/ArrowEvalPython/MapInPandas/
MapInArrow), and whether the parquet scans carry PushedFilters.

Usage: python tools/plan_audit.py [--suffix before|after] [--tag r15]
                                  [--sf DIR] [name_substring ...]

Streaming queries (streaming_*) are skipped by default: their query
functions RUN the stream during construction, so "capturing the plan"
would execute the full lifecycle; pass --streaming to include them.
Builds that themselves execute driver-side orchestration (riskloc/
hotspot/squeeze searches) still run that orchestration — use patterns
to scope the sweep when iterating.
"""
import os
import re
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402

_JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)
_PY_RE = re.compile(
    r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
    r"FlatMapGroupsInPandas|PythonMapInArrow)"
)


def shape(plan: str) -> dict:
    joins = _JOIN_RE.findall(plan)
    py = _PY_RE.findall(plan)
    return {
        "exchanges": plan.count("Exchange"),
        "joins": {j: joins.count(j) for j in sorted(set(joins))},
        "python": {p: py.count(p) for p in sorted(set(py))},
        "pushed": plan.count("PushedFilters: ["),
        "pushed_empty": plan.count("PushedFilters: []"),
        "rowudf": plan.count("BatchEvalPython"),
    }


def main():
    args = sys.argv[1:]

    def opt(flag, default=None):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    suffix = opt("--suffix", "before")
    tag = opt("--tag", "r15")
    sf_dir = opt("--sf", os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    include_streaming = "--streaming" in args
    if include_streaming:
        args.remove("--streaming")
    # --exec: run the query once before capturing, so lazily
    # materialized reuse_checkpoint frames appear in the plan as the
    # Scan ExistingRDD they execute as (a pre-execution explain shows
    # the full un-truncated lineage instead)
    execute_first = "--exec" in args
    if execute_first:
        args.remove("--exec")
    pats = args

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = E.queries()
    names = list(queries)
    if pats:
        names = [n for n in names if any(p in n for p in pats)]
    if not include_streaming:
        names = [n for n in names if not n.startswith("streaming_")]

    rows = []
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            if execute_first:
                df.count()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - audit must not stop
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        s = shape(plan)
        dt = time.time() - t0
        flags = []
        if s["rowudf"]:
            flags.append(f"BatchEvalPython x{s['rowudf']}")
        if s["joins"].get("CartesianProduct"):
            flags.append("CARTESIAN")
        if s["joins"].get("BroadcastNestedLoopJoin"):
            flags.append("BNLJ")
        joins = ",".join(
            f"{k[:-4] if k.endswith('Join') else k}x{v}"
            for k, v in s["joins"].items()
        )
        py = ",".join(f"{k}x{v}" for k, v in s["python"].items())
        print(
            f"{name}: exch={s['exchanges']} joins=[{joins}] py=[{py}] "
            f"pushed={s['pushed'] - s['pushed_empty']}/{s['pushed']} "
            f"build={dt:.1f}s"
            + (" !! " + " ".join(flags) if flags else "")
        )
        rows.append((name, s))
    print(f"\n{len(rows)} plans written to {outdir} (*_{suffix}.txt)")


if __name__ == "__main__":
    main()
