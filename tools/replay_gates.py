"""Standalone driver-contract replay: run every oracled queries() entry
against its DuckDB twin at a given sf dir, using the driver's compare
(row count + sorted column names + values at 1e-9, order-insensitive).

Usage: python tools/replay_gates.py [--diff] [--pandas] [--tz ZONE]
                                    [sf_dir] [name_substring ...]

--diff      on a hash mismatch, print EVERY differing row pair
            (spark-only rows vs oracle-only rows, aligned after the
            normalized sort) plus a per-column first-divergence note,
            so a driver red is diagnosable from this output alone.
--pandas    fetch the oracle result through DuckDB's pandas bridge
            (`.df()`) instead of `fetchall()`.  This is the path the
            driver's comparator takes, and it is NOT dtype-neutral:
            DuckDB 1.0 widens integer SUMs to HUGEINT, which pandas
            renders as float64 — so a bigint Spark column hashed
            against an uncast oracle SUM reds out here (the proven
            r12/r13 q11/q12 mechanism) while the default fetchall()
            path stays green.  Run with --pandas to reproduce driver
            dtype seams locally before they cost a round.
--tz ZONE   set spark.sql.session.timeZone AND the JVM user.timezone
            to ZONE (e.g. America/Los_Angeles) to reproduce a driver
            harness running under a non-UTC timezone.
"""
import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as E

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def _family(dtype):
    return {"i": "int", "u": "int", "f": "float"}.get(dtype.kind)


def dtype_family_mismatch(spark_pdf, pdf):
    """Return a description of the first output column whose
    int-vs-float family differs between the Spark result through
    toPandas() and the oracle through DuckDB's pandas bridge, or
    None.  Both sides go through pandas because that is where the
    seams live: DuckDB HUGEINT -> float64 against Spark int64 reds
    out (q11/q12, rounds 12-13), while int-with-NULLs promotes to
    float64 on BOTH bridges and cancels (events_rollup.hr)."""
    for col in pdf.columns:
        pfam = _family(pdf[col].dtype)
        sfam = (
            _family(spark_pdf[col].dtype)
            if col in spark_pdf.columns else None
        )
        if sfam and pfam and sfam != pfam:
            return (f"col {col}: spark-pandas {spark_pdf[col].dtype} "
                    f"vs oracle-pandas {pdf[col].dtype}")
    return None


def explain_red(name, scols, srows, dcols, drows):
    """Full per-row diagnosis of a mismatch: set-difference of the
    normalized rows, printed completely (both sides are gate-sized)."""
    a = normalize(srows, scols)
    b = normalize(drows, dcols)
    only_a = [r for r in a if r not in set(b)]
    only_b = [r for r in b if r not in set(a)]
    cols = sorted(scols)
    print(f"  diff {name}: columns (sorted) = {cols}")
    print(f"  spark-only rows ({len(only_a)}):")
    for r in only_a:
        print(f"    S {r}")
    print(f"  oracle-only rows ({len(only_b)}):")
    for r in only_b:
        print(f"    O {r}")
    # per-column first divergence on the aligned sorted lists — spots
    # a single drifting column (a float format, a unit, a timezone)
    for x, y in zip(a, b):
        if x != y:
            for c, (xv, yv) in zip(cols, zip(x, y)):
                if xv != yv:
                    print(f"  first divergence: col {c}: "
                          f"spark={xv!r} oracle={yv!r}")
                    return


def main():
    args = sys.argv[1:]
    show_diff = "--diff" in args
    if show_diff:
        args.remove("--diff")
    use_pandas = "--pandas" in args
    if use_pandas:
        args.remove("--pandas")
    tz = None
    if "--tz" in args:
        i = args.index("--tz")
        tz = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    pats = args[1:]
    builder = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
    )
    if tz:
        builder = builder.config(
            "spark.sql.session.timeZone", tz
        ).config(
            "spark.driver.extraJavaOptions", f"-Duser.timezone={tz}"
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = E.oracle_sql()
    queries = E.queries()
    names = [n for n in queries if n in oracles]
    if pats:
        names = [n for n in names if any(p in n for p in pats)]
    n_green = 0
    reds = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            family_red = None
            if use_pandas:
                # one Spark execution: both rows and dtypes come off
                # the SAME toPandas frame (the driver's data path)
                spdf = sdf.toPandas()
                scols = list(spdf.columns)
                srows = [
                    tuple(r) for r in spdf.itertuples(index=False)
                ]
                res = con.execute(oracles[name])
                pdf = res.df()
                dcols = list(pdf.columns)
                drows = [tuple(r) for r in pdf.itertuples(index=False)]
                # The driver-comparator seam: a Spark integer column
                # hashed against a pandas float64 (DuckDB HUGEINT) is
                # '3' vs '3.0' — normalize() below is float-tolerant,
                # so surface the dtype-family mismatch explicitly.
                family_red = dtype_family_mismatch(spdf, pdf)
            else:
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
            ok = (
                family_red is None
                and sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and normalize(srows, scols) == normalize(drows, dcols)
            )
        except Exception as exc:  # noqa: BLE001 - report, keep replaying
            print(f"RED   {name}: EXC {type(exc).__name__}: {exc}")
            reds.append(name)
            continue
        dt = time.time() - t0
        if ok:
            n_green += 1
            print(f"green {name} ({len(srows)} rows, {dt:.1f}s)")
        else:
            reds.append(name)
            a = normalize(srows, scols)
            b = normalize(drows, dcols)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
            extra = f" DTYPE-FAMILY {family_red}" if family_red else ""
            print(f"RED   {name}: rows {len(srows)}/{len(drows)} "
                  f"diff {diff}{extra}")
            if show_diff:
                explain_red(name, scols, srows, dcols, drows)
    print(f"\n{n_green}/{len(names)} green at {sf_dir}")
    if reds:
        print("REDS:", reds)
        sys.exit(1)


if __name__ == "__main__":
    main()
