"""Standalone driver-contract replay: run every oracled queries() entry
against its DuckDB twin at a given sf dir, using the driver's compare
(row count + sorted column names + values at 1e-9, order-insensitive).

Usage: python tools/replay_gates.py [--diff] [--tz ZONE] [sf_dir]
                                    [name_substring ...]

--diff      on a hash mismatch, print EVERY differing row pair
            (spark-only rows vs oracle-only rows, aligned after the
            normalized sort) plus a per-column first-divergence note,
            so a driver red is diagnosable from this output alone.
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
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = (
                sorted(scols) == sorted(dcols)
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
            print(f"RED   {name}: rows {len(srows)}/{len(drows)} diff {diff}")
            if show_diff:
                explain_red(name, scols, srows, dcols, drows)
    print(f"\n{n_green}/{len(names)} green at {sf_dir}")
    if reds:
        print("REDS:", reds)
        sys.exit(1)


if __name__ == "__main__":
    main()
