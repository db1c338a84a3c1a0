"""Z-order clustering (operators/zorder.py): Morton interleave vs a
pure-Python replay, edge quantization, NULL handling, write round
trip with per-file locality."""
from riskloc_spark.operators.zorder import write_zordered, zorder_key


def _py_z(vals, bits):
    """vals: list of already-quantized ints, one per column."""
    z = 0
    n = len(vals)
    for i, q in enumerate(vals):
        for b in range(bits):
            z |= ((q >> b) & 1) << (b * n + i)
    return z


def _py_quant(v, lo, hi, bits):
    if v is None or hi <= lo:
        return 0
    import math

    maxq = (1 << bits) - 1
    q = math.floor(((v - lo) * maxq) / (hi - lo))
    return min(max(q, 0), maxq)


def test_zorder_key_matches_python_replay(spark):
    rows = [(i, i % 97, (i * 7) % 89) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["id"]: r["__z"] for r in zorder_key(df, ["x", "y"], bits=8).collect()}
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    for i, x, y in rows:
        qx = _py_quant(x, min(xs), max(xs), 8)
        qy = _py_quant(y, min(ys), max(ys), 8)
        assert got[i] == _py_z([qx, qy], 8), (i, x, y)


def test_zorder_edges_nulls_and_constant_column(spark):
    df = spark.createDataFrame(
        [(0, 10, None), (1, 20, 5), (2, 30, 5)],
        "id long, x long, y int",
    )
    got = {r["id"]: r["__z"] for r in zorder_key(df, ["x", "y"], bits=4).collect()}
    # y is constant among non-nulls -> span 0 -> quantizes to 0 for all
    # x: 10 -> 0, 20 -> 7 (floor(10*15/20)), 30 -> 15
    assert got[0] == _py_z([0, 0], 4)
    assert got[1] == _py_z([7, 0], 4)
    assert got[2] == _py_z([15, 0], 4)


def test_zorder_interleave_is_morton(spark):
    # hand-pinned: qx=0b10, qy=0b01 at bits=2, n=2 ->
    # bit0 of x at pos 0, bit0 of y at pos 1, bit1 x at 2, bit1 y at 3
    assert _py_z([0b10, 0b01], 2) == 0b0110


def test_write_zordered_round_trip_and_locality(spark, tmp_path):
    rows = [(i, i % 32, (i * 11) % 32) for i in range(2048)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = str(tmp_path / "zordered")
    write_zordered(df, out, ["x", "y"], bits=5, partitions=8)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    assert "__z" not in back.columns
    # locality: each output file must cover a narrow x-range AND a
    # narrow y-range (the whole point of the curve) — strictly
    # smaller than the full 0..31 span on average
    import pyspark.sql.functions as F

    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(per_file) >= 4
    avg_sx = sum(r["sx"] for r in per_file) / len(per_file)
    avg_sy = sum(r["sy"] for r in per_file) / len(per_file)
    assert avg_sx < 24 and avg_sy < 24, (avg_sx, avg_sy)
