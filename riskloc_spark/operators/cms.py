"""Count-Min frequency sketches (Cormode & Muthukrishnan 2005, "An
improved data stream summary: the count-min sketch and its
applications") — the mergeable frequency-estimate companion to the
HLL cardinality sketch (operators/sketches.py).

The sketch is an ordinary DataFrame of (key..., row, bucket, cnt)
register rows: ``depth`` hash rows x ``width`` buckets, counts summed
exactly (BIGINT — no float anywhere, so merge and estimate are
bit-identical under any partitioning).  Build once per shard/day with
ONE map-combinable aggregation, persist like any table, MERGE by
summing counts (sketch(A ∪ B) == merge(sketch(A), sketch(B)),
property-tested), and look up items with a broadcast join + min.

Guarantees (classic): estimate >= true count always (counts only
collide upward), and estimate <= true + eps*N with probability
1 - delta for width >= e/eps, depth >= ln(1/delta).

The row hashes are the portable 60-bit md5 with the ROW INDEX as the
seed (operators/dedup.md5_hash64 appends ':<seed>'), so a DuckDB twin
replays every register; production swaps in xxhash64 via ``hash_fn``
— every hash is masked to its low 60 non-negative bits before the
bucket mod, so a signed 64-bit hash cannot yield negative buckets.
NULL values are excluded on both the build and lookup sides (md5's
concat_ws seeding would otherwise hash a NULL as the bare seed
string, adding phantom counts).

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from riskloc_spark.operators.dedup import md5_hash64, reuse_checkpoint

_HASH_MASK = (1 << 60) - 1  # fold ANY hash into [0, 2^60)


def _bucket(hash_fn, col, seed: int, width: int):
    """Non-negative bucket: mask the (possibly signed 64-bit) hash to
    its low 60 bits, then mod — a no-op re-slice for md5_hash64."""
    return (
        hash_fn(col, seed=seed).bitwiseAND(F.lit(_HASH_MASK)) % width
    ).cast("int")


def cms_sketch(
    df: DataFrame,
    value_col: str,
    key_cols: list | None = None,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., row, bucket, cnt): the Count-Min register table for
    the multiset of ``value_col`` per key group (``weight_col`` counts
    each row that many times; default 1).  One explode over the depth
    rows + one combinable aggregation — a mega-key contributes at most
    depth x width rows per input partition after partial agg."""
    if width < 2 or depth < 1:
        raise ValueError("width must be >= 2, depth >= 1")
    keys = list(key_cols or [])
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    # ONE scan: the depth seeded hashes explode from an in-row array
    # (a union of per-seed selects would scan the corpus depth times)
    buckets = F.posexplode(
        F.array(
            *[
                _bucket(hash_fn, F.col(value_col), r, width)
                for r in range(depth)
            ]
        )
    ).alias("row", "bucket")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, w.alias("__w"), buckets)
        .groupBy(*keys, "row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables from any number of shards/windows: the
    same groupBy SUM (counts are additive).  Columns must match."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    key_cols: list | None = None,
    width: int = 1024,
    depth: int = 4,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., item, est): the Count-Min frequency estimate for each
    item — min over the depth rows of the matching register, absent
    registers counting 0.  The item frame is broadcast into the
    register join (items are tiny against a persisted sketch); the
    min is one small aggregation per (key, item).

    When ``key_cols`` are given AND the item frame carries them, each
    key group is probed ONLY with its own (key, item) pairs — the
    probe joins on (key..., row, bucket), so a value never observed
    in a key cannot enter that key's estimates through the pooled
    candidate set, and probe volume stays |pairs| x depth instead of
    |keys| x |items| x depth.  An item frame WITHOUT the key columns
    falls back to the pooled cross-key probe (every key x every
    item), which is the right shape for an explicit "estimate these
    items everywhere" lookup."""
    keys = list(key_cols or [])
    keyed_items = bool(keys) and all(
        k in items.columns for k in keys
    )
    item_keys = keys if keyed_items else []
    uniq = (
        items.filter(F.col(item_col).isNotNull())
        .select(*item_keys, F.col(item_col).alias("item"))
        .distinct()
    )
    # the item frame feeds TWO plan branches (the probe and the
    # anchoring base) and Spark does no cross-branch CSE — without a
    # checkpoint an expensive upstream (e.g. heavy_hitter_candidates'
    # corpus scan) runs twice (the banded_hamming_pairs lesson)
    uniq = reuse_checkpoint(uniq)
    probes = [
        uniq.select(
            *item_keys,
            "item",
            F.lit(r).alias("row"),
            _bucket(hash_fn, F.col("item"), r, width).alias("bucket"),
        )
        for r in range(depth)
    ]
    probe = reduce(lambda a, b: a.unionAll(b), probes)
    joined = sketch.join(
        F.broadcast(probe), [*item_keys, "row", "bucket"]
    )
    # an absent register means NO collision landed there either: that
    # row's count is 0, so the min is 0 — count matched rows to
    # detect, and anchor on the full (key, item) probe frame so an
    # item with ZERO matching registers in a group still gets its 0
    # row
    per = joined.groupBy(*keys, "item").agg(
        F.min("cnt").alias("__min"),
        F.count(F.lit(1)).alias("__rows"),
    )
    if keyed_items:
        base = uniq
    elif keys:
        base = (
            sketch.select(*keys).distinct()
            .crossJoin(F.broadcast(uniq))
        )
    else:
        base = uniq
    return base.join(per, [*keys, "item"], "left_outer").select(
        *keys,
        "item",
        F.when(
            F.col("__rows").isNull() | (F.col("__rows") < depth),
            F.lit(0).cast("long"),
        )
        .otherwise(F.col("__min"))
        .alias("est"),
    )


def heavy_hitter_candidates(
    df: DataFrame,
    value_col: str,
    id_col: str,
    key_cols: list | None = None,
    sample_k: int = 4096,
    salt: int = 0,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., item): the distinct values seen in a deterministic
    bottom-``sample_k`` uniform row sample per key (the quantile
    sketch's hash-threshold membership, operators/quantiles.py) — the
    candidate stream for heavy-hitter discovery.  A value with
    frequency >= eps*n is missed with probability <= (1-eps)^sample_k
    (~e^(-eps*sample_k): at sample_k=4096 an 0.1%-heavy item is
    missed <2% of the time, a 1%-heavy item essentially never).
    Mergeable: candidate sets from shard-level bottom-k samples union
    into a superset of the union's candidates.  ``id_col`` must be
    unique per row."""
    if sample_k < 1:
        raise ValueError("sample_k must be >= 1")
    keys = list(key_cols or [])
    staged = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
        )
        .select(
            *keys,
            (
                hash_fn(F.col(id_col), seed=salt)
                .bitwiseAND(F.lit(_HASH_MASK))
            ).alias("__h"),
            F.col(value_col).alias("item"),
        )
    )
    # rank<=k compiles to WindowGroupLimit: each map task forwards at
    # most sample_k rows per key into the shuffle
    w = Window.partitionBy(*keys).orderBy("__h", "item")
    return (
        staged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= sample_k)
        .select(*keys, "item")
        .distinct()
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    id_col: str,
    key_cols: list | None = None,
    top_k: int = 20,
    sample_k: int = 4096,
    width: int = 1024,
    depth: int = 4,
    salt: int = 0,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., rank, item, est): heavy-hitter DISCOVERY — the top-k
    most frequent values per key group, found WITHOUT an exact
    distinct-sized aggregation: a bottom-``sample_k`` uniform sample
    proposes candidates (every eps-heavy value w.h.p., see
    ``heavy_hitter_candidates``), ``cms_sketch`` + ``cms_lookup``
    estimate their counts (overestimate-only, <= true + eps_cms*N
    w.h.p. for width >= e/eps_cms), and a WindowGroupLimit rank keeps
    the k largest estimates (item-asc tiebreak — deterministic).

    Why not SpaceSaving/Misra-Gries: their summaries depend on stream
    order, so two partitionings of the same data disagree — not
    replayable by an independent engine, not property-testable as
    merge == union.  This composition is both: candidates merge by
    union, registers by sum, so per-shard artifacts compose into the
    corpus answer.  Two corpus scans (sample + registers), both
    map-side bounded; everything downstream is candidate-sized.

    Caveat (documented, test-pinned): ranks order CMS OVERestimates,
    so a light item can outrank a heavier one only through register
    collisions — size ``width`` >= e/eps for the N at hand."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    keys = list(key_cols or [])
    # both intermediates are corpus scans reused across plan branches
    # inside cms_lookup — checkpoint so each scan happens once (the
    # results are tiny: <= sample_k items, <= depth x width registers
    # per key)
    cand = reuse_checkpoint(heavy_hitter_candidates(
        df, value_col, id_col, keys, sample_k, salt, hash_fn
    ))
    sketch = reuse_checkpoint(cms_sketch(
        df, value_col, keys, width, depth, hash_fn=hash_fn
    ))
    est = cms_lookup(
        sketch, cand, "item", keys, width, depth, hash_fn
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("est").desc(), F.col("item").asc()
    )
    return (
        est.withColumn(
            "rank", F.row_number().over(w).cast("int")
        )
        .filter(F.col("rank") <= top_k)
        .select(*keys, "rank", "item", "est")
    )


def cms_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    key_cols: list | None = None,
    depth: int = 4,
) -> DataFrame:
    """(key..., est): the Count-Min JOIN-SIZE estimate — how many
    rows an equi-join of the two sketched multisets would produce
    (|A JOIN B on v| = sum_v cnt_A(v) * cnt_B(v)), computed from the
    registers alone (Cormode & Muthukrishnan 2005, the inner-product
    estimator).  The 100-TB planning diagnostic: before running a
    join that might explode, dot two persisted per-column sketches
    (KB-sized artifacts) instead of scanning either table.

    est = min over the depth hash rows of the per-row bucket dot
    product.  Guarantee: every row's dot product counts each true
    (value, value) pairing exactly once plus non-negative collision
    cross-terms, so est >= true ALWAYS, and est <= true +
    eps * N_A * N_B w.h.p. for width >= e/eps (the classic bound).
    Exact when value sets are collision-free in every row
    (property-tested).  Both sketches must share (width, ``depth``,
    hash_fn, seeding); per-key sketches estimate per key group — a
    key present in both sketches with NO shared bucket in some hash
    row estimates 0 (that row's dot product is empty), which is why
    ``depth`` is a parameter: the register join drops empty rows and
    the anchor below restores their zeros.  Register tables are
    bucket-aligned by construction, so the join is register-sized —
    nothing rescans the data."""
    keys = list(key_cols or [])
    a = sketch_a.select(
        *keys, "row", "bucket", F.col("cnt").alias("__ca")
    )
    b = sketch_b.select(
        *keys, "row", "bucket", F.col("cnt").alias("__cb")
    )
    per_row = (
        a.join(b, [*keys, "row", "bucket"])
        .groupBy(*keys, "row")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__dot"))
    )
    per_key = per_row.groupBy(*keys).agg(
        F.min("__dot").alias("__min"),
        F.count(F.lit(1)).alias("__rows"),
    )
    est = (
        F.when(
            F.col("__rows").isNull() | (F.col("__rows") < depth),
            F.lit(0).cast("long"),
        )
        .otherwise(F.col("__min"))
        .alias("est")
    )
    if keys:
        base = a.select(*keys).distinct().join(
            b.select(*keys).distinct(), keys
        )
        return base.join(per_key, keys, "left_outer").select(
            *keys, est
        )
    # unkeyed: per_key is zero-or-one row — anchor on a literal
    # one-row frame so an empty register intersection yields est 0
    base = sketch_a.sparkSession.range(1).select(
        F.lit(1).alias("__k")
    )
    pk = per_key.withColumn("__k", F.lit(1))
    return base.join(pk, "__k", "left_outer").select(est)
