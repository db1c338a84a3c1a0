"""Bloom-filter membership sketches (Bloom 1970, "Space/time
trade-offs in hash coding with allowable errors") — the set-MEMBERSHIP
sibling of the HLL cardinality sketch and the Count-Min frequency
sketch (operators/sketches.py, operators/cms.py).

The filter is an ordinary DataFrame of (key..., pos) rows — the SET
bit positions, one row per distinct set bit.  Build once per
shard/day with one explode + distinct, persist like any table, MERGE
by union+distinct (filter(A ∪ B) == merge(filter(A), filter(B)),
property-tested), and probe with a broadcast item join: an item is
PRESENT-maybe iff all k of its positions are set (no false negatives
— guaranteed by construction and test-pinned; false positives at the
standard (1 - e^(-kn/m))^k rate).

The 100-TB use: "does this id/url/hash exist in the archive?" without
touching the archive — a day's ingest probes last year's bloom rows
(KBs-to-MBs per shard) instead of semi-joining petabytes; only
present-maybe hits pay the exact lookup.  The k hash rows reuse the
portable seeded 60-bit md5 (operators/dedup.md5_hash64) so a DuckDB
twin replays every bit; production swaps in xxhash64 via ``hash_fn``
— every hash is masked to its low 60 non-negative bits before the
position mod, so a signed 64-bit hash cannot set negative positions.
NULL values are excluded on both build and probe sides (a NULL would
otherwise hash as the bare seed string, setting spurious bits).

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from riskloc_spark.operators.dedup import md5_hash64, reuse_checkpoint

_HASH_MASK = (1 << 60) - 1  # fold ANY hash into [0, 2^60)


def _pos(hash_fn, col, seed: int, m_bits: int):
    """Non-negative bit position: mask the (possibly signed 64-bit)
    hash to its low 60 bits, then mod — a no-op for md5_hash64."""
    return (
        hash_fn(col, seed=seed).bitwiseAND(F.lit(_HASH_MASK)) % m_bits
    ).cast("long")


def bloom_build(
    df: DataFrame,
    value_col: str,
    key_cols: list | None = None,
    m_bits: int = 1 << 20,
    k: int = 4,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., pos): the distinct set-bit positions of the Bloom
    filter over ``value_col`` per key group — k seeded hashes mod
    ``m_bits`` per value, one explode + one distinct.  A mega-key
    contributes at most ``m_bits`` rows total, ever."""
    if m_bits < 2 or k < 1:
        raise ValueError("m_bits must be >= 2, k >= 1")
    keys = list(key_cols or [])
    # ONE scan: the k seeded positions explode from an in-row array (a
    # union of per-seed selects would scan the corpus k times)
    pos = F.explode(
        F.array(
            *[
                _pos(hash_fn, F.col(value_col), r, m_bits)
                for r in range(k)
            ]
        )
    ).alias("pos")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, pos)
        .distinct()
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union set-bit tables from any number of shards/windows: the
    bitwise OR is a union + distinct.  Columns must match."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.distinct()


def bloom_probe(
    bloom: DataFrame,
    items: DataFrame,
    item_col: str,
    key_cols: list | None = None,
    m_bits: int = 1 << 20,
    k: int = 4,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., item, maybe_present): membership verdict per item per
    key group — true iff ALL k positions are set.  The item frame is
    broadcast into the position join (items are tiny against a
    persisted filter); anchored on the full key x item frame so an
    item matching zero positions still gets its false row."""
    keys = list(key_cols or [])
    uniq = (
        items.filter(F.col(item_col).isNotNull())
        .select(F.col(item_col).alias("item"))
        .distinct()
    )
    # two plan branches (probe + anchoring base), no cross-branch CSE
    # — checkpoint so an expensive item pipeline runs once
    uniq = reuse_checkpoint(uniq)
    probes = [
        uniq.select(
            "item",
            _pos(hash_fn, F.col("item"), r, m_bits).alias("pos"),
        )
        for r in range(k)
    ]
    # an item's k hashes may COLLIDE with each other: count distinct
    # required positions per item, not k
    probe = reduce(lambda a, b: a.unionAll(b), probes).distinct()
    need = probe.groupBy("item").agg(
        F.count(F.lit(1)).alias("__need")
    )
    hit = (
        bloom.join(F.broadcast(probe), "pos")
        .groupBy(*keys, "item")
        .agg(F.count(F.lit(1)).alias("__hit"))
    )
    base = (
        bloom.select(*keys).distinct().crossJoin(F.broadcast(uniq))
        if keys
        else uniq
    )
    return (
        base.join(F.broadcast(need), "item")
        .join(hit, [*keys, "item"], "left_outer")
        .select(
            *keys,
            "item",
            (
                F.coalesce(F.col("__hit"), F.lit(0))
                == F.col("__need")
            ).alias("maybe_present"),
        )
    )
