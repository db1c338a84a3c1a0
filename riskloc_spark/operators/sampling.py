"""Deterministic sampling operators for training-data assembly.

The mixture-weights layer of an LLM corpus pipeline: which fraction of
each source enters the mix, and how the corpus splits into train/val/
test. ``df.sample`` is wrong for this job at scale — its membership
depends on partitioning and run order, so a re-run (or a second
consumer of the same split) sees a different sample. Every operator
here decides membership as a PURE FUNCTION of (id, salt): stable across
runs, partitionings and cluster sizes, reproducible by any engine, and
composable (complementary salts give independent samples; one salt's
split buckets are disjoint and exhaustive).

No reference counterpart (the reference is an RCA repo) — part of the
LLM-data-pipeline surface alongside dedup/curation. All pure column
algebra: a sample is a FILTER (predicate-pushdown friendly — at 100 TB
the sample predicate reaches the scan and unselected row groups are
still read but never shuffled), a split is a projection; no shuffle
anywhere.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from riskloc_spark.operators.dedup import xxhash64_fn

# hash granularity: fractions resolve to 1/NGRAIN steps (1e-6 — finer
# than any practical mixture weight; documented so 0.35 means exactly
# 350_000/1_000_000 of hash space, not "approximately 35%")
_GRAIN = 1_000_000


def _unit_hash(id_col: Column, salt: str, hash_fn) -> Column:
    """Uniform integer in [0, _GRAIN) from (id, salt): non-negative
    pmod of the 64-bit hash of the string key 'id' or 'id:salt' (always
    string-keyed, so any engine replays it). The salt makes samples
    independent — different salts draw from effectively independent
    permutations of the id space."""
    key = (
        id_col.cast("string")
        if salt == ""
        else F.concat_ws(":", id_col.cast("string"), F.lit(salt))
    )
    return F.pmod(hash_fn(key), F.lit(_GRAIN))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    salt: str = "",
    id_col: str = "doc_id",
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """Reproducible Bernoulli sample: keep a row iff
    pmod(hash(id:salt), 1e6) < fraction * 1e6. Membership is a pure
    function of (id, salt) — re-runs, repartitions and other consumers
    see the SAME sample, and samples with different salts are
    independent. The production hash is xxhash64; pass md5_hash64 for
    an ANSI-SQL-replayable sample."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * _GRAIN)
    return df.filter(_unit_hash(F.col(id_col), salt, hash_fn) < F.lit(cut))


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """Per-stratum deterministic rates — the MIXTURE-WEIGHTS operator:
    ``fractions`` maps a stratum value (e.g. source) to its keep
    fraction; unlisted strata keep ``default_fraction``. Same hash rule
    as deterministic_sample, so the same (id, salt) stays in or out as
    its stratum's rate moves — raising a rate only ADDS documents
    (nested samples), which makes mixture re-weighting reproducible
    instead of a reshuffle."""
    for v, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {v!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1]")
    cut = F.lit(int(default_fraction * _GRAIN))
    for v, f in sorted(fractions.items()):
        cut = F.when(
            F.col(strata_col) == F.lit(v), F.lit(int(f * _GRAIN))
        ).otherwise(cut)
    return df.filter(_unit_hash(F.col(id_col), salt, hash_fn) < cut)


def split_bounds(weights: dict) -> list:
    """The cumulative hash-space bounds hash_split assigns (one per
    bucket except the last, which takes the remainder): raw weights
    accumulate BEFORE the single divide, so integer weights ({3, 1} or
    {75, 15, 10}) produce exact cumulative fractions instead of
    compounding float error per bucket. Exposed so an external twin
    (or audit) can reproduce the exact boundary integers."""
    names = list(weights)
    total = float(sum(weights.values()))
    bounds = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        bounds.append(int(acc / total * _GRAIN))
    return bounds


def hash_split(
    df: DataFrame,
    weights: dict,
    salt: str = "split",
    id_col: str = "doc_id",
    split_col: str = "split",
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """Disjoint, exhaustive, reproducible split (train/val/test):
    ``weights`` maps split name -> weight (normalized to sum 1; buckets
    are consecutive hash ranges in the given insertion order, boundary
    rounding absorbed by the LAST bucket so the split is exhaustive by
    construction). Adds ``split_col``; filtering it is the 100-TB
    split-read (a pure predicate, no shuffle, any consumer
    re-derives the same assignment)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = _unit_hash(F.col(id_col), salt, hash_fn)
    names = list(weights)
    bounds = split_bounds(weights)
    # nest from the last bucket outward: the outermost WHEN tests the
    # first (smallest) bound, so each row takes the first range it fits
    expr = F.lit(names[-1])
    for name, b in list(zip(names[:-1], bounds))[::-1]:
        expr = F.when(h < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "",
    default_budget: int | None = None,
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """Deterministic PER-GROUP sampling to a TOKEN budget — the mixture
    step training pipelines actually run ("200B tokens of web, 30B of
    code"), where per-document rates undershoot or overshoot because
    documents have wildly different lengths.

    Documents are ordered within their group by the same pure (id,
    salt) hash the other sampling operators use (a deterministic
    shuffle — no quality bias, stable across runs/partitionings, and a
    different salt redraws independently), then taken while the
    group's RUNNING token total stays within budget: a document is
    kept iff cum_tokens_through_it <= budget, so the kept set
    overshoots by at most zero and undershoots by less than the first
    rejected document. Groups without a budget pass through when
    ``default_budget`` is None, else use the default.

    Output: the kept rows plus ``cum_tokens`` (the audit column: the
    running total that justified each keep — the evidence an auditor
    re-checks). One shuffle (the per-group window sort); at 100 TB
    groups are few and large, and the window sorts within each group
    partition — a skewed giant group sorts in parallel by range within
    its partition spill-safely."""
    from pyspark.sql import Window

    h = _unit_hash(F.col(id_col), salt, hash_fn)
    w = (
        Window.partitionBy(group_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    budget = None
    for g, b in budgets.items():
        cond = F.col(group_col) == F.lit(g)
        budget = (
            F.when(cond, F.lit(int(b)))
            if budget is None
            else budget.when(cond, F.lit(int(b)))
        )
    if budget is None:
        budget = F.lit(
            int(default_budget) if default_budget is not None else None
        )
    else:
        budget = budget.otherwise(
            F.lit(int(default_budget)) if default_budget is not None
            else F.lit(None)
        )
    out = df.withColumn("cum_tokens", cum.cast("long")).withColumn(
        "__budget", budget
    )
    return (
        out.filter(
            F.col("__budget").isNull()
            | (F.col("cum_tokens") <= F.col("__budget"))
        )
        .drop("__budget")
    )


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    k: int,
    order_by: list | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``k`` rows per key — the C4/RefinedWeb per-domain
    cap that stops a single mega-host from dominating the training
    mix.  Rows are kept by ``order_by`` priority (default: none),
    always tie-broken by ``id_col`` so the survivor set is
    deterministic under any partitioning.

    Scale shape: the rank<=k filter over a partitioned window compiles
    to WindowGroupLimit (plan-asserted in tests), which Spark applies
    on the MAP side before the shuffle — a mega-domain ships at most
    k rows per input partition to the reducer instead of its whole
    row set, so the classic hot-domain skew never reaches one core at
    full volume.  (A plain groupBy-collect_list cap would.)"""
    from pyspark.sql import Window

    order = list(order_by or []) + [F.col(id_col).asc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: list | None = None,
    salt: str = "",
    id_col: str = "doc_id",
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per key group —
    Efraimidis & Spirakis 2006 (A-ES): each row draws the
    deterministic uniform u = (hash(id:salt) + 1) / (grain + 1) and
    ranks by the exponential-race key ln(u) / w (the u^(1/w) ordering
    in log space); the top-k by that key IS a weight-proportional
    sample without replacement.  Membership is a pure function of
    (id, salt, weight) — re-runs and repartitions agree, different
    salts draw independent samples.  Rows with NULL or non-positive
    weight never qualify.

    Scale shape: the rank<=k filter compiles to WindowGroupLimit
    (map-side cap — the cap_per_key shape), so a mega-group ships at
    most k rows per input partition; no global sort, no collected
    candidate lists.  The production hash is xxhash64; pass
    md5_hash64 for the ANSI-SQL-replayable draw."""
    from pyspark.sql import Window

    keys = list(key_cols or [])
    u = (_unit_hash(F.col(id_col), salt, hash_fn) + 1) / F.lit(
        float(_GRAIN + 1)
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("__es").desc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__es", F.log(u) / F.col(weight_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__es", "__rn")
    )


def shuffle_and_shard(
    df: DataFrame,
    n_shards: int,
    salt: str = "shuffle",
    id_col: str = "doc_id",
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the last-mile
    stage before training export: adds ``shard`` (pmod of hash(id:salt)
    over n_shards) and ``pos`` (the row's dense 0-based position WITHIN
    its shard, ordered by an independent hash then id).  Training jobs
    that stream shard files in pos order see a reproducible global
    permutation; a re-run, a different partitioning, or another engine
    produces the SAME (shard, pos) for every row — ``df.orderBy(rand())``
    has none of these properties.

    Scale shape: ONE hash exchange on shard + a per-shard window (each
    shard sorts independently — no global sort, no single-reducer
    bottleneck; n_shards is the parallelism).  The production hash is
    xxhash64; pass md5_hash64 for an ANSI-SQL-replayable permutation."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    sid = F.pmod(
        hash_fn(
            F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
        ),
        F.lit(n_shards),
    ).cast("int")
    order = F.pmod(
        hash_fn(
            F.concat_ws(
                ":", F.col(id_col).cast("string"), F.lit(salt + ":ord")
            )
        ),
        F.lit(_GRAIN),
    )
    w = Window.partitionBy("shard").orderBy(order.asc(), F.col(id_col).asc())
    return df.withColumn("shard", sid).withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    salt: str = "shuffle",
    id_col: str = "doc_id",
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """Export the deterministic shuffle as one parquet directory per
    shard (``shard=K/``), rows carrying their ``pos`` so a reader
    restores the permutation with a per-shard sort — partitioned-write
    pruning means a trainer reading shard K touches only its files.
    Returns the per-shard manifest (shard, rows) — count() forces the
    write (the write_warc convention)."""
    sharded = shuffle_and_shard(df, n_shards, salt, id_col, hash_fn)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("rows"))
    )


def read_training_shards(
    spark, path: str, shard: int | None = None
) -> DataFrame:
    """Read a ``write_training_shards`` export back in permutation
    order: rows of one shard (or all shards) sorted by (shard, pos).
    Reading one shard prunes to its ``shard=K/`` directory (partition
    pruning — a trainer touches only its files); the per-shard sort is
    the order-restore contract stated by the writer."""
    df = spark.read.parquet(path)
    if shard is not None:
        df = df.filter(F.col("shard") == int(shard))
    return df.orderBy("shard", "pos")


def alpha_mixture_budgets(
    df: DataFrame,
    total_tokens: int,
    alpha: float = 0.5,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    quant_bits: int = 20,
) -> dict:
    """{group: token_budget}: sampling-temperature mixture weights —
    budget_g proportional to (group's token count)^alpha (the
    multilingual-corpus standard: alpha < 1 up-samples small
    languages/sources relative to their natural share; Lample &
    Conneau 2019, XLM-R, mT5 all train on this family), scaled so
    the budgets sum to ~``total_tokens``.

    Engine-portable exact arithmetic: the per-group weight n^alpha
    is QUANTIZED to an integer floor(n^alpha * 2^quant_bits), and
    budget_g = total * w_g // sum(w) runs in exact integer math
    (Python bigints on the bounded per-group table; the oracle uses
    HUGEINT) — so budgets never hinge on the last ulp of a float
    sum over groups.  The 2^-20 relative quantization of the weight
    is the documented price.  alpha=0.5 is sqrt — IEEE-exact and
    bit-identical in every engine; other alphas go through pow,
    identical only when both engines share a libm.  One bounded
    aggregation (groups are few); compose with
    ``token_budget_sample`` or call ``alpha_mixture_sample``."""
    import math

    if total_tokens < 0:
        raise ValueError("total_tokens must be >= 0")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    # NULL group values are excluded from the mixture: a None budget
    # key could never match token_budget_sample's when-chain anyway
    # (null-group rows would be silently dropped), and sorted() over
    # a None/str key mix raises TypeError
    rows = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("__nt"))
        .collect()
    )
    scale = 1 << quant_bits
    weights = {}
    for r in rows:
        nt = int(r["__nt"] or 0)
        if alpha == 0.5:
            w = int(math.sqrt(nt) * scale)
        else:
            w = int((float(nt) ** alpha) * scale)
        weights[r[group_col]] = w
    den = sum(weights.values())
    if den == 0:
        return {g: 0 for g in weights}
    return {
        g: (int(total_tokens) * w) // den
        for g, w in sorted(weights.items())
    }


def alpha_mixture_sample(
    df: DataFrame,
    total_tokens: int,
    alpha: float = 0.5,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "",
    quant_bits: int = 20,
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """Temperature-mixture corpus sampling in one call: derive the
    per-group token budgets from (size)^alpha
    (``alpha_mixture_budgets``) and take documents per group by the
    deterministic hash order until the budget fills
    (``token_budget_sample`` — cum_tokens audit column rides along).
    The composition training pipelines run as "sample a T-tempered
    mixture of sources to N tokens"."""
    budgets = alpha_mixture_budgets(
        df, total_tokens, alpha, group_col, tokens_col, quant_bits
    )
    return token_budget_sample(
        df, budgets, group_col, tokens_col, id_col, salt,
        default_budget=None, hash_fn=hash_fn,
    )


def group_split(
    df: DataFrame,
    weights: dict,
    group_col: str,
    salt: str = "split",
    split_col: str = "split",
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: assign whole GROUPS (a
    domain, a source document family, a user) to one split by hashing
    the group key — ``hash_split`` keyed on ``group_col``.  Why it
    exists as a named operator: splitting per document leaks
    near-duplicates and same-source siblings across the boundary
    (val items whose twin sits in train measure memorization, not
    generalization — the same failure benchmark decontamination
    chases INSIDE the corpus).  Same guarantees as hash_split:
    disjoint, exhaustive, reproducible, assignment re-derivable by
    any consumer from (group, salt) alone; split sizes track group
    token mass only as well as groups are balanced — rebalance with
    per-group weights upstream if a mega-group dominates."""
    return hash_split(
        df, weights, salt=salt, id_col=group_col,
        split_col=split_col, hash_fn=hash_fn,
    )
