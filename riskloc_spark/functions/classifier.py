"""Trained text classifier: hashed character-n-gram multinomial Naive
Bayes — the fastText-style linear tier above the heuristic quality
suite (VERDICT r9 Missing #3).

Model = a (label, bucket) -> weight table of FIXED-POINT log
probabilities ("micronats": round(ln(p) * 1e6) as BIGINT) plus
per-label default weight and prior.  Everything downstream of the two
ln() calls is INTEGER arithmetic: scores are exact BIGINT sums, the
argmax is engine-exact, and the only float seam is the micronat
rounding itself (the round(x, 6)-family convention every float gate in
this repo shares).

Fit is DISTRIBUTED and SQL-expressible (not a driver loop): hashed
gram counts are one groupBy, class totals a second — so the DuckDB
twin replays fit AND scoring verbatim and the gate hashes the
predictions.  Feature hashing uses the portable md5 family in gates
(dedup.md5_hash64) and xxhash64 in production paths.

Scale shape: features are ONE corpus-volume explode (the staged
O(len) char-array slide from functions/langid._gram_rows) folded to at
most ``n_buckets`` rows per document; the weight table is
n_labels x n_buckets rows — broadcast by construction; scoring is a
broadcast join + one aggregation.  The fit's labeled sample is
bounded by the caller (deterministic id-mod split, the bpe_fit /
k-means precedent).

No reference counterpart (pipeline extension).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from riskloc_spark.data import local_rows_df

from riskloc_spark.functions.langid import _gram_rows
from riskloc_spark.operators.dedup import md5_hash64, xxhash64_fn

# the two hash families a model may be fit with; save/load serializes
# the NAME (a Column-factory function can't go in a parquet artifact)
_HASH_FNS = {"xxhash64": xxhash64_fn, "md5": md5_hash64}


def _micronats(x: Column) -> Column:
    """Fixed-point log weight: round(ln * 1e6) as BIGINT.  Integer from
    here on — sums are exact, argmax is engine-exact."""
    return F.round(x * F.lit(1_000_000.0), 0).cast("long")


def hashed_gram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_buckets: int = 4096,
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """(id, bucket, cnt): hashed character-n-gram counts per document.
    One staged corpus explode, folded to <= n_buckets rows per doc."""
    grams = _gram_rows(df, [F.col(id_col)], text_col, n)
    return (
        grams.select(
            F.col(id_col),
            F.pmod(hash_fn(F.col("gram")), F.lit(n_buckets))
            .cast("int")
            .alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def fit_text_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_buckets: int = 4096,
    hash_fn=xxhash64_fn,
) -> dict:
    """Multinomial NB fit with Laplace smoothing over hashed grams.
    Returns {"weights": (label, bucket, w), "label_stats": (label, w0,
    prior), ...params}: w = micronats((c+1)/(tot+n_buckets)), w0 the
    unseen-bucket default, prior = micronats(docs_label/docs_total).
    Both frames are broadcastable (n_labels x n_buckets bound).

    Rows with a NULL label are dropped.  A label whose every training
    document is shorter than ``n`` characters contributes no grams and
    therefore no class statistics: it is absent from the model and can
    never be predicted — callers needing such labels must lower n or
    provide longer exemplars."""
    # unlabeled rows can't inform class statistics, and a None label
    # group would later break the scoring sort (review r10) — drop them
    # here, visibly documented rather than silently propagated
    lab = labeled.select(
        F.col(id_col), F.col(label_col).alias("label")
    ).filter(F.col("label").isNotNull())
    feats = hashed_gram_features(
        labeled, text_col, id_col, n, n_buckets, hash_fn
    )
    # the ONE corpus-volume pass of the fit, materialized here: weights
    # and label_stats both derive from this bounded (label, bucket)
    # table, and scoring consumes the model through a collect AND a
    # pivot-checkpoint — left lazy, the corpus explode would re-run for
    # each (the trigram-LM guard discipline)
    cb = (
        feats.join(lab, id_col)
        .groupBy("label", "bucket")
        .agg(F.sum("cnt").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = cb.groupBy("label").agg(F.sum("c").alias("tot"))
    weights = cb.join(tot, "label").select(
        "label",
        "bucket",
        _micronats(
            F.log(
                (F.col("c") + F.lit(1)).cast("double")
                / (F.col("tot") + F.lit(n_buckets))
            )
        ).alias("w"),
    )
    ndocs = lab.groupBy("label").agg(F.count(F.lit(1)).alias("nl"))
    ntot = F.sum("nl").over(Window.partitionBy())
    label_stats = (
        tot.join(ndocs, "label")
        .select(
            "label",
            "tot",
            "nl",
            ntot.alias("ntot"),
        )
        .select(
            "label",
            _micronats(
                F.log(
                    F.lit(1.0) / (F.col("tot") + F.lit(n_buckets))
                )
            ).alias("w0"),
            _micronats(
                F.log(F.col("nl").cast("double") / F.col("ntot"))
            ).alias("prior"),
        )
    )
    return {
        "weights": weights,
        "label_stats": label_stats,
        "n": n,
        "n_buckets": n_buckets,
        "hash_fn": hash_fn,
    }


def score_text_classifier(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pred_label, score, n_grams): argmax-label NB scoring.
    score = prior + sum over grams of the (label, bucket) weight,
    unseen buckets paying the per-label default — all BIGINT.  Ties
    break on label ASC (engine-exact).  Documents with no grams
    (shorter than n) are absent, matching the SQL twin.

    Shape: the sparse weight table PIVOTS wide per label (bounded:
    n_buckets rows x n_labels columns; labels and the per-label
    w0/prior scalars are a bounded driver collect, the adtributor
    precedent), so scoring is ONE broadcast hash join of the feature
    rows against the wide table and ONE exchange (the per-doc
    aggregation).  The naive (doc x label) grid formulation instead
    sort-merge-joins two corpus-volume frames and pays three
    exchanges; algebraically identical (exact integers:
    sum(cnt * coalesce(w, w0)) == matched + (n - matched_cnt) * w0)."""
    feats = hashed_gram_features(
        docs, text_col, id_col,
        model["n"], model["n_buckets"], model["hash_fn"],
    )
    stats = sorted(
        (r["label"], r["w0"], r["prior"])
        for r in model["label_stats"].collect()
    )
    if not stats:
        raise ValueError(
            "score_text_classifier: the fitted model has no labels — "
            "the training frame was empty, every training document was "
            f"shorter than n={model['n']} characters, or every label "
            "was NULL"
        )
    labels = [s[0] for s in stats]
    # materialize the (model-sized) wide table: left lazy, the whole
    # FIT subtree — including its corpus-volume feature explode — would
    # re-run inside every scoring action, and its exchanges would sit
    # in the scoring plan
    wide = (
        model["weights"]
        .groupBy("bucket")
        .pivot("label", labels)
        .agg(F.first("w"))
        .localCheckpoint(eager=True)
    )
    joined = feats.join(F.broadcast(wide), "bucket", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        *[
            F.sum(
                F.col("cnt") * F.coalesce(F.col(f"`{lab}`"), F.lit(w0))
            ).alias(f"__s_{i}")
            for i, (lab, w0, _) in enumerate(stats)
        ],
    )
    cands = [
        F.struct(
            (-(F.col(f"__s_{i}") + F.lit(prior))).alias("neg"),
            F.lit(lab).alias("label"),
            (F.col(f"__s_{i}") + F.lit(prior)).alias("score"),
        )
        for i, (lab, _, prior) in enumerate(stats)
    ]
    best = F.least(*cands) if len(cands) > 1 else cands[0]
    return per_doc.select(
        F.col(id_col),
        best["label"].alias("pred_label"),
        best["score"].cast("long").alias("score"),
        F.col("n_grams").cast("long").alias("n_grams"),
    )


def save_text_classifier(model: dict, path: str) -> None:
    """Persist a fitted model as parquet artifacts (weights,
    label_stats, a one-row params table) — the ingest-artifact
    discipline (the ivfpq cells/codes precedent): a deployment fits
    once at ingest, persists, and every scoring batch loads the
    bounded tables instead of re-running the fit's corpus pass.
    Everything goes through the engine's writers (DFS-portable, no
    local-FS side files)."""
    import os

    name = next(
        (k for k, v in _HASH_FNS.items() if v is model["hash_fn"]), None
    )
    if name is None:
        raise ValueError(
            "save_text_classifier: hash_fn must be one of "
            f"{sorted(_HASH_FNS)} to be serializable"
        )
    weights = model["weights"]
    weights.write.mode("overwrite").parquet(os.path.join(path, "weights"))
    model["label_stats"].write.mode("overwrite").parquet(
        os.path.join(path, "label_stats")
    )
    spark = weights.sparkSession
    local_rows_df(spark, 
        [(int(model["n"]), int(model["n_buckets"]), name)],
        "n int, n_buckets int, hash_fn string",
    ).write.mode("overwrite").parquet(os.path.join(path, "params"))


def load_text_classifier(spark, path: str) -> dict:
    """Load a model persisted by ``save_text_classifier``; the result
    plugs straight into ``score_text_classifier``."""
    import os

    p = spark.read.parquet(os.path.join(path, "params")).first()
    return {
        "weights": spark.read.parquet(os.path.join(path, "weights")),
        "label_stats": spark.read.parquet(
            os.path.join(path, "label_stats")
        ),
        "n": int(p["n"]),
        "n_buckets": int(p["n_buckets"]),
        "hash_fn": _HASH_FNS[p["hash_fn"]],
    }
