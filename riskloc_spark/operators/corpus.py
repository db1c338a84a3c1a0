"""End-to-end corpus curation: the one-call pipeline an LLM training
corpus actually runs — quality scoring, language filtering, and exact
deduplication composed as a single declarative plan.

No reference counterpart (the reference is an RCA repo); this is the
composition layer over functions/text.py and operators/dedup.py. The
whole pipeline is column algebra + one dedup shuffle: Catalyst fuses
the stat projection and both filters into the scan (pushdown /
whole-stage codegen), so the only exchange is the dedup groupBy — the
shape that survives a 100-TB corpus.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from riskloc_spark.functions.text import (
    char_count,
    lang_id_from,
    punct_ratio,
    quality_score_from,
    stopword_ratio,
    token_count,
)
from riskloc_spark.operators.dedup import exact_dedup


def curate_corpus(
    df: DataFrame,
    min_quality: float = 0.5,
    lang: str | None = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Filter + dedup a document corpus in one declarative pipeline.

    1. Shared-stat projection (token/punct/stopword computed ONCE — the
       round-4 lesson: per-score recomputation survives into the
       physical plan).
    2. Quality filter: heuristic C4-style score >= ``min_quality``.
    3. Language filter: keep ``lang`` (None = keep all).
    4. Exact dedup: lowest id per normalized text (one hash shuffle).

    Returns the surviving rows of ``df`` plus the ``quality`` and
    ``lang_pred`` columns the decision was made on — a curation
    pipeline that discards its own evidence is unauditable.
    """
    t = F.col(text_col)
    stats = df.select(
        "*",
        token_count(t).alias("__tok"),
        punct_ratio(t).alias("__punct"),
        stopword_ratio(t).alias("__stop"),
        char_count(t).alias("__chars"),
    )
    scored = stats.select(
        "*",
        quality_score_from(
            F.col("__tok"), F.col("__punct"), F.col("__stop")
        ).alias("quality"),
        lang_id_from(F.col("__stop")).alias("lang_pred"),
    ).drop("__tok", "__punct", "__stop", "__chars")
    kept = scored.filter(F.col("quality") >= F.lit(min_quality))
    if lang is not None:
        kept = kept.filter(F.col("lang_pred") == F.lit(lang))
    return exact_dedup(kept, text_col=text_col, id_col=id_col)
