"""BM25 full-text retrieval over a document corpus (Robertson &
Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
Beyond") — the corpus-side search primitive an LLM-data pipeline uses
for decontamination lookups, dedup triage, and eval-set mining.

Scale shapes
------------
* The posting list (doc, term, tf) is ONE map-combinable aggregation
  over the token explode; document lengths fall out of the same pass.
* Corpus stats (N, avgdl) are a one-row frame broadcast into the
  plan; per-term document frequencies are a second combinable
  aggregation over the (small) distinct posting keys.
* Queries are tiny against a 100-TB corpus: the query-term frame is
  BROADCAST into the posting join, so the corpus-volume side is never
  shuffled by the query — the single exchange is the per-(query, doc)
  score reduce, bounded by matched postings, combiner-absorbed.
* Top-k per query compiles to a rank window over the scored frame —
  with a LIMIT-like filter (rank <= k) Spark plans WindowGroupLimit,
  the map-side-capped shape the domain-caps operator pins in
  test_plans.

Tokenization is the repo-wide explicit-whitespace discipline
(functions/text.WS_CLASS): lowercase, split on ASCII whitespace runs.
Plug a better analyzer in by pre-tokenizing upstream.

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from riskloc_spark.functions.text import WS_CLASS


def _terms(df: DataFrame, text_col: str, keep: list) -> DataFrame:
    toks = F.split(
        F.lower(F.trim(F.col(text_col))), WS_CLASS + "+"
    )
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(*keep, F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score): BM25 score for every document that
    matches at least one query term.  idf is the non-negative variant
    ln(1 + (N - df + 0.5)/(df + 0.5)); duplicate terms in a query
    count once (standard bag-of-distinct-terms form)."""
    postings = _terms(docs, text_col, [F.col(doc_id_col).alias("doc_id")])
    tf = postings.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = postings.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = _terms(
        queries, query_col, [F.col(query_id_col).alias("query_id")]
    ).distinct()
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    # restrict the (vocab-sized) df table to query terms BEFORE it is
    # broadcast — the corpus side then sees only broadcast joins
    qvocab = qterms.select("term").distinct()
    dfreq_q = dfreq.join(F.broadcast(qvocab), "term")
    return (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq_q), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(idf * tf_norm).alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    **kwargs,
) -> DataFrame:
    """(query_id, rank, doc_id, score): the top-``topk`` documents per
    query by BM25, ranked score-descending with the doc id as the
    deterministic tiebreak; score rounded to 6 dp for stable
    downstream comparison."""
    scored = bm25_scores(docs, queries, **kwargs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.round("score", 6).alias("score"),
        )
    )
