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
* Queries are usually tiny against a 100-TB corpus: the query-term
  frame is BROADCAST into the posting join, so the corpus-volume side
  is never shuffled by the query — the single exchange is the
  per-(query, doc) score reduce, bounded by matched postings,
  combiner-absorbed.  THE BROADCAST-SIZE CONTRACT: the default path
  assumes the query set fits a broadcast (same contract as the robots
  rules table).  When query sets can be large (decontaminating
  against a whole benchmark suite), pass ``broadcast_queries_limit``:
  the operator PROBES the query count (one bounded limit+count on the
  query frame — never the corpus) and falls back to shuffle joins
  past the limit, the robots.py probed-regime discipline.
* Top-k per query compiles to a rank window over the scored frame —
  with a LIMIT-like filter (rank <= k) Spark plans WindowGroupLimit,
  the map-side-capped shape the domain-caps operator pins in
  test_plans.

Analyzer: the default is the repo-wide explicit-whitespace discipline
(functions/text.WS_CLASS): lowercase, split on ASCII whitespace runs
— EXACTLY the quality suite's ``words()`` tokenizer
(functions/quality.py:61), so BM25 and tf-idf rank over the same term
space.  Options (applied identically to documents and queries, so
both sides stay in one term space): ``lowercase`` off for
case-sensitive corpora, ``stopwords`` (e.g. quality.GOPHER_STOPWORDS
or text.EN_STOPWORDS) removed after casing, ``strip_punct`` trims
non-alphanumeric token edges ("spark," -> "spark"), ``min_token_len``
drops residue tokens.  All analyzer work is built-in column algebra
inside the one token explode — no UDFs.

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from riskloc_spark.functions.text import WS_CLASS


def _terms(
    df: DataFrame,
    text_col: str,
    keep: list,
    lowercase: bool = True,
    stopwords: list | None = None,
    strip_punct: bool = False,
    min_token_len: int = 1,
) -> DataFrame:
    """One analyzed (keep..., term) row per token.  The default
    options reproduce quality.words() exactly (lowercase + WS split +
    empty drop); every option is a column expression inside the same
    single explode."""
    base = F.trim(F.col(text_col))
    if lowercase:
        base = F.lower(base)
    toks = F.split(base, WS_CLASS + "+")
    out = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(*keep, F.explode(toks).alias("term"))
    )
    if strip_punct:
        # trim non-alphanumeric EDGES only ("spark," -> "spark",
        # "don't" stays "don't") — Unicode classes so the analyzer
        # is not ASCII-bound
        out = out.withColumn(
            "term",
            F.regexp_replace(
                F.col("term"),
                r"^[^\p{L}\p{N}]+|[^\p{L}\p{N}]+$",
                "",
            ),
        )
    cond = F.length(F.col("term")) >= max(1, int(min_token_len))
    if stopwords:
        cond = cond & ~F.col("term").isin(list(stopwords))
    return out.filter(cond)


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    stopwords: list | None = None,
    strip_punct: bool = False,
    min_token_len: int = 1,
    broadcast_queries_limit: int | None = None,
) -> DataFrame:
    """(query_id, doc_id, score): BM25 score for every document that
    matches at least one query term.  idf is the non-negative variant
    ln(1 + (N - df + 0.5)/(df + 0.5)); duplicate terms in a query
    count once (standard bag-of-distinct-terms form).  Analyzer
    options apply to BOTH sides (module docstring); the default path
    is bit-identical to the pre-option operator.

    ``broadcast_queries_limit``: None (default) trusts the
    broadcast-size contract and always broadcasts the query-term
    frames.  An integer PROBES what actually gets broadcast — the
    EXPLODED per-term query frame (bounded: limit+1 rows of the
    tokenized query table, never the corpus) — and switches to
    shuffle joins past it: the robots.py probed-regime discipline
    for caller-supplied tables of unknown size.  Probing terms, not
    query rows, means a handful of very long queries cannot sneak a
    terms frame past the threshold (r13 advisory)."""
    postings = _terms(
        docs, text_col, [F.col(doc_id_col).alias("doc_id")],
        lowercase, stopwords, strip_punct, min_token_len,
    )
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
        queries, query_col, [F.col(query_id_col).alias("query_id")],
        lowercase, stopwords, strip_punct, min_token_len,
    ).distinct()
    small_queries = True
    if broadcast_queries_limit is not None:
        # the ONLY eager action: a bounded count of the EXPLODED
        # per-term frame — the thing the hint below broadcasts (a
        # row-count probe of `queries` would pass a few megabyte-long
        # queries whose term explosion exceeds the threshold)
        probe = qterms.limit(broadcast_queries_limit + 1).count()
        small_queries = probe <= broadcast_queries_limit
    hint = F.broadcast if small_queries else (lambda d: d)
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
    dfreq_q = dfreq.join(hint(qvocab), "term")
    return (
        tf.join(hint(qterms), "term")
        .join(hint(dfreq_q), "term")
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
