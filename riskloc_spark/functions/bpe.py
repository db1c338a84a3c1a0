"""Byte-pair encoding: learned-merge tokenization over the pre-tokenizer
pieces.

Upgrades token ACCOUNTING (functions/text.py's piece count, an upper
bound) to real tokenization: ``bpe_fit`` learns a merge table from the
corpus, ``bpe_token_counts`` / ``bpe_encode`` apply it distributed —
the quantities a training-data pipeline budgets and packs by. The merge
algorithm is the GPT-2 scheme (Sennrich et al. 2016; Radford et al.
2019): repeatedly merge the lowest-rank adjacent symbol pair within a
piece until none remains.

No reference counterpart (the reference is an RCA repo).

Scale shape: fitting is driver-side over the piece-frequency table of a
BOUNDED deterministic document sample (same discipline as the k-means
quantizer fits — the table is Zipf-bounded, collected once); encoding
keeps the hot path split: pieces are produced by the JVM regex
(BPE_PIECE_REGEX — the exact pre-tokenizer the piece COUNT gates), and
only the merge loop runs in an Arrow-batched Pandas UDF with a
per-batch piece memo (Zipf again: a few thousand distinct pieces cover
almost every occurrence, so the per-piece Python loop amortizes to a
dict hit).
"""
from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from riskloc_spark.data import local_rows_df

from riskloc_spark.functions.text import BPE_PIECE_REGEX


def _merge_all(sym: list, pair: tuple) -> list:
    """Merge every left-to-right non-overlapping occurrence of ``pair``
    in the symbol sequence (the GPT-2 per-round rewrite)."""
    out = []
    i = 0
    a, b = pair
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def encode_piece(piece: str, ranks: dict) -> list:
    """Tokenize ONE piece under a merge-rank table: repeatedly merge the
    lowest-rank adjacent pair until no rankable pair remains."""
    sym = list(piece)
    while len(sym) > 1:
        best = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, (sym[i], sym[i + 1]))
        if best is None:
            break
        sym = _merge_all(sym, best[1])
    return sym


def bpe_fit(
    corpus: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_docs: int = 10_000,
) -> list:
    """Learn a BPE merge table from the corpus: piece frequencies over
    the first ``sample_docs`` documents by id (deterministic — a bare
    limit would be partition-order dependent), then the classic loop —
    count adjacent symbol pairs weighted by piece frequency, merge the
    most frequent (ties break to the lexicographically smallest pair,
    so the table is reproducible), rewrite, repeat. Returns the ordered
    merge list [(a, b), ...]; order IS the rank table."""
    rows = (
        corpus.orderBy(id_col)
        .limit(sample_docs)
        .select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_PIECE_REGEX), 0
                )
            ).alias("p")
        )
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    vocab = {tuple(r["p"]): int(r["c"]) for r in rows if r["p"]}
    merges: list = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # max by count; ties to the lexicographically SMALLEST pair
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        if top < 2:
            break  # nothing repeats: further merges memorize the sample
        merges.append(best_pair)
        vocab = {
            tuple(_merge_all(list(sym), best_pair)): c
            for sym, c in vocab.items()
        }
    return merges


def save_bpe(spark, merges: list, path: str) -> None:
    """Persist a fitted merge table as ONE parquet artifact
    (rank, a, b) — the ingest-artifact discipline of the quality
    classifier (save_text_classifier) and the IVF-PQ index
    (save_ann_index): fit once at ingest, persist, and every
    packing/chunking/budgeting batch loads the bounded table instead
    of re-running the fit's corpus pass.  Rank IS the merge order,
    so the round-trip is exact (test-pinned to identical
    ``bpe_encode`` output).  Goes through the engine's writers —
    DFS-portable, no local-FS side files."""
    local_rows_df(spark, 
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list:
    """Load a merge table persisted by ``save_bpe``; the result plugs
    straight into ``bpe_token_counts`` / ``bpe_encode``."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["a"], r["b"]) for r in rows]


def _pieces_col(text_col: str) -> Column:
    # pieces come from the JVM regex — the exact pre-tokenizer the
    # piece-count gate pins; Python's re lacks \p classes, so the
    # UDF never re-tokenizes
    return F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECE_REGEX), 0)


def _count_udf(merges: list):
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("long")
    def n_tokens(pieces: pd.Series) -> pd.Series:
        memo: dict = {}

        def count(ps) -> int:
            total = 0
            for p in ps:
                n = memo.get(p)
                if n is None:
                    n = len(encode_piece(p, ranks))
                    memo[p] = n
                total += n
            return total

        return pieces.map(count)

    return n_tokens


def bpe_token_counts(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens) under the merge table — the budget-planning
    number. JVM pre-tokenization, Arrow-batched merge loop with a
    per-batch piece memo."""
    return df.select(
        F.col(id_col),
        _count_udf(merges)(_pieces_col(text_col)).alias("n_tokens"),
    )


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>) — the full tokenization (inspection /
    downstream packing). Same memoized merge loop as the counts."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def toks(pieces: pd.Series) -> pd.Series:
        memo: dict = {}

        def enc(ps) -> list:
            out: list = []
            for p in ps:
                t = memo.get(p)
                if t is None:
                    t = encode_piece(p, ranks)
                    memo[p] = t
                out.extend(t)
            return out

        return pieces.map(enc)

    return df.select(
        F.col(id_col), toks(_pieces_col(text_col)).alias("tokens")
    )
