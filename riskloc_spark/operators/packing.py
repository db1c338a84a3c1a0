"""Sequence packing: assemble documents into fixed-token-budget
training sequences.

The last step of a training-data pipeline: tokenized documents are
packed into sequences of at most ``max_tokens`` so the trainer sees
dense batches. A naive partition-local packer would make the packing
depend on the physical partitioning (different cluster, different
shards); here assignment is DETERMINISTIC: documents are routed to one
of ``n_buckets`` packing buckets by the same pure (id, salt) hash rule
the sampling operators use, and packed WITHIN a bucket in id order by
the classic next-fit fold (close the current sequence when the next
document would overflow; an over-long document gets its own sequence).
The output is a pure function of (ids, token counts, salt) — stable
across runs, partitionings and cluster sizes, and replayable by any
engine.

No reference counterpart (the reference is an RCA repo).

Scale shape: one hash exchange to the buckets, then an Arrow-batched
sequential fold per bucket (``applyInPandas`` — next-fit is inherently
sequential, but only WITHIN a bucket: buckets pack in parallel and
their count scales with the cluster). Bucket skew is bounded by the
hash; per-bucket state is one running total.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from riskloc_spark.operators.dedup import xxhash64_fn
from riskloc_spark.operators.sampling import _GRAIN, _unit_hash


def pack_documents(
    df: DataFrame,
    max_tokens: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 32,
    salt: str = "pack",
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """(id, bucket, seq_id, seq_tokens): the packing assignment.
    ``seq_id`` numbers sequences within a bucket from 1 in id order;
    ``seq_tokens`` is the packed total of the sequence the document
    landed in (repeated on each member row — the audit column for
    waste analysis: waste = max_tokens - seq_tokens per distinct
    (bucket, seq_id)). Membership is a pure function of (id, salt) via
    the sampling hash rule, so packing composes with hash_split /
    deterministic_sample reproducibly."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    bucket = F.pmod(
        _unit_hash(F.col(id_col), salt, hash_fn), F.lit(n_buckets)
    ).alias("bucket")
    routed = df.select(F.col(id_col), F.col(tokens_col), bucket)

    out_schema = (
        f"{id_col} long, bucket int, seq_id int, seq_tokens long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        toks = pdf[tokens_col].to_numpy()
        b = int(pdf["bucket"].iloc[0])
        seq_ids, seq_of = [], []
        seq, used = 0, None
        for t in toks:
            t = int(t)
            if used is None or used + t > max_tokens:
                seq += 1
                used = t
            else:
                used += t
            seq_ids.append(seq)
            seq_of.append(used)
        # final per-sequence totals: last `used` value of each seq
        totals = {}
        for s, u in zip(seq_ids, seq_of):
            totals[s] = u
        return pd.DataFrame(
            {
                id_col: ids,
                "bucket": b,
                "seq_id": seq_ids,
                "seq_tokens": [totals[s] for s in seq_ids],
            }
        )

    return routed.groupBy("bucket").applyInPandas(pack, out_schema)


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One-row audit of a packing: sequences, packed documents, mean
    fill ratio, and total waste (token slots lost to fragmentation —
    over-long single-doc sequences count zero waste, their overflow is
    the document's, not the packer's)."""
    per_seq = packed.groupBy("bucket", "seq_id").agg(
        F.first("seq_tokens").alias("st"), F.count(F.lit(1)).alias("nd")
    )
    return per_seq.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("nd").alias("n_docs"),
        F.round(
            F.avg(F.least(F.col("st"), F.lit(max_tokens)) / F.lit(max_tokens)),
            6,
        ).alias("mean_fill"),
        F.sum(
            F.greatest(F.lit(max_tokens) - F.col("st"), F.lit(0))
        ).alias("waste_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into fixed-token-window chunks with
    ``overlap`` shared tokens between consecutive windows — the
    long-document complement of pack_documents (chunking cuts oversize
    docs down to the training context; packing fills the context with
    whole short docs).

    Window k starts at token k*(max_tokens - overlap); starts are
    generated while they introduce at least one token past the previous
    window's overlap (range(0, max(n - overlap, 1), step) — a doc with
    n <= max_tokens yields exactly one chunk, the final chunk may be
    short, blank docs yield none). Output: (id, chunk_idx, chunk_text,
    n_tokens). Deterministic in the text alone, so any engine replays
    it.

    Scale shape: a pure projection + posexplode — ZERO shuffles, no
    Python; whole-stage codegen end to end. Chunk fan-out is bounded by
    n/step per doc.
    """
    if overlap < 0 or overlap >= max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    from riskloc_spark.functions.text import WS_CLASS

    toks = F.split(F.trim(F.col(text_col)), WS_CLASS + "+")
    n = F.size(toks)
    # number of window starts: ceil(max(n - overlap, 1) / step)
    n_starts = F.ceil(F.greatest(n - overlap, F.lit(1)) / F.lit(step))
    starts = F.sequence(F.lit(0), (n_starts - 1).cast("int"))
    chunks = F.transform(
        starts,
        lambda k: F.struct(
            k.alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(toks, k * step + 1, max_tokens)
            ).alias("chunk_text"),
            F.least(n - k * step, F.lit(max_tokens)).alias("n_tokens"),
        ),
    )
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(id_col, F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").cast("long").alias("n_tokens"),
        )
    )
