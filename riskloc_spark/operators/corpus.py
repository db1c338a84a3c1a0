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
    lang_id_from,
    punct_ratio,
    quality_score_from,
    stopword_ratio,
    token_count,
)
from riskloc_spark.operators.dedup import exact_dedup


def score_and_filter(
    df: DataFrame,
    min_quality: float = 0.5,
    lang: str | None = "en",
    text_col: str = "text",
) -> DataFrame:
    """Quality + language filtering with a shared-stat projection
    (token/punct/stopword computed ONCE — the round-4 lesson:
    per-score recomputation survives into the physical plan). Returns
    the surviving rows plus the ``quality`` and ``lang_pred`` columns
    the decision was made on — a curation pipeline that discards its
    own evidence is unauditable."""
    t = F.col(text_col)
    stats = df.select(
        "*",
        token_count(t).alias("__tok"),
        punct_ratio(t).alias("__punct"),
        stopword_ratio(t).alias("__stop"),
    )
    scored = stats.select(
        "*",
        quality_score_from(
            F.col("__tok"), F.col("__punct"), F.col("__stop")
        ).alias("quality"),
        lang_id_from(F.col("__stop")).alias("lang_pred"),
    ).drop("__tok", "__punct", "__stop")
    kept = scored.filter(F.col("quality") >= F.lit(min_quality))
    if lang is not None:
        kept = kept.filter(F.col("lang_pred") == F.lit(lang))
    return kept


def curate_corpus(
    df: DataFrame,
    min_quality: float = 0.5,
    lang: str | None = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Filter + EXACT dedup in one declarative pipeline: shared-stat
    projection -> quality >= ``min_quality`` -> language filter ->
    lowest id per normalized text (one hash shuffle)."""
    kept = score_and_filter(df, min_quality, lang, text_col)
    return exact_dedup(kept, text_col=text_col, id_col=id_col)


def curate_corpus_near_dup(
    df: DataFrame,
    min_quality: float = 0.5,
    lang: str | None = "en",
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """Filter + NEAR-dup dedup: the filters of ``curate_corpus``, then
    MinHash+LSH candidate pairs over the SURVIVORS, connected-components
    group resolution (A~B and B~C collapse to one group even when A is
    not directly similar to C), and one representative (min id) kept per
    group. This is the full 100-TB curation shape: every stage is a
    bounded shuffle — no all-pairs comparison anywhere.

    ``hash_fn`` defaults to the production xxhash64; the oracle gate
    passes the portable md5 variant."""
    from riskloc_spark.operators.dedup import (
        dedup_groups,
        minhash_lsh_dedup,
        xxhash64_fn,
    )

    # persist: the filtered frame feeds the minhash pipeline, the
    # group-resolution vertex set, AND the final representative join —
    # three scans of the full stat projection otherwise
    kept = score_and_filter(df, min_quality, lang, text_col).persist()
    pairs = minhash_lsh_dedup(
        kept,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        hash_fn=hash_fn or xxhash64_fn,
    )
    try:
        groups = dedup_groups(pairs, documents=kept, id_col=id_col)
        reps = groups.filter(F.col("is_representative")).select(id_col)
        # materialize ONLY the tiny representative-id frame before the
        # cache vanishes — localCheckpointing the full curated output
        # would push the whole surviving corpus into non-reliable
        # executor-local storage (unrecoverable on executor loss, and a
        # surprise action in a DataFrame-returning API). The returned
        # frame stays a lazy, recomputable join of the filter plan
        # against the resolved ids.
        reps = reps.localCheckpoint(eager=True)
        out = kept.join(reps, on=id_col, how="inner")
    finally:
        kept.unpersist()
    return out


def curate_corpus_semantic(
    df: DataFrame,
    embeddings: DataFrame,
    min_quality: float = 0.5,
    lang: str | None = "en",
    cos_threshold: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    **ann_kwargs,
) -> DataFrame:
    """Filter + SEMANTIC dedup — the third dedup tier (after
    curate_corpus's exact hashes and curate_corpus_near_dup's MinHash):
    embedding-space near-duplicates (paraphrases, re-renderings) found
    via the IVF-PQ index (semantic_dedup_pairs: co-cell candidates, SDC
    code-lookup pre-filter, exact-cosine re-check), resolved with the
    SAME connected-components closure and min-id representative as the
    lexical tier. ``embeddings`` carries one vector per document
    (emb_id_col values == id_col values); ``ann_kwargs`` pass through
    to semantic_dedup_pairs (centroids/codebooks/index for a
    pre-built ingest index). Only the quality/lang SURVIVORS enter the
    pair graph — a rejected document never pulls a kept one into its
    group."""
    from riskloc_spark.operators.dedup import dedup_groups
    from riskloc_spark.operators.similarity import semantic_dedup_pairs

    kept = score_and_filter(df, min_quality, lang, text_col).persist()
    try:
        emb_kept = embeddings.join(
            kept.select(F.col(id_col).alias(emb_id_col)), emb_id_col
        )
        pairs = semantic_dedup_pairs(
            emb_kept,
            cos_threshold=cos_threshold,
            id_col=emb_id_col,
            **ann_kwargs,
        )
        groups = dedup_groups(
            pairs.select("id_a", "id_b"), documents=kept, id_col=id_col
        )
        reps = groups.filter(F.col("is_representative")).select(id_col)
        # same bounded materialization as curate_corpus_near_dup: only
        # the tiny representative-id frame is checkpointed; the output
        # stays a lazy, recomputable join
        reps = reps.localCheckpoint(eager=True)
        out = kept.join(reps, on=id_col, how="inner")
    finally:
        kept.unpersist()
    return out


def curate_from_crawl(
    spark,
    warc_path: str,
    min_quality: float = 0.5,
    lang: str | None = "en",
    drop_boilerplate: bool = True,
    max_link_density: float | None = None,
    parser: str = "regex",
    decode_bodies: bool = False,
) -> DataFrame:
    """The FULL crawl-to-corpus path in one declarative call: WARC
    response records -> HTTP split -> HTML -> text extraction ->
    cross-document boilerplate paragraph removal -> quality/language
    filter -> exact dedup.  Output is the ``documents`` shape
    (doc_id, text, + audit columns), ready for every downstream
    operator in this suite.

    Scale shape: the read is per-file parallel (WARC segments are the
    crawl's natural shard unit), extraction is a zero-shuffle
    projection, paragraph dedup is one groupBy-min(struct) exchange +
    the rebuild, and the filter + exact dedup add one more hash
    shuffle — three corpus exchanges end to end, none carrying raw
    HTML (it is dropped at extraction, before the first shuffle).

    doc_id is the 64-bit fingerprint of (warc_file, record_offset) —
    stable across re-reads of the same crawl, collision-checked
    nowhere (a 100-TB crawl holds ~2^37 records against a 2^64 space;
    the birthday bound is ~1e-4 and exact dedup downstream collapses
    any colliding pair that had identical text anyway).

    ``parser``: 'regex' (codegen fast path) or 'tree' (stdlib
    tokenizer — the real-crawl default candidate: quoted '>' in
    attributes, CDATA, conditional comments, misnested tags all
    extract browser-like instead of leaking fragments); both compose
    with ``max_link_density`` (the tree block twin landed in round
    11).

    ``decode_bodies``: False (default) splits bodies with the
    zero-Python UTF-8 cast and DROPS Content-Encoding-compressed
    responses; True routes payloads through
    ``warc.decode_http_bodies`` — gzip/deflate bodies decompress
    (bounded) and charsets sniff (header > BOM > meta > utf-8), so
    latin-1 and compressed pages JOIN the corpus instead of mojibaking
    or dropping.  The real-crawl setting."""
    from riskloc_spark.operators.dedup import remove_duplicate_paragraphs
    from riskloc_spark.operators.html import (
        drop_boilerplate_blocks,
        html_to_text,
        html_to_text_tree,
    )
    from riskloc_spark.sources.warc import (
        decode_http_bodies,
        http_response_parts,
        read_warc_records,
    )

    recs = read_warc_records(spark, warc_path)
    responses = recs.filter(F.col("warc_type") == "response")
    if decode_bodies:
        parts = decode_http_bodies(responses).filter(
            (F.col("http_status") == 200)
            & F.lower(F.col("content_type")).startswith("text/html")
            & F.col("body").isNotNull()
        )
    else:
        parts = http_response_parts(responses).filter(
            (F.col("http_status") == 200)
            # real crawls carry 'Text/HTML' / 'TEXT/HTML' — HTTP header
            # values are case-insensitive, so lowercase before matching
            & F.lower(F.col("content_type")).startswith("text/html")
            # bodies the server compressed (Content-Encoding: gzip/br)
            # would reach html_to_text as mojibake after the UTF-8 cast
            # in http_response_parts — drop them here (stated seam
            # there; decode_bodies=True recovers them instead)
            & (
                F.col("content_encoding").isNull()
                | F.lower(F.col("content_encoding")).isin("identity", "")
            )
        )
    keyed = parts.select(
        F.xxhash64("warc_file", "record_offset").alias("doc_id"),
        "target_uri",
        "body",
    )
    if parser not in ("regex", "tree"):
        raise ValueError(f"unknown parser {parser!r}")
    if max_link_density is not None:
        # within-page boilerplate first (link-density block filter),
        # so a page-unique nav bar never reaches the corpus
        uris = keyed.select("doc_id", "target_uri")
        docs = drop_boilerplate_blocks(
            keyed.select("doc_id", F.col("body").alias("html")),
            max_link_density=max_link_density,
            parser=parser,
        ).join(uris, "doc_id")
    else:
        extract = html_to_text if parser == "regex" else html_to_text_tree
        docs = keyed.select(
            "doc_id",
            "target_uri",
            extract(F.col("body")).alias("text"),
        )
    docs = docs.filter(F.length("text") > 0)
    if drop_boilerplate:
        kept_uri = docs.select("doc_id", "target_uri")
        docs = remove_duplicate_paragraphs(docs.select("doc_id", "text"))
        docs = docs.join(kept_uri, "doc_id")
    return curate_corpus(docs, min_quality=min_quality, lang=lang)


def quality_percentile_filter(
    df: DataFrame,
    q: float = 0.6,
    key_cols: tuple = ("lang",),
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 1024,
    salt: int = 0,
    hash_fn=None,
) -> DataFrame:
    """PERCENTILE-relative quality filtering: keep the documents whose
    heuristic quality score clears their group's q-quantile — "top
    (1-q) of each language", the FineWeb-style threshold that adapts
    per group instead of hard-coding one global cutoff (a fixed bar
    over-prunes low-resource languages whose score distribution sits
    lower).

    The cutoff comes from the mergeable bottom-k quantile sketch
    (operators/quantiles.py) — NO global sort, no per-group ntile
    over the corpus: one bounded WindowGroupLimit sample per group,
    a <= k-row estimate, and a broadcast join back.  Returns the
    surviving rows plus ``quality`` and ``quality_cutoff`` (the
    evidence columns; the audit re-checks quality >= cutoff).  The
    sketch makes the cutoff an ESTIMATE with the DKW rank envelope
    — the documented price for never sorting the corpus."""
    from riskloc_spark.functions.text import quality_score
    from riskloc_spark.operators.dedup import xxhash64_fn
    from riskloc_spark.operators.quantiles import (
        quantile_estimate,
        quantile_sketch,
    )

    hf = hash_fn or xxhash64_fn
    keys = list(key_cols)
    scored = df.select(
        "*", quality_score(F.col(text_col)).alias("quality")
    )
    sketch = quantile_sketch(
        scored, "quality", id_col, key_cols=keys, k=k, salt=salt,
        hash_fn=hf,
    )
    cut = quantile_estimate(sketch, [q], key_cols=keys).select(
        *keys, F.col("value").alias("quality_cutoff")
    )
    return scored.join(F.broadcast(cut), keys).filter(
        F.col("quality") >= F.col("quality_cutoff")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable_hash: bool = False,
) -> DataFrame:
    """Snapshot diff between two corpus versions: (id, status) with
    status in {added, removed, changed, unchanged} — the audit a
    versioned ingest pipeline publishes with every snapshot ("what
    moved since the corpus the last model trained on?").

    Rows compare by the deterministic content fingerprint
    (functions/text.fingerprint — whitespace-normalized, case-folded),
    so formatting-only edits read as unchanged; ``portable_hash``
    swaps in the md5 family for oracle replay.  ONE full-outer join
    on the id — both sides are scanned once, the join is the only
    exchange, and at scale snapshots bucketed on the id join
    exchange-free (sources/writers.py)."""
    from riskloc_spark.functions.text import fingerprint

    o = old.select(
        F.col(id_col),
        fingerprint(F.col(text_col), portable=portable_hash).alias(
            "__old_fp"
        ),
    )
    nw = new.select(
        F.col(id_col),
        fingerprint(F.col(text_col), portable=portable_hash).alias(
            "__new_fp"
        ),
    )
    return o.join(nw, id_col, "full_outer").select(
        id_col,
        F.when(F.col("__old_fp").isNull(), F.lit("added"))
        .when(F.col("__new_fp").isNull(), F.lit("removed"))
        .when(
            F.col("__old_fp") == F.col("__new_fp"), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def corpus_diff_stats(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable_hash: bool = False,
) -> DataFrame:
    """(status, n): the one-line summary of ``corpus_diff`` — the
    number a snapshot publisher alerts on (an unexpected 'removed'
    spike is a broken upstream, not a corpus improvement)."""
    return (
        corpus_diff(old, new, id_col, text_col, portable_hash)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
