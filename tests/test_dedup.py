"""Dedup operators on planted duplicates: exact, MinHash+LSH, SimHash,
n-gram Jaccard must all find the planted near-dup pair and nothing
between unrelated documents."""
import numpy as np
import pandas as pd
import pytest

from riskloc_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(40):
        words = list(rng.choice(vocab, size=80))
        rows.append((i, " ".join(words)))
    # 100: exact copy of 0 (modulo whitespace); 101: near-dup of 1 (two
    # word edits); 102: unrelated
    rows.append((100, rows[0][1].upper() + "  "))
    near = rows[1][1].split()
    near[10], near[50] = "changed", "words"
    rows.append((101, " ".join(near)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def test_exact_dedup_keeps_lowest_id(spark, docs):
    kept = {r[0] for r in exact_dedup(docs).select("doc_id").collect()}
    assert 0 in kept and 100 not in kept
    assert 1 in kept and 101 in kept  # near-dup is NOT exact


def test_minhash_finds_near_dup(spark, docs):
    pairs = minhash_lsh_dedup(docs, jaccard_threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100) in found
    assert (1, 101) in found
    for a, b in found:
        assert {a, b} <= {0, 100} or {a, b} <= {1, 101}


def test_simhash_finds_near_dup(spark, docs):
    pairs = simhash_dedup(docs, max_hamming=3).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100) in found


def test_ngram_jaccard_values(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert found[(0, 100)] == pytest.approx(1.0)  # normalization-exact copy
    assert 0.5 <= found[(1, 101)] < 1.0


def test_dedup_groups_transitive_chain(spark):
    """A~B and B~C (but A and C never paired directly) must still land
    all three in ONE group — the transitive closure the pair output
    alone does not give."""
    from riskloc_spark.operators.dedup import dedup_groups

    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
    )
    out = {
        r["doc_id"]: (r["group_id"], r["is_representative"])
        for r in dedup_groups(pairs).collect()
    }
    assert out == {1: (1, True), 2: (1, False), 3: (1, False)}


def test_dedup_groups_singletons_and_multiple_components(spark):
    from riskloc_spark.operators.dedup import dedup_groups

    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [10, 20], "id_b": [11, 21]})
    )
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10, 11, 20, 21, 99], "text": ["x"] * 5})
    )
    out = {
        r["doc_id"]: (r["group_id"], r["is_representative"])
        for r in dedup_groups(pairs, documents=docs).collect()
    }
    assert out == {
        10: (10, True), 11: (10, False),
        20: (20, True), 21: (20, False),
        99: (99, True),  # unpaired doc -> singleton group
    }


def test_connected_components_matches_union_find(spark):
    """Random sparse pair graph vs a driver union-find oracle: identical
    min-id component labels for every vertex."""
    from riskloc_spark.operators.dedup import connected_components

    rng = np.random.default_rng(7)
    ids = list(range(200))
    pair_list = [
        tuple(sorted(rng.choice(ids, size=2, replace=False).tolist()))
        for _ in range(120)
    ]
    from conftest import union_find_groups

    expect = union_find_groups(ids, pair_list)
    pairs = spark.createDataFrame(
        pd.DataFrame(pair_list, columns=["id_a", "id_b"])
    )
    verts = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    got = {
        r["doc_id"]: r["group_id"]
        for r in connected_components(pairs, vertices=verts).collect()
    }
    assert got == expect


def test_connected_components_long_chain_converges_fast(spark):
    """A 64-vertex path graph (worst-case diameter) must converge well
    under the O(diameter) bound — pointer jumping compresses label
    chains, so rounds ~ O(log diameter)."""
    from riskloc_spark.operators.dedup import connected_components

    n = 64
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
    )
    out = connected_components(pairs, max_iterations=10).collect()
    assert {r["group_id"] for r in out} == {0}
    assert len(out) == n


def test_connected_components_string_ids(spark):
    """Regression lock (review finding): with string/UUID ids the old
    numeric-label-sum convergence check NULLed out and faked
    convergence after one round, silently splitting components. The
    hash-sum signal must resolve a string-id chain completely."""
    from riskloc_spark.operators.dedup import dedup_groups

    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": ["a", "b", "c"], "id_b": ["b", "c", "d"]})
    )
    out = {
        r["doc_id"]: (r["group_id"], r["is_representative"])
        for r in dedup_groups(pairs).collect()
    }
    assert out == {
        "a": ("a", True), "b": ("a", False),
        "c": ("a", False), "d": ("a", False),
    }


def test_connected_components_active_vertex_iteration(spark):
    """r15 internals pin: the iteration runs over edge ENDPOINTS only
    and the singleton remainder is attached by one anti-join at the
    end.  Contract checks the restructure must preserve: duplicate
    rows in ``vertices`` still yield one output row per id, endpoint
    ids that ALSO appear in ``vertices`` are not duplicated by the
    union with the singleton leg, and an empty pair frame degrades to
    all-singletons."""
    from riskloc_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
    )
    # 1-3 overlap the endpoints; 7 is a singleton given TWICE
    verts = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 7, 7]})
    )
    rows = connected_components(pairs, vertices=verts).collect()
    assert len(rows) == 4  # one row per distinct id, no union dups
    got = {r["doc_id"]: r["group_id"] for r in rows}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7}

    empty = spark.createDataFrame(
        pd.DataFrame({"id_a": [], "id_b": []}), "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["group_id"]
        for r in connected_components(empty, vertices=verts).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 7: 7}


def test_curate_corpus_filters_and_dedups(spark):
    """Composed curation: junk (too short / no stopwords) is dropped,
    non-English dropped, exact duplicates keep the lowest id, and the
    decision columns ride along."""
    from riskloc_spark.operators.corpus import curate_corpus

    good = (
        "the quick brown fox, jumps over the lazy dog. it is a fine day "
        "for all of the animals in the field."
    )
    rows = [
        (1, good, "a"),
        (2, good, "a"),                      # exact duplicate -> dropped
        (3, "short", "a"),                   # too few tokens
        (4, "uno dos tres quatro cinco seis siete ocho nueve diez once doce, trece catorce quince.", "a"),  # no EN stopwords
        (5, good + " extra tail of words here.", "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus(df, min_quality=0.5, lang="en")
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 5}
    assert all(r["quality"] >= 0.5 and r["lang_pred"] == "en" for r in got.values())


def test_curate_corpus_near_dup_collapses_groups(spark):
    """Near-dup curation: a chain A~B, B~C collapses to ONE kept
    representative even though A and C are not directly similar, and
    quality-rejected documents never enter the pair graph."""
    from riskloc_spark.operators.corpus import curate_corpus_near_dup

    base = (
        "the quick brown fox jumps over the lazy dog and it is a fine "
        "day for all of the animals in the big green field near the "
        "old red barn, with many things to see and do for everyone."
    )
    words = base.split()
    a = " ".join(words)
    b = " ".join(words[:-3] + ["x1", "x2", "x3"])       # ~ a
    c = " ".join(["y1", "y2", "y3"] + words[3:-3] + ["x1", "x2", "x3"])  # ~ b
    rows = [
        (1, a, "s"),
        (2, b, "s"),
        (3, c, "s"),
        (4, "short junk", "s"),  # filtered before the pair graph
        (5, "completely different text about the history of the sea and " * 3, "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus_near_dup(df, min_quality=0.5, lang="en",
                                 jaccard_threshold=0.3)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert 4 not in kept
    # the a~b~c chain keeps exactly its min id
    assert 1 in kept and 2 not in kept and 3 not in kept
    assert 5 in kept


def test_minhash_signature_col_matches_groupby_signatures(spark):
    """The projection-only fold signature (streaming path) must be
    bit-identical to the explode+groupBy batch signatures for both hash
    families (round 8: the fold replaced a projection-collapse-prone
    per-permutation form)."""
    from pyspark.sql import functions as F

    from riskloc_spark.data import load_table
    from riskloc_spark.operators.dedup import (
        md5_hash64,
        minhash_signature_col,
        minhash_signatures,
        xxhash64_fn,
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(120)
    for fn in (xxhash64_fn, md5_hash64):
        a = {
            r["doc_id"]: list(r["sig"])
            for r in d.select(
                "doc_id",
                minhash_signature_col(
                    F.col("text"), num_hashes=16, hash_fn=fn
                ).alias("sig"),
            ).collect()
        }
        b = {
            r["doc_id"]: list(r["sig"])
            for r in minhash_signatures(
                d, num_hashes=16, hash_fn=fn
            ).collect()
        }
        assert a == b


def test_paragraph_dedup_keeps_first_occurrence(spark):
    """Boilerplate paragraphs shared across documents survive only at
    their first (doc_id, position); unique paragraphs all survive;
    within-document repeats keep the first position; whitespace-only
    parts vanish but still consume a split position."""
    from riskloc_spark.operators.dedup import paragraph_dedup

    header = "subscribe to our newsletter"
    rows = [
        (1, f"{header}\n\nunique body one\n\n{header}"),  # repeat in-doc
        (2, f"{header}\n\nunique body two"),
        (3, f"unique body three\n\n \t \n\n{header}"),    # blank middle
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["para_idx"]): r["para"]
        for r in paragraph_dedup(df).collect()
    }
    # header survives ONCE, at its first corpus position (doc 1, idx 0)
    assert got[(1, 0)] == header
    assert sum(1 for p in got.values() if p == header) == 1
    assert got[(1, 1)] == "unique body one"
    assert got[(2, 1)] == "unique body two"
    assert got[(3, 0)] == "unique body three"
    assert len(got) == 4


def test_paragraph_dedup_normalizes_key_keeps_raw(spark):
    """Case/whitespace variants of a paragraph are ONE key (matching
    exact_dedup's normalization) but the surviving row carries the raw
    first-seen text; consecutive blank lines are a single boundary."""
    from riskloc_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "Hello   World\n\n\n\nsecond"),
        (2, "hello world"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["para_idx"]): r["para"]
        for r in paragraph_dedup(df).collect()
    }
    assert got[(1, 0)] == "Hello   World"  # raw survivor
    assert (2, 0) not in got               # normalized dup of (1, 0)
    assert got[(1, 1)] == "second"         # \n\n\n\n was one boundary
    assert len(got) == 2


def test_remove_duplicate_paragraphs_rebuilds_in_order(spark):
    """The curation form: documents are reassembled from surviving
    paragraphs in original order, and a document that was ALL
    boilerplate drops entirely."""
    from riskloc_spark.operators.dedup import remove_duplicate_paragraphs

    header, footer = "shared header", "shared footer"
    rows = [
        (1, f"{header}\n\nbody one\n\n{footer}"),
        (2, f"{header}\n\nbody two\n\n{footer}"),
        (3, f"{header}\n\n{footer}"),  # pure boilerplate -> gone
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in remove_duplicate_paragraphs(df).collect()}
    assert got[1] == f"{header}\n\nbody one\n\n{footer}"
    assert got[2] == "body two"
    assert 3 not in got


def test_paragraph_dedup_composes_with_curation(spark):
    """Pipeline composition: paragraph dedup before document-level
    curation — boilerplate is stripped first, then the de-boilerplated
    documents flow through curate_corpus (quality + lang + exact dedup)
    unchanged."""
    from riskloc_spark.operators.corpus import curate_corpus
    from riskloc_spark.operators.dedup import remove_duplicate_paragraphs

    body = (
        "the quick brown fox jumps over the lazy dog, and it is a fine "
        "day for all of the animals in the field."
    )
    boiler = "click here to subscribe and share this page with friends."
    rows = [
        (1, f"{boiler}\n\n{body}", "s"),
        (2, f"{boiler}\n\n{body} some extra words on the end here.", "s"),
        (3, boiler, "s"),  # boilerplate-only page
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    stripped = remove_duplicate_paragraphs(df)
    # doc 1 keeps the boiler paragraph (first occurrence) + body; doc 3
    # is gone before curation even runs
    out = curate_corpus(
        stripped.join(df.select("doc_id", "source"), "doc_id"),
        min_quality=0.5,
        lang="en",
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 2]


def test_remove_duplicate_spans_cross_doc(spark):
    """Lee et al. span dedup: an n-token span shared across documents
    survives only at its smallest (doc, pos); straddling grams that mix
    unique context with the shared span stay untouched."""
    from riskloc_spark.operators.dedup import remove_duplicate_spans

    slogan = "the shared slogan of this network appears right here today"
    docs = spark.createDataFrame(
        [
            (0, f"u0 v0 w0 x0 {slogan} z0"),
            (1, f"u1 v1 w1 x1 {slogan} z1"),
            (2, f"{slogan} leading position here"),
            (3, "completely unique text with no duplicated spans at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=8).collect()
    }
    # doc 0 holds the first occurrence (slogan at pos 4 < doc 2's pos 0
    # only by doc order: (0,4) < (2,0)) and keeps everything
    assert out[0]["n_tokens_removed"] == 0
    assert slogan in out[0]["text"]
    # docs 1 and 2 lose exactly the 10-token slogan as ONE merged span
    for i in (1, 2):
        assert out[i]["n_tokens_removed"] == 10
        assert out[i]["n_spans"] == 1
        assert slogan not in out[i]["text"]
    assert out[1]["text"] == "u1 v1 w1 x1 z1"
    assert out[2]["text"] == "leading position here"
    assert out[3]["n_tokens_removed"] == 0


def test_remove_duplicate_spans_within_doc(spark):
    """A span repeated INSIDE one document keeps its first occurrence
    and drops the repeat — the within-doc case Lee et al. handle that
    paragraph_dedup misses when the repeat is not paragraph-aligned."""
    from riskloc_spark.operators.dedup import remove_duplicate_spans

    ten = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(0, f"{ten} mid1 mid2 {ten}")],
        "doc_id long, text string",
    )
    r = remove_duplicate_spans(docs, n=8).first()
    assert r["n_tokens_removed"] == 10 and r["n_spans"] == 1
    assert r["text"] == f"{ten} mid1 mid2"


def test_remove_duplicate_spans_overlapping_merge(spark):
    """Adjacent duplicated grams merge into one maximal span: a 12-token
    shared block yields 5 duplicate 8-grams but ONE removed interval of
    12 tokens."""
    from riskloc_spark.operators.dedup import remove_duplicate_spans

    block = "p q r s t u v w x y zz ww"
    docs = spark.createDataFrame(
        [(0, f"first0 {block} tail0"), (1, f"other1 {block} tail1")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, n=8).collect()}
    assert out[0]["n_tokens_removed"] == 0
    assert out[1]["n_dup_grams"] == 5
    assert out[1]["n_spans"] == 1
    assert out[1]["n_tokens_removed"] == 12
    assert out[1]["text"] == "other1 tail1"


def test_remove_duplicate_spans_plan_single_corpus_exchange(spark, sf_dir):
    """Scale contract: the gram-occurrence frame crosses the wire ONCE
    (a partition-only window yields group count + group first in the
    same pass — no self-join, no unbounded broadcast); the only other
    hash exchanges carry duplicate occurrences / doc ids."""
    from riskloc_spark.operators.dedup import remove_duplicate_spans

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = remove_duplicate_spans(d, n=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(h") == 1, plan
    assert plan.count("Window") == 1, plan
    assert "EvalPython" not in plan


def test_remove_duplicate_spans_sampled_alignment_free(spark):
    """sample_mod selection is content-based: the same span planted at
    DIFFERENT offsets in each document fingerprints the same relative
    positions, so detection does not depend on alignment — and removal
    stays within the span."""
    from riskloc_spark.operators.dedup import md5_hash64, remove_duplicate_spans

    span = (
        "the shared slogan of this network appears right here today "
        "and it keeps going with even more trailing words attached"
    )
    docs = spark.createDataFrame(
        [
            (0, f"a0 {span}"),
            (1, f"b1 c1 d1 e1 f1 g1 {span} h1"),
            (2, "nothing shared lives in this document at all today ok"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, n=8, sample_mod=3, hash_fn=md5_hash64
        ).collect()
    }
    # doc 0 is first everywhere it fingerprints; doc 1's copy is caught
    # despite the different offset, and nothing outside the span goes
    assert out[0]["n_tokens_removed"] == 0
    assert out[1]["n_tokens_removed"] > 0
    assert out[2]["n_tokens_removed"] == 0
    for w in ("b1", "c1", "d1", "e1", "f1", "g1", "h1"):
        assert w in out[1]["text"]
    # sampled removal is a subset of the exhaustive removal
    full = {
        r["doc_id"]: r["n_tokens_removed"]
        for r in remove_duplicate_spans(
            docs, n=8, hash_fn=md5_hash64
        ).collect()
    }
    assert out[1]["n_tokens_removed"] <= full[1]


# ---------------------------------------------------------------------------
# incremental ingestion tier: probe a persisted index, never rescan base
# ---------------------------------------------------------------------------

def test_incremental_near_dup_against_index(spark, docs):
    from riskloc_spark.operators.dedup import (
        accept_new_documents,
        build_near_dup_index,
        incremental_near_dup,
        minhash_lsh_dedup,
    )

    base = docs  # ids 0..39 + 100, 101
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    base_rows = {r["doc_id"]: r["text"] for r in base.collect()}
    new_rows = [
        (200, base_rows[0].upper() + " "),  # exact re-copy of base 0
        (201, base_rows[5]),                # exact re-copy of base 5
        (0, base_rows[0]),                  # re-submitted same id: skip
        (202, " ".join(rng.choice(vocab, size=80))),  # fresh
    ]
    near = base_rows[3].split()
    near[7] = "tweaked"
    new_rows.append((203, " ".join(near)))  # near-dup of base 3
    new = spark.createDataFrame(
        pd.DataFrame(new_rows, columns=["doc_id", "text"])
    )

    index = build_near_dup_index(base)
    got = {
        (r["new_id"], r["base_id"])
        for r in incremental_near_dup(
            new, index, jaccard_threshold=0.5
        ).collect()
    }
    assert (200, 0) in got and (201, 5) in got and (203, 3) in got
    # re-submitted id 0 is not "a duplicate of itself" (no (0, 0)) but
    # IS a duplicate of base 100, the whitespace copy of base 0
    assert (0, 0) not in got and (0, 100) in got
    assert not any(n == 202 for n, _ in got)  # fresh doc matches nothing

    # parity: the incremental pairs equal the union self-join's
    # cross-split pairs (same params, new ids all > base ids)
    union_pairs = {
        (r["id_b"], r["id_a"])
        for r in minhash_lsh_dedup(
            base.union(new.filter("doc_id != 0")), jaccard_threshold=0.5
        ).collect()
        if r["id_b"] >= 200 and r["id_a"] < 200
    }
    assert {p for p in got if p[0] >= 200} == union_pairs

    accepted = {
        r["doc_id"]
        for r in accept_new_documents(
            new, incremental_near_dup(new, index, jaccard_threshold=0.5)
        ).collect()
    }
    assert accepted == {202}


def test_frequent_ngrams_ranks_boilerplate_first(spark):
    from riskloc_spark.operators.dedup import frequent_ngrams

    rows = []
    for i in range(8):
        body = " ".join(f"u{i}w{j}" for j in range(10))
        # boilerplate carried by 6 of 8 docs, twice in doc 0
        extra = " all rights reserved" if i < 6 else ""
        dup = " all rights reserved" if i == 0 else ""
        rows.append((i, body + extra + dup))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = frequent_ngrams(df, n=3, top_k=4).collect()
    assert out[0]["ngram"].endswith("all rights reserved")
    assert out[0]["doc_freq"] == 6 and out[0]["total_count"] == 7
    # deterministic: two runs return the identical ranked set
    again = frequent_ngrams(df, n=3, top_k=4).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_frequent_ngrams_ignores_short_and_empty_docs(spark):
    """Sub-n-token and empty docs contribute NO grams (review finding:
    the MinHash whole-text fallback must not pollute the ranking)."""
    from riskloc_spark.operators.dedup import frequent_ngrams

    rows = [(i, "") for i in range(50)]            # empty flood
    rows += [(100 + i, "two words") for i in range(50)]  # sub-n flood
    rows += [(200 + i, "real shared gram here") for i in range(3)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = frequent_ngrams(df, n=3, top_k=5).collect()
    assert out, "real grams must survive"
    assert all(len(r["ngram"].split()) == 3 for r in out)
    assert out[0]["doc_freq"] == 3


def test_reuse_checkpoint_honors_conf_flag(spark):
    """r13 advisory: cross-branch reuse checkpoints must be
    opt-out-able — with spark.riskloc.localCheckpoint=false the frame
    passes through UN-checkpointed (lineage preserved for clusters
    with dynamic allocation); default and 'true' checkpoint it."""
    from riskloc_spark.operators.dedup import reuse_checkpoint

    df = spark.range(10)
    on = reuse_checkpoint(df)
    assert on is not df
    assert sorted(r["id"] for r in on.collect()) == list(range(10))
    try:
        spark.conf.set("spark.riskloc.localCheckpoint", "false")
        off = reuse_checkpoint(df)
        assert off is df  # pass-through, no checkpoint node
    finally:
        spark.conf.unset("spark.riskloc.localCheckpoint")
    back = reuse_checkpoint(df)
    assert back is not df
