"""Property tests (SURVEY §5): score identities that must hold for ANY
non-degenerate RCA frame — hypothesis generates the leaf measures, Spark
evaluates the real scoring columns."""
import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from riskloc_spark.functions.scores import (
    add_deviation_score,
    add_explanatory_power,
    add_partition,
    add_surprise,
    add_weight,
    get_cutoff,
)

measure = st.floats(
    min_value=0.0, max_value=1e6, allow_nan=False, allow_infinity=False
)
frames = st.lists(st.tuples(measure, measure), min_size=4, max_size=20)

relaxed = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)


def _df(spark, rows):
    pdf = pd.DataFrame(
        [(f"e{i}", r, p) for i, (r, p) in enumerate(rows)],
        columns=["d1", "real", "predict"],
    )
    return spark.createDataFrame(pdf)


@given(rows=frames)
@relaxed
def test_ep_sums_to_one(spark, rows):
    A = sum(r for r, _ in rows)
    Ff = sum(p for _, p in rows)
    assume(abs(A - Ff) > 1e-6 * max(A, Ff, 1.0))
    out = add_explanatory_power(_df(spark, rows))
    total = out.agg({"ep": "sum"}).first()[0]
    assert total == pytest.approx(1.0, rel=1e-6)


@given(rows=frames)
@relaxed
def test_deviation_bounded_and_zero_on_exact_forecast(spark, rows):
    out = add_deviation_score(_df(spark, rows)).collect()
    for row in out:
        assert -2.0 <= row["deviation"] <= 2.0
        if row["real"] == row["predict"]:
            assert row["deviation"] == 0.0


@given(rows=frames)
@relaxed
def test_weight_in_unit_interval(spark, rows):
    df = add_deviation_score(_df(spark, rows))
    cutoff = get_cutoff(df, n_remove=1)
    out = add_weight(add_partition(df, cutoff), cutoff).collect()
    for row in out:
        assert 0.0 <= row["weight"] <= 1.0
        assert row["partition"] in (0, 1)


@given(rows=frames)
@relaxed
def test_surprise_nonnegative(spark, rows):
    # each element's surprise is a pointwise JS-divergence contribution:
    # 0.5*(p*log(2p/(p+q)) + q*log(2q/(p+q))) >= 0 by the log-sum
    # inequality; guards map degenerate p/q to 0
    assume(sum(r for r, _ in rows) > 0 and sum(p for _, p in rows) > 0)
    out = add_surprise(_df(spark, rows)).collect()
    for row in out:
        assert row["surprise"] >= -1e-12
        assert math.isfinite(row["surprise"])


edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=0,
    max_size=40,
)


@given(edges=edge_lists)
@relaxed
def test_connected_components_equals_union_find(spark, edges):
    """For ANY pair list (self-loops and duplicates included), the
    distributed hash-min components must equal a driver union-find:
    every vertex labeled with its component's min id."""
    from riskloc_spark.operators.dedup import connected_components

    pairs = [(a, b) for a, b in edges if a != b]
    assume(pairs)
    ids = sorted({v for p in pairs for v in p})

    from conftest import union_find_groups

    expect = union_find_groups(ids, pairs)

    sdf = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["id_a", "id_b"])
    )
    got = {
        r["doc_id"]: r["group_id"]
        for r in connected_components(sdf).collect()
    }
    assert got == expect


# --- exact-substring span dedup vs a brute-force reference ---

span_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12),
    min_size=1,
    max_size=5,
)


def _spans_reference(token_lists, n):
    """Brute-force Python oracle of remove_duplicate_spans semantics:
    count every n-token tuple corpus-wide, keep the smallest (doc, pos)
    occurrence of each duplicated tuple, remove the rest with interval
    coverage, rebuild."""
    occ = {}
    for d, toks in enumerate(token_lists):
        for p in range(len(toks) - n + 1):
            occ.setdefault(tuple(toks[p : p + n]), []).append((d, p))
    removed = {d: set() for d in range(len(token_lists))}
    for gram, places in occ.items():
        if len(places) >= 2:
            first = min(places)
            for d, p in places:
                if (d, p) != first:
                    removed[d].add(p)
    out = []
    for d, toks in enumerate(token_lists):
        cover = set()
        for p in removed[d]:
            cover.update(range(p, p + n))
        kept = [t for i, t in enumerate(toks) if i not in cover]
        # merged spans over sorted removal starts
        spans, end = 0, -1
        for p in sorted(removed[d]):
            if p >= end:
                spans += 1
            end = max(end, p + n)
        out.append(
            (d, " ".join(kept), len(toks), len(toks) - len(kept),
             len(removed[d]), spans)
        )
    return out


@given(docs=span_docs)
@relaxed
def test_remove_duplicate_spans_matches_reference(spark, docs):
    """Tiny-alphabet corpora are duplicate-dense: every (doc, pos)
    bookkeeping corner — within-doc self-overlap, cross-doc firsts,
    interval merging, all-tokens-removed documents — must match the
    brute-force oracle exactly."""
    from riskloc_spark.operators.dedup import remove_duplicate_spans

    n = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["doc_id"], r["text"], r["n_tokens"], r["n_tokens_removed"],
            r["n_dup_grams"], r["n_spans"],
        )
        for r in remove_duplicate_spans(df, n=n).collect()
    }
    want = {row[0]: row for row in _spans_reference(docs, n)}
    assert got == want


# --- corpus_report exact quantiles vs the type-1 rule ---

token_counts = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=30
)


@given(counts=token_counts)
@relaxed
def test_corpus_report_quantiles_match_type1_rule(spark, counts):
    """For any multiset of token counts, each reported quantile must be
    the smallest value whose cumulative frequency reaches ceil(q * n)
    (inverse CDF / type-1) — checked against a direct sort."""
    from riskloc_spark.functions.quality import corpus_report

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * c) if c else "", "s") for i, c in enumerate(counts)],
        "doc_id long, text string, source string",
    )
    r = corpus_report(docs).first()
    s = sorted(counts)
    n = len(s)
    for q, col in ((0.5, "p50_tokens"), (0.9, "p90_tokens"), (0.99, "p99_tokens")):
        want = s[math.ceil(q * n) - 1]
        assert r[col] == want, (q, s, r[col], want)
    assert r["n_docs"] == n and r["total_tokens"] == sum(counts)
    assert r["max_tokens"] == max(counts)


@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=8),
    st.integers(min_value=2, max_value=50),
    st.data(),
)
@relaxed
def test_chunk_documents_reconstruction(spark, sizes, max_tokens, data):
    """For ANY (doc sizes, window, overlap): the start rule yields
    ceil(max(n-ov,1)/step) chunks, all but the last full, and chunk 0
    plus each later chunk's post-overlap tail rebuilds the document."""
    overlap = data.draw(st.integers(min_value=0, max_value=max_tokens - 1))
    from riskloc_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(sizes)),
                "text": [
                    " ".join(f"d{i}t{j}" for j in range(n))
                    for i, n in enumerate(sizes)
                ],
            }
        )
    )
    step = max_tokens - overlap
    out = chunk_documents(df, max_tokens=max_tokens, overlap=overlap)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(sizes):
        if n == 0:
            assert i not in by_doc
            continue
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        assert len(chunks) == (max(n - overlap, 1) + step - 1) // step
        assert all(c["n_tokens"] == max_tokens for c in chunks[:-1])
        toks = chunks[0]["chunk_text"].split()
        for c in chunks[1:]:
            toks += c["chunk_text"].split()[overlap:]
        assert toks == [f"d{i}t{j}" for j in range(n)]
