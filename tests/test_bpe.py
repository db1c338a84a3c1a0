"""BPE fit/encode: hand-checked merge learning, parity of the
distributed encode with an independent step-at-a-time reference
implementation, and the closed-form token-count theorem the oracle
gate relies on (property-tested with hypothesis)."""
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from riskloc_spark.functions.bpe import (
    bpe_encode,
    bpe_fit,
    bpe_token_counts,
    encode_piece,
)

# the handcrafted gate merge table: two independent chains over
# disjoint letter sets
GATE_MERGES = [("t", "h"), ("th", "e"), ("i", "n"), ("in", "g")]


def naive_encode(piece: str, merges: list) -> list:
    """Independent reference: apply ONE pair occurrence at a time,
    always the lowest-rank pair present, leftmost occurrence first.
    Equivalent to the production merge-all-per-round loop, coded
    differently on purpose."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sym = list(piece)
    while True:
        cand = [
            (ranks[(sym[i], sym[i + 1])], i)
            for i in range(len(sym) - 1)
            if (sym[i], sym[i + 1]) in ranks
        ]
        if not cand:
            return sym
        _, i = min(cand)
        sym = sym[:i] + [sym[i] + sym[i + 1]] + sym[i + 2:]


def closed_form_count(text: str) -> int:
    """The oracle formula for GATE_MERGES: base symbols are the
    characters; each non-overlapping 'th'/'in' occurrence saves one
    symbol, each 'the'/'ing' one more (the chains are over disjoint
    letters, so the savings are independent and additive)."""
    return (
        len(text)
        - len(re.findall("th", text))
        - len(re.findall("the", text))
        - len(re.findall("in", text))
        - len(re.findall("ing", text))
    )


def test_encode_piece_hand_checked():
    r = {tuple(p): i for i, p in enumerate(GATE_MERGES)}
    assert encode_piece("the", r) == ["the"]
    assert encode_piece("thing", r) == ["th", "ing"]
    assert encode_piece("theth", r) == ["the", "th"]
    assert encode_piece("tthhe", r) == ["t", "th", "h", "e"]
    assert encode_piece("nothing", r) == ["n", "o", "th", "ing"]
    assert encode_piece("x", r) == ["x"]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="theing x", max_size=24))
def test_closed_form_count_theorem(s):
    """For the gate merge table, the algorithm's token count over the
    pre-tokenized pieces equals the character-count-minus-substring-
    counts formula on the RAW text (letter merges cannot cross piece
    boundaries, because a letter run IS a piece)."""
    ranks = {tuple(p): i for i, p in enumerate(GATE_MERGES)}
    # python-side piece split mirroring BPE_PIECE_REGEX for this
    # alphabet: letter runs and space runs
    pieces = re.findall("[theing]+| [theing]*|\\s+", s)
    pieces = [p for p in re.findall("[a-z]+|[^a-z]+", s) if p]
    algo = sum(len(encode_piece(p, ranks)) for p in pieces)
    assert algo == closed_form_count(s), (s, pieces)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdegh intx", max_size=20))
def test_encode_matches_naive_reference(s):
    """merge-all-per-round (production) == one-at-a-time (reference)
    for every input, under a table with interacting chains."""
    merges = [("a", "b"), ("ab", "c"), ("b", "c"), ("t", "h"), ("i", "n")]
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for p in re.findall("[a-z]+|[^a-z]+", s):
        assert encode_piece(p, ranks) == naive_encode(p, merges), p


def test_bpe_fit_hand_checked(spark):
    """'the the the ten' hand-traced: pieces are 'the', ' the' x2,
    ' ten' (space-prefixed, the GPT-2 reality), so (' ', 't'), (t, h)
    and (h, e) all weigh 3 and the lexicographic tie-break picks
    (' ', 't') first; after (h, e) and (' t', he), the dominant
    space-prefixed ' the' is ONE token while bare 'the' is two — the
    classic learned-vocabulary shape."""
    docs = spark.createDataFrame(
        [(1, "the the the ten")], "doc_id long, text string"
    )
    merges = bpe_fit(docs, num_merges=3, sample_docs=10)
    assert merges == [(" ", "t"), ("h", "e"), (" t", "he")]
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert encode_piece(" the", ranks) == [" the"]
    assert encode_piece("the", ranks) == ["t", "he"]


def test_bpe_fit_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "some repeated words appear in some repeated text")
         for i in range(20)],
        "doc_id long, text string",
    )
    a = bpe_fit(docs, num_merges=20)
    b = bpe_fit(docs, num_merges=20)
    assert a == b and len(a) > 0


def test_distributed_counts_and_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "the thing"), (2, "nothing in the night"), (3, "xyz")],
        "doc_id long, text string",
    )
    counts = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(docs, GATE_MERGES).collect()
    }
    assert counts == {
        1: closed_form_count("the thing"),
        2: closed_form_count("nothing in the night"),
        3: 3,
    }
    toks = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(docs, GATE_MERGES).collect()
    }
    assert toks[1] == ["the", " ", "th", "ing"]
    assert len(toks[2]) == counts[2]  # counts are the encode's length
    # learned merges compress relative to character count
    learned = bpe_fit(docs, num_merges=30, sample_docs=10)
    n = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(docs, learned).collect()
    }
    assert n[1] < len("the thing")


def test_bpe_artifact_roundtrip_and_cli(spark, tmp_path):
    """save_bpe/load_bpe round-trips the merge table EXACTLY (rank
    order preserved), pinned to identical bpe_encode output; the CLI
    bpe-fit --save / bpe-count --model path exercises the same
    artifacts end-to-end."""
    import subprocess
    import sys

    from riskloc_spark.functions.bpe import load_bpe, save_bpe

    docs = spark.createDataFrame(
        [(i, "the thing sings in the night " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    merges = bpe_fit(docs, num_merges=40, sample_docs=20)
    path = str(tmp_path / "bpe_model")
    save_bpe(spark, merges, path)
    loaded = load_bpe(spark, path)
    assert loaded == [tuple(m) for m in merges]
    a = sorted(map(tuple, bpe_encode(docs, merges).collect()))
    b = sorted(map(tuple, bpe_encode(docs, loaded).collect()))
    assert a == b

    data = str(tmp_path / "docs")
    docs.write.parquet(data)
    model2 = str(tmp_path / "bpe_model2")
    fit_out = str(tmp_path / "fit_out")
    cnt_out = str(tmp_path / "cnt_out")
    env_cmd = [
        sys.executable, "-m", "riskloc_spark.cli", "pipeline",
    ]
    r = subprocess.run(
        env_cmd + ["bpe-fit", data, "--output", fit_out,
                   "--merges", "40", "--sample-docs", "20",
                   "--save", model2, "--cpus", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert load_bpe(spark, model2) == loaded  # same fit, same artifact
    r = subprocess.run(
        env_cmd + ["bpe-count", data, "--output", cnt_out,
                   "--model", model2, "--cpus", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {
        r2["doc_id"]: r2["n_tokens"]
        for r2 in spark.read.parquet(cnt_out).collect()
    }
    want = {
        r2["doc_id"]: r2["n_tokens"]
        for r2 in bpe_token_counts(docs, merges).collect()
    }
    assert got == want
