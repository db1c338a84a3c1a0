"""Link-graph + PageRank operators (operators/graph.py): URL
resolution rules, host aggregation, and the fixed-point integer
PageRank against a pure-Python replay of the pinned arithmetic."""
from pyspark.sql import functions as F

from riskloc_spark.operators.graph import (
    extract_links,
    host_graph,
    pagerank,
)


def _page(url, html):
    return (url, html)


def test_extract_links_resolution_rules(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://Host.COM/dir/sub/page.html?q=1#frag",
                '<html><a href="https://abs.org/x">a</a>'
                '<a href="//proto.net/y">b</a>'
                '<a href="/root/z">c</a>'
                '<a href="rel.html">d</a>'
                '<a href="../up.html">e</a>'
                '<a href="https://f.org/p#sec">f</a>'
                '<a href="mailto:x@y.z">g</a>'
                '<a href="javascript:void(0)">h</a>'
                '<a href="#top">i</a></html>',
            )
        ],
        "url string, html string",
    )
    rows = {
        r["href"]: (r["link_url"], r["link_host"])
        for r in extract_links(pages).collect()
    }
    assert rows == {
        "https://abs.org/x": ("https://abs.org/x", "abs.org"),
        "//proto.net/y": ("https://proto.net/y", "proto.net"),
        "/root/z": ("https://Host.COM/root/z", "host.com"),
        "rel.html": ("https://Host.COM/dir/sub/rel.html", "host.com"),
        # stated seam: '..' unnormalized, resolved against the base dir
        "../up.html": ("https://Host.COM/dir/sub/../up.html", "host.com"),
        "https://f.org/p": ("https://f.org/p", "f.org"),
    }


def test_extract_links_bare_origin_base(spark):
    pages = spark.createDataFrame(
        [("https://h.com", '<a href="x.html">r</a><a href="/y">s</a>')],
        "url string, html string",
    )
    rows = {r["href"]: r["link_url"] for r in extract_links(pages).collect()}
    assert rows == {"x.html": "https://h.com/x.html", "/y": "https://h.com/y"}


def test_host_graph_drops_self_loops_and_counts(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/p", "b.com"),
            ("https://a.com/q", "b.com"),
            ("https://A.com/r", "a.com"),  # self-loop after lowering
            ("https://b.com/s", "a.com"),
        ],
        "src_url string, link_host string",
    )
    rows = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(links).collect()
    }
    assert rows == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}


def _pagerank_py(edges, iterations=5, num=85, den=100, scale=10**12):
    """Driver-side replay of the pinned BIGINT arithmetic (the same
    role as conftest.union_find_groups for the dedup tests)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    score = {v: scale // n for v in nodes}
    base = ((den - num) * (scale // n)) // den
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += score[s] // out[s]
        dang = sum(score[v] for v in nodes if v not in out)
        score = {
            v: base + (num * (inc[v] + dang // n)) // den for v in nodes
        }
    return score


def test_pagerank_matches_python_replay_with_dangling(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("a", "d"), ("b", "d"),  # d has NO out-edges: dangling
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["score"]
        for r in pagerank(df, "src", "dst", iterations=5).collect()
    }
    assert got == _pagerank_py(edges)
    # fixed-point mass: total stays within floor losses of the scale
    assert 0 <= 10**12 - sum(got.values()) < 100 * len(got)
    # c receives from both a and b; it must outrank b (one in-edge)
    assert got["c"] > got["b"]


def test_pagerank_partitioning_invariant(spark):
    edges = [(f"n{i}", f"n{(i * 3 + 1) % 11}") for i in range(11)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {r["node"]: r["score"] for r in pagerank(df, "src", "dst").collect()}
    b = {
        r["node"]: r["score"]
        for r in pagerank(
            df.repartition(7), "src", "dst", partitions=3
        ).collect()
    }
    assert a == b


def test_pagerank_self_loops_and_duplicate_edges_ignored(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")],
        "src string, dst string",
    )
    got = {r["node"]: r["score"] for r in pagerank(df, "src", "dst").collect()}
    assert got == _pagerank_py([("a", "b"), ("b", "a")])
