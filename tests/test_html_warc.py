"""HTML -> text extraction and the WARC record source/sink: extractor
rule coverage, chunk-walk robustness against malformed containers, and
the composition into the existing boilerplate machinery
(paragraph_dedup over extracted blocks)."""
import gzip
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from riskloc_spark.operators.html import (
    escape_html_text,
    extract_html_docs,
    html_to_text,
    synthesize_html_corpus,
)
from riskloc_spark.sources.warc import (
    format_warc_record,
    http_response_parts,
    parse_warc_members,
    read_warc_records,
    write_warc,
)


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_to_text(F.col("html")).alias("t")).first()["t"]


# ---------------------------------------------------------------------------
# extractor rules
# ---------------------------------------------------------------------------

def test_block_tags_become_blank_lines(spark):
    assert _extract(spark, "<p>a</p><p>b</p><div>c</div>") == "a\n\nb\n\nc"


def test_inline_tags_vanish(spark):
    assert (
        _extract(spark, "<p><a href='/x'>home</a> | <b>about</b></p>")
        == "home | about"
    )


def test_script_style_comment_content_removed(spark):
    html = (
        "<p>keep</p><script>if (1 < 2 && x) { y(\"<p>no</p>\"); }"
        "</script><style>p { color: red }</style>"
        "<!-- hidden <p>spam</p> --><p>also</p>"
    )
    assert _extract(spark, html) == "keep\n\nalso"


def test_entity_decode_amp_last(spark):
    # "&amp;lt;" must decode to the literal "&lt;", never double-decode
    assert _extract(spark, "<p>&amp;lt; &lt; &gt; &quot; &#39; &nbsp;x</p>") \
        == "&lt; < > \" ' x"


def test_whitespace_block_semantics(spark):
    html = "<div>  a   b  </div>\n\n\n   <div>\t c </div>"
    assert _extract(spark, html) == "a b\n\nc"


def test_case_insensitive_tags(spark):
    assert _extract(spark, "<P>a</P><SCRIPT>x<1</SCRIPT><DIV>b</DIV>") \
        == "a\n\nb"


def test_escape_round_trip(spark):
    df = spark.createDataFrame(
        [("tricky & <angled> text > here",)], "text string"
    )
    out = df.select(
        html_to_text(
            F.concat(F.lit("<p>"), escape_html_text(F.col("text")),
                     F.lit("</p>"))
        ).alias("t")
    ).first()["t"]
    assert out == "tricky & <angled> text > here"


def test_extract_composes_with_paragraph_dedup(spark, sf_dir):
    """The crawl story end to end: synthesized pages share identical
    nav blocks; extraction surfaces blocks as blank-line paragraphs, so
    paragraph_dedup keeps the nav exactly once corpus-wide and every
    distinct body survives."""
    from riskloc_spark.data import load_table
    from riskloc_spark.operators.dedup import paragraph_dedup

    d = load_table(spark, sf_dir, "documents").limit(50)
    docs = extract_html_docs(synthesize_html_corpus(d))
    kept = paragraph_dedup(docs)
    navs = kept.filter(F.col("para") == "home | about | contact")
    assert navs.count() == 1
    # every body paragraph (distinct per doc) survives
    bodies = kept.join(
        d.select("doc_id", F.col("text").alias("orig")), "doc_id"
    ).filter(F.col("para") == F.col("orig"))
    assert bodies.count() == 50


# ---------------------------------------------------------------------------
# WARC container
# ---------------------------------------------------------------------------

def _mk_record(i: int, body: bytes = b"hello world") -> bytes:
    return format_warc_record(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:test:{i}>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "WARC-Target-URI": f"https://x.example/{i}",
        },
        body,
    )


def test_parse_multi_record_file():
    data = b"".join(_mk_record(i, b"payload %d" % i) for i in range(5))
    recs = parse_warc_members(data, "f")
    assert len(recs) == 5
    assert recs[3]["record_id"] == "<urn:test:3>"
    assert recs[3]["payload"] == b"payload 3"
    assert recs[3]["content_length"] == len(b"payload 3")
    assert recs[0]["record_offset"] == 0


def test_parse_truncated_tail_keeps_prefix():
    data = b"".join(_mk_record(i) for i in range(3))
    recs = parse_warc_members(data[:-20], "f")
    assert len(recs) == 2  # the cut record is dropped, prefix kept


def test_parse_resyncs_past_garbage():
    data = _mk_record(0) + b"GARBAGE NOT A RECORD" + _mk_record(1)
    recs = parse_warc_members(data, "f")
    assert [r["record_id"] for r in recs] == ["<urn:test:0>", "<urn:test:1>"]


def test_parse_bad_content_length_stops():
    bad = _mk_record(0).replace(b"Content-Length: 11",
                                b"Content-Length: 99999")
    recs = parse_warc_members(bad + _mk_record(1), "f")
    # the declared length points past EOF -> walk ends, nothing bogus
    assert all(r["record_id"] != "<urn:test:0>" or r["payload"] is not None
               for r in recs)
    assert len(recs) <= 1


def test_read_warc_gz_and_plain(spark):
    stage = tempfile.mkdtemp(prefix="warc_gz_")
    try:
        with open(os.path.join(stage, "a.warc"), "wb") as f:
            f.write(_mk_record(0) + _mk_record(1))
        with open(os.path.join(stage, "b.warc.gz"), "wb") as f:
            f.write(gzip.compress(_mk_record(2)))
        recs = read_warc_records(spark, stage)
        got = sorted(r["record_id"] for r in recs.collect())
        assert got == ["<urn:test:0>", "<urn:test:1>", "<urn:test:2>"]
    finally:
        import shutil
        shutil.rmtree(stage)


def test_read_warc_oversize_budget(spark):
    stage = tempfile.mkdtemp(prefix="warc_big_")
    try:
        with open(os.path.join(stage, "big.warc"), "wb") as f:
            f.write(_mk_record(0, b"x" * 4096))
        recs = read_warc_records(spark, stage, budget=1024).collect()
        assert len(recs) == 1
        assert recs[0]["warc_type"] == "__oversize__"
        assert recs[0]["payload"] is None
    finally:
        import shutil
        shutil.rmtree(stage)


def test_http_response_parts_malformed_payload(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"HTTP/1.1 404 Not Found\r\n"
                       b"Content-Type: text/plain\r\n\r\nbody text")),
         (2, bytearray(b"no header split here"))],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in http_response_parts(df).collect()}
    assert rows[1]["http_status"] == 404
    assert rows[1]["content_type"] == "text/plain"
    assert rows[1]["content_encoding"] is None
    assert rows[1]["body"] == "body text"
    assert rows[2]["http_status"] is None
    assert rows[2]["body"] is None


def test_http_response_parts_content_encoding(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"HTTP/1.1 200 OK\r\n"
                       b"Content-Type: TEXT/HTML; charset=utf-8\r\n"
                       b"Content-Encoding: gzip\r\n\r\n<html>x</html>"))],
        "id long, payload binary",
    )
    r = http_response_parts(df).collect()[0]
    assert r["content_type"] == "TEXT/HTML; charset=utf-8"
    assert r["content_encoding"] == "gzip"


def test_write_read_round_trip_exact_bytes(spark):
    df = spark.createDataFrame(
        [(f"<urn:t:{i}>", f"https://e/{i}",
          bytearray(f"payload-{i}".encode()) * (i + 1))
         for i in range(10)],
        "record_id string, target_uri string, payload binary",
    )
    stage = tempfile.mkdtemp(prefix="warc_rt2_")
    try:
        manifest = write_warc(df.repartition(3), stage).collect()
        assert sum(m["records"] for m in manifest) == 10
        back = {r["record_id"]: bytes(r["payload"])
                for r in read_warc_records(spark, stage).collect()}
        assert back == {f"<urn:t:{i}>": f"payload-{i}".encode() * (i + 1)
                        for i in range(10)}
    finally:
        import shutil
        shutil.rmtree(stage)


def test_curate_from_crawl_end_to_end(spark, tmp_path_factory):
    """The one-call crawl pipeline: WARC -> extract -> boilerplate
    paragraph removal -> quality/lang filter -> exact dedup.  Shared
    nav/footer blocks across pages must survive exactly once
    corpus-wide; per-page bodies survive; an exact-duplicate page
    collapses; a non-HTML and a non-200 record are dropped."""
    from pyspark.sql import functions as F

    from riskloc_spark.operators.corpus import curate_from_crawl

    body_words = (
        "the and of to a in is it that for document body text "
        "with plenty of the common stopwords and the filler"
    )
    pages = []
    for i in range(8):
        body = f"{body_words} page number {i}"
        pages.append(
            (f"<urn:c:{i}>", f"https://site/{i}",
             "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
             "<html><body><div><a href='/'>shared</a> <a href='/n'>nav"
             " bar</a></div>"
             f"<p>{body}</p>"
             "<footer>shared footer line</footer></body></html>")
        )
    # an exact duplicate of page 0 under a different uri
    pages.append((f"<urn:c:dup>", "https://site/dup",
                  pages[0][2]))
    # a 404 and a non-html record: dropped by the status/type filter
    pages.append(("<urn:c:404>", "https://site/404",
                  "HTTP/1.1 404 Not Found\r\nContent-Type: text/html"
                  "\r\n\r\n<p>gone</p>"))
    pages.append(("<urn:c:bin>", "https://site/bin",
                  "HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\nPNG"))
    # an UPPERCASE content-type must still be accepted (headers are
    # case-insensitive; r10 advisory), and a gzip-encoded body must be
    # dropped (would be mojibake after the UTF-8 cast)
    pages.append(
        ("<urn:c:uc>", "https://site/uc",
         "HTTP/1.1 200 OK\r\nContent-Type: TEXT/HTML; charset=utf-8"
         "\r\n\r\n<html><body><p>uppercase header page body with the "
         "and of to in plenty stopwords</p></body></html>")
    )
    pages.append(
        ("<urn:c:gz>", "https://site/gz",
         "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
         "Content-Encoding: gzip\r\n\r\n<p>pretend-compressed bytes</p>")
    )
    df = spark.createDataFrame(
        pages, "record_id string, target_uri string, body string"
    ).select(
        "record_id", "target_uri",
        F.col("body").cast("binary").alias("payload"),
    )
    from riskloc_spark.sources.warc import write_warc

    warc_dir = str(tmp_path_factory.mktemp("crawl"))
    write_warc(df.repartition(2), warc_dir).count()

    out = curate_from_crawl(spark, warc_dir, min_quality=0.0, lang="en")
    rows = out.collect()
    texts = [r["text"] for r in rows]
    # 8 distinct pages survive; the duplicate page collapsed (its nav/
    # footer/body paragraphs are all dupes, leaving empty text that the
    # curation filter may keep as a distinct empty doc — assert bodies)
    bodies = [t for t in texts if "page number" in t]
    assert len(bodies) == 8
    # boilerplate survives exactly once corpus-wide
    assert sum("shared nav bar" in t for t in texts) == 1
    assert sum("shared footer line" in t for t in texts) == 1
    assert all("404" not in (r["target_uri"] or "") for r in rows)
    assert all("bin" not in (r["target_uri"] or "") for r in rows)
    assert sum("uppercase header page" in t for t in texts) == 1
    assert all("pretend-compressed" not in t for t in texts)

    # with the link-density stage, a link-only nav is dropped WITHIN
    # each page (before any cross-page dedup can see it)
    out2 = curate_from_crawl(
        spark, warc_dir, min_quality=0.0, lang="en",
        max_link_density=0.3,
    )
    texts2 = [r["text"] for r in out2.collect()]
    assert sum("page number" in t for t in texts2) == 8


def test_block_stats_and_link_density(spark):
    from riskloc_spark.operators.html import html_block_stats

    html = (
        "<html><body>"
        "<div class='nav'><a href='/'>home</a> <a href='/a'>about us</a>"
        "</div>"
        "<p>real prose with a single <a href='x'>link</a> inside it</p>"
        "<footer><a href='1'>one</a><a href='2'>two</a></footer>"
        "</body></html>"
    )
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    rows = {r["block_idx"]: r
            for r in html_block_stats(df).collect()}
    assert len(rows) == 3
    nav = rows[0]
    assert nav["text"] == "home about us"
    assert nav["anchor_chars"] == len("home") + len("about us")
    assert nav["link_density"] == round(12 / 13, 6)
    prose = rows[1]
    assert prose["anchor_chars"] == 4
    assert prose["link_density"] < 0.15
    foot = rows[2]
    assert foot["text"] == "onetwo" and foot["link_density"] == 1.0


def test_drop_boilerplate_blocks_rebuild(spark):
    from riskloc_spark.operators.html import (
        drop_boilerplate_blocks,
        extract_html_docs,
    )

    html = (
        "<html><body>"
        "<div><a href='/'>home</a> | <a href='/b'>blog</a></div>"
        "<p>the actual article text goes here</p>"
        "<p>and a second paragraph of it</p>"
        "<footer><a href='x'>links</a><a href='y'>only</a></footer>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    kept = drop_boilerplate_blocks(df, max_link_density=0.3).first()
    assert kept["text"] == (
        "the actual article text goes here"
        "\n\nand a second paragraph of it"
    )
    # with the threshold wide open the rebuild equals the plain extract
    all_blocks = drop_boilerplate_blocks(df, max_link_density=1.0).first()
    plain = extract_html_docs(df).first()
    assert all_blocks["text"] == plain["text"]


def test_truncated_gzip_member_skipped(spark):
    """One interrupted .warc.gz download must skip the file, not abort
    the read: truncated gzip raises EOFError (not OSError), corrupt
    deflate raises zlib.error (review r10)."""
    stage = tempfile.mkdtemp(prefix="warc_badgz_")
    try:
        with open(os.path.join(stage, "ok.warc"), "wb") as f:
            f.write(_mk_record(0))
        whole = gzip.compress(_mk_record(1))
        with open(os.path.join(stage, "trunc.warc.gz"), "wb") as f:
            f.write(whole[: len(whole) // 2])
        with open(os.path.join(stage, "corrupt.warc.gz"), "wb") as f:
            f.write(whole[:10] + b"\x00" * 30)
        got = sorted(r["record_id"]
                     for r in read_warc_records(spark, stage).collect())
        assert got == ["<urn:test:0>"]
    finally:
        import shutil
        shutil.rmtree(stage)


def test_block_stats_splits_embedded_blank_lines(spark):
    """Operator semantics on multi-paragraph block content: an embedded
    blank line splits the block (same units html_to_text separates);
    the html_block_stats GATE sanitizes newlines on both sides, so the
    fixed-seven-block oracle stays well-defined on any corpus."""
    from riskloc_spark.operators.html import html_block_stats

    df = spark.createDataFrame(
        [(1, "<p>first para\n\nsecond para</p>")],
        "doc_id long, html string",
    )
    texts = [r["text"] for r in
             html_block_stats(df).orderBy("block_idx").collect()]
    assert texts == ["first para", "second para"]


# ---------------------------------------------------------------------------
# tree-parser extraction (round 11)
# ---------------------------------------------------------------------------

def test_tree_parity_with_regex_on_wellformed(spark):
    """On well-formed pages (the synthesized corpus) the tree parser
    and the regex chain must extract IDENTICAL text — the tree path is
    a robustness upgrade, not a semantics change."""
    from riskloc_spark.operators.html import synthesize_html_corpus

    rows = [
        (1, "web", "en", 15, "hello & goodbye"),
        (2, "wiki", "de", 20, 'quotes "inside" text'),
        (3, "news", "fr", 9, "a < b > c"),
        (4, "web", "en", 0, ""),
        (5, "arx", "en", 12, "line one\nline two\n\npara two"),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, "
              "n_chars long, text string")
    pages = synthesize_html_corpus(d)
    regex = {r["doc_id"]: r["text"] for r in
             extract_html_docs(pages, parser="regex").collect()}
    tree = {r["doc_id"]: r["text"] for r in
            extract_html_docs(pages, parser="tree").collect()}
    assert regex == tree


def test_tree_extract_malformed_pages():
    """Pure-Python checks of the constructs the regex chain's stated
    seams exclude — each must extract browser-like."""
    from riskloc_spark.operators.html import _extract_tree

    # quoted attribute containing '>': no fragment leaks
    assert _extract_tree('<p data-x="a>b">hi</p>') == "hi"
    assert _extract_tree('<a href="/x" title="1>0">link</a>') == "link"
    # CDATA dropped wholesale (HTML5 bogus-comment behavior)
    assert _extract_tree("<p>a</p><![CDATA[<p>hidden</p>]]><p>b</p>") \
        == "a\n\nb"
    # conditional comments dropped with their content
    assert _extract_tree(
        "<p>a</p><!--[if IE]><p>ie only</p><![endif]--><p>b</p>"
    ) == "a\n\nb"
    # unclosed / misnested tags: events still fire; inline tags join
    # within the block (browser rendering: 'twobold tail' is one
    # paragraph — no whitespace existed between 'two' and '<b>')
    assert _extract_tree("<p>one<p>two<b><i>bold</b></i> tail") \
        == "one\n\ntwobold tail"
    # script whose string contains a closing-div: CDATA tokenizer mode
    assert _extract_tree(
        '<p>a</p><script>x("</div> junk & <p>");</script><p>b</p>'
    ) == "a\n\nb"
    # unclosed script suppresses the rest (browser behavior; stated
    # divergence from the regex chain)
    assert _extract_tree("<p>a</p><script>var x=1; <p>gone</p>") == "a"
    # DOCTYPE / processing instructions dropped
    assert _extract_tree("<!DOCTYPE html><?xml spam?><p>kept</p>") \
        == "kept"
    # HTML5 charrefs beyond the regex chain's 7-entity table decode
    assert _extract_tree("<p>&hellip; &#x41;&nbsp;end</p>") \
        == "… A end"


def test_tree_null_and_empty(spark):
    from riskloc_spark.operators.html import html_to_text_tree

    df = spark.createDataFrame([(1, None), (2, ""), (3, "<p></p>")],
                               "doc_id long, html string")
    got = {r["doc_id"]: r["t"] for r in df.select(
        "doc_id", html_to_text_tree(F.col("html")).alias("t")).collect()}
    assert got == {1: None, 2: "", 3: ""}


def test_adversarial_corpus_expected_closed_form(spark):
    """The gate contract: the adversarial page's tree extraction equals
    the closed-form block join the DuckDB twin reconstructs."""
    from riskloc_spark.operators.html import synthesize_adversarial_corpus

    d = spark.createDataFrame(
        [(9, "web", "en", 11, "body & text")],
        "doc_id long, source string, lang string, n_chars long, "
        "text string")
    out = extract_html_docs(
        synthesize_adversarial_corpus(d), parser="tree").first()
    assert out["text"] == (
        "Doc 9\n\nhome | about\n\nbody & text\n\n"
        "lang: en\n\nchars: 11\n\n'web' fin"
    )


def test_curate_from_crawl_tree_parser(spark, tmp_path_factory):
    from riskloc_spark.operators.corpus import curate_from_crawl
    from riskloc_spark.sources.warc import write_warc

    body = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            "<html><body><div data-x=\"a>b\"><p>the and of to a in is "
            "it that for tree parsed body text with plenty stopwords"
            "</p></div><script>x(\"</div> junk\")</script></body></html>")
    df = spark.createDataFrame(
        [("<urn:t:1>", "https://site/1", body)],
        "record_id string, target_uri string, body string",
    ).select("record_id", "target_uri",
             F.col("body").cast("binary").alias("payload"))
    warc_dir = str(tmp_path_factory.mktemp("crawl_tree"))
    write_warc(df, warc_dir).count()
    out = curate_from_crawl(spark, warc_dir, min_quality=0.0,
                            lang="en", parser="tree").collect()
    assert len(out) == 1
    assert "tree parsed body text" in out[0]["text"]
    assert "junk" not in out[0]["text"]
    assert ">" not in out[0]["text"]
    # tree parser composes with the link-density block filter (r11)
    out2 = curate_from_crawl(spark, warc_dir, min_quality=0.0,
                             lang="en", parser="tree",
                             max_link_density=0.3).collect()
    assert len(out2) == 1
    assert "tree parsed body text" in out2[0]["text"]
    with pytest.raises(ValueError):
        curate_from_crawl(spark, warc_dir, parser="nope")


# ---------------------------------------------------------------------------
# per-member gzip split + sink commit protocol (round 11)
# ---------------------------------------------------------------------------

def test_write_warc_compressed_round_trip(spark, tmp_path):
    """compress=True writes one gzip member PER RECORD (the CommonCrawl
    layout); the reader walks members with cumulative decompressed
    offsets equal to what an uncompressed write would produce."""
    df = spark.createDataFrame(
        [(f"<urn:z:{i}>", f"https://e/{i}",
          bytearray(f"body-{i}".encode()) * (i + 1)) for i in range(12)],
        "record_id string, target_uri string, payload binary",
    )
    gz_dir = str(tmp_path / "gz")
    plain_dir = str(tmp_path / "plain")
    from riskloc_spark.sources.warc import write_warc
    write_warc(df.coalesce(1), gz_dir, compress=True).count()
    write_warc(df.coalesce(1), plain_dir).count()
    assert os.listdir(gz_dir) == ["part-00000.warc.gz"]
    gz = {r["record_id"]: r for r in
          read_warc_records(spark, gz_dir).collect()}
    plain = {r["record_id"]: r for r in
             read_warc_records(spark, plain_dir).collect()}
    assert set(gz) == set(plain) and len(gz) == 12
    for k in gz:
        assert bytes(gz[k]["payload"]) == bytes(plain[k]["payload"])
        assert gz[k]["record_offset"] == plain[k]["record_offset"]


def test_gz_member_walk_resyncs_past_corrupt_member():
    from riskloc_spark.sources.warc import _iter_gz_members

    good = [gzip.compress(_mk_record(i), mtime=0) for i in range(3)]
    # corrupt the middle member's deflate stream, keep its magic
    bad = good[1][:6] + b"\x00garbage\xff" * 3
    data = good[0] + bad + good[2]
    members = list(_iter_gz_members(data))
    texts = [m[2] for m in members]
    assert _mk_record(0) in texts and _mk_record(2) in texts


def test_gz_per_member_budget(spark, tmp_path):
    stage = str(tmp_path)
    small = gzip.compress(_mk_record(0), mtime=0)
    big = gzip.compress(_mk_record(1, b"x" * 4096), mtime=0)
    with open(os.path.join(stage, "mix.warc.gz"), "wb") as f:
        f.write(small + big + gzip.compress(_mk_record(2), mtime=0))
    recs = read_warc_records(spark, stage, budget=1024).collect()
    kinds = sorted((r["warc_type"], r["record_id"]) for r in recs)
    assert ("__oversize__", None) in kinds
    assert ("response", "<urn:test:0>") in kinds
    assert ("response", "<urn:test:2>") in kinds


def test_split_read_equals_whole_read(spark, tmp_path):
    """index_warc_gz_members + read_warc_records_split must reproduce
    the whole-file read EXACTLY (ids, payloads, record_offsets) while
    splitting one archive into multiple tasks."""
    from riskloc_spark.sources.warc import (
        index_warc_gz_members,
        read_warc_records_split,
        write_warc,
    )

    df = spark.createDataFrame(
        [(f"<urn:s:{i}>", f"https://e/{i}",
          bytearray(f"payload {i} ".encode()) * 40) for i in range(60)],
        "record_id string, target_uri string, payload binary",
    )
    gz_dir = str(tmp_path / "arch")
    write_warc(df.coalesce(1), gz_dir, compress=True).count()

    # ~300B/member compressed: 2 KiB splits => many splits of one file
    idx = index_warc_gz_members(spark, gz_dir, split_bytes=2048)
    idx.persist().count()
    splits = idx.collect()
    assert len(splits) > 4, "one archive must yield multiple splits"
    assert sum(s["members"] for s in splits) == 60

    whole = {r["record_id"]: (bytes(r["payload"]), r["record_offset"])
             for r in read_warc_records(spark, gz_dir).collect()}
    split = {r["record_id"]: (bytes(r["payload"]), r["record_offset"])
             for r in read_warc_records_split(spark, idx).collect()}
    assert whole == split and len(whole) == 60
    idx.unpersist()


def test_write_warc_commit_leaves_no_temp_files(spark, tmp_path):
    from riskloc_spark.sources.warc import write_warc

    df = spark.createDataFrame(
        [(f"<urn:c:{i}>", f"https://e/{i}", bytearray(b"x" * 10))
         for i in range(8)],
        "record_id string, target_uri string, payload binary",
    )
    out = str(tmp_path / "sink")
    man = write_warc(df.repartition(4), out).collect()
    names = sorted(os.listdir(out))
    assert names == [f"part-{i:05d}.warc" for i in range(4)]
    assert not any(".inprogress" in n for n in names)
    assert sum(m["records"] for m in man) == 8


def test_block_stats_tree_parity_on_wellformed(spark):
    """html_block_stats_tree must produce the regex path's exact rows
    (blocks, indices, anchor accounting) on well-formed pages."""
    from riskloc_spark.operators.html import (
        html_block_stats,
        html_block_stats_tree,
        synthesize_html_corpus,
    )

    rows = [
        (1, "web", "en", 15, "hello & goodbye"),
        (2, "wiki", "de", 20, 'quotes "inside" text'),
        (3, "news", "fr", 9, "a < b > c"),
        (4, "arx", "en", 12, "line one\nline two\n\npara two"),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, "
              "n_chars long, text string")
    pages = synthesize_html_corpus(d)
    key = lambda r: (r["doc_id"], r["block_idx"])
    val = lambda r: (r["text"], r["n_chars"], r["anchor_chars"],
                     round(r["link_density"], 6))
    a = {key(r): val(r) for r in html_block_stats(pages).collect()}
    b = {key(r): val(r) for r in html_block_stats_tree(pages).collect()}
    assert a == b and len(a) > 0


def test_block_stats_tree_malformed():
    """The tree block walk on the regex path's stated seams."""
    from riskloc_spark.operators.html import _block_stats_tree

    # quoted '>' in an attribute; anchor chars counted per anchor
    got = _block_stats_tree(
        '<div data-x="a>b"><a href="/1">one</a> and '
        '<a href="/2"> two </a></div>'
    )
    assert got == [("one and two", 6)]
    # conditional comment and CDATA drop; blank line in data splits
    got = _block_stats_tree(
        "<p>alpha\n\nbeta</p><!--[if IE]><p>x</p><![endif]-->"
        "<![CDATA[<p>y</p>]]><p>gamma</p>"
    )
    assert got == [("alpha", 0), ("beta", 0), ("gamma", 0)]
    # a block tag inside an open anchor closes the anchor at the
    # boundary (stated behavior)
    got = _block_stats_tree('<p><a href="/">link<p>tail</a></p>')
    assert got == [("link", 4), ("tail", 0)]


# ---------------------------------------------------------------------------
# charset-aware body decode (round 11)
# ---------------------------------------------------------------------------

def test_decode_http_bodies_charsets_and_gzip(spark):
    from riskloc_spark.sources.warc import decode_http_bodies

    latin = "café niño".encode("latin-1")
    rows = [
        (0, bytearray(b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; "
                      b"charset=ISO-8859-1\r\n\r\n" + latin)),
        (1, bytearray(b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                      b"Content-Encoding: gzip\r\n\r\n"
                      + gzip.compress("trésor".encode(), mtime=0))),
        (2, bytearray(b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                      b"\r\n" + '<meta charset="iso-8859-1">touché'
                      .encode("latin-1"))),
        (3, bytearray(b"HTTP/1.1 200 OK\r\nContent-Type: a\r\n"
                      b"Content-Encoding: gzip\r\n\r\nnot actually gzip")),
        (4, bytearray(b"no header blank line")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_http_bodies(df).collect()}
    assert got[0]["charset"] == "iso-8859-1"
    assert got[0]["body"] == "café niño"
    assert got[1]["content_encoding"] == "gzip"
    assert got[1]["body"] == "trésor"
    assert got[2]["charset"] == "iso-8859-1"
    assert got[2]["body"].endswith("touché")
    assert got[3]["body"] is None  # corrupt gzip: headers kept
    assert got[3]["http_status"] == 200
    assert got[4]["http_status"] is None and got[4]["body"] is None


def test_decode_http_bodies_budget(spark):
    from riskloc_spark.sources.warc import decode_http_bodies

    big = gzip.compress(b"x" * 100_000, mtime=0)
    df = spark.createDataFrame(
        [(0, bytearray(b"HTTP/1.1 200 OK\r\nContent-Type: t\r\n"
                       b"Content-Encoding: gzip\r\n\r\n" + big))],
        "doc_id long, payload binary",
    )
    r = decode_http_bodies(df, budget=1024).collect()[0]
    assert r["body"] is None and r["http_status"] == 200


def test_curate_from_crawl_decode_bodies(spark, tmp_path_factory):
    """decode_bodies=True recovers a gzip-compressed and a latin-1
    page that the fast path drops / mojibakes."""
    from riskloc_spark.operators.corpus import curate_from_crawl
    from riskloc_spark.sources.warc import write_warc

    stop = ("the and of to a in is it that for with plenty of the "
            "common stopwords and the filler")
    plain = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
             f"<p>plain page {stop}</p>").encode()
    gzbody = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
              b"Content-Encoding: gzip\r\n\r\n"
              + gzip.compress(f"<p>zipped page {stop}</p>".encode(),
                              mtime=0))
    latin = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
             b"charset=ISO-8859-1\r\n\r\n"
             + f"<p>caf\xe9 page {stop}</p>".encode("latin-1"))
    df = spark.createDataFrame(
        [("<urn:d:0>", "https://site/0", bytearray(plain)),
         ("<urn:d:1>", "https://site/1", bytearray(gzbody)),
         ("<urn:d:2>", "https://site/2", bytearray(latin))],
        "record_id string, target_uri string, payload binary",
    )
    warc_dir = str(tmp_path_factory.mktemp("crawl_dec"))
    write_warc(df, warc_dir).count()
    fast = curate_from_crawl(spark, warc_dir, min_quality=0.0,
                             lang="en").collect()
    texts_fast = [r["text"] for r in fast]
    assert not any("zipped page" in t for t in texts_fast)
    dec = curate_from_crawl(spark, warc_dir, min_quality=0.0,
                            lang="en", decode_bodies=True).collect()
    texts = sorted(r["text"] for r in dec)
    assert sum("zipped page" in t for t in texts) == 1
    assert sum("café page" in t for t in texts) == 1
    assert sum("plain page" in t for t in texts) == 1


def test_crawl_to_training_set_end_to_end(spark, tmp_path_factory):
    """The WHOLE ingestion story in one composition: a mixed crawl
    (well-formed, adversarial-markup, gzip-compressed, latin-1, and
    exact-duplicate pages) written as a per-record-member .warc.gz
    through the committed sink, curated with the tree parser +
    charset decode, then sharded into a deterministic training export
    and read back in permutation order."""
    import gzip as _gzip

    from pyspark.sql import functions as F

    from riskloc_spark.operators.corpus import curate_from_crawl
    from riskloc_spark.operators.sampling import (
        read_training_shards,
        write_training_shards,
    )
    from riskloc_spark.sources.warc import write_warc

    stop = ("the and of to a in is it that for with plenty of the "
            "common stopwords and the filler text")

    def http(body: bytes, ctype=b"text/html", enc=None) -> bytes:
        head = b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
        if enc:
            head += b"\r\nContent-Encoding: " + enc
        return head + b"\r\n\r\n" + body

    pages = []
    for i in range(6):
        pages.append(
            (f"<urn:e2e:{i}>", f"https://site/{i}",
             http(f"<p>page {i} body {stop}</p>".encode()))
        )
    # adversarial markup (attr '>', CDATA) the tree parser must survive
    pages.append(
        ("<urn:e2e:adv>", "https://site/adv",
         http((f'<div data-x="a>b"><p>adversarial body {stop}</p>'
               f"</div><![CDATA[<p>junk</p>]]>").encode()))
    )
    # gzip-compressed body
    pages.append(
        ("<urn:e2e:gz>", "https://site/gz",
         http(_gzip.compress(
             f"<p>compressed body {stop}</p>".encode(), mtime=0),
             enc=b"gzip"))
    )
    # latin-1 body declared by the header charset
    pages.append(
        ("<urn:e2e:l1>", "https://site/l1",
         http(f"<p>café body {stop}</p>".encode("latin-1"),
              ctype=b"text/html; charset=ISO-8859-1"))
    )
    # exact duplicate of page 0 under another uri: must collapse
    pages.append(("<urn:e2e:dup>", "https://site/dup", pages[0][2]))

    df = spark.createDataFrame(
        [(r, u, bytearray(b)) for r, u, b in pages],
        "record_id string, target_uri string, payload binary",
    )
    warc_dir = str(tmp_path_factory.mktemp("e2e_crawl"))
    write_warc(df.repartition(2), warc_dir, compress=True).count()
    import os
    assert all(n.endswith(".warc.gz") for n in os.listdir(warc_dir))

    docs = curate_from_crawl(
        spark, warc_dir, min_quality=0.0, lang="en",
        parser="tree", decode_bodies=True,
    ).persist()
    texts = [r["text"] for r in docs.collect()]
    bodies = [t for t in texts if "body" in t]
    # 6 plain + adversarial + compressed + latin-1 survive; dup folds
    assert sum("adversarial body" in t for t in texts) == 1
    assert all("junk" not in t and ">" not in t for t in texts)
    assert sum("compressed body" in t for t in texts) == 1
    assert sum("café body" in t for t in texts) == 1
    assert sum("page 0 body" in t for t in texts) == 1  # dup collapsed
    assert len(bodies) == 9

    out = str(tmp_path_factory.mktemp("e2e_out") / "shards")
    manifest = write_training_shards(docs, out, 2).collect()
    assert sum(m["rows"] for m in manifest) == docs.count()
    back = read_training_shards(spark, out)
    assert back.count() == docs.count()
    assert {"shard", "pos", "text"} <= set(back.columns)
    docs.unpersist()
