"""The compact bench line must ALWAYS fit the driver's 2000-char tail
window whole (VERDICT r9 #1: BENCH_r09 recorded ``parsed: null`` for the
third time in five rounds because scale-block growth pushed the line to
3,403 chars).  These tests build the line from a BENCH_FULL-shaped
fixture carrying TWICE today's scale-block count, so the next round that
adds blocks fails here before it loses a driver record.

No Spark session needed — build_compact_line is pure."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_compact_line  # noqa: E402

# A full-record fixture mirroring BENCH_FULL_latest.json's shape: the
# real r9 block inventory (14 named blocks + rung top-level), then every
# block DUPLICATED under a _x2 name to model two more rounds of growth.
_SCALE = {
    "leaves": 562500,
    "label": "b=b24&c=c6",
    "sec": {"riskloc": 9.2, "autoroot": 4.6, "squeeze": 15.8,
            "robustspot": 10.7},
    "found": {"riskloc": True, "autoroot": True, "squeeze": True,
              "robustspot": True},
    "dedup": {"docs": 51000, "sec": 9.13, "planted_pairs": 1000,
              "recall": 0.998, "false_merge_groups": 0},
    "media": {
        "png": {"images": 800, "payload_mb": 33.5, "sec": 0.58,
                "mb_per_s": 57.7, "mpix_per_s": 22.6},
        "gif": {"images": 1200, "payload_mb": 5.0, "sec": 0.66,
                "mb_per_s": 7.6, "mpix_per_s": 16.9},
        "jpeg": {"images": 600, "payload_mb": 0.6, "sec": 0.65,
                 "mb_per_s": 1.0, "mpix_per_s": 15.1},
    },
    "ann": {"vectors": 200000, "queries": 50, "bruteforce_sec": 3.22,
            "lsh": {"sec": 2.81, "recall_at_10": 1.0},
            "pq": {"fit_sec": 4.19, "encode_sec": 3.58, "sec": 4.68,
                   "recall_at_10": 1.0},
            "ivfpq": {"index_sec": 3.94, "sec": 2.44,
                      "recall_at_10": 1.0}},
    "semantic": {"vectors": 101000, "planted_pairs": 1000, "sec": 29.24,
                 "recall": 0.996, "false_pairs": 0},
    "paragraphs": {"docs": 500000, "sec": 1.35, "survivors": 500201,
                   "headers_kept": 200, "footer_kept": 1,
                   "bodies_kept": 500000},
    "quality": {"docs": 100000, "sec": 20.93, "docs_per_sec": 4778,
                "kept": 95000, "dropped": 5000},
    "spans": {"docs": 200000, "sec": 5.28, "docs_per_sec": 37879,
              "docs_touched": 19999, "expected_touched": 19999,
              "tokens_removed": 240345,
              "expected_tokens_removed": 239988, "spans": 19999},
    "langid": {"docs": 300000, "sec": 40.91, "docs_per_sec": 7333,
               "classified": 300000, "accuracy": 1.0},
    "ingest": {"base_docs": 200000, "batch_docs": 20000,
               "index_sec": 20.523, "probe_sec": 3.442,
               "selfjoin_sec": 17.487, "selfjoin_cross_pairs": 1996,
               "planted_pairs": 2000, "recall": 0.998,
               "false_matches": 0},
    "audio": {"docs": 20000, "payload_mb": 241.5, "sec": 0.636,
              "mb_per_s": 379.7, "msamples_per_s": 188.7,
              "channel_rows": 30000},
    "normalize": {"docs": 100000, "sec": 0.437, "docs_per_s": 228833,
                  "changed": 20000, "changed_expected": 20000},
    "rung2": {
        "leaves": 5400000, "label": "b=b47&c=c12",
        "sec": {"riskloc": 18.6, "autoroot": 21.8, "squeeze": 52.8,
                "robustspot": 27.1},
        "sec_runs": {"riskloc": [18.6, 19.1], "autoroot": [21.8, 22.0],
                     "squeeze": [52.8, 53.0],
                     "robustspot": [27.1, 27.5]},
        "found": {"riskloc": True, "autoroot": True, "squeeze": True,
                  "robustspot": True},
        "writers": {"write_bucketed_sec": 1.636, "write_plain_sec": 0.462,
                    "bucketed_join": {"sec": 0.414, "exchanges": 1},
                    "plain_join": {"sec": 1.633, "exchanges": 3}},
    },
    "dedup2": {"docs": 510000, "sec": 51.584, "planted_pairs": 10000,
               "recall": 0.9981, "false_merge_groups": 0},
    "ann2": {"vectors": 2000000, "queries": 32, "truth_sec": 23.77,
             "ingest_sec": 22.14,
             "pq": {"sec": 25.27, "recall_at_10": 1.0},
             "ivfpq": {"sec": 7.08, "recall_at_10": 1.0}},
    "spans2": {"docs": 1000000, "sec": 12.9, "docs_per_sec": 77519,
               "docs_touched": 99999, "expected_touched": 99999,
               "tokens_removed": 1209787,
               "expected_tokens_removed": 1199988, "spans": 99999},
    "ingest2": {"base_docs": 500000, "batch_docs": 20000,
                "index_sec": 48.881, "probe_sec": 3.647,
                "selfjoin_sec": 38.547, "selfjoin_cross_pairs": 1996,
                "planted_pairs": 2000, "recall": 0.998,
                "false_matches": 0},
}


def _fixture(doubled=False):
    scale = dict(_SCALE)
    if doubled:
        for k, v in list(_SCALE.items()):
            if k in ("leaves", "label", "sec", "found"):
                continue
            scale[k + "_x2"] = v
    queries = {f"query_with_a_long_name_{i:03d}": round(0.3 + i * 0.07, 2)
               for i in range(140)}
    return {
        "queries": queries,
        "metric": "headline_queries_total_wall",
        "value": 131.41,
        "unit": "sec",
        "sf": 0.1,
        "queries_isolated": queries,
        "isolated_every": 12,
        "isolated_total": 120.09,
        "scale": scale,
    }


def _doubled_fixture():
    return _fixture(doubled=True)


def test_compact_line_fits_tail_at_double_block_count():
    line = build_compact_line(_doubled_fixture())
    # the driver keeps the last 2000 chars of stdout: the line plus its
    # newline must sit inside that window whole
    assert len(line) < 1900
    assert json.loads(line[-2000:]) == json.loads(line)


def test_compact_line_headline_first():
    line = build_compact_line(_doubled_fixture())
    # even a mid-line truncation keeps the headline: metric/value lead
    head = line[:90]
    assert '"metric":"headline_queries_total_wall"' in head
    assert '"value":131.41' in head
    rec = json.loads(line)
    keys = list(rec)
    assert keys[:4] == ["metric", "value", "unit", "sf"]


def test_doubled_inventory_keeps_every_block_and_flag():
    rec = json.loads(build_compact_line(_doubled_fixture()))
    scale = rec["scale"]
    # every named block survives summarization (doubled inventory may
    # fall back to the tight {sec, ok, recall} form, never drop a block)
    expect = {k for k in _SCALE if k not in
              ("leaves", "label", "sec", "found")}
    expect |= {k + "_x2" for k in expect} | {"rung1"}
    assert expect <= set(scale)
    for name in ("rung1", "rung2", "dedup2", "spans_x2"):
        b = scale[name]
        assert "sec" in b
        assert b.get("ok", b.get("found", b.get("exact"))) is True
    assert scale["langid"]["accuracy"] == 1.0
    assert scale["dedup"]["recall"] == 0.998


def test_compact_line_carries_every_block_flag():
    # at today's real block count the DETAILED form fits: per-search sec
    # maps, curve numbers, and every quality flag
    rec = json.loads(build_compact_line(_fixture()))
    scale = rec["scale"]
    assert scale["rung1"] == {
        "sec": {"riskloc": 9.2, "autoroot": 4.6, "squeeze": 15.8,
                "robustspot": 10.7},
        "found": True,
    }
    assert scale["rung2"]["found"] is True
    assert scale["dedup"]["recall"] == 0.998
    assert scale["dedup"]["fp0"] is True
    assert scale["langid"]["accuracy"] == 1.0
    assert scale["spans"]["exact"] is True
    assert scale["normalize"]["exact"] is True
    # the two curve claims keep their two numbers
    assert scale["ann2"]["ivfpq"] == 7.08 and scale["ann2"]["pq"] == 25.27
    assert scale["ingest"]["probe"] == 3.442
    assert scale["ingest"]["selfjoin"] == 17.487
    assert scale["rung2"]["writers"] == {"bucketed": 0.414, "plain": 1.633}


def test_compact_line_shrinks_slowest_not_blocks():
    # a pathological fixture (4x today's blocks) drops slowest-query
    # samples and flag detail before it drops any block; a failure flag
    # (found=False) survives even the ultra level
    out = _doubled_fixture()
    for k, v in list(out["scale"].items()):
        if k.endswith("_x2"):
            out["scale"][k + "b"] = v
            out["scale"][k + "c"] = v
    out["scale"]["rung2"] = dict(out["scale"]["rung2"])
    out["scale"]["rung2"]["found"] = {"riskloc": False, "autoroot": True,
                                      "squeeze": True, "robustspot": True}
    line = build_compact_line(out)
    rec = json.loads(line)
    assert len(line) < 1900
    assert "rung1" in rec["scale"] and "ann2_x2c" in rec["scale"]
    assert rec["scale"]["rung2"]["ok"] is False


def test_literal_exact_boolean_passes_through():
    # the html rungs carry a literal "exact" boolean: a red extraction
    # rung must surface in the compact line (review r10)
    out = _fixture()
    out["scale"]["html"] = {"docs": 300000, "payload_mb": 208.0,
                            "sec": 3.1, "docs_per_sec": 96774,
                            "mb_per_s": 67.0, "extracted": 300000,
                            "matched": 299998, "exact": False}
    rec = json.loads(build_compact_line(out))
    assert rec["scale"]["html"]["exact"] is False


def test_throughput_keys_never_summed_as_seconds():
    # docs_per_sec ends in _sec but is a THROUGHPUT: it must never fold
    # into the block's seconds (it put sec=44784 on the classifier
    # block in the r10 dry run)
    out = _fixture()
    out["scale"]["classifier"] = {
        "docs": 210000, "fit_sec": 5.38, "score_sec": 5.33,
        "docs_per_sec": 39400, "holdout": 105000, "accuracy": 1.0,
    }
    rec = json.loads(build_compact_line(out))
    assert rec["scale"]["classifier"]["sec"] == pytest.approx(10.71)
    assert rec["scale"]["classifier"]["accuracy"] == 1.0


def test_compact_line_carries_queries_contract_key():
    # the driver's perf/scaling comparison reads parsed["queries"]: the
    # compact line must carry per-query samples under THAT key (r9-r15
    # carried them as "slowest" and PERF_r15 recorded n_common=0),
    # verbatim name -> measured seconds, slowest first
    out = _fixture()
    rec = json.loads(build_compact_line(out))
    assert rec["queries"]
    for name, sec in rec["queries"].items():
        assert out["queries"][name] == sec
    slowest = max(out["queries"].items(), key=lambda kv: kv[1])[0]
    assert slowest in rec["queries"]
    # greedy fill: with today's block inventory a useful sample count
    # fits (the fixture's 140 long-named queries leave >= 8 in budget)
    assert len(rec["queries"]) >= 8


def test_compact_line_real_record_if_present():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_FULL_latest.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        out = json.load(f)
    line = build_compact_line(out)
    assert len(line) < 1900
    assert json.loads(line)["metric"] == "headline_queries_total_wall"


def test_block_error_is_truncated_not_fatal():
    out = _fixture()
    out["scale"]["dedup"] = {"error": "E" * 500}
    rec = json.loads(build_compact_line(out))
    assert rec["scale"]["dedup"] == {"error": "E" * 60}
