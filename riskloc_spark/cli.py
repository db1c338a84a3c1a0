"""CLI mirroring the reference's run.py + utils/argument_parser.py.

Usage:
    python -m riskloc_spark.cli <algorithm> <data> [common options] [algorithm options]

Algorithms and their options (defaults = reference argument_parser.py):
  riskloc       --risk-threshold 0.5 --pep-threshold 0.02 --n-remove 5
                --remove-relative --prune-elements/--no-prune-elements
  autoroot      --delta-threshold 0.25
  squeeze       --ps-upper-bound 0.9 --max-num-elements-single-cluster 12
  hotspot       --pt 0.8 --m 200 --scoring gps|ps
  adtributor    --tep 0.1 --teep 0.1 --k 3
  r_adtributor  --teep 0.2 --k 3
  robustspot    --k 3 --lambda-amplification 100
                --contribution-ability-threshold 0.0 --confidence-threshold 0.8

Data forms (ref run.py:39-53):
  <case>.csv        plain: attr columns + real + predict
  <case>            derived: <case>.a.csv / <case>.b.csv next to it
                    (auto-detected when <data>.a.csv exists)
  --rs-data         RobustSpot minute-grain csv (single file: needs
                    --timestamp; directory: timestamps from anomaly.yaml)
  <directory>       batch mode (ref run.py:10-36): every deepest-level
                    folder's files are instances; dataset name = first
                    path component under the directory. Dataset 'D' and
                    'RS' imply --derived, 'RS' implies --rs-data (ref
                    run.py:26-27). Labels come from injection_info.csv
                    (timestamp,set) or anomaly.yaml (RS). Writes
                    <algorithm>-all<suffix>.csv and
                    <algorithm>-summary<suffix>.csv with per-instance and
                    per-folder aggregate F1 (ref run_utils.py
                    result_post_processing).

The reference fans instances over a process pool because pandas is
single-threaded; here ONE SparkSession runs instances sequentially and
parallelizes each across cores (executors on a cluster).

Corpus-pipeline subcommands (no reference counterpart — the
LLM-data-pipeline surface; parquet in, parquet out, one JSON status
line):
    python -m riskloc_spark.cli pipeline curate docs.parquet --output out
    python -m riskloc_spark.cli pipeline curate-near-dup docs.parquet --output out
    python -m riskloc_spark.cli pipeline curate-semantic docs.parquet \
        --embeddings emb.parquet --output out
    python -m riskloc_spark.cli pipeline dedup-paragraphs docs.parquet --output out
    python -m riskloc_spark.cli pipeline sample docs.parquet --output out \
        --fraction 0.3 --salt mix [--strata-col source --rate src0=1.0]
    python -m riskloc_spark.cli pipeline split docs.parquet --output out \
        --weights train=0.8,val=0.1,test=0.1
    python -m riskloc_spark.cli pipeline decontaminate docs.parquet \
        --benchmark bench.parquet --output out [--ngram 8 --max-contamination 0]
    python -m riskloc_spark.cli pipeline dedup-spans docs.parquet --output out \
        [--ngram 8]
    python -m riskloc_spark.cli pipeline gopher-filter docs.parquet --output out \
        [--min-words 50 --max-words 100000 --audit]
    python -m riskloc_spark.cli pipeline c4-clean docs.parquet --output out \
        [--min-line-words 3 --min-kept-lines 1]
    python -m riskloc_spark.cli pipeline redact-pii docs.parquet --output out
    python -m riskloc_spark.cli pipeline tfidf docs.parquet --output out \
        [--group-col source --top-k 10]
    python -m riskloc_spark.cli pipeline report docs.parquet --output out \
        [--group-col source]
    python -m riskloc_spark.cli pipeline normalize docs.parquet --output out
    python -m riskloc_spark.cli pipeline build-dedup-index docs.parquet \
        --output index
    python -m riskloc_spark.cli pipeline ingest-dedup batch.parquet \
        --output accepted --index index --jaccard-threshold 0.8
    python -m riskloc_spark.cli pipeline langid docs.parquet --output out \
        [--lang-col lang --profile-size 300]
    python -m riskloc_spark.cli pipeline block-domains docs.parquet --output out \
        --domain ads.net [--domain tracker.io ...]
    python -m riskloc_spark.cli pipeline html-extract pages.parquet --output out \
        [--parser tree]
    python -m riskloc_spark.cli pipeline warc-extract <warc-dir> --output out \
        [--decode-bodies]
    python -m riskloc_spark.cli pipeline curate-crawl <warc-dir> --output out \
        [--parser tree --decode-bodies --max-link-density 0.5]
    python -m riskloc_spark.cli pipeline shard docs.parquet --output out \
        [--n-shards 64 --salt shuffle]
    python -m riskloc_spark.cli pipeline image-dedup media.parquet --output out \
        [--max-hamming 4]
    python -m riskloc_spark.cli pipeline hll docs.parquet --output sketch \
        --value-col user_id [--key-cols source --precision 12 | --estimate]
    python -m riskloc_spark.cli pipeline bm25 docs.parquet --output ranked \
        --queries queries.parquet [--topk 10]
    python -m riskloc_spark.cli pipeline zorder facts.parquet --output tiled \
        --cols x,y [--bits 16 --partitions 64]
    python -m riskloc_spark.cli pipeline quantiles docs.parquet --output sk \
        --value-col n_chars --id-col doc_id [--key-cols lang --k 1024 |
        --estimate 0.5,0.9,0.99]
    python -m riskloc_spark.cli pipeline heavy-hitters docs.parquet \
        --output hh --value-col domain --id-col doc_id [--top-k 20]
"""
from __future__ import annotations

import argparse
import json
import os
import time

ALGORITHMS = (
    "riskloc",
    "autoroot",
    "squeeze",
    "hotspot",
    "adtributor",
    "r_adtributor",
    "robustspot",
)

# subcommand options forwarded to the operator (name -> default); mirrors
# reference utils/argument_parser.py:15-75
ALGO_OPTIONS: dict[str, dict[str, object]] = {
    "riskloc": {
        "risk_threshold": 0.5,
        "pep_threshold": 0.02,
        "n_remove": 5,
        "remove_relative": False,
        "prune_elements": True,
    },
    "autoroot": {"delta_threshold": 0.25},
    "squeeze": {
        "ps_upper_bound": 0.9,
        "max_num_elements_single_cluster": 12,
        "density_estimation_method": "histogram",
        "histogram_bar_width": "auto",
        "max_normal_deviation": 0.20,
    },
    "hotspot": {"pt": 0.8, "m": 200, "scoring": "gps"},
    "adtributor": {"tep": 0.1, "teep": 0.1, "k": 3},
    "r_adtributor": {"teep": 0.2, "k": 3},
    "robustspot": {
        "k": 3,
        "lambda_amplification": 100,
        "contribution_ability_threshold": 0.0,
        "confidence_threshold": 0.8,
    },
}


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="riskloc_spark", description="riskloc_spark runner")
    sub = p.add_subparsers(dest="algorithm", required=True)

    def common(sp: argparse.ArgumentParser) -> None:
        sp.add_argument("data", help="csv / derived base path / directory")
        sp.add_argument(
            "--derived", type=_str2bool, nargs="?", const=True, default=None,
            help="derived dataset (auto: D/RS dataset names, or <data>.a.csv exists)",
        )
        sp.add_argument("--rs-data", action="store_true")
        sp.add_argument("--timestamp", type=int, help="anomalous minute for --rs-data")
        sp.add_argument("--label", help="ground-truth 'd=v&d=v;...' for F1 scoring")
        sp.add_argument("--cpus", default=None, help="local parallelism override")
        sp.add_argument("--output-suffix", default="", help="suffix for batch csvs")
        sp.add_argument("--output-dir", default=".", help="directory for batch csvs")
        sp.add_argument(
            "--debug", action="store_true",
            help="verbose run diagnostics (ref run.py --debug): INFO "
            "Spark logs + DEBUG riskloc_spark logging",
        )

    sp = sub.add_parser("riskloc")
    common(sp)
    sp.add_argument("--risk-threshold", type=float, default=0.5)
    sp.add_argument("--pep-threshold", type=float, default=0.02)
    sp.add_argument("--n-remove", type=int, default=5)
    sp.add_argument("--remove-relative", type=_str2bool, nargs="?", const=True, default=False)
    sp.add_argument("--prune-elements", type=_str2bool, nargs="?", const=True, default=True)

    sp = sub.add_parser("autoroot")
    common(sp)
    sp.add_argument("--delta-threshold", type=float, default=0.25)

    sp = sub.add_parser("squeeze")
    common(sp)
    sp.add_argument("--ps-upper-bound", type=float, default=0.9)
    sp.add_argument("--max-num-elements-single-cluster", type=int, default=12)
    sp.add_argument(
        "--density-estimation-method",
        choices=["histogram", "kde"],
        default="histogram",
    )
    sp.add_argument(
        "--histogram-bar-width",
        type=lambda v: v if v == "auto" else float(v),
        default="auto",
    )
    sp.add_argument(
        "--max-normal-deviation",
        type=lambda v: v if v == "auto" else float(v),
        default=0.20,
    )

    sp = sub.add_parser("hotspot")
    common(sp)
    sp.add_argument("--pt", type=float, default=0.8)
    sp.add_argument("--m", type=int, default=200)
    sp.add_argument("--scoring", choices=["gps", "ps"], default="gps")

    sp = sub.add_parser("adtributor")
    common(sp)
    sp.add_argument("--tep", type=float, default=0.1)
    sp.add_argument("--teep", type=float, default=0.1)
    sp.add_argument("--k", type=int, default=3)

    sp = sub.add_parser("r_adtributor")
    common(sp)
    sp.add_argument("--teep", type=float, default=0.2)
    sp.add_argument("--k", type=int, default=3)

    sp = sub.add_parser("robustspot")
    common(sp)
    sp.add_argument("--k", type=int, default=3)
    sp.add_argument("--lambda-amplification", type=float, default=100)
    sp.add_argument("--contribution-ability-threshold", type=float, default=0.0)
    sp.add_argument("--confidence-threshold", type=float, default=0.8)

    # corpus-pipeline subcommands (no reference counterpart — the
    # LLM-data-pipeline surface): parquet in, parquet out, one JSON
    # status line on stdout
    pp = sub.add_parser(
        "pipeline",
        help="corpus pipeline ops over parquet (documents schema: "
        "doc_id, text[, source, lang])",
    )
    psub = pp.add_subparsers(dest="pipeline_op", required=True)

    def pcommon(sp2: argparse.ArgumentParser) -> None:
        sp2.add_argument("data", help="input parquet path")
        sp2.add_argument("--output", required=True, help="output parquet path")
        sp2.add_argument("--cpus", default=None)

    sp2 = psub.add_parser("curate", help="quality/lang filter + exact dedup")
    pcommon(sp2)
    sp2.add_argument("--min-quality", type=float, default=0.5)
    sp2.add_argument("--lang", default="en")

    sp2 = psub.add_parser(
        "curate-near-dup", help="quality/lang filter + MinHash near-dup"
    )
    pcommon(sp2)
    sp2.add_argument("--min-quality", type=float, default=0.5)
    sp2.add_argument("--lang", default="en")
    sp2.add_argument("--jaccard-threshold", type=float, default=0.5)

    sp2 = psub.add_parser(
        "curate-semantic",
        help="quality/lang filter + embedding near-dup (IVF-PQ SemDeDup)",
    )
    pcommon(sp2)
    sp2.add_argument(
        "--embeddings", required=True,
        help="parquet with (vec_id, embedding) aligned to doc_id",
    )
    sp2.add_argument("--min-quality", type=float, default=0.5)
    sp2.add_argument("--lang", default="en")
    sp2.add_argument("--cos-threshold", type=float, default=0.9)

    sp2 = psub.add_parser(
        "dedup-paragraphs",
        help="strip repeated boilerplate paragraphs, rebuild documents",
    )
    pcommon(sp2)

    sp2 = psub.add_parser(
        "sample", help="deterministic Bernoulli / per-stratum sampling"
    )
    pcommon(sp2)
    sp2.add_argument("--fraction", type=float, required=True)
    sp2.add_argument("--salt", default="")
    sp2.add_argument("--strata-col", help="sample per-stratum instead")
    sp2.add_argument(
        "--rate", action="append", default=[], metavar="VALUE=FRACTION",
        help="per-stratum rate (repeatable); --fraction is the default rate",
    )

    sp2 = psub.add_parser(
        "split", help="disjoint reproducible train/val/test split column"
    )
    pcommon(sp2)
    sp2.add_argument(
        "--weights", default="train=0.8,val=0.1,test=0.1",
        help="name=weight[,name=weight...]",
    )
    sp2.add_argument("--salt", default="split")
    sp2.add_argument(
        "--by-col", default="",
        help="leakage-safe GROUP split: assign whole groups (domain, "
        "user, source) keyed on this column instead of per document",
    )

    sp2 = psub.add_parser(
        "sample-alpha",
        help="temperature-mixture sampling: per-group token budgets "
        "proportional to size^alpha, taken to a total token target",
    )
    pcommon(sp2)
    sp2.add_argument("--total-tokens", type=int, required=True)
    sp2.add_argument("--alpha", type=float, default=0.5)
    sp2.add_argument("--group-col", default="source")

    sp2 = psub.add_parser(
        "decontaminate", help="drop documents overlapping a benchmark"
    )
    pcommon(sp2)
    sp2.add_argument(
        "--benchmark", required=True, help="benchmark parquet (text column)"
    )
    sp2.add_argument("--ngram", type=int, default=8)
    sp2.add_argument("--max-contamination", type=float, default=0.0)

    sp2 = psub.add_parser(
        "decontaminate-near-dup",
        help="drop documents that MinHash-near-duplicate a benchmark "
        "(catches paraphrased eval leakage exact n-grams miss)",
    )
    pcommon(sp2)
    sp2.add_argument(
        "--benchmark", required=True, help="benchmark parquet (text column)"
    )
    sp2.add_argument("--jaccard-threshold", type=float, default=0.5)
    sp2.add_argument("--bands", type=int, default=8)

    sp2 = psub.add_parser(
        "expect",
        help="data-quality expectations audit: per-rule violation "
        "counts in one scan; rules like col:not_null, col:unique, "
        "col:in_set:a|b, col:range:0:100, col:regex:^x$",
    )
    pcommon(sp2)
    sp2.add_argument(
        "--rule", action="append", required=True,
        help="repeatable rule spec (colon-separated; see --help)",
    )

    sp2 = psub.add_parser(
        "quality-percentile",
        help="keep each group's documents clearing that group's "
        "q-quantile of the heuristic quality score (sketch cutoffs, "
        "no global sort)",
    )
    pcommon(sp2)
    sp2.add_argument("--q", type=float, default=0.6)
    sp2.add_argument("--key-cols", default="lang",
                     help="comma-separated group keys")
    sp2.add_argument("--k", type=int, default=1024,
                     help="quantile-sketch sample size per group")

    sp2 = psub.add_parser(
        "decontaminate-spans",
        help="cut benchmark-matching n-token spans out of documents "
        "(keep the clean remainder) instead of dropping whole docs",
    )
    pcommon(sp2)
    sp2.add_argument(
        "--benchmark", required=True, help="benchmark parquet (text column)"
    )
    sp2.add_argument("--ngram", type=int, default=8)

    sp2 = psub.add_parser(
        "semantic-contamination",
        help="embedding-tier contamination audit: input is the corpus "
        "embeddings parquet (vec_id, embedding), output the complete "
        "per-item audit vs a benchmark embeddings parquet",
    )
    pcommon(sp2)
    sp2.add_argument(
        "--benchmark", required=True,
        help="benchmark embeddings parquet (vec_id, embedding)",
    )
    sp2.add_argument("--cos-threshold", type=float, default=0.8)
    sp2.add_argument(
        "--ivf-clusters", type=int, default=0,
        help="0 = exact broadcast audit; N > 0 = IVF co-cell pruned "
        "path with N coarse cells",
    )

    sp2 = psub.add_parser(
        "dedup-spans",
        help="remove repeated n-token spans corpus-wide (exact-substring "
        "dedup, Lee et al. 2022)",
    )
    pcommon(sp2)
    sp2.add_argument("--ngram", type=int, default=8)

    sp2 = psub.add_parser(
        "gopher-filter",
        help="Gopher quality rules (Rae et al. 2021); survivors only "
        "unless --audit",
    )
    pcommon(sp2)
    sp2.add_argument("--min-words", type=int, default=50)
    sp2.add_argument("--max-words", type=int, default=100_000)
    sp2.add_argument(
        "--audit", action="store_true",
        help="write every page with stats + reason + kept instead of "
        "filtering",
    )

    sp2 = psub.add_parser(
        "c4-clean", help="C4 line-level cleaning (Raffel et al. 2020)"
    )
    pcommon(sp2)
    sp2.add_argument("--min-line-words", type=int, default=3)
    sp2.add_argument("--min-kept-lines", type=int, default=1)

    sp2 = psub.add_parser(
        "redact-pii", help="redact emails / IPv4s / dashed phone numbers"
    )
    pcommon(sp2)

    sp2 = psub.add_parser(
        "tfidf", help="top-k characteristic terms per group by tf-idf"
    )
    pcommon(sp2)
    sp2.add_argument("--group-col", default="source")
    sp2.add_argument("--top-k", type=int, default=10)

    sp2 = psub.add_parser(
        "report",
        help="per-group corpus datasheet (counts, token totals, exact "
        "quantiles)",
    )
    pcommon(sp2)
    sp2.add_argument("--group-col", default="source")

    sp2 = psub.add_parser(
        "block-domains",
        help="drop documents containing a URL on a blocked domain",
    )
    pcommon(sp2)
    sp2.add_argument(
        "--domain", action="append", required=True,
        help="blocked domain (repeatable)",
    )

    sp2 = psub.add_parser(
        "langid",
        help="Cavnar-Trenkle n-gram language ID: fit profiles on the "
        "labeled rows, predict every row",
    )
    pcommon(sp2)
    sp2.add_argument("--lang-col", default="lang")
    sp2.add_argument("--profile-size", type=int, default=300)

    sp2 = psub.add_parser(
        "audio-features",
        help="decode WAV payloads (media_id, payload) to per-channel "
        "integer amplitude features",
    )
    pcommon(sp2)
    sp2.add_argument("--stride", type=int, default=1)

    sp2 = psub.add_parser(
        "video-frames",
        help="demux AVI payloads (media_id, payload), decode MJPEG "
        "frames at a temporal stride, emit per-frame pixel stats",
    )
    pcommon(sp2)
    sp2.add_argument("--every", type=int, default=1)

    sp2 = psub.add_parser(
        "sample-tokens",
        help="deterministic per-group sampling to a TOKEN budget "
        "(mixture weights in tokens, not rates)",
    )
    pcommon(sp2)
    sp2.add_argument("--group-col", default="source")
    sp2.add_argument(
        "--budget", action="append", default=[], metavar="GROUP=TOKENS",
        help="per-group token budget (repeatable)",
    )
    sp2.add_argument("--default-budget", type=int, default=None)
    sp2.add_argument("--salt", default="")

    sp2 = psub.add_parser(
        "top-ngrams",
        help="corpus-wide top-k word n-grams by document frequency "
        "(boilerplate mining)",
    )
    pcommon(sp2)
    sp2.add_argument("--ngram", type=int, default=3)
    sp2.add_argument("--top-k", type=int, default=20)

    sp2 = psub.add_parser(
        "chunk",
        help="split documents into fixed-token-window chunks with overlap",
    )
    pcommon(sp2)
    sp2.add_argument("--max-tokens", type=int, default=512)
    sp2.add_argument("--overlap", type=int, default=0)

    sp2 = psub.add_parser(
        "normalize",
        help="Unicode canonicalization: strip C0/C1/DEL controls, "
        "NFC-compose; adds before/after counts + changed flag",
    )
    pcommon(sp2)

    sp2 = psub.add_parser(
        "build-dedup-index",
        help="write the MinHash near-dup index for a base corpus "
        "(ingest-dedup probes it without rescanning the base)",
    )
    pcommon(sp2)

    sp2 = psub.add_parser(
        "ingest-dedup",
        help="dedupe an incoming batch against a build-dedup-index "
        "artifact; writes accepted (unmatched) docs",
    )
    pcommon(sp2)
    sp2.add_argument(
        "--index", required=True, help="parquet written by build-dedup-index"
    )
    sp2.add_argument("--jaccard-threshold", type=float, default=0.8)
    sp2.add_argument(
        "--matches-output", help="also write the (new_id, base_id, "
        "est_jaccard) match table here",
    )

    sp2 = psub.add_parser(
        "html-extract",
        help="strip HTML to text under block whitespace semantics "
        "(crawl -> documents; input needs doc_id + an html column)",
    )
    pcommon(sp2)
    sp2.add_argument("--html-col", default="html")
    sp2.add_argument(
        "--parser", choices=("regex", "tree"), default="regex",
        help="regex = codegen fast path; tree = stdlib tokenizer "
        "(robust to malformed real-world HTML)",
    )

    sp2 = psub.add_parser(
        "warc-extract",
        help="read WARC response records from a directory of .warc/"
        ".warc.gz files, HTTP-split, extract text (data arg = WARC dir)",
    )
    pcommon(sp2)
    sp2.add_argument(
        "--decode-bodies", action="store_true",
        help="decompress Content-Encoding bodies and sniff charsets "
        "(header > BOM > meta > utf-8) instead of the UTF-8 fast path",
    )

    sp2 = psub.add_parser(
        "curate-crawl",
        help="the full crawl path: WARC dir -> extract -> boilerplate "
        "paragraph removal -> quality/lang filter -> exact dedup "
        "(data arg = WARC dir)",
    )
    pcommon(sp2)
    sp2.add_argument("--min-quality", type=float, default=0.5)
    sp2.add_argument("--lang", default="en")
    sp2.add_argument("--keep-boilerplate", action="store_true")
    sp2.add_argument(
        "--parser", choices=("regex", "tree"), default="regex",
        help="regex = codegen fast path; tree = stdlib tokenizer "
        "(robust to malformed real-world HTML)",
    )
    sp2.add_argument(
        "--decode-bodies", action="store_true",
        help="decompress Content-Encoding bodies and sniff charsets "
        "(header > BOM > meta > utf-8) instead of the UTF-8 fast path",
    )
    sp2.add_argument("--max-link-density", type=float, default=None)

    sp2 = psub.add_parser(
        "image-dedup",
        help="image near-duplicate dedup: dhash -> banded pairs -> "
        "connected components -> keep min-id representative "
        "(input needs media_id + a binary payload column)",
    )
    pcommon(sp2)
    sp2.add_argument("--max-hamming", type=int, default=4)

    sp2 = psub.add_parser(
        "shard",
        help="deterministic global shuffle + training-shard export "
        "(shard=K/ parquet dirs; rows carry pos for order restore)",
    )
    pcommon(sp2)
    sp2.add_argument("--n-shards", type=int, default=64)
    sp2.add_argument("--salt", default="shuffle")

    sp2 = psub.add_parser(
        "url-dedup",
        help="canonicalize URLs (fragments/case/ports/tracking params) "
        "and keep the first document per canonical URL",
    )
    pcommon(sp2)
    sp2.add_argument("--uri-col", default="target_uri")

    sp2 = psub.add_parser(
        "sentences",
        help="rule-based sentence splitting: one row per sentence with "
        "dense indices",
    )
    pcommon(sp2)

    sp2 = psub.add_parser(
        "classify",
        help="hashed char-n-gram NB: fit on --label-col over the "
        "--train-mod id split, score every document",
    )
    pcommon(sp2)
    sp2.add_argument("--label-col", default="label")
    sp2.add_argument("--buckets", type=int, default=4096)
    sp2.add_argument(
        "--train-mod", type=int, default=1,
        help="fit on doc_id %% mod == 0 (1 = fit on everything)",
    )

    sp2 = psub.add_parser(
        "link-graph",
        help="anchor extraction + URL resolution over (url, html) rows "
        "-> one row per resolved link with its lowercased host",
    )
    pcommon(sp2)
    sp2.add_argument("--url-col", default="url")
    sp2.add_argument("--html-col", default="html")

    sp2 = psub.add_parser(
        "pagerank",
        help="host-level webgraph + fixed-point integer PageRank over "
        "(url, html) pages: extract links, aggregate the host graph, "
        "rank hosts (score = 1e12 fixed-point probability mass)",
    )
    pcommon(sp2)
    sp2.add_argument("--url-col", default="url")
    sp2.add_argument("--html-col", default="html")
    sp2.add_argument("--iterations", type=int, default=5)

    sp2 = psub.add_parser(
        "ppl-buckets",
        help="CCNet-style per-language perplexity bucketing: trigram-LM "
        "score each doc, cut each language into head/middle/tail",
    )
    pcommon(sp2)
    sp2.add_argument("--n-buckets", type=int, default=3)

    sp2 = psub.add_parser(
        "hll",
        help="HyperLogLog distinct-count sketch: build the mergeable "
        "(key, bucket, rank) register table, or estimate from one",
    )
    pcommon(sp2)
    sp2.add_argument("--value-col", required=True)
    sp2.add_argument("--key-cols", default="",
                     help="comma-separated group keys (optional)")
    sp2.add_argument("--precision", type=int, default=12)
    sp2.add_argument("--estimate", action="store_true",
                     help="input is a register table: emit estimates")

    sp2 = psub.add_parser(
        "bm25",
        help="BM25 top-k retrieval: score (query_id, query) rows from "
        "--queries parquet against the document corpus",
    )
    pcommon(sp2)
    sp2.add_argument("--queries", required=True,
                     help="parquet with (query_id, query) rows")
    sp2.add_argument("--topk", type=int, default=10)
    sp2.add_argument("--text-col", default="text")

    sp2 = psub.add_parser(
        "zorder",
        help="rewrite parquet tiled along the Z-curve of the given "
        "columns (multi-column range pruning layout)",
    )
    pcommon(sp2)
    sp2.add_argument("--cols", required=True,
                     help="comma-separated numeric columns")
    sp2.add_argument("--bits", type=int, default=16)
    sp2.add_argument("--partitions", type=int, default=0)

    sp2 = psub.add_parser(
        "quantiles",
        help="mergeable bottom-k quantile sketch: build the (key..., "
        "h, value) sample table, or estimate quantiles from one",
    )
    pcommon(sp2)
    sp2.add_argument("--value-col", required=True)
    sp2.add_argument("--id-col", default="doc_id",
                     help="unique row id the sample membership hashes")
    sp2.add_argument("--key-cols", default="",
                     help="comma-separated group keys (optional)")
    sp2.add_argument("--k", type=int, default=1024)
    sp2.add_argument("--salt", type=int, default=0)
    sp2.add_argument("--estimate", default="",
                     help="input is a sketch table: emit these "
                     "comma-separated quantile fractions")

    sp2 = psub.add_parser(
        "bpe-fit",
        help="learn a BPE merge table from the corpus; output is the "
        "(rank, a, b) merge table, --save also persists it as the "
        "reusable tokenizer artifact",
    )
    pcommon(sp2)
    sp2.add_argument("--merges", type=int, default=200)
    sp2.add_argument("--sample-docs", type=int, default=10_000)
    sp2.add_argument("--save", default="",
                     help="also persist the merge table artifact here "
                     "(load with bpe-count --model)")

    sp2 = psub.add_parser(
        "bpe-count",
        help="per-document BPE token counts under a persisted merge "
        "table (bpe-fit --save)",
    )
    pcommon(sp2)
    sp2.add_argument("--model", required=True,
                     help="merge-table artifact path from bpe-fit --save")

    sp2 = psub.add_parser(
        "scd2",
        help="type-2 slowly-changing-dimension history from a change "
        "feed: one row per version with validity intervals",
    )
    pcommon(sp2)
    sp2.add_argument("--keys", required=True,
                     help="comma-separated dimension key columns")
    sp2.add_argument("--ts-col", required=True)
    sp2.add_argument("--attrs", required=True,
                     help="comma-separated tracked attribute columns")

    sp2 = psub.add_parser(
        "cdc-apply",
        help="apply an upsert/delete change feed to a snapshot "
        "(MERGE INTO shape); input parquet is the snapshot",
    )
    pcommon(sp2)
    sp2.add_argument("--changes", required=True,
                     help="parquet with (keys..., ts, op, attrs...)")
    sp2.add_argument("--keys", required=True)
    sp2.add_argument("--ts-col", required=True)
    sp2.add_argument("--attrs", required=True)
    sp2.add_argument("--op-col", default="op")
    sp2.add_argument("--delete-op", default="delete")

    sp2 = psub.add_parser(
        "fuzzy-join",
        help="match keys within a small Levenshtein distance via the "
        "deletion-neighborhood blocked equi-join; input parquet is "
        "the left side",
    )
    pcommon(sp2)
    sp2.add_argument("--right", required=True,
                     help="parquet with the right-side rows")
    sp2.add_argument("--key", required=True,
                     help="key column name (same on both sides)")
    sp2.add_argument("--max-distance", type=int, default=1,
                     choices=(1, 2))
    sp2.add_argument("--left-id", default=None)
    sp2.add_argument("--right-id", default=None)

    sp2 = psub.add_parser(
        "heavy-hitters",
        help="top-k most frequent values per key via the bottom-k "
        "candidate sample composed with Count-Min estimates",
    )
    pcommon(sp2)
    sp2.add_argument("--value-col", required=True)
    sp2.add_argument("--id-col", default="doc_id")
    sp2.add_argument("--key-cols", default="")
    sp2.add_argument("--top-k", type=int, default=20)
    sp2.add_argument("--sample-k", type=int, default=4096)
    sp2.add_argument("--width", type=int, default=1024)
    sp2.add_argument("--depth", type=int, default=4)

    return p


def run_pipeline(spark, args) -> dict:
    """Dispatch a `pipeline` subcommand: read parquet, run the operator,
    write parquet, return the status record printed as JSON."""
    op = args.pipeline_op
    # warc-extract's input is a directory of WARC files, not parquet
    df = (
        None
        if op in ("warc-extract", "curate-crawl")
        else spark.read.parquet(args.data)
    )
    if op == "curate":
        from riskloc_spark.operators.corpus import curate_corpus

        out = curate_corpus(df, args.min_quality, args.lang or None)
    elif op == "curate-near-dup":
        from riskloc_spark.operators.corpus import curate_corpus_near_dup

        out = curate_corpus_near_dup(
            df, args.min_quality, args.lang or None,
            jaccard_threshold=args.jaccard_threshold,
        )
    elif op == "curate-semantic":
        from riskloc_spark.operators.corpus import curate_corpus_semantic

        emb = spark.read.parquet(args.embeddings)
        out = curate_corpus_semantic(
            df, emb, args.min_quality, args.lang or None,
            cos_threshold=args.cos_threshold,
        )
    elif op == "dedup-paragraphs":
        from riskloc_spark.operators.dedup import remove_duplicate_paragraphs

        out = remove_duplicate_paragraphs(df)
    elif op == "sample":
        if args.strata_col:
            from riskloc_spark.operators.sampling import stratified_sample

            rates = {}
            for spec in args.rate:
                k, _, v = spec.partition("=")
                rates[k] = float(v)
            out = stratified_sample(
                df, rates, args.strata_col, salt=args.salt,
                default_fraction=args.fraction,
            )
        else:
            from riskloc_spark.operators.sampling import deterministic_sample

            out = deterministic_sample(df, args.fraction, salt=args.salt)
    elif op == "split":
        from riskloc_spark.operators.sampling import (
            group_split,
            hash_split,
        )

        weights = {}
        for spec in args.weights.split(","):
            k, _, v = spec.partition("=")
            weights[k] = float(v)
        if args.by_col:
            out = group_split(
                df, weights, args.by_col, salt=args.salt
            )
        else:
            out = hash_split(df, weights, salt=args.salt)
    elif op == "sample-alpha":
        from pyspark.sql import functions as F

        from riskloc_spark.functions.text import token_count
        from riskloc_spark.operators.sampling import (
            alpha_mixture_sample,
        )

        if "n_tokens" not in df.columns:
            df = df.withColumn(
                "n_tokens", token_count(F.col("text")).cast("long")
            )
        out = alpha_mixture_sample(
            df, total_tokens=args.total_tokens, alpha=args.alpha,
            group_col=args.group_col,
        )
    elif op == "decontaminate-near-dup":
        from riskloc_spark.operators.decontamination import (
            decontaminate_near_dup,
        )

        bench = spark.read.parquet(args.benchmark)
        out = decontaminate_near_dup(
            df, bench,
            jaccard_threshold=args.jaccard_threshold,
            bands=args.bands,
        )
    elif op == "expect":
        from riskloc_spark.operators.expectations import (
            validate_expectations,
        )

        rules = []
        for spec in args.rule:
            parts = spec.split(":", 2)
            col, kind = parts[0], parts[1]
            rule = {"col": col, "kind": kind}
            if kind == "in_set":
                rule["values"] = parts[2].split("|")
            elif kind == "range":
                lo, _, hi = parts[2].partition(":")
                if lo:
                    rule["min"] = float(lo)
                if hi:
                    rule["max"] = float(hi)
            elif kind == "regex":
                rule["pattern"] = parts[2]
            rules.append(rule)
        out = validate_expectations(df, rules)
    elif op == "quality-percentile":
        from riskloc_spark.operators.corpus import (
            quality_percentile_filter,
        )

        keys = tuple(k for k in args.key_cols.split(",") if k)
        out = quality_percentile_filter(
            df, q=args.q, key_cols=keys, k=args.k
        )
    elif op == "decontaminate-spans":
        from riskloc_spark.operators.decontamination import (
            excise_contaminated_spans,
        )

        bench = spark.read.parquet(args.benchmark)
        out = excise_contaminated_spans(df, bench, n=args.ngram)
    elif op == "semantic-contamination":
        from riskloc_spark.operators.decontamination import (
            semantic_contamination_stats,
            semantic_contamination_stats_ivf,
        )

        bench = spark.read.parquet(args.benchmark)
        if args.ivf_clusters > 0:
            out = semantic_contamination_stats_ivf(
                df, bench, cos_threshold=args.cos_threshold,
                n_clusters=args.ivf_clusters,
            )
        else:
            out = semantic_contamination_stats(
                df, bench, cos_threshold=args.cos_threshold
            )
    elif op == "decontaminate":
        from riskloc_spark.operators.decontamination import decontaminate

        bench = spark.read.parquet(args.benchmark)
        out = decontaminate(
            df, bench, n=args.ngram,
            max_contamination=args.max_contamination,
        )
    elif op == "dedup-spans":
        from riskloc_spark.operators.dedup import remove_duplicate_spans

        out = remove_duplicate_spans(df, n=args.ngram)
    elif op == "gopher-filter":
        from pyspark.sql import functions as F

        from riskloc_spark.functions.quality import gopher_quality

        out = gopher_quality(
            df, min_words=args.min_words, max_words=args.max_words
        )
        if not args.audit:
            out = out.filter(F.col("kept")).select(*df.columns)
    elif op == "c4-clean":
        from riskloc_spark.functions.quality import c4_clean

        out = c4_clean(
            df,
            min_line_words=args.min_line_words,
            min_kept_lines=args.min_kept_lines,
        )
    elif op == "redact-pii":
        from riskloc_spark.functions.quality import redact_pii

        out = redact_pii(df)
    elif op == "tfidf":
        from riskloc_spark.functions.quality import tfidf_top_terms

        out = tfidf_top_terms(df, group_col=args.group_col, k=args.top_k)
    elif op == "report":
        from riskloc_spark.functions.quality import corpus_report

        out = corpus_report(df, group_col=args.group_col)
    elif op == "block-domains":
        from riskloc_spark.functions.quality import filter_blocked_domains

        out = filter_blocked_domains(df, tuple(args.domain))
    elif op == "langid":
        from riskloc_spark.functions.langid import (
            classify_language,
            doc_gram_counts,
            lang_profiles,
        )

        # one shared corpus explode for fit + classify (round 10)
        counts = doc_gram_counts(df).localCheckpoint(eager=True)
        prof = lang_profiles(
            df, lang_col=args.lang_col, k=args.profile_size,
            doc_counts=counts,
        )
        out = classify_language(
            df, prof, k=args.profile_size, doc_counts=counts
        )
    elif op == "audio-features":
        from riskloc_spark.operators.audio import audio_features

        out = audio_features(df, stride=args.stride)
    elif op == "video-frames":
        from riskloc_spark.operators.video import video_frame_stats

        out = video_frame_stats(df, every=args.every)
    elif op == "sample-tokens":
        from pyspark.sql import functions as F

        from riskloc_spark.functions.text import token_count
        from riskloc_spark.operators.sampling import token_budget_sample

        budgets = {}
        for spec in args.budget:
            k, _, v = spec.partition("=")
            budgets[k] = int(v)
        if "n_tokens" not in df.columns:
            df = df.withColumn(
                "n_tokens", token_count(F.col("text")).cast("long")
            )
        out = token_budget_sample(
            df, budgets, group_col=args.group_col, salt=args.salt,
            default_budget=args.default_budget,
        )
    elif op == "top-ngrams":
        from riskloc_spark.operators.dedup import frequent_ngrams

        out = frequent_ngrams(df, n=args.ngram, top_k=args.top_k)
    elif op == "chunk":
        from riskloc_spark.operators.packing import chunk_documents

        out = chunk_documents(
            df, max_tokens=args.max_tokens, overlap=args.overlap
        )
    elif op == "normalize":
        from riskloc_spark.functions.text import normalize_text

        out = normalize_text(df)
    elif op == "build-dedup-index":
        from riskloc_spark.operators.dedup import build_near_dup_index

        out = build_near_dup_index(df)
    elif op == "ingest-dedup":
        from riskloc_spark.operators.dedup import (
            accept_new_documents,
            incremental_near_dup,
        )

        index = spark.read.parquet(args.index)
        matches = incremental_near_dup(
            df, index, jaccard_threshold=args.jaccard_threshold
        )
        if args.matches_output:
            matches.write.mode("overwrite").parquet(args.matches_output)
            # re-read: accept must not recompute the probe twice
            matches = spark.read.parquet(args.matches_output)
        out = accept_new_documents(df, matches)
    elif op == "html-extract":
        from riskloc_spark.operators.html import extract_html_docs

        out = extract_html_docs(
            df, html_col=args.html_col, parser=args.parser
        )
    elif op == "warc-extract":
        from pyspark.sql import functions as F

        from riskloc_spark.operators.html import html_to_text
        from riskloc_spark.sources.warc import (
            http_response_parts,
            read_warc_records,
        )

        recs = read_warc_records(spark, args.data)
        responses = recs.filter(F.col("warc_type") == "response")
        if args.decode_bodies:
            from riskloc_spark.sources.warc import decode_http_bodies

            parts = decode_http_bodies(responses)
        else:
            parts = http_response_parts(responses)
        out = parts.select(
            "record_id",
            "target_uri",
            "warc_date",
            "http_status",
            "content_type",
            html_to_text(F.col("body")).alias("text"),
        )
    elif op == "curate-crawl":
        from riskloc_spark.operators.corpus import curate_from_crawl

        out = curate_from_crawl(
            spark, args.data,
            min_quality=args.min_quality,
            lang=args.lang or None,
            drop_boilerplate=not args.keep_boilerplate,
            max_link_density=args.max_link_density,
            parser=args.parser,
            decode_bodies=args.decode_bodies,
        )
    elif op == "image-dedup":
        from riskloc_spark.operators.multimodal import image_dedup

        out = image_dedup(df, max_hamming=args.max_hamming)
    elif op == "shard":
        from riskloc_spark.operators.sampling import write_training_shards

        # the writer writes the shard=K/ dirs itself; the manifest goes
        # to a sibling path and the standard return reads the export
        manifest = write_training_shards(
            df, args.output, args.n_shards, salt=args.salt
        )
        manifest.write.mode("overwrite").parquet(
            args.output + "_manifest"
        )
        written = spark.read.parquet(args.output)
        return {
            "pipeline_op": op,
            "input_rows": df.count(),
            "output_rows": written.count(),
            "output": args.output,
        }
    elif op == "url-dedup":
        from riskloc_spark.operators.dedup import url_dedup

        out = url_dedup(df, uri_col=args.uri_col)
    elif op == "sentences":
        from riskloc_spark.functions.text import split_sentences

        out = split_sentences(df)
    elif op == "classify":
        from pyspark.sql import functions as F

        from riskloc_spark.functions.classifier import (
            fit_text_classifier,
            score_text_classifier,
        )

        train = (
            df
            if args.train_mod <= 1
            else df.filter(F.col("doc_id") % args.train_mod == 0)
        )
        model = fit_text_classifier(
            train, label_col=args.label_col, n_buckets=args.buckets
        )
        out = score_text_classifier(df, model)
    elif op == "link-graph":
        from riskloc_spark.operators.graph import extract_links

        out = extract_links(
            df, html_col=args.html_col, url_col=args.url_col,
            keep=[args.url_col],
        )
    elif op == "pagerank":
        from riskloc_spark.operators.graph import (
            extract_links,
            host_graph,
            pagerank,
        )

        links = extract_links(
            df, html_col=args.html_col, url_col=args.url_col,
            keep=[args.url_col],
        )
        out = pagerank(
            host_graph(links, src_url_col=args.url_col),
            iterations=args.iterations,
        )
    elif op == "ppl-buckets":
        from riskloc_spark.functions.text import perplexity_buckets

        out = perplexity_buckets(df, n_buckets=args.n_buckets)
    elif op == "hll":
        from riskloc_spark.operators.sketches import (
            hll_estimate,
            hll_sketch,
        )

        keys = [k for k in args.key_cols.split(",") if k]
        if args.estimate:
            out = hll_estimate(df, key_cols=keys, p=args.precision)
        else:
            out = hll_sketch(
                df, args.value_col, key_cols=keys, p=args.precision
            )
    elif op == "bm25":
        from riskloc_spark.operators.retrieval import bm25_topk

        qs = spark.read.parquet(args.queries)
        out = bm25_topk(
            df, qs, topk=args.topk, text_col=args.text_col
        )
    elif op == "quantiles":
        from riskloc_spark.operators.quantiles import (
            quantile_estimate,
            quantile_sketch,
        )

        keys = [k for k in args.key_cols.split(",") if k]
        if args.estimate:
            qs = [float(x) for x in args.estimate.split(",") if x]
            out = quantile_estimate(df, qs, key_cols=keys)
        else:
            out = quantile_sketch(
                df, args.value_col, args.id_col, key_cols=keys,
                k=args.k, salt=args.salt,
            )
    elif op == "bpe-fit":
        from riskloc_spark.functions.bpe import bpe_fit, save_bpe

        merges = bpe_fit(
            df, num_merges=args.merges, sample_docs=args.sample_docs
        )
        if args.save:
            save_bpe(spark, merges, args.save)
        from riskloc_spark.data import local_rows_df

        out = local_rows_df(
            spark,
            [(i, a, b) for i, (a, b) in enumerate(merges)],
            "rank int, a string, b string",
        )
    elif op == "bpe-count":
        from riskloc_spark.functions.bpe import bpe_token_counts, load_bpe

        out = bpe_token_counts(df, load_bpe(spark, args.model))
    elif op == "scd2":
        from riskloc_spark.operators.temporal import scd2_history

        out = scd2_history(
            df,
            args.keys.split(","),
            args.ts_col,
            args.attrs.split(","),
        )
    elif op == "cdc-apply":
        from riskloc_spark.operators.temporal import cdc_apply

        changes = spark.read.parquet(args.changes)
        out = cdc_apply(
            df,
            changes,
            args.keys.split(","),
            args.ts_col,
            args.attrs.split(","),
            op_col=args.op_col,
            delete_op=args.delete_op,
        )
    elif op == "fuzzy-join":
        from riskloc_spark.operators.fuzzy import fuzzy_join

        right = spark.read.parquet(args.right)
        out = fuzzy_join(
            df, right, args.key,
            max_distance=args.max_distance,
            left_id=args.left_id, right_id=args.right_id,
        )
    elif op == "heavy-hitters":
        from riskloc_spark.operators.cms import heavy_hitters

        keys = [k for k in args.key_cols.split(",") if k]
        out = heavy_hitters(
            df, args.value_col, args.id_col, key_cols=keys,
            top_k=args.top_k, sample_k=args.sample_k,
            width=args.width, depth=args.depth,
        )
    elif op == "zorder":
        from riskloc_spark.operators.zorder import write_zordered

        write_zordered(
            df, args.output, args.cols.split(","), bits=args.bits,
            partitions=args.partitions or None,
        )
        written = spark.read.parquet(args.output)
        return {
            "pipeline_op": op,
            "input_rows": df.count(),
            "output_rows": written.count(),
            "output": args.output,
        }
    else:  # pragma: no cover - argparse enforces choices
        raise ValueError(op)
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    return {
        "pipeline_op": op,
        "input_rows": df.count() if df is not None else None,
        "output_rows": written.count(),
        "output": args.output,
    }


def run_method(df, attributes, algorithm, derived, opts, rs_data=False):
    """Dispatch (ref utils/run_utils.py:14-56) with per-algorithm args."""
    if algorithm == "riskloc":
        from riskloc_spark.operators.riskloc import riskloc

        return riskloc(df, attributes, derived=derived, **opts)
    if algorithm == "autoroot":
        from riskloc_spark.operators.autoroot import autoroot

        return autoroot(df, attributes, **opts)
    if algorithm == "squeeze":
        from riskloc_spark.operators.squeeze import SqueezeOptions, squeeze

        return squeeze(
            df, attributes, options=SqueezeOptions(**opts), derived=derived
        )
    if algorithm == "hotspot":
        from riskloc_spark.operators.hotspot import hotspot

        return [hotspot(df, attributes, **opts)]
    if algorithm == "adtributor":
        from riskloc_spark.operators.adtributor import adtributor

        return adtributor(df, attributes, derived=derived, **opts)
    if algorithm == "r_adtributor":
        from riskloc_spark.operators.adtributor import rev_rec_adtributor

        return rev_rec_adtributor(df, attributes, derived=derived, **opts)
    if algorithm == "robustspot":
        from riskloc_spark.operators.robustspot import robustspot

        # RS-format frames already carry failure counts in the a measure;
        # skip the reference's success->failure flip (see adapt_frame)
        return robustspot(
            df, attributes, derived=derived, flip_derived=not rs_data, **opts
        )
    raise ValueError(f"method {algorithm} not implemented")


# --------------------------------------------------------------------------
# labels (ref run_utils.py get_label / robustspot_data_utils)
# --------------------------------------------------------------------------

def _read_anomaly_yaml(path: str) -> list[dict]:
    """anomaly.yaml: list of {data, timestamp, cause} entries where cause
    is a list of flat dicts (ref robustspot_data_utils.get_rs_anomaly).
    Uses pyyaml when importable, else a minimal parser for that shape."""
    text = open(path, encoding="utf-8").read()
    try:
        import yaml  # type: ignore

        return yaml.safe_load(text)
    except ImportError:
        entries: list[dict] = []
        cur: dict = {}
        cause_item: dict = {}
        in_cause = False
        item_indent = 0
        for raw in text.splitlines():
            if not raw.strip() or raw.strip().startswith("#"):
                continue
            indent = len(raw) - len(raw.lstrip())
            body = raw.strip()
            if indent == 0 and body.startswith("- "):
                cur = {}
                entries.append(cur)
                in_cause = False
                body = body[2:]
                if ":" not in body:
                    continue
            elif body.startswith("- ") and in_cause:
                cause_item = {}
                cur["cause"].append(cause_item)
                item_indent = indent
                body = body[2:]
                if ":" not in body:
                    continue
                k, v = body.split(":", 1)
                cause_item[k.strip()] = _yaml_scalar(v)
                continue
            if ":" in body:
                k, v = body.split(":", 1)
                k, v = k.strip(), v.strip()
                if k == "cause" and v == "":
                    cur["cause"] = []
                    in_cause = True
                elif in_cause and indent > item_indent:
                    cause_item[k] = _yaml_scalar(v)
                else:
                    in_cause = False
                    cur[k] = _yaml_scalar(v)
        return entries


def _yaml_scalar(v: str):
    v = v.strip()
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
        return v[1:-1]  # quoted -> always a string
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


def _rs_anomaly(directory: str, file_stem: str) -> dict:
    entries = _read_anomaly_yaml(os.path.join(directory, "anomaly.yaml"))
    return [d for d in entries if str(d.get("data")) == file_stem][0]


def rs_label(directory: str, file_stem: str) -> str:
    """'d=v&d=v;...' label from anomaly.yaml (ref
    robustspot_data_utils.get_rs_label)."""
    causes = _rs_anomaly(directory, file_stem)["cause"]
    if not isinstance(causes, list):
        causes = [causes]
    return ";".join(
        "&".join(f"{k}={v}" for k, v in c.items()) for c in causes
    )


def injection_label(directory: str, file_stem: str) -> str | None:
    """Label from injection_info.csv (columns timestamp,set) — ref
    run_utils.get_label."""
    import csv

    path = os.path.join(directory, "injection_info.csv")
    if not os.path.exists(path):
        return None
    with open(path, newline="", encoding="utf-8") as fh:
        for row in csv.DictReader(fh):
            if str(row.get("timestamp")) == file_stem:
                return row.get("set")
    return None


# --------------------------------------------------------------------------
# batch mode (ref run.py:10-36, run_utils.get_instances /
# result_post_processing)
# --------------------------------------------------------------------------

def get_instances(root: str) -> list[tuple[str, str, str, str]]:
    """(dataset, subdir, file_stem, dirpath) for every instance file in
    every deepest-level directory under root (ref run_utils.py:111-140)."""
    instances = []
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        if dirnames:
            continue
        rel = os.path.relpath(dirpath, root)
        parts = [] if rel == "." else rel.split(os.sep)
        dataset = parts[0] if parts else os.path.basename(os.path.abspath(root))
        subdir = os.path.join(*parts[1:]) if len(parts) > 1 else ""
        stems = sorted(
            {
                f.split(".")[0]
                for f in filenames
                if f not in ("injection_info.csv", "anomaly.yaml")
                and not f.startswith(".")
            }
        )
        for s in stems:
            instances.append((dataset, subdir, s, dirpath))
    return instances


def run_instance(spark, dirpath, file_stem, algorithm, opts, derived, rs_data):
    """One instance: read, run, score (ref run.py:56-95). Returns
    (F1, TP, FP, FN, runtime, preds, label)."""
    from riskloc_spark.evaluation import (
        f1 as f1_of,
        root_cause_postprocessing,
        score_root_causes,
    )
    from riskloc_spark.sources import (
        read_rca_csv,
        read_rca_csv_derived,
        read_robustspot_csv,
    )

    if rs_data:
        anomaly = _rs_anomaly(dirpath, file_stem)
        df, attributes = read_robustspot_csv(
            spark, os.path.join(dirpath, file_stem + ".csv"), int(anomaly["timestamp"])
        )
        label = rs_label(dirpath, file_stem)
    elif derived:
        base = os.path.join(dirpath, file_stem)
        df, attributes = read_rca_csv_derived(spark, base + ".a.csv", base + ".b.csv")
        label = injection_label(dirpath, file_stem)
    else:
        df, attributes = read_rca_csv(spark, os.path.join(dirpath, file_stem + ".csv"))
        label = injection_label(dirpath, file_stem)

    start = time.time()
    root_causes = run_method(df, attributes, algorithm, derived, opts, rs_data)
    preds = root_cause_postprocessing(root_causes, algorithm)
    runtime = time.time() - start

    if label is None:
        return None, 0, 0, 0, runtime, preds, label
    tp, fp, fn, _ = score_root_causes(preds, label)
    return f1_of(tp, fp, fn), tp, fp, fn, runtime, preds, label


def run_directory(spark, root, algorithm, opts, derived_flag, suffix, output_dir):
    """Batch run + aggregate-F1 csvs (ref run.py:10-36,
    run_utils.result_post_processing)."""
    import numpy as np
    import pandas as pd

    rows = []
    for dataset, subdir, stem, dirpath in get_instances(root):
        derived = derived_flag if derived_flag is not None else dataset in ("D", "RS")
        rs_data = dataset == "RS"
        f1_v, tp, fp, fn, runtime, preds, label = run_instance(
            spark, dirpath, stem, algorithm, opts, derived, rs_data
        )
        print(
            json.dumps(
                {
                    "dataset": dataset,
                    "folder": subdir,
                    "file": stem,
                    "f1": f1_v,
                    "root_causes": list(preds),
                    "label": label,
                }
            )
        )
        rows.append((dataset, subdir, stem, f1_v, tp, fp, fn, runtime))

    df = pd.DataFrame(
        rows, columns=["Dataset", "Folder", "File", "F1", "TP", "FP", "FN", "Time"]
    ).sort_values(["Dataset", "Folder"])

    summary = df.copy()
    # ref result_post_processing: the A dataset's folder names encode
    # (elements, layer); regroup them for the summary
    a_split = (
        "layer_" + summary["Folder"].str.split("_").str[-1]
        + "_elements_" + summary["Folder"].str.split("_").str[-3]
    )
    summary["Folder"] = np.where(summary["Dataset"] == "A", a_split, summary["Folder"])
    summary = (
        summary.groupby(["Dataset", "Folder"], as_index=False)
        .agg({"TP": "sum", "FP": "sum", "FN": "sum", "Time": "sum"})
        .sort_values(["Dataset", "Folder"])
    )
    summary["F1-score"] = 2 * summary["TP"] / (
        2 * summary["TP"] + summary["FP"] + summary["FN"]
    )

    os.makedirs(output_dir, exist_ok=True)
    df.to_csv(os.path.join(output_dir, f"{algorithm}-all{suffix}.csv"), index=False)
    summary.to_csv(
        os.path.join(output_dir, f"{algorithm}-summary{suffix}.csv"), index=False
    )
    print(summary.to_string(index=False))
    return df, summary


def _csv_suffix(output_suffix: str, opts: dict) -> str:
    # ref run.py:107-110
    argument_list = [k + "-" + str(v).replace(".", "") for k, v in opts.items()]
    suffix = "-".join(["", output_suffix, *argument_list])
    return suffix if output_suffix != "" else "-" + "-".join(argument_list)


def main(argv: list[str] | None = None) -> int:
    p = build_parser()
    args = p.parse_args(argv)

    from riskloc_spark.session import get_spark

    if args.algorithm == "pipeline":
        spark = get_spark(
            "riskloc-spark-pipeline",
            master=f"local[{args.cpus}]" if args.cpus else None,
        )
        spark.sparkContext.setLogLevel("ERROR")
        print(json.dumps(run_pipeline(spark, args)))
        return 0

    opts = {k: getattr(args, k) for k in ALGO_OPTIONS[args.algorithm]}

    spark = get_spark(
        "riskloc-spark-cli", master=f"local[{args.cpus}]" if args.cpus else None
    )
    if args.debug:
        import logging

        logging.basicConfig(level=logging.DEBUG)
        logging.getLogger("riskloc_spark").setLevel(logging.DEBUG)
        spark.sparkContext.setLogLevel("INFO")
    else:
        spark.sparkContext.setLogLevel("ERROR")

    if os.path.isdir(args.data):
        run_directory(
            spark,
            args.data,
            args.algorithm,
            opts,
            args.derived,
            _csv_suffix(args.output_suffix, opts),
            args.output_dir,
        )
        return 0

    from riskloc_spark.evaluation import root_cause_postprocessing, score_root_causes
    from riskloc_spark.sources import (
        read_rca_csv,
        read_rca_csv_derived,
        read_robustspot_csv,
    )

    base = args.data[:-4] if args.data.endswith(".csv") else args.data
    derived = args.derived
    if derived is None:
        derived = os.path.exists(base + ".a.csv") and not args.rs_data

    if args.rs_data:
        if args.timestamp is None:
            p.error("--rs-data requires --timestamp")
        df, attributes = read_robustspot_csv(spark, args.data, args.timestamp)
        derived = True
    elif derived:
        df, attributes = read_rca_csv_derived(spark, base + ".a.csv", base + ".b.csv")
    else:
        df, attributes = read_rca_csv(spark, args.data)

    root_causes = run_method(
        df, attributes, args.algorithm, derived, opts, args.rs_data
    )
    preds = root_cause_postprocessing(root_causes, args.algorithm)
    out = {"algorithm": args.algorithm, "root_causes": list(preds)}
    if args.label:
        tp, fp, fn, _ = score_root_causes(preds, args.label)
        denom = 2 * tp + fp + fn
        out |= {"tp": tp, "fp": fp, "fn": fn, "f1": 2 * tp / denom if denom else 0.0}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
