"""CLI end-to-end: the reference run.py workflow — load case, localize,
score F1 against the label."""
import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def run_cli_parallel(cmds, timeout=300):
    """Launch INDEPENDENT CLI invocations concurrently and wait for all.

    Each subprocess is its own JVM (~8s startup): running back-to-back,
    a 3-invocation e2e test pays the startup serially three times —
    these tests were the suite's largest wall-time block (and the suite
    timed out in the r15 driver harness, VERIFY_r15 tests_ok=false).
    Only invocations with no data dependency between them are batched;
    dependent steps stay in later waves.  Returns CompletedProcess-like
    results in cmd order."""
    procs = [
        subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True
        )
        for cmd in cmds
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        results.append(
            subprocess.CompletedProcess(p.args, p.returncode, out, err)
        )
    return results


@pytest.fixture(scope="module")
def case_csv(tmp_path_factory):
    rng = np.random.default_rng(4)
    rows = []
    for a in [f"a{i}" for i in range(5)]:
        for b in [f"b{i}" for i in range(5)]:
            for c in [f"c{i}" for i in range(4)]:
                predict = float(rng.uniform(50, 150))
                real = predict * (1 + rng.uniform(-0.02, 0.02))
                if a == "a3" and b == "b1":
                    real = predict * (1 - 0.8 - rng.uniform(0, 0.1))
                rows.append((a, b, c, real, predict))
    pdf = pd.DataFrame(rows, columns=["a", "b", "c", "real", "predict"])
    p = tmp_path_factory.mktemp("cli") / "case.csv"
    pdf.to_csv(p, index=False)
    return str(p)


def test_cli_riskloc_with_label(case_csv):
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "riskloc", case_csv,
            "--label", "a=a3&b=b1", "--risk-threshold", "0.3", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["algorithm"] == "riskloc"
    assert "a=a3&b=b1" in out["root_causes"]
    assert out["tp"] == 1
    assert out["f1"] > 0


@pytest.fixture(scope="module")
def derived_case(tmp_path_factory):
    rng = np.random.default_rng(6)
    rows_a, rows_b = [], []
    for a in [f"a{i}" for i in range(4)]:
        for b in [f"b{i}" for i in range(4)]:
            total = float(rng.integers(500, 1500))
            ok = total * (0.95 + rng.uniform(-0.01, 0.01))
            if a == "a2":
                ok = total * 0.3
            rows_a.append((a, b, ok, total * 0.95))
            rows_b.append((a, b, total, total))
    base = tmp_path_factory.mktemp("cli_derived") / "case"
    pd.DataFrame(rows_a, columns=["a", "b", "real", "predict"]).to_csv(
        str(base) + ".a.csv", index=False
    )
    pd.DataFrame(rows_b, columns=["a", "b", "real", "predict"]).to_csv(
        str(base) + ".b.csv", index=False
    )
    return str(base)


def test_cli_adtributor_derived(derived_case):
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "adtributor",
            derived_case, "--derived", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert any("a=a2" in rc for rc in out["root_causes"]), out


def test_cli_robustspot_rs_data(tmp_path):
    ts = 1_700_000_000
    rng = np.random.default_rng(12)
    rows = []
    for i in range(6):
        t = ts - i * 60
        for cdn in ["cdn1", "cdn2", "cdn3"]:
            for bitrate in ["hd", "sd"]:
                total = 100.0
                ok = total * (0.95 + rng.uniform(-0.01, 0.01))
                if cdn == "cdn2" and i == 0:  # anomaly at current minute
                    ok = total * 0.2
                rows.append((t, cdn, bitrate, round(ok, 2), total))
    p = tmp_path / "rs.csv"
    pd.DataFrame(rows, columns=["min", "cdn", "bitrate", "value", "cnt"]).to_csv(
        p, index=False
    )
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "robustspot",
            str(p), "--rs-data", "--timestamp", str(ts), "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert any("cdn=cdn2" in rc for rc in out["root_causes"]), out


def test_parser_exposes_reference_algorithm_args():
    """Per-algorithm options mirror reference utils/argument_parser.py."""
    from riskloc_spark.cli import ALGO_OPTIONS, build_parser

    p = build_parser()
    a = p.parse_args(
        ["riskloc", "x.csv", "--pep-threshold", "0.05", "--n-remove", "7",
         "--remove-relative", "--prune-elements", "false"]
    )
    assert (a.pep_threshold, a.n_remove, a.remove_relative, a.prune_elements) == (
        0.05, 7, True, False
    )
    a = p.parse_args(["autoroot", "x.csv", "--delta-threshold", "0.3"])
    assert a.delta_threshold == 0.3
    a = p.parse_args(
        ["robustspot", "x.csv", "--k", "5", "--lambda-amplification", "50",
         "--contribution-ability-threshold", "0.1", "--confidence-threshold", "0.7"]
    )
    assert (a.k, a.lambda_amplification, a.contribution_ability_threshold,
            a.confidence_threshold) == (5, 50, 0.1, 0.7)
    a = p.parse_args(["squeeze", "x.csv", "--ps-upper-bound", "0.8",
                      "--max-num-elements-single-cluster", "6"])
    assert (a.ps_upper_bound, a.max_num_elements_single_cluster) == (0.8, 6)
    a = p.parse_args(["hotspot", "x.csv", "--pt", "0.7", "--m", "50",
                      "--scoring", "ps"])
    assert (a.pt, a.m, a.scoring) == (0.7, 50, "ps")
    # defaults match the reference parser
    for algo, opts in ALGO_OPTIONS.items():
        ns = p.parse_args([algo, "x.csv"])
        for k, v in opts.items():
            assert getattr(ns, k) == v, (algo, k)


def test_anomaly_yaml_fallback_parser(tmp_path):
    """The import-gated minimal parser handles the reference's
    anomaly.yaml shape (list of {data, timestamp, cause:[{k:v}]})."""
    from riskloc_spark.cli import _read_anomaly_yaml, rs_label

    text = """\
- data: '1001'
  timestamp: 1700000000
  cause:
  - cdn: c1
    bitrate: b2
- data: '1002'
  timestamp: 1700000060
  cause:
  - cdn: c3
"""
    p = tmp_path / "anomaly.yaml"
    p.write_text(text)
    # with pyyaml present
    entries = _read_anomaly_yaml(str(p))
    assert entries[0]["data"] == "1001" and entries[0]["timestamp"] == 1700000000
    assert rs_label(str(tmp_path), "1001") == "bitrate=b2&cdn=c1" or (
        rs_label(str(tmp_path), "1001") == "cdn=c1&bitrate=b2"
    )
    # force the fallback parser by making `import yaml` fail
    import builtins

    real_import = builtins.__import__

    def no_yaml(name, *a, **kw):
        if name == "yaml":
            raise ImportError(name)
        return real_import(name, *a, **kw)

    builtins.__import__ = no_yaml
    try:
        entries2 = _read_anomaly_yaml(str(p))
    finally:
        builtins.__import__ = real_import
    assert entries2 == entries


def test_cli_directory_batch_run(tmp_path):
    """Directory mode (ref run.py:10-36): 2 instances under one dataset
    folder, labels from injection_info.csv, per-instance + aggregate F1
    csvs written."""
    rng = np.random.default_rng(11)
    d = tmp_path / "data" / "S" / "week1"
    d.mkdir(parents=True)
    labels = []
    for ts, (ca, cb) in [("1001", ("a1", "b2")), ("1002", ("a0", "b3"))]:
        rows = []
        for a in [f"a{i}" for i in range(4)]:
            for b in [f"b{i}" for i in range(4)]:
                for c in [f"c{i}" for i in range(3)]:
                    predict = float(rng.uniform(50, 150))
                    real = predict * (1 + rng.uniform(-0.02, 0.02))
                    if a == ca and b == cb:
                        real = predict * (1 - 0.85)
                    rows.append((a, b, c, real, predict))
        pd.DataFrame(rows, columns=["a", "b", "c", "real", "predict"]).to_csv(
            d / f"{ts}.csv", index=False
        )
        labels.append({"timestamp": ts, "set": f"a={ca}&b={cb}"})
    pd.DataFrame(labels).to_csv(d / "injection_info.csv", index=False)

    outdir = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "riskloc",
            str(tmp_path / "data"), "--risk-threshold", "0.3",
            "--cpus", "4", "--output-dir", str(outdir),
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    all_csvs = list(outdir.glob("riskloc-all*.csv"))
    summary_csvs = list(outdir.glob("riskloc-summary*.csv"))
    assert len(all_csvs) == 1 and len(summary_csvs) == 1
    per_inst = pd.read_csv(all_csvs[0])
    assert len(per_inst) == 2
    assert set(per_inst["File"].astype(str)) == {"1001", "1002"}
    assert (per_inst["F1"] == 1.0).all(), per_inst
    summary = pd.read_csv(summary_csvs[0])
    assert len(summary) == 1
    assert summary.loc[0, "Dataset"] == "S"
    assert summary.loc[0, "F1-score"] == 1.0


def test_directory_batch_rs_dataset(spark, tmp_path):
    """RS dataset folder in batch mode: anomaly.yaml supplies timestamps
    and labels, the RobustSpot reader and flip semantics apply."""
    from riskloc_spark.cli import run_directory

    ts = 1_700_000_000
    rng = np.random.default_rng(12)
    d = tmp_path / "data" / "RS"
    d.mkdir(parents=True)
    rows = []
    for i in range(6):
        t = ts - i * 60
        for cdn in ["cdn1", "cdn2", "cdn3"]:
            for bitrate in ["hd", "sd"]:
                total = 100.0
                ok = total * (0.95 + rng.uniform(-0.01, 0.01))
                if cdn == "cdn2" and i == 0:
                    ok = total * 0.2
                rows.append((t, cdn, bitrate, round(ok, 2), total))
    pd.DataFrame(rows, columns=["min", "cdn", "bitrate", "value", "cnt"]).to_csv(
        d / "1001.csv", index=False
    )
    (d / "anomaly.yaml").write_text(
        f"- data: '1001'\n  timestamp: {ts}\n  cause:\n  - cdn: cdn2\n"
    )

    all_df, summary = run_directory(
        spark, str(tmp_path / "data"), "robustspot",
        {"k": 3, "lambda_amplification": 100,
         "contribution_ability_threshold": 0.0, "confidence_threshold": 0.8},
        derived_flag=None, suffix="", output_dir=str(tmp_path / "res"),
    )
    assert len(all_df) == 1
    assert summary.loc[0, "Dataset"] == "RS"
    assert summary.loc[0, "TP"] >= 1, all_df


def test_cli_pipeline_sample_and_split(spark, tmp_path):
    """pipeline subcommands: parquet in -> parquet out, one JSON status
    line; the sample CLI reproduces the operator's deterministic
    membership, split adds the label column."""
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"text number {i}", "s0") for i in range(200)],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    out1 = str(tmp_path / "sampled")
    out2 = str(tmp_path / "splits")
    # sample and split both read only the staged src: one wave
    r, r2s = run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline", "sample",
         src, "--output", out1, "--fraction", "0.3", "--salt", "x",
         "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline", "split",
         src, "--output", out2, "--weights", "train=0.7,val=0.3",
         "--cpus", "4"],
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["input_rows"] == 200 and 0 < rec["output_rows"] < 200
    from riskloc_spark.operators.sampling import deterministic_sample

    want = {
        r2["doc_id"]
        for r2 in deterministic_sample(
            spark.read.parquet(src), 0.3, "x"
        ).collect()
    }
    got = {r2["doc_id"] for r2 in spark.read.parquet(out1).collect()}
    assert got == want

    assert r2s.returncode == 0, r2s.stderr[-2000:]
    rows = spark.read.parquet(out2).collect()
    assert len(rows) == 200
    assert {r2["split"] for r2 in rows} == {"train", "val"}


def test_cli_pipeline_curate_and_decontaminate(spark, tmp_path):
    good = (
        "the quick brown fox jumps over the lazy dog and it is a fine "
        "day for all of the animals in the field."
    )
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, good, "s"),
            (2, good, "s"),            # exact dup -> curate drops
            (3, "short", "s"),         # junk -> curate drops
            (4, good + " extra tail of words here we go.", "s"),
        ],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(9, good)], "bid long, text string"
    ).write.parquet(bench)

    out1 = str(tmp_path / "curated")
    out2 = str(tmp_path / "decontaminated")
    # curate and decontaminate both read only the staged src: one wave
    for r in run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline", "curate",
         src, "--output", out1, "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "decontaminate", src, "--output", out2,
         "--benchmark", bench, "--cpus", "4"],
    ]):
        assert r.returncode == 0, r.stderr[-2000:]
    assert sorted(
        r2["doc_id"] for r2 in spark.read.parquet(out1).collect()
    ) == [1, 4]

    kept = sorted(r2["doc_id"] for r2 in spark.read.parquet(out2).collect())
    # docs 1/2/4 share benchmark 8-grams; only the junk doc survives
    assert kept == [3]


def test_cli_pipeline_quality_ops(spark, tmp_path):
    """gopher-filter / c4-clean / redact-pii / tfidf subcommands:
    parquet in -> parquet out, matching the operators' direct output."""
    good = (
        "The quick brown fox jumps over the lazy dog and it is a fine "
        "day for all of the animals in the big field to be with friends."
    )
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, good + "\nAnother fine sentence stays right here.", "s0"),
            (2, "spam spam spam spam spam", "s0"),
            (3, "Contact a@b.com or 1.2.3.4 right now.\nKeep this line here.", "s1"),
        ],
        "doc_id long, text string, source string",
    ).write.parquet(src)

    out1 = str(tmp_path / "gophered")
    out2 = str(tmp_path / "c4")
    out3 = str(tmp_path / "pii")
    out4 = str(tmp_path / "tfidf")
    # four independent subcommands over the same staged input: one wave
    for r in run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "gopher-filter", src, "--output", out1, "--min-words", "10",
         "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "c4-clean", src, "--output", out2, "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "redact-pii", src, "--output", out3, "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "tfidf", src, "--output", out4, "--top-k", "3", "--cpus", "4"],
    ]):
        assert r.returncode == 0, r.stderr[-2000:]

    assert [
        r2["doc_id"] for r2 in spark.read.parquet(out1).collect()
    ] == [1]

    c4 = {r2["doc_id"]: r2["text"] for r2 in spark.read.parquet(out2).collect()}
    assert 2 not in c4 and "Keep this line here." in c4[3]

    pii = {r2["doc_id"]: r2 for r2 in spark.read.parquet(out3).collect()}
    assert pii[3]["n_emails"] == 1 and pii[3]["n_ips"] == 1
    assert "<EMAIL>" in pii[3]["text"] and "<IP>" in pii[3]["text"]

    rows = spark.read.parquet(out4).collect()
    assert {r2["source"] for r2 in rows} == {"s0", "s1"}
    assert all(1 <= r2["rank"] <= 3 for r2 in rows)


def test_cli_pipeline_dedup_spans(spark, tmp_path):
    slogan = "the shared slogan of this network appears right here today"
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (0, f"u0 v0 w0 x0 {slogan} z0"),
            (1, f"u1 v1 w1 x1 {slogan} z1"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "spanned")
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "pipeline",
            "dedup-spans", src, "--output", out, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = {r2["doc_id"]: r2 for r2 in spark.read.parquet(out).collect()}
    assert rows[0]["n_tokens_removed"] == 0
    assert rows[1]["n_tokens_removed"] == 10
    assert rows[1]["text"] == "u1 v1 w1 x1 z1"


def test_cli_pipeline_normalize_and_ingest_dedup(spark, tmp_path):
    """normalize: NFC + control strip through the CLI; build-dedup-index
    + ingest-dedup: the two-step ingestion flow, matches table included."""
    base_src = str(tmp_path / "base")

    def body(i):
        return " ".join(f"w{i}x{j}" for j in range(30))

    spark.createDataFrame(
        [(i, body(i), "s") for i in range(20)],
        "doc_id long, text string, source string",
    ).write.parquet(base_src)
    # batch: 100 is a near-dup of base doc 3 (one word edit), 101 fresh
    batch_src = str(tmp_path / "batch")
    spark.createDataFrame(
        [
            (100, body(3).replace("w3x7", "edited"), "s"),
            (101, body(999), "s"),
        ],
        "doc_id long, text string, source string",
    ).write.parquet(batch_src)

    idx_out = str(tmp_path / "index")
    norm_out = str(tmp_path / "normed")
    # wave 1: index build and normalize are independent
    r, r_norm = run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "build-dedup-index", base_src, "--output", idx_out,
         "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "normalize", base_src, "--output", norm_out, "--cpus", "4"],
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["output_rows"] == 20 * 8  # one row per (doc, band)
    assert r_norm.returncode == 0, r_norm.stderr[-2000:]

    # wave 2: the probe reads wave 1's index artifact
    acc_out = str(tmp_path / "accepted")
    m_out = str(tmp_path / "matches")
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "pipeline",
            "ingest-dedup", batch_src, "--output", acc_out,
            "--index", idx_out, "--jaccard-threshold", "0.5",
            "--matches-output", m_out, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    accepted = {r2["doc_id"] for r2 in spark.read.parquet(acc_out).collect()}
    assert accepted == {101}
    matches = spark.read.parquet(m_out).collect()
    assert {(m["new_id"], m["base_id"]) for m in matches} == {(100, 3)}

    rows = spark.read.parquet(norm_out).collect()
    assert len(rows) == 20
    assert all(not r2["changed"] for r2 in rows)  # ASCII corpus
    assert {"n_chars_before", "n_chars_after"} <= set(rows[0].asDict())


def test_cli_pipeline_audio_and_video(spark, tmp_path):
    """media subcommands: WAV payloads -> features; AVI payloads ->
    per-frame stats, through the subprocess CLI."""
    from riskloc_spark.operators.audio import synthesize_wav_corpus
    from riskloc_spark.operators.video import synthesize_avi_corpus

    ids = spark.range(0, 6).withColumnRenamed("id", "media_id")
    wav_src = str(tmp_path / "wavs")
    synthesize_wav_corpus(ids).write.parquet(wav_src)
    avi_src = str(tmp_path / "avis")
    synthesize_avi_corpus(ids).write.parquet(avi_src)

    a_out = str(tmp_path / "afeat")
    v_out = str(tmp_path / "vframes")
    # audio and video read disjoint staged corpora: one wave
    for r in run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "audio-features", wav_src, "--output", a_out, "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "video-frames", avi_src, "--output", v_out,
         "--every", "2", "--cpus", "4"],
    ]):
        assert r.returncode == 0, r.stderr[-2000:]
    rows = spark.read.parquet(a_out).collect()
    # one row per (doc, channel): ids 0..5 -> 3 stereo, 3 mono
    assert len(rows) == 9
    assert all(r2["energy"] > 0 for r2 in rows)

    vrows = spark.read.parquet(v_out).collect()
    assert vrows and all(r2["frame_idx"] % 2 == 0 for r2 in vrows)


def test_cli_pipeline_html_warc_classify(spark, tmp_path):
    """The round-10 ingestion family end to end through the CLI:
    html-extract strips a synthesized page corpus, warc-extract reads a
    WARC staging dir back to text, classify fits-and-scores NB on a
    label column."""
    from pyspark.sql import functions as F

    from riskloc_spark.operators.html import synthesize_html_corpus
    from riskloc_spark.sources.warc import write_warc

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i} delta", ["en", "de"][i % 2],
          f"s{i % 3}", 20 + i) for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pages = synthesize_html_corpus(docs)
    html_src = str(tmp_path / "pages")
    pages.write.parquet(html_src)
    warc_dir = str(tmp_path / "warcs")
    recs = pages.select(
        F.concat(F.lit("<urn:t:"), F.col("doc_id"), F.lit(">"))
        .alias("record_id"),
        F.concat(F.lit("https://e/"), F.col("doc_id")).alias("target_uri"),
        F.concat(
            F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
            F.col("html"),
        ).cast("binary").alias("payload"),
    )
    write_warc(recs.repartition(2), warc_dir).count()
    lab_src = str(tmp_path / "labeled")
    docs.withColumnRenamed("lang", "label").write.parquet(lab_src)

    out1 = str(tmp_path / "extracted")
    out2 = str(tmp_path / "warc_out")
    out3 = str(tmp_path / "classified")
    out4 = str(tmp_path / "crawled")
    out5 = str(tmp_path / "crawled_tree")
    # five independent subcommands over the pre-staged inputs: one wave
    for r in run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "html-extract", html_src, "--output", out1, "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "warc-extract", warc_dir, "--output", out2, "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "classify", lab_src, "--output", out3, "--label-col", "label",
         "--buckets", "256", "--train-mod", "2", "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "curate-crawl", warc_dir, "--output", out4,
         "--min-quality", "0", "--lang", "", "--cpus", "4"],
        # the tree-parser path through the CLI (round 11): same corpus,
        # same surviving bodies
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "curate-crawl", warc_dir, "--output", out5,
         "--min-quality", "0", "--lang", "", "--parser", "tree",
         "--cpus", "4"],
    ]):
        assert r.returncode == 0, r.stderr[-2000:]

    got = {r2["doc_id"]: r2["text"]
           for r2 in spark.read.parquet(out1).collect()}
    assert len(got) == 40
    assert "alpha beta gamma 7 delta" in got[7]
    assert "<" not in got[7] and "home | about | contact" in got[7]

    rows = {r2["target_uri"]: r2 for r2 in
            spark.read.parquet(out2).collect()}
    assert len(rows) == 40
    assert rows["https://e/3"]["http_status"] == 200
    assert "alpha beta gamma 3 delta" in rows["https://e/3"]["text"]

    scored = spark.read.parquet(out3)
    assert scored.count() == 40
    assert set(scored.columns) == {"doc_id", "pred_label", "score",
                                   "n_grams"}

    crawled = spark.read.parquet(out4)
    assert crawled.count() > 0
    assert "text" in crawled.columns and "quality" in crawled.columns

    treed = spark.read.parquet(out5)
    assert treed.count() == crawled.count()


def test_cli_pipeline_url_dedup_and_sentences(spark, tmp_path):
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "https://a.example/x", "One two. Three four! rest here"),
         (1, "HTTPS://A.Example:443/x#f", "short text."),
         (2, "https://a.example/y?utm_source=t", "Another doc. Fine!")],
        "doc_id long, target_uri string, text string",
    ).write.parquet(src)

    out1 = str(tmp_path / "urldedup")
    out2 = str(tmp_path / "sents")
    # url-dedup and sentences both read only the staged src: one wave
    for r in run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "url-dedup", src, "--output", out1, "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "sentences", src, "--output", out2, "--cpus", "4"],
    ]):
        assert r.returncode == 0, r.stderr[-2000:]
    kept = {r2["doc_id"]: r2["canonical_url"]
            for r2 in spark.read.parquet(out1).collect()}
    assert set(kept) == {0, 2}
    assert kept[2] == "https://a.example/y"

    rows = spark.read.parquet(out2).collect()
    s0 = sorted((r2["sent_idx"], r2["sentence"])
                for r2 in rows if r2["doc_id"] == 0)
    assert [s for _, s in s0] == ["One two.", "Three four! rest here"]


def test_cli_pipeline_shard(spark, tmp_path):
    src = str(tmp_path / "docs")
    spark.range(100).selectExpr(
        "id AS doc_id", "concat('text ', id) AS text"
    ).write.parquet(src)
    out = str(tmp_path / "sharded")
    r = subprocess.run(
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "shard", src, "--output", out, "--n-shards", "4",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import os
    assert sorted(d for d in os.listdir(out) if d.startswith("shard=")) \
        == [f"shard={i}" for i in range(4)]
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert {"shard", "pos", "doc_id", "text"} <= set(back.columns)
    man = spark.read.parquet(out + "_manifest")
    assert sum(r2["rows"] for r2 in man.collect()) == 100


def test_cli_pipeline_image_dedup(spark, tmp_path):
    import numpy as np

    from riskloc_spark.operators.png import encode_png

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (16, 16, 3))
    other = rng.integers(0, 256, (16, 16, 3))
    rows = [
        (0, bytearray(encode_png(base.astype(np.int64), 2, 8))),
        (1, bytearray(encode_png(base.astype(np.int64), 2, 8))),
        (2, bytearray(encode_png(other.astype(np.int64), 2, 8))),
    ]
    src = str(tmp_path / "media")
    spark.createDataFrame(rows, "media_id long, payload binary") \
        .write.parquet(src)
    out = str(tmp_path / "deduped")
    r = subprocess.run(
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "image-dedup", src, "--output", out, "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    kept = sorted(r2["media_id"] for r2 in
                  spark.read.parquet(out).collect())
    assert kept == [0, 2]


def test_cli_pipeline_pagerank_and_ppl_buckets(spark, tmp_path):
    """pipeline pagerank: (url, html) pages -> host scores through the
    subprocess CLI, cross-checked against the in-process operator
    chain; ppl-buckets labels every scorable doc."""
    import sys

    pages = str(tmp_path / "pages")
    rows = []
    for i in range(30):
        rows.append(
            (
                f"https://h{i % 5}.com/p{i}.html",
                f'<html><a href="https://h{(i + 1) % 5}.com/x">n</a>'
                f'<a href="/local">l</a></html>',
            )
        )
    spark.createDataFrame(rows, "url string, html string").write.parquet(
        pages
    )
    docs = str(tmp_path / "pdocs")
    spark.createDataFrame(
        [
            (i, "en", "the cat sat on the mat number %d" % (i % 7))
            for i in range(12)
        ],
        "doc_id long, lang string, text string",
    ).write.parquet(docs)

    out = str(tmp_path / "pr")
    out2 = str(tmp_path / "buckets")
    # pagerank reads pages, ppl-buckets reads docs: one wave
    for r in run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "pagerank", pages, "--output", out, "--iterations", "3",
         "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "ppl-buckets", docs, "--output", out2, "--cpus", "4"],
    ]):
        assert r.returncode == 0, r.stderr[-2000:]
    got = {
        r2["node"]: r2["score"]
        for r2 in spark.read.parquet(out).collect()
    }
    from riskloc_spark.operators.graph import (
        extract_links,
        host_graph,
        pagerank,
    )

    want = {
        r2["node"]: r2["score"]
        for r2 in pagerank(
            host_graph(
                extract_links(
                    spark.read.parquet(pages), keep=["url"]
                ),
                src_url_col="url",
            ),
            iterations=3,
        ).collect()
    }
    assert got == want and len(got) == 5

    rows2 = spark.read.parquet(out2).collect()
    assert len(rows2) == 12
    assert {r2["ppl_bucket"] for r2 in rows2} <= {"head", "middle", "tail"}


def test_cli_pipeline_hll_and_bm25(spark, tmp_path):
    """round-12 subcommands: hll builds a register table then
    estimates from it; bm25 ranks a queries parquet against the
    corpus — both end-to-end through the subprocess entrypoint."""
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"term{i % 7} common word doc {i}", f"s{i % 3}")
         for i in range(300)],
        "doc_id long, text string, source string",
    ).write.parquet(src)

    qsrc = str(tmp_path / "queries")
    spark.createDataFrame(
        [(0, "term1 doc"), (1, "common")], "query_id long, query string"
    ).write.parquet(qsrc)

    sk = str(tmp_path / "sketch")
    ranked = str(tmp_path / "ranked")
    # wave 1: the hll register build and bm25 are independent
    for r in run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline", "hll",
         src, "--output", sk, "--value-col", "doc_id",
         "--key-cols", "source", "--precision", "8", "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline", "bm25",
         src, "--output", ranked, "--queries", qsrc, "--topk", "5",
         "--cpus", "4"],
    ]):
        assert r.returncode == 0, r.stderr[-2000:]
    # wave 2: the estimate reads wave 1's register table
    est = str(tmp_path / "est")
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "pipeline", "hll",
            sk, "--output", est, "--value-col", "doc_id",
            "--key-cols", "source", "--precision", "8", "--estimate",
            "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {
        row["source"]: row["est"]
        for row in spark.read.parquet(est).collect()
    }
    assert set(got) == {"s0", "s1", "s2"}
    for v in got.values():
        assert abs(v - 100) / 100 < 0.25, got  # p=8: ~6.5% stderr

    rows = spark.read.parquet(ranked).collect()
    by_q = {}
    for row in rows:
        by_q.setdefault(row["query_id"], []).append(row)
    assert set(by_q) == {0, 1}
    assert all(len(v) == 5 for v in by_q.values())
    # query 0's top docs must actually contain term1 (doc_id % 7 == 1)
    top0 = sorted(by_q[0], key=lambda r2: r2["rank"])[0]
    assert top0["doc_id"] % 7 == 1


def test_cli_pipeline_zorder(spark, tmp_path):
    """pipeline zorder: rewrite tiled along the Z-curve, round trip
    intact, layout key dropped."""
    src = str(tmp_path / "facts")
    rows = [(i, i % 16, (i * 5) % 16) for i in range(512)]
    spark.createDataFrame(rows, "id long, x long, y long").write.parquet(src)
    out = str(tmp_path / "tiled")
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "pipeline",
            "zorder", src, "--output", out, "--cols", "x,y",
            "--bits", "4", "--partitions", "4", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["input_rows"] == 512 and rec["output_rows"] == 512
    back = spark.read.parquet(out)
    assert "__z" not in back.columns
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_cli_pipeline_quantiles_and_heavy_hitters(spark, tmp_path):
    """round-13 subcommands: quantiles builds a bottom-k sample table
    then estimates from it; heavy-hitters discovers the top values —
    both end-to-end through the subprocess entrypoint."""
    src = str(tmp_path / "docs13")
    spark.createDataFrame(
        [(i, i % 101, f"d{(i * i) % 9}") for i in range(600)],
        "doc_id long, n long, domain string",
    ).write.parquet(src)

    sk = str(tmp_path / "qsk")
    hh = str(tmp_path / "hh")
    # wave 1: the sample-table build and heavy-hitters are independent
    for r in run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "quantiles", src, "--output", sk, "--value-col", "n",
         "--id-col", "doc_id", "--k", "128", "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "heavy-hitters", src, "--output", hh,
         "--value-col", "domain", "--id-col", "doc_id",
         "--top-k", "3", "--sample-k", "256", "--width", "512",
         "--cpus", "4"],
    ]):
        assert r.returncode == 0, r.stderr[-2000:]
    # wave 2: the estimate reads wave 1's sample table
    est = str(tmp_path / "qest")
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "pipeline",
            "quantiles", sk, "--output", est, "--value-col", "n",
            "--estimate", "0.5,0.99", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {
        row["q"]: row["value"]
        for row in spark.read.parquet(est).collect()
    }
    assert set(got) == {0.5, 0.99}
    assert 30 <= got[0.5] <= 70  # true median 50, k=128 envelope

    rows = sorted(
        spark.read.parquet(hh).collect(), key=lambda r2: r2["rank"]
    )
    assert len(rows) == 3
    # squares mod 9 land on {0,1,4,7} with 0 the most frequent
    assert rows[0]["item"] == "d0" and rows[0]["est"] >= 150


def test_cli_pipeline_scd2_and_cdc_apply(spark, tmp_path):
    """round-13 temporal subcommands end-to-end: scd2 builds the
    version history from a feed; cdc-apply merges the feed's latest
    ops into a snapshot."""
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [
            (1, 10, "upsert", "a", 5),
            (1, 20, "upsert", "a2", 6),
            (2, 10, "upsert", "b", 7),
            (2, 30, "delete", None, None),
        ],
        "k long, ts long, op string, name string, v long",
    ).write.parquet(feed)
    snap = str(tmp_path / "snap")
    spark.createDataFrame(
        [(1, "old", 1), (3, "c", 9)], "k long, name string, v long"
    ).write.parquet(snap)

    hist = str(tmp_path / "hist")
    merged = str(tmp_path / "merged")
    # scd2 and cdc-apply read only the staged feed/snapshot: one wave
    for r in run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "scd2", feed, "--output", hist, "--keys", "k",
         "--ts-col", "ts", "--attrs", "name,v", "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "cdc-apply", snap, "--output", merged,
         "--changes", feed, "--keys", "k", "--ts-col", "ts",
         "--attrs", "name,v", "--cpus", "4"],
    ]):
        assert r.returncode == 0, r.stderr[-2000:]
    hrows = spark.read.parquet(hist).collect()
    cur = {r2["k"]: r2["name"] for r2 in hrows if r2["is_current"]}
    assert cur[1] == "a2"

    got = {
        r2["k"]: (r2["name"], r2["v"])
        for r2 in spark.read.parquet(merged).collect()
    }
    assert got == {1: ("a2", 6), 3: ("c", 9)}  # 2 deleted, 3 untouched


def test_cli_pipeline_fuzzy_join(spark, tmp_path):
    """round-13 fuzzy-join subcommand end-to-end through the
    subprocess entrypoint."""
    left = str(tmp_path / "fl")
    right = str(tmp_path / "fr")
    spark.createDataFrame(
        [(1, "acme corp"), (2, "zzz")], "lid long, k string"
    ).write.parquet(left)
    spark.createDataFrame(
        [(10, "acme korp"), (11, "unrelated")], "rid long, k string"
    ).write.parquet(right)
    out = str(tmp_path / "fj")
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "pipeline",
            "fuzzy-join", left, "--output", out, "--right", right,
            "--key", "k", "--left-id", "lid", "--right-id", "rid",
            "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = spark.read.parquet(out).collect()
    assert [(x["left_id"], x["right_id"], x["distance"])
            for x in rows] == [(1, 10, 1)]


def test_cli_pipeline_decontamination_tiers(spark, tmp_path):
    """round-14 decontamination subcommands end-to-end:
    decontaminate-near-dup drops the paraphrased benchmark twin the
    exact tier misses; semantic-contamination audits embeddings in
    both the exact and IVF regimes."""
    docs = str(tmp_path / "docs")
    body = " ".join(f"tok{j}" for j in range(40))
    para = " ".join(
        f"EDIT{j}" if j % 9 == 4 else f"tok{j}" for j in range(40)
    )
    spark.createDataFrame(
        [(1, para), (2, "completely unrelated words here " * 6)],
        "doc_id long, text string",
    ).write.parquet(docs)
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(100, body)], "doc_id long, text string"
    ).write.parquet(bench)
    emb = str(tmp_path / "emb")
    spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    ).write.parquet(emb)
    bemb = str(tmp_path / "bemb")
    spark.createDataFrame(
        [(50, [0.99, 0.01, 0.0])],
        "vec_id long, embedding array<double>",
    ).write.parquet(bemb)

    out = str(tmp_path / "clean")
    audit = str(tmp_path / "audit")
    # the two tiers read disjoint staged inputs: one wave
    for r in run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "decontaminate-near-dup", docs, "--output", out,
         "--benchmark", bench, "--jaccard-threshold", "0.3",
         "--bands", "16", "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "semantic-contamination", emb, "--output", audit,
         "--benchmark", bemb, "--cos-threshold", "0.9",
         "--cpus", "4"],
    ]):
        assert r.returncode == 0, r.stderr[-2000:]
    kept = [r2["doc_id"] for r2 in spark.read.parquet(out).collect()]
    assert kept == [2]

    got = {
        r2["vec_id"]: r2["n_bench_matches"]
        for r2 in spark.read.parquet(audit).collect()
    }
    assert got == {1: 1, 2: 0}


def test_cli_pipeline_alpha_sample_and_group_split(spark, tmp_path):
    """round-14 sampling subcommands end-to-end: sample-alpha fills
    per-source budgets from size^alpha; split --by-col assigns whole
    groups to one split."""
    docs = str(tmp_path / "docs")
    rows = [(i, "big", "w " * 20) for i in range(60)]
    rows += [(100 + i, "small", "w " * 20) for i in range(10)]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(docs)

    out = str(tmp_path / "mix")
    sp = str(tmp_path / "split")
    # sample-alpha and group-split both read only the staged docs: one wave
    r, r_sp = run_cli_parallel([
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "sample-alpha", docs, "--output", out,
         "--total-tokens", "400", "--alpha", "0.5", "--cpus", "4"],
        [sys.executable, "-m", "riskloc_spark.cli", "pipeline",
         "split", docs, "--output", sp,
         "--weights", "train=0.5,val=0.5", "--by-col", "source",
         "--cpus", "4"],
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    got = spark.read.parquet(out).collect()
    per_g = {}
    for r2 in got:
        per_g[r2["source"]] = max(
            per_g.get(r2["source"], 0), r2["cum_tokens"]
        )
    assert set(per_g) == {"big", "small"}
    assert per_g["big"] <= 400 and per_g["small"] <= 400

    assert r_sp.returncode == 0, r_sp.stderr[-2000:]
    per_group = {}
    for r2 in spark.read.parquet(sp).collect():
        per_group.setdefault(r2["source"], set()).add(r2["split"])
    assert all(len(s) == 1 for s in per_group.values())
