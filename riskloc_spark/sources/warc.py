"""WARC (ISO 28500) record source + sink — the container format of
web crawls (CommonCrawl et al.), the step before HTML extraction in a
corpus pipeline.

Reader shape: ``spark.read.format("binaryFile")`` gives one row per
WARC file; an Arrow-batched mapInPandas walks each file's records with
the same chunk-walk discipline as the audio/video codecs (explicit
budgets, malformed-input tolerance, no driver loops).  Parallelism is
per FILE — exactly how crawls ship (CommonCrawl segments are ~1 GB
gzipped members), so file-count parallelism is the natural unit; a
single oversized file is rejected by ``MAX_WARC_BYTES`` rather than
OOMing an executor.  ``.warc.gz`` files are decompressed whole-file
(stdlib gzip handles multi-member streams transparently); the
production seam — streaming per-member decompression with mid-file
splits — is stated, not faked.

Writer shape: WARC is a concatenated-record format with no columnar
footer, so the sink is a side-effect-per-partition write (one
``part-NNNNN.warc`` per partition, the foreachPartition sink pattern)
returning a one-row-per-partition manifest.  Task retries can leave a
partial file behind on failure — a production deployment wraps this in
a commit protocol (write to temp names, rename on task commit); local
pipelines re-run the stage.

Gate: ``__spark_entry__.warc_records`` writes the synthesized
HTML-in-HTTP corpus through this sink, reads it back through this
reader, and hashes record headers + the extracted text against a
closed-form DuckDB reconstruction from the original columns (the
jsonl_roundtrip precedent, with the framing itself under test).

No reference counterpart (pipeline ingestion surface).
"""
from __future__ import annotations

import gzip
import os
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# per-file budget: binaryFile materializes the whole file in one row;
# crawls shard ~1 GB, local tests far less. Oversized files yield a
# single __oversize__ marker row instead of an executor OOM.
MAX_WARC_BYTES = 1 << 30

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_offset", T.LongType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def format_warc_record(headers: dict[str, str], payload: bytes) -> bytes:
    """One WARC/1.0 record: version line, named headers,
    Content-Length, blank line, payload, record separator."""
    lines = [b"WARC/1.0"]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode())
    lines.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(lines) + _HDR_END + payload + _HDR_END


def parse_warc_members(data: bytes, path: str = "") -> list[dict]:
    """Chunk-walk a WARC byte string into record dicts.  Tolerant the
    way a crawl consumer must be: a malformed header block or a
    Content-Length pointing past EOF ends the walk for that file
    (records already parsed are kept) — one corrupt tail must not
    poison the batch.  Missing record separators resync by searching
    for the next version line."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            # resync: find the next version line or give up
            nxt = data.find(b"WARC/1.", pos)
            if nxt < 0:
                break
            pos = nxt
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            break
        head = data[pos:hdr_end]
        rec: dict = {
            "warc_file": path,
            "record_offset": pos,
            "record_id": None,
            "warc_type": None,
            "target_uri": None,
            "warc_date": None,
            "content_length": None,
            "payload": None,
        }
        try:
            lines = head.split(_CRLF)
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                key = k.strip().lower()
                val = v.strip().decode("utf-8", "replace")
                if key == b"warc-record-id":
                    rec["record_id"] = val
                elif key == b"warc-type":
                    rec["warc_type"] = val
                elif key == b"warc-target-uri":
                    rec["target_uri"] = val
                elif key == b"warc-date":
                    rec["warc_date"] = val
                elif key == b"content-length":
                    rec["content_length"] = int(val)
        except (ValueError, UnicodeDecodeError):
            break
        clen = rec["content_length"]
        if clen is None or clen < 0:
            break
        body_start = hdr_end + len(_HDR_END)
        if body_start + clen > n:
            break  # truncated record
        rec["payload"] = data[body_start : body_start + clen]
        out.append(rec)
        pos = body_start + clen
    return out


def read_warc_records(
    spark: SparkSession, path: str, budget: int = MAX_WARC_BYTES
) -> DataFrame:
    """Read every WARC record under ``path`` (plain ``.warc`` or
    gzipped ``.warc.gz``) as one row each; see module docstring for
    the parallelism/budget contract."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _RECORD_SCHEMA]
        for pdf in batches:
            rows: list[dict] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if p.endswith(".gz"):
                    # BadGzipFile is an OSError, but a TRUNCATED member
                    # raises EOFError and corrupt deflate data raises
                    # zlib.error — one interrupted download must skip
                    # the file, not abort the whole read (review r10)
                    try:
                        data = gzip.decompress(data)
                    except (OSError, EOFError, zlib.error):
                        continue
                if len(data) > budget:
                    rows.append(
                        {
                            "warc_file": p,
                            "record_offset": -1,
                            "record_id": None,
                            "warc_type": "__oversize__",
                            "target_uri": None,
                            "warc_date": None,
                            "content_length": len(data),
                            "payload": None,
                        }
                    )
                    continue
                rows.extend(parse_warc_members(data, p))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(
        run, schema=_RECORD_SCHEMA
    )


_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("records", T.LongType()),
        T.StructField("bytes", T.LongType()),
    ]
)


def write_warc(
    df: DataFrame,
    path: str,
    uri_col: str = "target_uri",
    id_col: str = "record_id",
    payload_col: str = "payload",
    warc_type: str = "response",
    warc_date: str = "2026-01-01T00:00:00Z",
) -> DataFrame:
    """Write (record_id, target_uri, payload[binary]) rows as WARC
    files, one ``part-NNNNN.warc`` per partition.  Returns the
    manifest frame (path, records, bytes) — count() it to force the
    write.  ``warc_date`` is a pinned column-or-literal (crawl time is
    data, not wall clock)."""
    os.makedirs(path, exist_ok=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fpath = os.path.join(path, f"part-{pid:05d}.warc")
        n = 0
        nb = 0
        with open(fpath, "wb") as f:
            for pdf in batches:
                for rid, uri, payload in zip(
                    pdf[id_col], pdf[uri_col], pdf[payload_col]
                ):
                    rec = format_warc_record(
                        {
                            "WARC-Type": warc_type,
                            "WARC-Record-ID": str(rid),
                            "WARC-Date": warc_date,
                            "WARC-Target-URI": str(uri),
                            "Content-Type": "application/http;"
                            "msgtype=response",
                        },
                        bytes(payload),
                    )
                    f.write(rec)
                    n += 1
                    nb += len(rec)
        yield pd.DataFrame(
            [{"path": fpath, "records": n, "bytes": nb}],
            columns=[f.name for f in _MANIFEST_SCHEMA],
        )

    return df.mapInPandas(run, schema=_MANIFEST_SCHEMA)


def http_response_parts(df: DataFrame) -> DataFrame:
    """Split HTTP-response payloads into (http_status, content_type,
    content_encoding, body): the standard post-read stage for response
    records.  Pure column algebra over the binary payload cast to
    string — the header block ends at the first blank line; a payload
    with no blank line yields a NULL body (malformed response).

    Stated production seams (alongside the module seams at the top):
    the binary→string cast assumes UTF-8 — latin-1/shift-jis bodies
    get replacement chars (a charset-sniffing decode per the page's
    meta/BOM would go behind mapInPandas, like the codecs), and a
    Content-Encoding: gzip/br body passes through as mojibake 'text'.
    ``content_encoding`` is surfaced exactly so downstream consumers
    can drop compressed responses — curate_from_crawl does."""
    s = F.col("payload").cast("string")
    split_at = F.instr(s, "\r\n\r\n")
    head = F.when(split_at > 0, s.substr(F.lit(1), split_at - 1))
    body = F.when(split_at > 0, s.substr(split_at + 4, F.length(s)))
    return df.withColumns(
        {
            "http_status": F.regexp_extract(
                head, r"^HTTP/[0-9.]+ (\d{3})", 1
            ).cast("int"),
            "content_type": F.regexp_extract(
                head, r"(?im)^content-type:\s*([^\r\n]+)", 1
            ),
            "content_encoding": F.nullif(
                F.regexp_extract(
                    head, r"(?im)^content-encoding:\s*([^\r\n]+)", 1
                ),
                F.lit(""),
            ),
            "body": body,
        }
    )
