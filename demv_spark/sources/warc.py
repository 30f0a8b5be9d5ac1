"""Native WARC (Web ARChive) source with zero third-party deps — the
canonical 100 TB crawl-ingest format (Common-Crawl-style corpora ship
as .warc / .warc.gz), parsed entirely with stdlib ``zlib`` + bytes
ops so the container needs no warcio.

Scale topology: a crawl corpus is many ~1 GB WARC files; the natural
parallel unit is the FILE (records inside one file are a sequential
byte stream — per-record gzip members must be walked in order), so
``read_warc`` loads files via Spark's ``binaryFile`` source and
parses each file's records inside one Arrow-batched ``mapInPandas``
task: parallelism = number of files, exactly how warcio-based
pipelines shard. No driver-side parsing at any size.

Malformed input follows the JSONL-quarantine convention
(sources/readers.py): a file that stops parsing mid-way yields the
records recovered so far plus ONE error row (``error`` column set,
payload NULL) — never a dead read.

Format notes (public WARC/1.0-1.1 spec): each record is
``WARC/1.x\\r\\n`` + header lines + blank line + exactly
``Content-Length`` payload bytes + ``\\r\\n\\r\\n``. A .warc.gz is a
concatenation of per-record gzip MEMBERS — stdlib ``zlib``
decompresses member-by-member via ``unused_data``.
"""

from __future__ import annotations

import zlib
from typing import Iterator, Optional

WARC_SCHEMA = (
    "file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, payload binary, error string"
)

_GZIP_MAGIC = b"\x1f\x8b"

# header blocks are small (a dozen short lines); 64 KB bounds the
# per-record separator search so a hostile/corrupt record can't make
# one record's parse scan the rest of the file
_MAX_HEADER = 64 * 1024


def _gunzip_members_ex(data: bytes) -> "tuple[bytes, Optional[str]]":
    """Decompress a concatenation of gzip members (the .warc.gz
    layout) into one byte stream. Non-gzip input passes through.
    Returns (bytes, error): corrupt members and non-gzip junk between
    members surface as an error message alongside whatever
    decompressed cleanly — quarantine material, never an exception."""
    if not data.startswith(_GZIP_MAGIC):
        return data, None
    out = []
    rest = data
    member = 0
    while rest[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out.append(d.decompress(rest))
            out.append(d.flush())
        except zlib.error as e:
            return b"".join(out), f"corrupt gzip member {member}: {e}"
        if not d.eof:
            return b"".join(out), f"truncated gzip member {member}"
        rest = d.unused_data
        member += 1
    if rest:
        return (
            b"".join(out),
            f"{len(rest)} non-gzip bytes after member {member - 1}",
        )
    return b"".join(out), None


def gunzip_members(data: bytes) -> bytes:
    """Bytes-only view of ``_gunzip_members_ex`` (clean decompression
    of whatever is recoverable; see that function for the error
    channel the parser uses)."""
    return _gunzip_members_ex(data)[0]


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
    return headers


def parse_warc_records(data: bytes, file: str = "") -> "list[tuple]":
    """Parse one WARC file's bytes into WARC_SCHEMA tuples. Pure
    function — usable driver-side in tests and executor-side in
    ``read_warc``. Tolerates \\n line endings and a truncated tail
    (recovered records + one error row)."""
    data, gz_err = _gunzip_members_ex(data)
    rows: list[tuple] = []

    def error_row(msg: str):
        return (file, None, None, None, None, None, None, None, msg)

    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record separators
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            rows.append(error_row(f"expected WARC/ magic at byte {pos}"))
            break
        # header block ends at the first blank line. Both searches are
        # BOUNDED to a 64 KB header window — an unbounded find would
        # rescan the remaining FILE per record whenever a payload
        # lacks the sought separator, turning the parse O(file^2)
        limit = min(pos + _MAX_HEADER, n)
        sep = data.find(b"\r\n\r\n", pos, limit)
        sep_n = data.find(b"\n\n", pos, sep + 4 if sep != -1 else limit)
        if sep == -1 or (sep_n != -1 and sep_n < sep):
            sep, sep_len = sep_n, 2
        else:
            sep_len = 4
        if sep == -1:
            rows.append(error_row(f"unterminated header block at byte {pos}"))
            break
        headers = _parse_headers(data[pos:sep])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:
            # a negative length would move pos BACKWARD — with a
            # crafted file that is an infinite parse loop, so it is
            # rejected like any other malformed record
            rows.append(error_row(f"missing/invalid Content-Length at byte {pos}"))
            break
        body_start = sep + sep_len
        body_end = body_start + length
        if body_end > n:
            rows.append(error_row(
                f"truncated payload at byte {body_start} "
                f"(want {length}, have {n - body_start})"
            ))
            break
        rows.append((
            file,
            headers.get("warc-record-id"),
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("content-type"),
            length,
            data[body_start:body_end],
            None,
        ))
        pos = body_end
    if gz_err is not None:
        rows.append(error_row(gz_err))
    return rows


def _parse_files(files):
    """(path, content) DataFrame → WARC_SCHEMA via one Arrow-batched
    parse task per file; shared by the batch and streaming readers so
    the two cannot drift."""

    def parse(batches):
        import pandas as pd

        cols = [
            "file", "record_id", "warc_type", "target_uri", "warc_date",
            "content_type", "content_length", "payload", "error",
        ]
        for b in batches:
            out = []
            for _, r in b.iterrows():
                out.extend(parse_warc_records(bytes(r["content"]), r["path"]))
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(parse, WARC_SCHEMA)


"""Oversized-file contract: the parallel unit is the FILE (one
mapInPandas task materializes the whole file's bytes), so a single
oversized .warc has no split path — Spark's binaryFile source itself
caps a file's ``content`` at 2 GiB (a single byte array). Crawl
corpora honor this naturally (~1 GB rotation is the Common Crawl
convention); files past ``max_file_bytes`` are QUARANTINED, not read:
the length predicate is pushed down to the binaryFile scan, and the
oversized branch selects only (path, length) — content is pruned, so
the bytes never leave the filesystem. Pre-split oversized files
upstream (a .warc.gz is a concatenation of independently-inflatable
gzip members, so a byte-level member-boundary split is lossless)."""
_MAX_FILE_BYTES = (1 << 31) - 1  # binaryFile's content ceiling (Int.MaxValue)


def read_warc(spark, path: str, max_file_bytes: int = _MAX_FILE_BYTES):
    """Distributed WARC reader: ``binaryFile`` scan → one
    ``mapInPandas`` parse task per file. Returns WARC_SCHEMA rows;
    filter ``error IS NULL`` for clean records, keep the error rows
    as the quarantine census. Files larger than ``max_file_bytes``
    (default: binaryFile's 2 GiB content ceiling) surface as one
    quarantine error row each WITHOUT their bytes being read — see
    the oversized-file contract above."""
    import pyspark.sql.functions as F

    scan = spark.read.format("binaryFile").load(path)
    small = scan.filter(F.col("length") <= max_file_bytes).select("path", "content")
    oversized = (
        scan.filter(F.col("length") > max_file_bytes)
        .select(
            F.col("path").alias("file"),
            *[F.lit(None).cast(t).alias(c) for c, t in (
                ("record_id", "string"), ("warc_type", "string"),
                ("target_uri", "string"), ("warc_date", "string"),
                ("content_type", "string"),
            )],
            F.col("length").alias("content_length"),
            F.lit(None).cast("binary").alias("payload"),
            F.concat(
                F.lit("file exceeds max_file_bytes="),
                F.lit(str(max_file_bytes)),
                F.lit(" ("),
                F.col("length").cast("string"),
                F.lit(" bytes); pre-split the file (gzip members are "
                      "independently inflatable)"),
            ).alias("error"),
        )
    )
    return _parse_files(small).unionByName(oversized)


def http_response_body(payload: Optional[bytes]) -> Optional[bytes]:
    """Body of an HTTP response payload (a WARC ``response`` record
    wraps status line + headers + body): bytes after the first blank
    line; payloads without one pass through unchanged."""
    if payload is None:
        return None
    # split at the EARLIEST blank line of either convention: checking
    # CRLF first would let a CRLF blank line deep in the BODY win
    # over the real LF-LF header terminator and silently truncate
    i_crlf = payload.find(b"\r\n\r\n")
    i_lf = payload.find(b"\n\n")
    candidates = [
        (i, sep_len)
        for i, sep_len in ((i_crlf, 4), (i_lf, 2))
        if i != -1
    ]
    if not candidates:
        return payload
    i, sep_len = min(candidates)
    return payload[i + sep_len:]


def response_texts(df, encoding: str = "utf-8"):
    """WARC records → (file, target_uri, text) for ``response`` /
    ``resource`` records, decoded with replacement — the handoff into
    the text-curation operators. The HTTP envelope (status line +
    headers) is stripped ONLY for ``response`` records — per the WARC
    spec a ``resource`` record carries the raw retrieved payload with
    no protocol envelope, so its bytes pass through whole (stripping
    would silently drop everything before the first blank line, e.g.
    a leading paragraph). Arrow-batched; stays one map task per input
    partition."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            keep = b[b["error"].isna() & b["warc_type"].isin(["response", "resource"])]
            texts = [
                (
                    (http_response_body(p) if t == "response" else p)
                    or b""
                ).decode(encoding, "replace")
                for p, t in zip(keep["payload"], keep["warc_type"])
            ]
            yield pd.DataFrame({
                "file": keep["file"].values,
                "target_uri": keep["target_uri"].values,
                "text": texts,
            })

    return df.mapInPandas(extract, "file string, target_uri string, text string")


def _safe_header_value(v: str) -> str:
    """Percent-encode control characters (C0 + DEL) in a header value
    before serializing. A raw CR/LF in a value (e.g. a crafted
    ``target_uri``) would inject header LINES into the written record
    — ``'http://a/b\\r\\nWARC-Type: evil'`` round-trips with
    ``warc_type='evil'`` otherwise. RFC 3986 already forbids raw
    control chars in URIs, so legal URIs are untouched and the
    ``read_warc(write_warc_dataset(df)) ≡ df`` invariant holds
    byte-exactly for them; hostile values round-trip percent-encoded
    (%0D%0A…) instead of corrupting the record structure."""
    if not any(ord(ch) < 0x20 or ord(ch) == 0x7F for ch in v):
        return v
    return "".join(
        f"%{ord(ch):02X}" if (ord(ch) < 0x20 or ord(ch) == 0x7F) else ch
        for ch in v
    )


def _record_bytes(rec: dict, gzip_member: bool = False) -> bytes:
    """One spec-shaped WARC record (optionally its own gzip member —
    a .warc.gz is a concatenation of per-record members). Shared by
    the driver-side fixture writer and the distributed sink so the
    two byte layouts cannot drift. Header values are sanitized via
    ``_safe_header_value`` (CR/LF injection defense)."""
    payload = rec.get("payload") or b""
    head = [b"WARC/1.0"]
    hdrs = {
        "WARC-Type": rec.get("warc_type", "response"),
        "WARC-Record-ID": rec.get("record_id", "<urn:uuid:0>"),
        "WARC-Date": rec.get("warc_date", "2026-01-01T00:00:00Z"),
        "Content-Type": rec.get("content_type", "application/http"),
        "Content-Length": str(len(payload)),
    }
    if rec.get("target_uri"):
        hdrs["WARC-Target-URI"] = rec["target_uri"]
    for k, v in hdrs.items():
        head.append(f"{k}: {_safe_header_value(str(v))}".encode())
    raw = b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"
    if gzip_member:
        import gzip as _gzip

        raw = _gzip.compress(raw)
    return raw


def write_warc(path: str, records: "list[dict]", gzip_members: bool = False) -> None:
    """Test/fixture writer: serialize records ({headers...,
    'payload': bytes}) into a spec-shaped .warc or per-member-gzip
    .warc.gz."""
    with open(path, "wb") as f:
        f.write(b"".join(_record_bytes(r, gzip_members) for r in records))


def write_warc_dataset(
    df,
    path: str,
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    gzip_members: bool = True,
) -> "list":
    """Distributed WARC sink: every task serializes ITS partition's
    (uri, payload) rows into one ``part-NNNNN.warc[.gz]`` shard under
    ``path`` — the inverse of ``read_warc``'s file-per-task topology,
    so export parallelism equals partition count and no row ever
    moves to the driver. Returns the collected shard manifest (one
    row per non-empty partition: path, n_records, n_bytes) — the only
    driver-sized artifact.

    Record ids are ``<urn:demv:PARTITION:SEQ>`` (deterministic given
    a fixed partitioning); the byte layout is ``_record_bytes``, the
    SAME serializer the fixture writer uses, so
    ``read_warc(write_warc_dataset(df)) ≡ df`` by construction.
    The target dir is recreated (overwrite semantics): shard names
    depend on the partition count, so appending to a stale dir could
    double-read old shards. Each task ATTEMPT streams its records
    into an attempt-private dot-prefixed temp file (peak memory = one
    record, not the shard) and atomically ``os.replace``s it onto the
    final shard name — concurrent speculative attempts never
    interleave bytes, the last completed attempt wins with a whole
    file, and a hard-killed attempt leaves only a ``.part-*.tmp-*``
    file Spark's file index ignores (hidden-file convention: names
    starting with ``.`` or ``_`` are filtered from every scan). No job-level commit
    protocol: a failed JOB leaves a partially-written dir (the same
    caveat as any direct-write sink — write to a fresh dir and swap
    for transactional swaps). Tasks write with plain ``open()`` —
    ``path`` must be a filesystem every executor can reach (local
    mode, NFS, fuse-mounted object store); a pure-HDFS deployment
    would swap the ``open()`` for the Hadoop FileSystem API,
    everything else unchanged."""
    import os as _os
    import shutil as _shutil

    if _os.path.isdir(path):
        _shutil.rmtree(path)
    _os.makedirs(path, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"

    def dump(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        out = _os.path.join(path, f"part-{pid:05d}{ext}")
        tmp = _os.path.join(
            path, f".part-{pid:05d}{ext}.tmp-{ctx.taskAttemptId()}"
        )
        n = 0
        n_bytes = 0
        f = None
        try:
            for b in batches:
                for uri, payload in zip(b[uri_col], b[payload_col]):
                    raw = _record_bytes(
                        {
                            "target_uri": None if uri is None else str(uri),
                            "payload": (
                                None if payload is None else bytes(payload)
                            ),
                            "record_id": f"<urn:demv:{pid}:{n}>",
                        },
                        gzip_members,
                    )
                    if f is None:  # lazy: no empty shards ever appear
                        f = open(tmp, "wb")
                    f.write(raw)
                    n += 1
                    n_bytes += len(raw)
            if f is None:
                yield pd.DataFrame({"path": [], "n_records": [], "n_bytes": []})
                return
            f.close()
            f = None
            _os.replace(tmp, out)  # atomic: whole file or nothing
        finally:
            if f is not None:
                f.close()
            if _os.path.exists(tmp):
                _os.remove(tmp)
        yield pd.DataFrame(
            {"path": [out], "n_records": [n], "n_bytes": [n_bytes]}
        )

    manifest = df.select(uri_col, payload_col).mapInPandas(
        dump, "path string, n_records long, n_bytes long"
    )
    return manifest.collect()


def read_warc_stream(spark, path: str):
    """Streaming twin of ``read_warc``: watch a directory for new
    crawl files (the continuous-ingest shape) and parse each arriving
    file with the SAME per-file mapInPandas task, so stream and batch
    rows are identical by construction (pinned in tests). Compose
    with ``response_texts`` and the streaming curation operators for
    live crawl-to-corpus. binaryFile streaming requires the explicit
    file schema; maxFilesPerTrigger etc. apply as usual."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType([
        StructField("path", StringType()),
        StructField("modificationTime", TimestampType()),
        StructField("length", LongType()),
        StructField("content", BinaryType()),
    ])
    files = (
        spark.readStream.format("binaryFile")
        .schema(schema)
        .load(path)
        .select("path", "content")
    )
    return _parse_files(files)
