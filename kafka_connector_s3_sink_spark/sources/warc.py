"""Distributed WARC/WET crawl ingestion and export.

A real 100 TB pretraining pipeline does not start from a tidy ``documents``
parquet — it starts from CommonCrawl-style WARC archives (ISO 28500): a
sequence of records, each a ``WARC/1.0`` header block (CRLF-separated
``Name: value`` lines, blank-line terminated) followed by exactly
``Content-Length`` payload bytes and a ``CRLF CRLF`` separator. ``response``
records carry a full HTTP response (status line + headers + body, usually
HTML); WET sidecars carry ``conversion`` records whose payload is extracted
plain text. Crawl WARCs are gzip-compressed with EACH RECORD AS ITS OWN GZIP
MEMBER, which is what makes a 1 GB archive splittable at record boundaries
without a byte index.

This module is the missing first stage in front of the existing pipeline
(``text.html_to_text`` → ``urls.*`` → dedup cascade → ``streaming.ingest``):

- ``read_warc``: one archive per task (the ``sources/objects.py``
  one-object-per-task pattern — a binaryFile scan fans N archives out to N
  tasks, then a single Arrow boundary parses members/records/HTTP in
  vectorized batches). Per-RECORD corruption is routed, not fatal: per-member
  gzip framing means a damaged member resynchronizes at the next member, so
  one flipped byte costs one record, and the ``parse_error`` column says why.
- ``warc_documents``: ``response``/``conversion`` records → the ``documents``
  shape the rest of the engine consumes (``url``, ``fetched_at``, ``text``
  via ``html_to_text`` for HTML responses, payload text for WET).
- ``write_warc``: the inverse, one archive per partition streamed through
  ``sinks.storage.ObjectStorage`` (same abort-on-error commit discipline as
  the sink writer) — spec-compliant output (wget/warcio-compatible framing),
  used both as an export sink and as the distributed fixture generator for
  the correctness gate's byte-losslessness proof.

Scale notes: binaryFile materializes one whole archive per task row —
bounded by archive size (CommonCrawl caps segments at ~1 GB), not corpus
size; at 100 TB that is ~100k independent tasks with no shuffle anywhere in
the scan→parse→extract chain. Parsing is pure Python per batch but runs once
per corpus byte at ingest, emitting columnar Arrow batches whose payloads
downstream JVM expressions (html_to_text, urls) process without re-crossing
the Python boundary.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("record_no", T.IntegerType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)

_GZIP_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------------------
# pure-Python record codec (runs inside tasks; no Spark imports at module use)


def _iter_gzip_members(data: bytes) -> Iterator[tuple[bytes | None, str | None]]:
    """Decompress a multi-member gzip stream member by member, yielding
    (member_bytes, None) or (None, error) — a corrupt member is reported and
    iteration RESUMES at the next gzip magic, so damage is contained to the
    records inside one member (the splittability property crawl WARCs are
    compressed per-record to provide)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(data[pos:])
            if not d.eof:
                yield None, "truncated gzip member"
                return
            consumed = len(data) - pos - len(d.unused_data)
            pos += max(consumed, 1)
            yield member, None
        except zlib.error as e:
            nxt = data.find(_GZIP_MAGIC, pos + 2)
            yield None, f"corrupt gzip member: {e}"
            if nxt == -1:
                return
            pos = nxt


def _find_header_end(data, start: int = 0) -> tuple[int, int]:
    """Position and width of the EARLIEST header terminator at/after
    ``start``: ``CRLF CRLF`` (width 4) or bare ``LF LF`` (width 2),
    whichever occurs first — ``(-1, 0)`` if neither is present.

    Earliest-match matters: probing CRLFCRLF exhaustively before falling
    back to LFLF lets a bare-LF-terminated header whose payload (or a later
    record) contains ``\\r\\n\\r\\n`` steal the terminator, misparsing
    Content-Length and losing the member's remainder. The two patterns
    cannot overlap (LFLF is not a substring of CRLFCRLF), so the earlier
    position is always the real terminator."""
    crlf = data.find(b"\r\n\r\n", start)
    lf = data.find(b"\n\n", start)
    if crlf == -1 and lf == -1:
        return -1, 0
    if lf == -1 or (crlf != -1 and crlf < lf):
        return crlf, 4
    return lf, 2


def _header_text(raw: bytes) -> str:
    """Header bytes → str: UTF-8 first (ISO 28500 allows UTF-8 header
    values — non-ASCII target URIs are common), latin-1 fallback for the
    HTTP-side headers that predate it. Both are total decodings, so a
    malformed value degrades, never raises."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _parse_header_block(block: bytes) -> dict[str, str]:
    """CRLF-separated ``Name: value`` lines → dict (names case-folded).
    Tolerates bare-LF line endings (seen in the wild) per WARC readers'
    convention."""
    headers: dict[str, str] = {}
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if not line or b":" not in line:
            continue
        name, _, value = line.partition(b":")
        headers[_header_text(name.strip()).lower()] = _header_text(value.strip())
    return headers


def iter_warc_records(
    stream: bytes,
) -> Iterator[tuple[dict[str, str] | None, bytes | None, str | None]]:
    """Parse UNCOMPRESSED WARC bytes into (headers, block, error) triples.

    Framing per ISO 28500: version line, header lines, blank line, exactly
    ``Content-Length`` payload bytes, ``CRLF CRLF``. A framing error ends the
    stream (Content-Length is the only record delimiter, so a bad length
    loses the remainder — which is precisely why per-member gzip exists and
    why ``read_warc`` works member-at-a-time)."""
    pos = 0
    n = len(stream)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and stream[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not stream[pos : pos + 5] == b"WARC/":
            yield None, None, "missing WARC/ version line"
            return
        head_end, sep = _find_header_end(stream, pos)
        if head_end == -1:
            yield None, None, "unterminated WARC header block"
            return
        headers = _parse_header_block(stream[pos:head_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            yield headers, None, "missing/invalid Content-Length"
            return
        body_start = head_end + sep
        if body_start + length > n:
            yield headers, None, "payload truncated"
            return
        yield headers, stream[body_start : body_start + length], None
        pos = body_start + length


def _split_http_payload(block: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response block → (status, content-type, body). Non-HTTP or
    malformed heads degrade to (None, None, whole block) — the bytes are
    never dropped."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    head_end, sep = _find_header_end(block)
    if head_end == -1:
        return None, None, block
    head = block[:head_end]
    status_line = head.split(b"\n", 1)[0].rstrip(b"\r")
    parts = status_line.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    http_headers = _parse_header_block(head.split(b"\n", 1)[1] if b"\n" in head else b"")
    return status, http_headers.get("content-type"), block[head_end + sep :]


def build_record(
    warc_type: str,
    payload: bytes,
    *,
    target_uri: str | None = None,
    record_id: str | None = None,
    warc_date: str = "2024-01-01T00:00:00Z",
    content_type: str | None = None,
) -> bytes:
    """One spec-framed, UNCOMPRESSED WARC record. ``record_id`` defaults to a
    deterministic urn derived from (type, uri, payload) so distributed writes
    and task retries reproduce identical bytes (the same idempotence contract
    as the sink's deterministic object names)."""
    import hashlib

    if content_type is None:
        content_type = {
            "response": 'application/http; msgtype="response"',
            "conversion": "text/plain",
            "warcinfo": "application/warc-fields",
        }.get(warc_type, "application/octet-stream")
    if record_id is None:
        digest = hashlib.md5(
            warc_type.encode() + b"\x00" + (target_uri or "").encode() + b"\x00" + payload
        ).hexdigest()
        record_id = f"<urn:uuid:{digest[:8]}-{digest[8:12]}-{digest[12:16]}-{digest[16:20]}-{digest[20:32]}>"
    lines = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: {record_id}",
        f"WARC-Date: {warc_date}",
    ]
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}")
    lines.append(f"Content-Type: {content_type}")
    lines.append(f"Content-Length: {len(payload)}")
    # UTF-8 per ISO 28500 (header values may be UTF-8; ASCII is unchanged)
    head = ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8")
    return head + payload + b"\r\n\r\n"


def build_http_response_payload(
    body: bytes, *, status: int = 200, content_type: str = "text/html; charset=utf-8"
) -> bytes:
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(status, "")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1")
    return head + body


def _gzip_member(record: bytes) -> bytes:
    """One record → one gzip member (mtime pinned to 0 for byte-determinism)."""
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    # wbits=31 emits a gzip header with mtime=0 and no filename — deterministic
    return c.compress(record) + c.flush()


# ---------------------------------------------------------------------------
# distributed read


def read_warc(
    spark: SparkSession,
    path: str,
    on_error: str = "route",
    batch_records: int = 256,
    batch_bytes: int = 1 << 25,
) -> DataFrame:
    """Every WARC record under ``path`` (``*.warc.gz`` per-member gzip,
    ``*.warc`` plain, or WET equivalents), one archive per task.

    ``on_error="route"`` (crawl posture, default) emits one row per damaged
    member/record with ``parse_error`` set and everything else null;
    ``"fail"`` raises. Output batches are bounded by ``batch_records`` rows /
    ``batch_bytes`` payload bytes so a task's Arrow batches stay small even
    when one archive holds millions of records."""
    if on_error not in ("fail", "route"):
        raise ValueError(f"on_error must be 'fail' or 'route', got {on_error!r}")

    def decode(batches) -> Iterator:
        import pandas as pd

        rows: list[tuple] = []
        held = 0

        def flush():
            nonlocal rows, held
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
                )
                rows, held = [], 0

        def emit(row):
            nonlocal held
            rows.append(row)
            held += len(row[10] or b"")

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                no = 0
                if data[:2] == _GZIP_MAGIC:
                    chunks = _iter_gzip_members(data)
                else:
                    chunks = iter([(data, None)])
                for member, gz_err in chunks:
                    if gz_err is not None:
                        if on_error == "fail":
                            raise ValueError(f"{fpath}: {gz_err}")
                        emit((fpath, no, None, None, None, None, None, None,
                              None, None, None, gz_err))
                        no += 1
                        continue
                    for headers, block, err in iter_warc_records(member):
                        if err is not None:
                            if on_error == "fail":
                                raise ValueError(f"{fpath}: {err}")
                            emit((fpath, no, None, None, None, None, None,
                                  None, None, None, None, err))
                            no += 1
                            continue
                        wtype = headers.get("warc-type")
                        status, http_ct, body = (None, None, block)
                        if wtype == "response":
                            status, http_ct, body = _split_http_payload(block)
                        emit(
                            (
                                fpath,
                                no,
                                wtype,
                                headers.get("warc-record-id"),
                                headers.get("warc-target-uri"),
                                headers.get("warc-date"),
                                headers.get("content-type"),
                                int(headers["content-length"]),
                                status,
                                http_ct,
                                body,
                                None,
                            )
                        )
                        no += 1
                        if len(rows) >= batch_records or held >= batch_bytes:
                            yield from flush()
            yield from flush()

    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(decode, WARC_RECORD_SCHEMA)


def warc_documents(records: DataFrame, main_content: bool = False) -> DataFrame:
    """``response``/``conversion`` records → the engine's crawl-document
    shape: ``(url, fetched_at, http_status, mime, text, doc_id)``.

    HTML responses run ``text.html_to_text`` (JVM regexp — the payload
    crosses the Python/Arrow boundary exactly once, in ``read_warc``), or
    ``text.html_main_content`` when ``main_content=True`` (structural
    boilerplate regions stripped first — the near-dup-sharpening posture);
    WET ``conversion`` payloads ARE extracted text and pass through.
    ``doc_id`` is a content-derived 63-bit key (xxhash of url + payload) —
    stable across re-reads, collision-checked downstream by the dedup
    cascade. Non-2xx and non-text responses yield null ``text`` but keep
    their row: filtering is the pipeline's decision, not the reader's."""
    from kafka_connector_s3_sink_spark.operators.text import (
        html_main_content,
        html_to_text,
    )

    extract = html_main_content if main_content else html_to_text
    is_resp = F.col("warc_type") == "response"
    is_conv = F.col("warc_type") == "conversion"
    body_text = F.col("payload").cast("string")
    is_html = F.col("http_content_type").rlike("(?i)^text/html")
    text = (
        F.when(is_conv, body_text)
        .when(is_resp & is_html, extract(body_text))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        records.filter((is_resp | is_conv) & F.col("parse_error").isNull())
        .select(
            F.col("target_uri").alias("url"),
            F.to_timestamp("warc_date").alias("fetched_at"),
            F.col("http_status"),
            F.coalesce("http_content_type", "content_type").alias("mime"),
            text.alias("text"),
            F.octet_length("payload").alias("n_bytes"),
            F.abs(F.xxhash64("target_uri", "payload")).alias("doc_id"),
        )
    )


def enrich_crawl_documents(
    docs: DataFrame,
    quality_weights=None,
) -> DataFrame:
    """One-call crawl preprocessing over ``warc_documents`` output: URL
    hygiene (host, registrable domain, canonical URL), multi-language ID,
    quality score (static heuristic or the trained classifier when
    ``quality_weights`` is given), token count, and the exact-dup
    fingerprint — every column a row-local JVM expression, so the whole
    enrichment fuses into the scan→parse stage with zero added shuffles.
    The output is the standard input to the dedup cascade / ingest pipeline
    and to mixture/politeness planning (group by ``domain``)."""
    from kafka_connector_s3_sink_spark.operators import text as text_ops
    from kafka_connector_s3_sink_spark.operators import urls as url_ops

    u = F.col("url")
    t = F.col("text")
    if quality_weights is not None:
        from kafka_connector_s3_sink_spark.operators.quality import (
            classifier_score,
        )

        quality = classifier_score(t, quality_weights)
    else:
        quality = text_ops.quality_score(t)
    return docs.select(
        "*",
        url_ops.url_host(u).alias("host"),
        url_ops.registrable_domain(u).alias("domain"),
        url_ops.strip_tracking(u).alias("canonical_url"),
        text_ops.language_id_multi(t).alias("lang"),
        F.when(t.isNotNull(), quality).alias("quality"),
        F.when(t.isNotNull(), text_ops.token_count(t)).alias("n_tokens"),
        F.when(t.isNotNull(), text_ops.fingerprint(t)).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# distributed write (export sink + gate fixture generator)


def write_warc(
    df: DataFrame,
    dest_dir: str,
    *,
    file_prefix: str = "crawl",
    compress: bool = True,
    warcinfo: str | None = None,
    record_type: str = "response",
) -> list[str]:
    """Write ``(target_uri, payload [, warc_date, http_status,
    http_content_type])`` rows as spec-framed WARC archives, one
    ``<prefix>-<partitionId>.warc[.gz]`` per partition, per-record gzip
    members (splittable), streamed through ``ObjectStorage`` with the sink's
    abort-on-error commit (a failed task leaves no partial archive; a retry
    reproduces identical bytes — record ids are content-derived). Returns the
    object names written. Rows with null payload are skipped.

    ``record_type="response"`` (default) wraps each payload in an HTTP
    response (a crawl archive); ``"conversion"`` writes the payload verbatim
    as ``text/plain`` conversion records — the WET shape (see ``write_wet``
    for the documents-DataFrame convenience form)."""
    from kafka_connector_s3_sink_spark.sinks.storage import ObjectStorage

    if record_type not in ("response", "conversion"):
        raise ValueError(f"record_type must be response|conversion, got {record_type!r}")
    storage = ObjectStorage(dest_dir)
    cols = set(df.columns)
    sel = [
        F.col("target_uri"),
        F.col("payload"),
        (F.col("warc_date") if "warc_date" in cols
         else F.lit("2024-01-01T00:00:00Z")).alias("warc_date"),
        (F.col("http_status") if "http_status" in cols else F.lit(200))
        .alias("http_status"),
        (F.col("http_content_type") if "http_content_type" in cols
         else F.lit("text/html; charset=utf-8")).alias("http_content_type"),
    ]
    wet = record_type == "conversion"
    ext = (".warc.wet" if wet else ".warc") + (".gz" if compress else "")

    def write_partition(rows: Iterator) -> Iterator[str]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"{file_prefix}-{pid:05d}{ext}"
        first = True
        wrote = False
        with storage.open_output(name) as out:
            def put(record: bytes):
                out.write(_gzip_member(record) if compress else record)

            for row in rows:
                if row["payload"] is None:
                    continue
                if first and warcinfo is not None:
                    put(build_record("warcinfo", warcinfo.encode("utf-8"),
                                     warc_date=row["warc_date"]))
                first = False
                wrote = True
                if wet:
                    put(
                        build_record(
                            "conversion",
                            bytes(row["payload"]),
                            target_uri=row["target_uri"],
                            warc_date=row["warc_date"],
                            content_type="text/plain",
                        )
                    )
                    continue
                http = build_http_response_payload(
                    bytes(row["payload"]),
                    status=row["http_status"],
                    content_type=row["http_content_type"],
                )
                put(
                    build_record(
                        "response",
                        http,
                        target_uri=row["target_uri"],
                        warc_date=row["warc_date"],
                    )
                )
            if not wrote:
                raise _EmptyPartition()  # abort: no empty archives
        yield name

    def safe(rows: Iterator) -> Iterator[str]:
        try:
            yield from write_partition(rows)
        except _EmptyPartition:
            return

    return sorted(df.select(*sel).rdd.mapPartitions(safe).collect())


def write_wet(
    docs: DataFrame,
    dest_dir: str,
    *,
    url_col: str = "url",
    text_col: str = "text",
    file_prefix: str = "extract",
    compress: bool = True,
    warcinfo: str | None = None,
) -> list[str]:
    """Export a documents DataFrame as WET archives (``conversion`` records,
    payload = the extracted text) — the crawl-native materialization of a
    post-extraction corpus, re-ingestable by ``read_warc``/the ``warc``
    source on the other side (``warc_documents`` passes conversion payloads
    through as ``text``). Null-text rows are skipped."""
    return write_warc(
        docs.select(
            F.col(url_col).alias("target_uri"),
            F.encode(F.col(text_col), "UTF-8").alias("payload"),
        ),
        dest_dir,
        file_prefix=file_prefix,
        compress=compress,
        warcinfo=warcinfo,
        record_type="conversion",
    )


class _EmptyPartition(Exception):
    """Control-flow: a partition with no payload rows writes no archive."""


def compact_warc_store(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_records_per_archive: int = 50_000,
    file_prefix: str = "compact",
    main_records_only: bool = True,
) -> list[str]:
    """Fold a store of many SMALL archives (the shape a fetcher fleet
    produces — one archive per fetcher flush) into right-sized ones:
    re-ingest via ``read_warc``, repartition EACH record type to
    ``ceil(type_count / target_records_per_archive)`` partitions, re-export
    with ``write_warc`` — same pattern as ``packing.compact_parquet`` for
    the parquet side. Response records keep their HTTP framing (status and
    content-type re-emitted); with ``main_records_only`` (default)
    warcinfo/request/metadata records drop — compaction is a DATA
    maintenance op, and each output archive gets its own fresh warcinfo.
    Record ids and gzip members stay content-derived/deterministic, so
    re-running compaction is idempotent byte-wise per partition."""
    import math

    records = read_warc(spark, src_dir).filter(F.col("parse_error").isNull())
    if main_records_only:
        records = records.filter(
            F.col("warc_type").isin("response", "conversion")
        )
    # one lightweight job; per-TYPE counts drive the partition counts — a
    # mixed store sized off the combined count would emit up to 2x the
    # intended archives, each half-filled
    counts = {
        row["warc_type"]: row["count"]
        for row in records.groupBy("warc_type").count().collect()
    }
    resp_n = counts.get("response", 0)
    conv_n = counts.get("conversion", 0)
    if resp_n == 0 and conv_n == 0:
        return []
    conversions = records.filter(F.col("warc_type") == "conversion")
    responses = records.filter(F.col("warc_type") == "response")
    written: list[str] = []
    if resp_n:
        n_out = max(1, math.ceil(resp_n / target_records_per_archive))
        written += write_warc(
            responses.select(
                "target_uri",
                "payload",
                F.coalesce(
                    "warc_date", F.lit("2024-01-01T00:00:00Z")
                ).alias("warc_date"),
                F.coalesce("http_status", F.lit(200)).alias("http_status"),
                F.coalesce(
                    "http_content_type", F.lit("text/html; charset=utf-8")
                ).alias("http_content_type"),
            ).repartition(n_out),
            dest_dir,
            file_prefix=file_prefix,
            warcinfo="operation: compaction\r\n",
        )
    if conv_n:
        n_out = max(1, math.ceil(conv_n / target_records_per_archive))
        written += write_warc(
            conversions.select(
                "target_uri",
                "payload",
                F.coalesce(
                    "warc_date", F.lit("2024-01-01T00:00:00Z")
                ).alias("warc_date"),
            ).repartition(n_out),
            dest_dir,
            file_prefix=f"{file_prefix}-wet",
            warcinfo="operation: compaction\r\n",
            record_type="conversion",
        )
    return sorted(written)


# ---------------------------------------------------------------------------
# constant-memory streaming decode + the registrable "warc" Data Source


def _decompress_members_streaming(chunks: Iterator[bytes]) -> Iterator[bytes]:
    """Multi-member gzip → decompressed byte pieces, incrementally: each
    compressed chunk is fed to the current member's decompressor and any
    output yielded immediately; at member end the leftover bytes seed the
    next member. Memory is O(chunk), never O(archive) — the property that
    lets one task stream a 1 GB CommonCrawl segment without holding it."""
    d = zlib.decompressobj(wbits=31)
    for chunk in chunks:
        while chunk:
            out = d.decompress(chunk)
            if out:
                yield out
            if d.eof:
                chunk = d.unused_data
                d = zlib.decompressobj(wbits=31)
            else:
                chunk = b""


def _parse_records_streaming(
    pieces: Iterator[bytes],
) -> Iterator[tuple[dict[str, str] | None, bytes | None, str | None]]:
    """Incremental WARC framing over a byte stream: buffers only until one
    record is complete (bounded by max record size), emits, and discards.
    A trailing partial record surfaces as one error triple."""
    buf = bytearray()

    def try_one() -> tuple | None:
        # skip inter-record CRLFs
        start = 0
        while start < len(buf) and buf[start : start + 1] in (b"\r", b"\n"):
            start += 1
        if len(buf) - start < 5:
            return None
        if bytes(buf[start : start + 5]) != b"WARC/":
            return (None, None, "missing WARC/ version line"), len(buf)
        head_end, sep = _find_header_end(buf, start)
        if head_end == -1:
            return None  # header still incomplete
        headers = _parse_header_block(bytes(buf[start:head_end]))
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            return (headers, None, "missing/invalid Content-Length"), len(buf)
        body_start = head_end + sep
        if len(buf) < body_start + length:
            return None  # body incomplete
        body = bytes(buf[body_start : body_start + length])
        return (headers, body, None), body_start + length

    for piece in pieces:
        buf += piece
        while True:
            got = try_one()
            if got is None:
                break
            triple, consumed = got
            yield triple
            del buf[:consumed]
            if triple[2] is not None:
                # framing lost: Content-Length is the only record delimiter,
                # so the remainder is unparseable — stop (the binaryFile
                # route's per-member resync is read_warc's job)
                return
    if bytes(buf).strip(b"\r\n"):
        yield None, None, "payload truncated"


def _record_rows(
    fpath: str,
    triples: Iterator[tuple],
    on_error: str,
) -> Iterator[tuple]:
    """(headers, block, err) triples → WARC_RECORD_SCHEMA rows."""
    no = 0
    for headers, block, err in triples:
        if err is not None:
            if on_error == "fail":
                raise ValueError(f"{fpath}: {err}")
            yield (fpath, no, None, None, None, None, None, None, None,
                   None, None, err)
            no += 1
            continue
        wtype = (headers or {}).get("warc-type")
        status, http_ct, body = (None, None, block)
        if wtype == "response":
            status, http_ct, body = _split_http_payload(block)
        yield (
            fpath, no, wtype,
            headers.get("warc-record-id"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("content-type"),
            int(headers["content-length"]),
            status, http_ct, body, None,
        )
        no += 1


def _open_archive_chunks(
    storage, name: str, chunk_bytes: int = 1 << 20
) -> Iterator[bytes]:
    with storage.open_input(name) as f:
        head = f.read(2)
        compressed = head == _GZIP_MAGIC
        pieces = iter(lambda: f.read(chunk_bytes), b"")

        def all_chunks() -> Iterator[bytes]:
            yield head
            yield from pieces

        if compressed:
            yield from _decompress_members_streaming(all_chunks())
        else:
            yield from all_chunks()


from pyspark.sql.datasource import (  # noqa: E402 — grouped with their users
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class WarcDataSource(DataSource):
    """Registrable ``spark.read.format("warc")`` / ``spark.readStream
    .format("warc")`` over a directory of WARC/WET archives.

    This is the SCALE path next to ``read_warc``: the binaryFile route hands
    each task the whole archive as one row, so peak task memory is
    O(archive); here each task STREAMS its archive through the incremental
    gzip-member decoder (O(chunk) memory) — the difference between "works on
    fixtures" and "works on 1 GB CommonCrawl segments". Planning is one
    ``InputPartition`` per archive (driver lists names only); the streaming
    form's offset is the seen-archive set (crawl drops are immutable and
    append-only, the same listing-delta contract as ``sink_objects``), and
    every byte is read/decompressed/parsed inside executor tasks.

    Options: ``path`` (required), ``on_error`` (``route`` default | ``fail``).
    Registration is per-session: ``spark.dataSource.register(WarcDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> T.StructType:
        return WARC_RECORD_SCHEMA

    def reader(self, schema: T.StructType) -> "_WarcBatchReader":
        return _WarcBatchReader(self.options)

    def streamReader(self, schema: T.StructType) -> "_WarcStreamReader":
        return _WarcStreamReader(self.options)


class _WarcReaderCore:
    def __init__(self, options):
        self._path = options["path"]
        self._on_error = options.get("on_error", "route")
        if self._on_error not in ("fail", "route"):
            raise ValueError(
                f"on_error must be 'fail' or 'route', got {self._on_error!r}"
            )

    def _storage(self):
        from kafka_connector_s3_sink_spark.sinks.storage import ObjectStorage

        return ObjectStorage(self._path)

    def _names(self) -> list[str]:
        return [n for n in self._storage().listing() if ".warc" in n]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # executor-side: stream one archive through the incremental decoder
        storage = self._storage()
        name = partition.value

        def triples() -> Iterator[tuple]:
            # a gzip-stream error (corrupt member) aborts THIS archive's
            # remainder but routes as one error row instead of failing the
            # task — the batch binaryFile route (read_warc) additionally
            # resyncs at member boundaries when forensics matter
            try:
                yield from _parse_records_streaming(
                    _open_archive_chunks(storage, name)
                )
            except Exception as e:  # noqa: BLE001 — routed per policy
                if self._on_error == "fail":
                    raise
                yield None, None, f"{type(e).__name__}: {e}"

        return _record_rows(name, triples(), self._on_error)


class _WarcBatchReader(_WarcReaderCore, DataSourceReader):
    def partitions(self):
        return [InputPartition(n) for n in self._names()]


class _WarcStreamReader(_WarcReaderCore, DataSourceStreamReader):
    def initialOffset(self) -> dict:
        return {"names": []}

    def latestOffset(self) -> dict:
        return {"names": self._names()}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["names"]) - set(start["names"]))
        return [InputPartition(n) for n in new]

    def commit(self, end: dict) -> None:
        pass  # archives are immutable
