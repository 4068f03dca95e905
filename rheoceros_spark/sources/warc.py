"""WARC (Web ARChive, ISO 28500) record demux — the byte-level stage 0
of a crawl pipeline: one ``.warc`` file is a stream of back-to-back
records (``WARC/1.0`` header block, CRLF-separated named fields
including a mandatory ``Content-Length``, blank line, payload, blank
line), and Common Crawl publishes exactly this format.

Same design as the concatenated-P6 video demux
(``operators/multimodal.py`` ``scan_ppm_stream``): a strict pure-Python
scanner computes REAL byte offsets from the headers (never arithmetic
placeholders), and the Spark operator fans records out of binary
payload columns via Arrow-batched ``mapInPandas`` — per-file
independent, so demux parallelism equals scan parallelism and record
rows (not whole archives) flow downstream.

``encode_warc`` is the writer twin used by fixtures and tests; round
trips are byte-exact.  HTTP ``response`` payloads can optionally have
their HTTP header block split off (CCNet/C4 consume the entity body).

Public format only (ISO 28500 / IIPC warc-specifications).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "WarcRecord",
    "scan_warc_stream",
    "encode_warc",
    "warc_records",
    "wet_records",
    "load_warc",
    "load_wet",
]

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


class WarcRecord(NamedTuple):
    """One demuxed record: ``offset`` / ``header_len`` are byte
    positions in the stream; ``payload`` is exactly
    ``Content-Length`` bytes starting at ``offset + header_len``."""

    offset: int
    header_len: int
    content_length: int
    warc_type: Optional[str]
    target_uri: Optional[str]


def scan_warc_stream(blob: bytes) -> list[WarcRecord]:
    """Strict scan of a concatenated-WARC byte stream.

    Raises ``ValueError`` on malformed input (bad magic, missing or
    non-numeric ``Content-Length``, truncated payload, missing
    record separator) — a silently mis-framed archive would corrupt
    every downstream record, the same loud-reject contract as the
    tokenizer-artifact reader."""
    records: list[WarcRecord] = []
    i = 0
    n = len(blob)
    while i < n:
        if not blob.startswith(b"WARC/", i):
            raise ValueError(
                f"warc: expected record header at byte {i}, "
                f"got {blob[i:i + 8]!r}"
            )
        hdr_end = blob.find(_SEP, i)
        if hdr_end < 0:
            raise ValueError(f"warc: unterminated header block at byte {i}")
        header_len = hdr_end + len(_SEP) - i
        content_length: Optional[int] = None
        warc_type: Optional[str] = None
        target_uri: Optional[str] = None
        # first line is the version; subsequent lines are Name: value
        for line in blob[i:hdr_end].split(_CRLF)[1:]:
            name, _, value = line.partition(b":")
            key = name.strip().lower()
            val = value.strip()
            if key == b"content-length":
                if not val.isdigit():
                    raise ValueError(
                        f"warc: non-numeric Content-Length {val!r} at byte {i}"
                    )
                content_length = int(val)
            elif key == b"warc-type":
                warc_type = val.decode("utf-8", "replace")
            elif key == b"warc-target-uri":
                target_uri = val.decode("utf-8", "replace")
        if content_length is None:
            raise ValueError(f"warc: record at byte {i} has no Content-Length")
        body_start = i + header_len
        body_end = body_start + content_length
        if body_end > n:
            raise ValueError(
                f"warc: truncated payload at byte {i} "
                f"(need {content_length}, have {n - body_start})"
            )
        records.append(
            WarcRecord(i, header_len, content_length, warc_type, target_uri)
        )
        i = body_end
        # the spec terminates every record with two CRLFs; accept EOF
        # right after the payload of the final record
        if i == n:
            break
        if not blob.startswith(_SEP, i):
            raise ValueError(
                f"warc: missing record separator at byte {i}"
            )
        i += len(_SEP)
    return records


def encode_warc(
    records: Sequence[tuple[str, Optional[str], bytes]],
    version: str = "WARC/1.0",
) -> bytes:
    """Writer twin of :func:`scan_warc_stream`:
    ``records = [(warc_type, target_uri_or_None, payload_bytes), ...]``
    → one well-formed concatenated stream.  Round trips byte-exactly
    (pinned in tests) — this is how fixtures build archives."""
    out = bytearray()
    for warc_type, uri, payload in records:
        out += version.encode("ascii") + _CRLF
        out += b"WARC-Type: " + warc_type.encode("ascii") + _CRLF
        if uri is not None:
            out += b"WARC-Target-URI: " + uri.encode("utf-8") + _CRLF
        out += b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
        out += _CRLF
        out += payload
        out += _SEP
    return bytes(out)


WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.StringType(), False),
        T.StructField("rec_idx", T.IntegerType(), False),
        T.StructField("byte_offset", T.LongType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("content_length", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("http_status", T.IntegerType(), True),
    ]
)


def _split_http(payload: bytes) -> tuple[Optional[int], bytes]:
    """If the payload is an HTTP message (``response`` records carry
    the full wire exchange), split off the HTTP header block and parse
    the status code; otherwise return it unchanged."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    sep = payload.find(_SEP)
    if sep < 0:
        return None, payload
    status_line = payload[: payload.find(_CRLF)]
    parts = status_line.split(b" ")
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    return status, payload[sep + len(_SEP):]


def warc_records(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "source_id",
    strip_http_headers: bool = True,
) -> DataFrame:
    """Demux binary WARC streams into one row per record:
    (source_id, rec_idx, byte_offset, warc_type, target_uri,
    content_length, payload, http_status).

    A malformed archive contributes NO rows instead of killing the job
    (the ``sample_frames_ppm`` one-bad-blob contract) — at crawl scale
    a truncated file is routine and must be quarantined, not fatal.
    With ``strip_http_headers`` (default), HTTP payloads are reduced to
    their entity body and the status code is surfaced — what the HTML
    extractor downstream actually consumes.

    Scale shape: Arrow-batched ``mapInPandas`` over a column-pruned
    (id, content) projection; per-file independent, record rows flow
    downstream so the HTML stage never re-reads archives."""
    pruned = df.where(F.col(id_col).isNotNull()).select(
        F.col(id_col).cast("string").alias("source_id"), content_col
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for sid, blob in zip(pdf["source_id"], pdf[content_col]):
                if blob is None:
                    continue
                blob = bytes(blob)
                try:
                    recs = scan_warc_stream(blob)
                except ValueError:
                    continue
                for idx, r in enumerate(recs):
                    payload = blob[
                        r.offset + r.header_len:
                        r.offset + r.header_len + r.content_length
                    ]
                    status: Optional[int] = None
                    if strip_http_headers:
                        status, payload = _split_http(payload)
                    rows.append(
                        {
                            "source_id": sid,
                            "rec_idx": idx,
                            "byte_offset": r.offset,
                            "warc_type": r.warc_type,
                            "target_uri": r.target_uri,
                            "content_length": r.content_length,
                            "payload": payload,
                            "http_status": status,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return pruned.mapInPandas(batches, schema=WARC_RECORD_SCHEMA)


def load_warc(
    spark,
    path: str,
    strip_http_headers: bool = True,
    path_glob: Optional[str] = None,
) -> DataFrame:
    """Read ``.warc`` files with Spark's ``binaryFile`` source and
    demux (:func:`warc_records`).  ``source_id`` is the file path —
    binaryFile gives splittable listing parallelism (one task per
    file), which matches WARC's file-level independence; Common Crawl
    ships ~1 GB archives, so file-granular tasks are the right unit at
    100 TB."""
    reader = spark.read.format("binaryFile")
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    raw = reader.load(path).select(
        F.col("path").alias("source_id"), F.col("content")
    )
    return warc_records(
        raw, content_col="content", id_col="source_id",
        strip_http_headers=strip_http_headers,
    )


def wet_records(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "source_id",
) -> DataFrame:
    """Demux WET archives — Common Crawl's extracted-text distribution:
    the same ISO-28500 framing as WARC, but every document is a
    ``conversion`` record whose payload is plain UTF-8 text (no HTTP
    wire exchange).  Output: one text row per document —
    (source_id, rec_idx, byte_offset, target_uri, text) — ready for
    the text pipeline (gopher rules, dedup, lang-id) with NO HTML
    extraction stage.  ``warcinfo``/metadata records are dropped;
    undecodable bytes are replaced, never fatal (the one-bad-blob
    contract of the underlying demux)."""
    recs = warc_records(
        df, content_col=content_col, id_col=id_col, strip_http_headers=False
    )
    return recs.where(F.col("warc_type") == "conversion").select(
        "source_id",
        "rec_idx",
        "byte_offset",
        "target_uri",
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )


def load_wet(
    spark,
    path: str,
    path_glob: Optional[str] = None,
) -> DataFrame:
    """Read ``.wet`` files with the binaryFile source and demux to
    text rows (:func:`wet_records`) — file-granular tasks, matching
    Common Crawl's archive unit (see :func:`load_warc`)."""
    reader = spark.read.format("binaryFile")
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    raw = reader.load(path).select(
        F.col("path").alias("source_id"), F.col("content")
    )
    return wet_records(raw)
