"""WARC ingestion (round 9): the Web ARChive container — the format
Common Crawl and every serious web corpus ship in — parsed pure-stdlib
into one row per record, with HTTP response payloads split into
status/headers/body so the HTML-extraction operator
(`functions/text.py::strip_html`) turns a crawl file into `documents`
rows in one map-only pass.

Reference parity: the reference ingests CSV files into a pipeline
(`README.md:8-13`); a training-data deployment of the same engine
ingests crawl archives — this module is that source, with the same
malformed-record discipline (a corrupt record lands a quarantine row
carrying `parse_error`; the file's remaining records still parse).

Scale shape: WARC files are independent units — `binaryFile` +
`mapInPandas` parses each file inside one task with zero shuffle, so
a 100 TB crawl parallelizes by file exactly like Common Crawl's own
processing; gzip members decompress streamwise (multi-member
`GzipFile`, the member-per-record layout CC uses). Record payloads
never pass through Python row-at-a-time — whole Arrow batches of file
blobs in, record rows out.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame

_CRLF = b"\r\n"


def _maybe_gunzip(data: bytes) -> bytes:
    """Transparently inflate gzip input — including the multi-member
    (one member per record) layout real crawl archives use, which
    `gzip.decompress` would silently truncate to the first member."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            out += chunk
    return bytes(out)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Walk a (possibly gzipped) WARC stream -> (headers, payload)
    per record. Header names are lower-cased; the version line is
    validated; payload length comes from Content-Length (mandatory
    per the spec). Malformed structure raises ValueError — the caller
    decides whether that quarantines the record or the file."""
    data = _maybe_gunzip(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        end = data.find(_CRLF + _CRLF, pos)
        if end < 0:
            raise ValueError("WARC: unterminated record header block")
        head = data[pos:end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(
                f"WARC: bad version line {head[0][:40]!r}"
            )
        headers: dict[str, str] = {}
        for line in head[1:]:
            k, sep, v = line.partition(":")
            if not sep:
                raise ValueError(f"WARC: malformed header {line[:40]!r}")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as ex:
            raise ValueError("WARC: missing/bad Content-Length") from ex
        body_at = end + 4
        if body_at + length > n:
            raise ValueError("WARC: payload extends past the stream")
        yield headers, data[body_at : body_at + length]
        pos = body_at + length


def parse_http_response(payload: bytes) -> tuple[int, dict, bytes]:
    """HTTP/1.x response payload -> (status, headers, body)."""
    split = payload.find(_CRLF + _CRLF)
    if split < 0:
        raise ValueError("HTTP: no header/body separator")
    head = payload[:split].decode("utf-8", "replace").split("\r\n")
    parts = head[0].split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"HTTP: bad status line {head[0][:40]!r}")
    try:
        status = int(parts[1])
    except ValueError as ex:
        raise ValueError(f"HTTP: bad status {parts[1][:12]!r}") from ex
    headers: dict[str, str] = {}
    for line in head[1:]:
        k, sep, v = line.partition(":")
        if sep:
            headers[k.strip().lower()] = v.strip()
    return status, headers, payload[split + 4 :]


WARC_RECORD_SCHEMA = (
    "file_id long, rec_idx int, warc_type string, target_uri string, "
    "http_status int, n_payload_bytes int, n_body_bytes int, "
    "body binary, parse_error string"
)


def warc_records(
    df: DataFrame,
    id_col: str = "file_id",
    content_col: str = "content",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(file blob) frame -> one row per WARC record.

    Response records carry the parsed HTTP status and body; other
    record kinds (request/metadata/warcinfo) keep their type with a
    NULL body. ``passthrough`` names STRING columns of ``df``
    replicated onto every record row of that file (the streaming path
    rides the file key and source path through the 1:N parse this
    way — no join). The dead-letter discipline is two-level: a record
    whose HTTP payload is malformed quarantines THAT record
    (`parse_error` set, siblings unaffected); a structurally broken
    file emits ONE quarantine row for the file (rec_idx -1), because
    record boundaries past the corruption cannot be trusted."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            extras = [pdf[c] for c in passthrough]
            for row_i, (fid, blob) in enumerate(
                zip(pdf[id_col], pdf[content_col])
            ):
                thru = tuple(col.iloc[row_i] for col in extras)
                try:
                    recs = list(iter_warc_records(bytes(blob)))
                except (ValueError, OSError, EOFError) as ex:
                    rows.append(
                        (fid, -1, None, None, None, None, None, None,
                         f"{type(ex).__name__}: {ex}"[:200]) + thru
                    )
                    continue
                for j, (hdrs, payload) in enumerate(recs):
                    wtype = hdrs.get("warc-type", "")
                    uri = hdrs.get("warc-target-uri")
                    if wtype != "response":
                        rows.append(
                            (fid, j, wtype, uri, None,
                             len(payload), None, None, None) + thru
                        )
                        continue
                    try:
                        status, _h, body = parse_http_response(payload)
                    except ValueError as ex:
                        rows.append(
                            (fid, j, wtype, uri, None, len(payload),
                             None, None,
                             f"{type(ex).__name__}: {ex}"[:200]) + thru
                        )
                        continue
                    rows.append(
                        (fid, j, wtype, uri, status, len(payload),
                         len(body), body, None) + thru
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "rec_idx", "warc_type", "target_uri",
                    "http_status", "n_payload_bytes", "n_body_bytes",
                    "body", "parse_error", *passthrough,
                ],
            )

    schema = WARC_RECORD_SCHEMA + "".join(
        f", {c} string" for c in passthrough
    )
    return df.mapInPandas(batches, schema=schema)
