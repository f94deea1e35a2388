"""WARC (ISO 28500) record writer + tolerant parser — pure python, no deps.

Common Crawl publishes its corpus as WARC files (raw HTTP captures), WET
files (extracted-text "conversion" records — same container format), and a
URL index of ``(file, offset, length)`` triples pointing at individual
records. The reference pipeline's work items are page files on disk
(reference: src/scanner.py:40-63); the web-scale analog of that input is a
WARC segment listing, so the engine needs a native reader for the format —
and a writer, both to synthesize deterministic fixtures and to emit the
extraction output as standard WET that any downstream CC tooling can read.

Format essentials implemented here (all public, from the ISO 28500 spec and
the Common Crawl docs):

- A record is ``WARC/1.0\\r\\n`` + named-field header lines + ``\\r\\n`` +
  ``Content-Length`` bytes of payload + ``\\r\\n\\r\\n``.
- Header names are case-insensitive; values may be LWS-folded onto
  continuation lines (leading space/tab).
- ``response`` records carry a full HTTP message as payload
  (``Content-Type: application/http; msgtype=response``): status line +
  HTTP headers + CRLFCRLF + body.
- ``conversion`` records (WET) carry ``text/plain`` extracted text.
- The standard at-rest layout is *member gzip*: each record is its own
  gzip member, members concatenated. This is what makes the format usable
  at scale — a reader can seek straight to a record by compressed offset,
  and damage to one member cannot corrupt its neighbours.

Tolerance contract (mirrors the engine's S6 tolerant-JSONL posture): a
malformed record yields an ``error`` entry and parsing continues — at the
next gzip member boundary, or, in a plain file, at the next ``WARC/1.``
magic — a bad capture never kills the task.
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import io
import zlib
from typing import Iterable, Iterator

_CRLF = b"\r\n"
_MAGIC = b"WARC/1."
_GZ_MAGIC = b"\x1f\x8b"

# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _record_id(seed: str) -> str:
    """Deterministic WARC-Record-ID (urn:uuid shape, content-addressed).

    The spec requires a globally unique URI per record; real tools mint
    random UUIDs. Everything in this engine must be rerun-stable, so the
    id is derived from the record's identity instead — same page, same id.
    """
    h = hashlib.md5(seed.encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def format_warc_date(ts: dt.datetime) -> str:
    """UTC ``YYYY-MM-DDTHH:MM:SSZ`` (the WARC-Date profile CC uses)."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def parse_warc_date(value: str) -> dt.datetime | None:
    """Inverse of :func:`format_warc_date`; tolerates fractional seconds
    and a numeric offset. Returns a naive UTC datetime (the engine's
    timestamp convention) or None if unparseable."""
    v = value.strip()
    try:
        if v.endswith(("Z", "z")):
            v = v[:-1] + "+00:00"
        parsed = dt.datetime.fromisoformat(v)
    except ValueError:
        return None
    if parsed.tzinfo is not None:
        parsed = parsed.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return parsed


def build_record(
    warc_type: str,
    headers: list[tuple[str, str]],
    payload: bytes,
) -> bytes:
    """Serialize one WARC record (uncompressed)."""
    lines = [b"WARC/1.0"]
    lines.append(b"WARC-Type: " + warc_type.encode("ascii"))
    for name, value in headers:
        lines.append(
            name.encode("ascii") + b": " + value.encode("utf-8")
        )
    lines.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    head = _CRLF.join(lines) + _CRLF + _CRLF
    return head + payload + _CRLF + _CRLF


def build_response_record(
    url: str,
    ts: dt.datetime,
    body: bytes,
    http_content_type: str = "text/html",
    http_status: int = 200,
) -> bytes:
    """A CC-style ``response`` record: payload is the full HTTP message."""
    date = format_warc_date(ts)
    http = (
        f"HTTP/1.1 {http_status} OK\r\n"
        f"Content-Type: {http_content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("ascii") + body
    return build_record(
        "response",
        [
            ("WARC-Target-URI", url),
            ("WARC-Date", date),
            ("WARC-Record-ID", _record_id(f"response|{url}|{date}")),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http,
    )


def build_conversion_record(
    url: str, ts: dt.datetime | None, text: str
) -> bytes:
    """A WET ``conversion`` record: payload is extracted UTF-8 text.

    ``ts=None`` (a page row with no capture timestamp — the parquet input
    path allows NULL warc_ts) falls back to the Unix epoch rather than
    dropping the record or failing the task: WARC-Date is mandatory, and
    the epoch placeholder keeps the write deterministic.
    """
    date = format_warc_date(ts) if ts is not None else "1970-01-01T00:00:00Z"
    body = text.encode("utf-8")
    return build_record(
        "conversion",
        [
            ("WARC-Target-URI", url),
            ("WARC-Date", date),
            ("WARC-Record-ID", _record_id(f"conversion|{url}|{date}")),
            ("Content-Type", "text/plain"),
        ],
        body,
    )


def build_warcinfo_record(ts: dt.datetime, info: str) -> bytes:
    date = format_warc_date(ts)
    return build_record(
        "warcinfo",
        [
            ("WARC-Date", date),
            ("WARC-Record-ID", _record_id(f"warcinfo|{info}|{date}")),
            ("Content-Type", "application/warc-fields"),
        ],
        info.encode("utf-8"),
    )


def write_warc(records: Iterable[bytes], member_gzip: bool = True) -> bytes:
    """Concatenate serialized records into a WARC file image.

    ``member_gzip=True`` (the CC at-rest layout) compresses each record as
    its own gzip member with ``mtime=0`` so output bytes are run-stable.
    """
    if not member_gzip:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        out.write(gzip.compress(rec, mtime=0))
    return out.getvalue()


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _parse_header_block(block: bytes) -> tuple[str, list[tuple[str, str]]]:
    """(version-line, [(lower-name, value)]) with LWS folding unfolded."""
    lines = block.split(b"\r\n")
    if len(lines) == 1:  # tolerate bare-LF producers
        lines = block.split(b"\n")
    version = lines[0].decode("ascii", "replace").strip()
    fields: list[tuple[str, str]] = []
    for raw in lines[1:]:
        if not raw:
            continue
        if raw[:1] in (b" ", b"\t") and fields:  # folded continuation
            name, value = fields[-1]
            fields[-1] = (name, value + " " + raw.strip().decode("utf-8", "replace"))
            continue
        name, sep, value = raw.partition(b":")
        if not sep:
            continue  # junk header line — tolerated
        fields.append(
            (
                name.decode("ascii", "replace").strip().lower(),
                value.decode("utf-8", "replace").strip(),
            )
        )
    return version, fields


def _header(fields: list[tuple[str, str]], name: str) -> str | None:
    for k, v in fields:
        if k == name:
            return v
    return None


def _find_terminator(buf: bytes, start: int = 0) -> tuple[int, int]:
    """Earliest blank-line header terminator: ``(index, sep_len)`` or ``(-1, 0)``.

    Both CRLF and bare-LF header blocks occur in real captures. Choosing by
    separator *type* (try ``\\r\\n\\r\\n`` everywhere before ``\\n\\n``)
    mis-splits an LF header block whose *body* contains CRLF bytes — e.g. an
    LF-headered WARC record wrapping a standard CRLF HTTP message — so the
    split must go to whichever terminator occurs first in the buffer.
    """
    crlf = buf.find(b"\r\n\r\n", start)
    lf = buf.find(b"\n\n", start)
    if crlf >= 0 and (lf < 0 or crlf < lf):
        return crlf, 4
    if lf >= 0:
        return lf, 2
    return -1, 0


def split_http_payload(
    payload: bytes,
) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an ``application/http`` payload.

    Tolerant: if no HTTP header terminator is found the whole payload is
    returned as the body with null status (some captures are truncated).
    """
    idx, sep_len = _find_terminator(payload)
    if idx >= 0:
        head, body = payload[:idx], payload[idx + sep_len:]
    else:
        return None, None, payload
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    status: int | None = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[0][:5] == b"HTTP/":
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    ctype = None
    for raw in lines[1:]:
        name, sep_, value = raw.partition(b":")
        if sep_ and name.strip().lower() == b"content-type":
            ctype = value.decode("utf-8", "replace").strip()
            break
    return status, ctype, body


class WarcRecord:
    """One parsed record (or one parse failure)."""

    __slots__ = (
        "warc_type",
        "url",
        "date",
        "record_id",
        "content_type",
        "payload",
        "offset",
        "length",
        "error",
    )

    def __init__(
        self,
        warc_type: str | None = None,
        url: str | None = None,
        date: dt.datetime | None = None,
        record_id: str | None = None,
        content_type: str | None = None,
        payload: bytes = b"",
        offset: int = 0,
        length: int = 0,
        error: str | None = None,
    ) -> None:
        self.warc_type = warc_type
        self.url = url
        self.date = date
        self.record_id = record_id
        self.content_type = content_type
        self.payload = payload
        self.offset = offset
        self.length = length
        self.error = error


def _parse_one(
    buf: bytes, pos: int, offset: int | None
) -> tuple[WarcRecord | None, int]:
    """Parse the record starting at ``pos`` in ``buf``.

    Returns (record, next_pos). record=None means end-of-buffer (only
    trailing whitespace left). ``offset`` is the *file-level* offset
    recorded on the row — the compressed-member offset for gzip input
    (the value a CC-style index stores); pass None for plain input and
    the record's own byte position is used.
    """
    # skip inter-record padding
    while pos < len(buf) and buf[pos:pos + 1] in (b"\r", b"\n"):
        pos += 1
    if pos >= len(buf):
        return None, pos
    if offset is None:
        offset = pos
    if not buf.startswith(_MAGIC, pos):
        # damaged region: resync at the next magic
        nxt = buf.find(_MAGIC, pos + 1)
        end = nxt if nxt >= 0 else len(buf)
        rec = WarcRecord(
            offset=offset,
            length=end - pos,
            error=f"no WARC magic at offset {pos}; skipped {end - pos} bytes",
        )
        return rec, end
    hdr_end, sep_len = _find_terminator(buf, pos)
    if hdr_end >= 0:
        body_start = hdr_end + sep_len
    else:
        return (
            WarcRecord(
                offset=offset,
                length=len(buf) - pos,
                error="truncated record: no header terminator",
            ),
            len(buf),
        )
    _version, fields = _parse_header_block(buf[pos:hdr_end])
    clen_s = _header(fields, "content-length")
    try:
        clen = int(clen_s)  # type: ignore[arg-type]
    except (TypeError, ValueError):
        nxt = buf.find(_MAGIC, body_start)
        end = nxt if nxt >= 0 else len(buf)
        return (
            WarcRecord(
                offset=offset,
                length=end - pos,
                error=f"bad Content-Length {clen_s!r}",
            ),
            end,
        )
    payload = buf[body_start:body_start + clen]
    if len(payload) < clen:
        return (
            WarcRecord(
                offset=offset,
                length=len(buf) - pos,
                error=f"truncated payload: {len(payload)}/{clen} bytes",
            ),
            len(buf),
        )
    date_s = _header(fields, "warc-date")
    rec = WarcRecord(
        warc_type=(_header(fields, "warc-type") or "").lower() or None,
        url=_header(fields, "warc-target-uri"),
        date=parse_warc_date(date_s) if date_s else None,
        record_id=_header(fields, "warc-record-id"),
        content_type=_header(fields, "content-type"),
        payload=payload,
        offset=offset,
        length=(body_start + clen) - pos,
    )
    return rec, body_start + clen


def _iter_gzip_members(data: bytes) -> Iterator[tuple[int, bytes | None, str | None]]:
    """Yield (compressed-offset, decompressed-bytes | None, error | None)
    per gzip member. A corrupt member yields an error and scanning resumes
    at the next gzip magic — the containment property member-gzip exists
    to provide."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
            if not d.eof:
                yield pos, None, "truncated gzip member"
                return
            consumed = (n - pos) - len(d.unused_data)
            yield pos, chunk, None
            pos += consumed
        except zlib.error as exc:
            nxt = data.find(_GZ_MAGIC, pos + 1)
            end = nxt if nxt >= 0 else n
            yield pos, None, f"corrupt gzip member: {exc}"
            pos = end


def parse_warc(data: bytes) -> list[WarcRecord]:
    """Parse a WARC file image (plain, member-gzip, or whole-file gzip).

    Offsets on returned records are file-level: compressed member offsets
    for gzipped input, byte offsets for plain input.
    """
    out: list[WarcRecord] = []
    if data[:2] == _GZ_MAGIC:
        for m_off, chunk, err in _iter_gzip_members(data):
            if err is not None:
                out.append(WarcRecord(offset=m_off, error=err))
                continue
            pos = 0
            while True:
                rec, pos = _parse_one(chunk, pos, m_off)  # type: ignore[arg-type]
                if rec is None:
                    break
                out.append(rec)
        return out
    pos = 0
    while True:
        rec, nxt = _parse_one(data, pos, None)
        if rec is None:
            break
        out.append(rec)
        pos = nxt
    return out
