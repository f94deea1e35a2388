"""From-scratch minimal PDF text extraction kernel.

pdfminer-*style* (public knowledge: the pdfminer.six layout algorithm —
char/box collection, line clustering by baseline y, reading-order sort)
implemented on a minimal PDF content-stream parser. Scope is intentionally
small (the north_rule requires the clustering style, not full PDF spec
coverage): text objects (BT..ET) with Tf/Td/TD/TL/T*/Tm positioning and
Tj/TJ/' show operators, in plain or FlateDecode streams.

Replaces the reference's remote OCR of page images (reference:
src/batch_api.py:21-27 delegates per-page extraction to a remote service;
our analog parses the page's own text objects deterministically).
"""

from __future__ import annotations

import re
import zlib

# Adversarial-input bounds (a crawl kernel parses attacker bytes):
# - stream/BT bodies are located with LINEAR find() scans, not lazy
#   regexes — `stream\r?\n(.*?)\r?\nendstream` rescans to EOF at every
#   `stream\n` occurrence when no terminator exists, O(n²) on floods
#   (the same class as the r3 HTML-tokenizer fix).
# - FlateDecode output is capped per stream: a kB-sized zlib bomb can
#   otherwise expand without bound.
MAX_STREAM_DECOMPRESSED = 8 * 1024 * 1024  # 8 MiB per content stream


def _iter_stream_bodies(pdf_bytes: bytes):
    """Yield raw stream bodies — the linear-scan twin of the old
    ``stream\\r?\\n(.*?)\\r?\\nendstream`` lazy regex (same bodies, same
    skip rules: `stream` must be followed by a newline, the body — which
    may be empty — ends at the first LATER newline-preceded `endstream`,
    matches never overlap).  The terminator search starts at ``j``, not
    ``j - 1``: the newline after the `stream` keyword must not double as
    the terminator newline, so ``b"stream\\nendstream"`` yields nothing
    (exactly the regex, which needs a second newline for the empty-body
    match) — fuzz-pinned in tests/test_pdf_kernel.py."""
    i, n = 0, len(pdf_bytes)
    while True:
        s = pdf_bytes.find(b"stream", i)
        if s < 0:
            return
        j = s + 6
        if pdf_bytes[j : j + 2] == b"\r\n":
            j += 2
        elif pdf_bytes[j : j + 1] == b"\n":
            j += 1
        else:  # keyword not followed by newline — not a stream start
            i = s + 1
            continue
        e = pdf_bytes.find(b"\nendstream", j)
        if e < 0:
            return
        raw = pdf_bytes[j:e]
        if raw.endswith(b"\r"):  # the regex's optional \r before \n
            raw = raw[:-1]
        yield raw
        i = e + len(b"\nendstream")


def _iter_bt_bodies(content: bytes):
    """Yield BT..ET text-object bodies — linear-scan twin of the old
    lazy ``BT(.*?)ET`` regex (first ET wins, resume after it)."""
    i = 0
    while True:
        s = content.find(b"BT", i)
        if s < 0:
            return
        e = content.find(b"ET", s + 2)
        if e < 0:
            return
        yield content[s + 2 : e]
        i = e + 2

# Tokenize a content stream: strings, arrays, numbers, operators.
_TOKEN_RE = re.compile(
    rb"""
    (?P<str>\((?:\\.|[^\\()])*\))   # literal string incl. escapes
  | (?P<arr>\[|\])
  | (?P<num>[-+]?\d*\.?\d+)
  | (?P<name>/[^\s\[\]()<>/]+)
  | (?P<op>[A-Za-z'"*]+)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}

# Line clustering tolerance in text-space units (points).
LINE_Y_TOL = 3.0
# Column split: a gap in x-start histogram wider than this starts a column.
COLUMN_GAP_MIN = 120.0


def _unescape_pdf_string(raw: bytes) -> str:
    """Decode a PDF literal string body (between parens)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd
                j = i + 1
                digits = b""
                while j < len(raw) and raw[j : j + 1].isdigit() and len(digits) < 3:
                    digits += raw[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # lone backslash: drop
            continue
        out += c
        i += 1
    return out.decode("latin-1")


# TJ kerning threshold (thousandths of a text-space unit): a negative
# inter-segment adjustment at or beyond this magnitude is an author-drawn
# WORD GAP, not letter kerning — the pdfminer-style heuristic. Real PDFs
# routinely encode spaces this way instead of a ' ' glyph.
TJ_WORD_GAP = 180.0


def _iter_text_items(content: bytes):
    """Yield (x, y, text) for every shown string in the content stream."""
    for body in _iter_bt_bodies(content):
        x = y = 0.0
        leading = 12.0
        nums: list[float] = []
        strings: list[str] = []
        arr_segments: list[tuple[str, object]] = []
        in_array = False
        for m in _TOKEN_RE.finditer(body):
            kind = m.lastgroup
            if kind == "num":
                v = float(m.group("num"))
                nums.append(v)
                if in_array:
                    arr_segments.append(("n", v))
            elif kind == "str":
                s = _unescape_pdf_string(m.group("str")[1:-1])
                strings.append(s)
                if in_array:
                    arr_segments.append(("s", s))
            elif kind == "arr":
                in_array = m.group("arr") == b"["
                if in_array:
                    strings.clear()
                    arr_segments = []
            elif kind == "name":
                continue
            elif kind == "op":
                op = m.group("op")
                if op == b"Td" and len(nums) >= 2:
                    x += nums[-2]
                    y += nums[-1]
                elif op == b"TD" and len(nums) >= 2:
                    leading = -nums[-1]
                    x += nums[-2]
                    y += nums[-1]
                elif op == b"TL" and nums:
                    leading = nums[-1]
                elif op == b"Tm" and len(nums) >= 6:
                    x = nums[-2]
                    y = nums[-1]
                elif op == b"T*":
                    y -= leading
                elif op == b"Tj" and strings:
                    yield (x, y, strings[-1])
                elif op == b"'" and strings:
                    y -= leading
                    yield (x, y, strings[-1])
                elif op == b"TJ" and strings:
                    if arr_segments:
                        parts: list[str] = []
                        gap = False
                        for seg_kind, seg_val in arr_segments:
                            if seg_kind == "s":
                                if gap and parts:
                                    parts.append(" ")
                                parts.append(seg_val)
                                gap = False
                            elif seg_val <= -TJ_WORD_GAP:
                                gap = True
                        yield (x, y, "".join(parts))
                    else:
                        yield (x, y, "".join(strings))
                nums.clear()
                strings.clear()
                arr_segments = []
                in_array = False


def _collect_items(pdf_bytes: bytes) -> list[tuple[float, float, str]]:
    items: list[tuple[float, float, str]] = []
    for raw in _iter_stream_bodies(pdf_bytes):
        try:
            # capped: a kB-sized zlib bomb must not expand unbounded —
            # the decompressed prefix is kept (crawl-robust truncation)
            content = zlib.decompressobj().decompress(
                raw, MAX_STREAM_DECOMPRESSED
            )
        except zlib.error:
            content = raw
        items.extend(_iter_text_items(content))
    return items


def _cluster_lines(
    items: list[tuple[float, float, str]],
) -> list[tuple[float, float, str]]:
    """Cluster items into lines by y (tolerance), join by x order.

    Returns one (x_min, y, text) per line — the pdfminer-style baseline
    grouping step.
    """
    if not items:
        return []
    by_y = sorted(items, key=lambda it: (-it[1], it[0]))
    lines: list[list[tuple[float, float, str]]] = []
    for it in by_y:
        if lines and abs(lines[-1][0][1] - it[1]) <= LINE_Y_TOL:
            lines[-1].append(it)
        else:
            lines.append([it])
    out = []
    for line in lines:
        line.sort(key=lambda it: it[0])
        text = " ".join(part[2].strip() for part in line if part[2].strip())
        if text:
            out.append((min(p[0] for p in line), line[0][1], text))
    return out


def _split_columns(
    items: list[tuple[float, float, str]],
) -> list[list[tuple[float, float, str]]]:
    """Detect a two-column layout by the largest gap in item x-starts.

    Runs BEFORE line clustering (pdfminer-style: boxes group within a
    column), otherwise same-baseline items across columns would merge
    into one line.
    """
    if len(items) < 4:
        return [items]
    xs = sorted({round(it[0], 1) for it in items})
    if len(xs) < 2:
        return [items]
    best_gap, split_at = 0.0, None
    for a, b in zip(xs, xs[1:]):
        if b - a > best_gap:
            best_gap, split_at = b - a, (a + b) / 2.0
    if best_gap < COLUMN_GAP_MIN or split_at is None:
        return [items]
    left = [it for it in items if it[0] < split_at]
    right = [it for it in items if it[0] >= split_at]
    if not left or not right:
        return [items]
    return [left, right]


def extract_pdf(pdf_bytes: bytes) -> tuple[str, list[tuple[int, int, str]]]:
    """PDF bytes → (extracted_text, spans); spans one per column block.

    Reading order: left column top-down, then right column top-down —
    the x-then-y sweep named by BASELINE.json's north_star.
    """
    items = _collect_items(pdf_bytes)
    columns = _split_columns(items)
    pieces: list[str] = []
    spans: list[tuple[int, int, str]] = []
    offset = 0
    for ci, col_items in enumerate(columns):
        lines = _cluster_lines(col_items)
        text = "\n".join(l[2] for l in lines)
        if not text:
            continue
        if ci and pieces:
            pieces.append("\n\n")
            offset += 2
        pieces.append(text)
        spans.append((offset, offset + len(text), "pdf_block"))
        offset += len(text)
    return "".join(pieces), spans
