"""Deterministic synthetic pages-table generator (seeded; no external data).

Produces rows of exactly the BASELINE.json ``input_hint`` shape:
(url string, warc_ts timestamp, html binary, text string, lang string).
HTML pages carry known boilerplate (nav/header/footer/link-farm) around
known main content; PDFs are minimal single/two-column text-object files;
a heavy tail of giant blobs exercises skew salting. The fixture classes
mirror the reference's scanner/results unit-test cases (reference:
test/unit/test_scanner.py:14-217, test/unit/test_results.py:13-75) —
see FIXTURES.md §1.
"""

from __future__ import annotations

import datetime as dt
import random
import zlib

_WORDS = (
    "analysis course data engine query spark table column join filter "
    "window history science method result archive record lecture spring "
    "autumn catalog syllabus faculty research paper study topic chapter "
    "theory practice exam credit semester schedule laboratory project"
).split()

_LANGS = ("en", "de", "fr", "zh", "es")

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _sentence(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(n_words)]
    return (" ".join(words)).capitalize() + "."


def _paragraph(rng: random.Random, n_sentences: int) -> str:
    return " ".join(_sentence(rng, rng.randint(6, 14)) for _ in range(n_sentences))


def make_html_page(rng: random.Random, *, n_paragraphs: int = 4,
                   giant: bool = False, malformed: bool = False,
                   link_farm_only: bool = False) -> bytes:
    """Synthetic page: known main content wrapped in known boilerplate."""
    nav_links = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in rng.sample(_WORDS, 6)
    )
    link_farm = "".join(
        f'<a href="/x/{i}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a> '
        for i in range(20)
    )
    if link_farm_only:
        body_main = f"<div>{link_farm}</div><div>{link_farm}</div>"
    else:
        paras = n_paragraphs * (60 if giant else 1)
        main_parts = [f"<h1>{_sentence(rng, 4)[:-1]}</h1>"]
        for i in range(paras):
            if i % 7 == 3:
                main_parts.append(f"<h2>{_sentence(rng, 3)[:-1]}</h2>")
            main_parts.append(f"<p>{_paragraph(rng, rng.randint(2, 5))}</p>")
        if not giant and rng.random() < 0.3:
            items = "".join(f"<li>{_sentence(rng, 5)}</li>" for _ in range(3))
            main_parts.append(f"<ul>{items}</ul>")
        body_main = f"<article>{''.join(main_parts)}</article>"
    page = (
        "<!DOCTYPE html><html><head><title>t</title>"
        "<style>.x{color:red}</style><script>var q=1;</script></head>"
        f"<body><header><div>Site Chrome Banner</div></header>"
        f"<nav><ul>{nav_links}</ul></nav>"
        f"{body_main}"
        f'<aside><div>{link_farm}</div></aside>'
        "<footer><p>Copyright 2024 Example Corp. All rights reserved."
        "</p></footer></body></html>"
    )
    if malformed:
        page = page.replace("</article>", "").replace("</p>", "", 3)
    return page.encode("utf-8")


def make_pdf_page(rng: random.Random, *, two_column: bool = False,
                  compress: bool = False) -> bytes:
    """Minimal valid-enough PDF with positioned text objects."""
    lines = []
    y = 720.0
    for _ in range(rng.randint(5, 10)):
        lines.append((72.0, y, _sentence(rng, rng.randint(4, 8))))
        y -= 14.0
    if two_column:
        y = 720.0
        for _ in range(rng.randint(5, 10)):
            lines.append((320.0, y, _sentence(rng, rng.randint(4, 8))))
            y -= 14.0
    ops = ["BT", "/F1 12 Tf"]
    for x, yy, text in lines:
        safe = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"1 0 0 1 {x:.1f} {yy:.1f} Tm ({safe}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    if compress:
        content = zlib.compress(content)
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream\nendobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


def generate_rows(n: int, seed: int = 42) -> list[tuple]:
    """n deterministic pages rows: (url, warc_ts, html, text, lang).

    Row-class mix (FIXTURES.md §1): ~80% clean HTML, plus link-farm-only,
    malformed, PDFs (single/two-column, plain/Flate), empty blobs, binary
    garbage, giant blobs (heavy tail for skew), and duplicate-url rows.
    """
    rng = random.Random(seed)
    rows: list[tuple] = []
    for i in range(n):
        lang = _LANGS[i % len(_LANGS)]
        ts = EPOCH + dt.timedelta(minutes=i)
        roll = rng.random()
        if roll < 0.04:
            url = f"https://example.org/doc/{i}.pdf"
            blob = make_pdf_page(rng, two_column=(i % 2 == 0),
                                 compress=(i % 3 == 0))
        elif roll < 0.06:
            url = f"https://example.org/farm/{i}.html"
            blob = make_html_page(rng, link_farm_only=True)
        elif roll < 0.08:
            url = f"https://example.org/bad/{i}.html"
            blob = make_html_page(rng, malformed=True)
        elif roll < 0.09:
            url = f"https://example.org/empty/{i}.html"
            blob = b""
        elif roll < 0.10:
            url = f"https://example.org/bin/{i}.html"
            blob = bytes(rng.getrandbits(8) for _ in range(512))
        elif roll < 0.115:  # heavy tail: ~1.5% giant blobs (skew driver)
            url = f"https://example.org/giant/{i}.html"
            blob = make_html_page(rng, n_paragraphs=6, giant=True)
        else:
            url = f"https://example.org/page/{i}.html"
            blob = make_html_page(rng, n_paragraphs=rng.randint(2, 6))
        rows.append((url, ts, blob, None, lang))
        if i % 97 == 0 and i:  # duplicate url, distinct warc_ts (recrawl)
            rows.append((url, ts + dt.timedelta(days=30), blob, None, lang))
    return rows


def write_pages_parquet(rows: list[tuple], path: str) -> None:
    """Write rows as a pages parquet via pyarrow (no Spark needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "lang": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    # Bounded row groups keep the file SPLITTABLE: Spark plans byte-range
    # splits, but a split only yields rows if a row-group START falls
    # inside it — a single-row-group file makes every task but one empty,
    # silently serializing the whole extraction (found in r3: 121k docs
    # ran on one core because pyarrow's default wrote one row group).
    pq.write_table(table, path, row_group_size=8192)


def write_pages_warc(rows: list[tuple], out_dir: str, files: int = 4) -> list[str]:
    """Write the same rows as a Common-Crawl-style WARC segment: ``files``
    member-gzip ``.warc.gz`` files, each led by a warcinfo record, pages as
    HTTP ``response`` records (PDF blobs get ``application/pdf``).

    Round-robin assignment keeps file sizes balanced the way a crawler's
    rotating writers do; everything is deterministic (content-addressed
    record ids, gzip mtime=0) so fixtures are rerun-stable.
    """
    import os

    from gemini_ocr_batch_spark.kernels import warc as wk

    os.makedirs(out_dir, exist_ok=True)
    buckets: list[list[bytes]] = [[] for _ in range(files)]
    for i, (url, ts, blob, _text, _lang) in enumerate(rows):
        ctype = "application/pdf" if url.endswith(".pdf") else "text/html"
        buckets[i % files].append(
            wk.build_response_record(url, ts, blob, http_content_type=ctype)
        )
    paths = []
    for f, recs in enumerate(buckets):
        path = os.path.join(out_dir, f"seg-{f:05d}.warc.gz")
        info = wk.build_warcinfo_record(
            rows[0][1] if rows else dt.datetime(2026, 1, 1),
            f"software: gemini_ocr_batch_spark datagen\r\nfile: seg-{f:05d}",
        )
        with open(path, "wb") as fh:
            fh.write(wk.write_warc([info] + recs, member_gzip=True))
        paths.append(path)
    return paths


def golden_extract(rows: list[tuple]) -> dict[tuple, tuple]:
    """Single-threaded golden oracle: key → (text, spans, kind, error).

    Runs the *same kernel code* the Spark operator runs; the byte-identity
    test (north_rule) compares Spark output against this.
    """
    from gemini_ocr_batch_spark.kernels import extract_document

    out = {}
    for url, ts, blob, _text, _lang in rows:
        out[(url, ts)] = extract_document(blob, url)
    return out
