"""Unit tests for the minimal PDF extraction kernel (pure Python)."""

import random

from gemini_ocr_batch_spark.datagen import make_pdf_page
from gemini_ocr_batch_spark.kernels.dispatch import extract_document, sniff_kind
from gemini_ocr_batch_spark.kernels.pdf_extract import extract_pdf


def _simple_pdf(lines, compress=False):
    import zlib

    ops = ["BT", "/F1 12 Tf"]
    for x, y, t in lines:
        ops.append(f"1 0 0 1 {x} {y} Tm ({t}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    if compress:
        content = zlib.compress(content)
    return (
        b"%PDF-1.4\n4 0 obj << /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\ntrailer\n%%EOF\n"
    )


def test_single_column_reading_order():
    pdf = _simple_pdf([(72, 700, "first line"), (72, 686, "second line"),
                       (72, 672, "third line")])
    text, spans = extract_pdf(pdf)
    assert text == "first line\nsecond line\nthird line"
    assert len(spans) == 1
    assert spans[0][2] == "pdf_block"


def test_two_column_left_then_right():
    pdf = _simple_pdf(
        [(72, 700, "L1"), (72, 686, "L2"), (72, 672, "L3"), (72, 658, "L4"),
         (340, 700, "R1"), (340, 686, "R2"), (340, 672, "R3"), (340, 658, "R4")]
    )
    text, spans = extract_pdf(pdf)
    assert text.index("L4") < text.index("R1")
    assert len(spans) == 2
    left, right = spans
    assert text[left[0]:left[1]].splitlines() == ["L1", "L2", "L3", "L4"]
    assert text[right[0]:right[1]].splitlines() == ["R1", "R2", "R3", "R4"]


def test_same_line_joined_by_x_order():
    pdf = _simple_pdf([(200, 700, "world"), (72, 700, "hello")])
    text, _ = extract_pdf(pdf)
    assert text == "hello world"


def test_td_relative_positioning_and_escapes():
    content = (
        b"BT /F1 12 Tf 72 700 Td (open \\(paren\\)) Tj 0 -14 Td (next) Tj ET"
    )
    pdf = (
        b"%PDF-1.4\n4 0 obj << /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )
    text, _ = extract_pdf(pdf)
    assert text == "open (paren)\nnext"


def test_tj_array_and_flate():
    rng = random.Random(3)
    pdf = make_pdf_page(rng, compress=True)
    text, spans = extract_pdf(pdf)
    assert len(text) > 20
    assert spans


def test_dispatch_sniffs_pdf():
    rng = random.Random(5)
    pdf = make_pdf_page(rng)
    assert sniff_kind(pdf) == "pdf"
    text, spans, kind, err = extract_document(pdf, "https://x/a.pdf")
    assert err is None
    assert kind == "pdf"
    assert len(text) > 0


def test_dispatch_error_rows():
    assert extract_document(b"", "u")[3] == "EmptyDocument"
    assert extract_document(None, "u")[3] == "EmptyDocument"
    garbage = bytes(range(256)) * 4
    _, _, _, err = extract_document(garbage, "https://x/b.html")
    assert err == "DecodeError"


def test_dispatch_html_roundtrip():
    from gemini_ocr_batch_spark.datagen import make_html_page

    rng = random.Random(9)
    blob = make_html_page(rng)
    text, spans, kind, err = extract_document(blob, "https://x/c.html")
    assert err is None
    assert kind == "html"
    for s, e, _ in spans:
        assert 0 <= s < e <= len(text)


def test_pdf_kernel_never_raises_on_structured_garbage():
    """Robustness: random recombinations of PDF structural fragments
    (streams, text operators, escapes, Flate blobs, binary noise) must
    produce typed errors or tolerant extractions — never an unhandled
    exception (r3 fuzz ran 30k docs; this pins a 2k-doc sample)."""
    import random
    import zlib

    from gemini_ocr_batch_spark.kernels import extract_document_detail

    rng = random.Random(777)
    frags = [b"%PDF-1.4\n", b"stream\n", b"endstream", b"BT ", b"ET",
             b"Tj", b"TJ", b"Td", b"TD", b"Tm", b"(text here)",
             b"(unclosed", b"()", rb"(esc\)ed)", rb"(\053\n)",
             b"[(a)(b)]", b"[(a) -250 (b)] TJ", b"1 0 0 1 72 700 Tm",
             b"/F1 12 Tf", b"<</Filter /FlateDecode>>", b"<</Length 99>>",
             zlib.compress(b"BT (deflated text) Tj ET"), b"\x00\xff\xfe",
             b"obj", b"endobj", b"xref", b"trailer", b"startxref",
             b"%%EOF", b"4 0 R", b"q Q", b"0.5 0 0 0.5 0 0 cm",
             b"(" + bytes(range(256)) + b")", b"BI ID EI", b">>", b"<<",
             b"]", b"[", b"\\", b"(", rb"(a\400b)", rb"(\0053)",
             b"(\xe9\xfc)", b"1e999 0 Td", b"nan nan Td", b"-1e-999 Tj"]
    for _ in range(2000):
        doc = b"".join(rng.choice(frags) for _ in range(rng.randint(1, 30)))
        if rng.random() < 0.3:
            doc = b"%PDF-" + doc
        text, spans, kind, err, msg = extract_document_detail(
            doc, "https://x/doc.pdf"
        )
        assert err is None or isinstance(err, str)


def test_pdf_adversarial_floods_parse_in_linear_time():
    """Crawl-DoS guard (r4, same class as the HTML-tokenizer fix): a
    `stream\\n` or `BT` flood with no terminator must not rescan to EOF
    per occurrence. Scaling-ratio assertion — 2× input ≤ ~3× time —
    rather than an absolute wall-clock bound (±50% noisy host)."""
    import time

    from gemini_ocr_batch_spark.kernels.pdf_extract import extract_pdf

    for unit, reps in [(b"stream\n x ", 40000), (b"BT (t) ", 60000),
                       (b"stream\r\n", 40000)]:
        def timed(k):
            blob = unit * k
            t0 = time.perf_counter()
            extract_pdf(blob)
            return time.perf_counter() - t0

        timed(reps // 4)  # warm-up
        t1 = min(timed(reps), timed(reps))
        t2 = min(timed(reps * 2), timed(reps * 2))
        assert t2 <= 3.2 * t1 + 0.05, (
            f"superlinear pdf parse for {unit!r}: t(n)={t1:.3f}s "
            f"t(2n)={t2:.3f}s"
        )


def test_pdf_flate_bomb_is_capped():
    """A small zlib bomb must decompress to at most the per-stream cap
    (the kept prefix still parses) instead of expanding unbounded."""
    import zlib

    from gemini_ocr_batch_spark.kernels.pdf_extract import (
        MAX_STREAM_DECOMPRESSED,
        _collect_items,
    )

    # ~1 GiB of zeros compresses to ~1 MB; the kernel must hold the
    # decompressed prefix at the cap
    bomb = zlib.compress(b"\x00" * (1 << 30), 9)
    pdf = b"stream\n" + bomb + b"\nendstream"
    items = _collect_items(pdf)  # must return quickly, bounded memory
    assert items == []  # zeros contain no BT..ET
    assert MAX_STREAM_DECOMPRESSED <= 64 * 1024 * 1024


def test_pdf_stream_scan_matches_old_regex_semantics():
    """The linear scanner must yield the same bodies as the old lazy
    regex on well-formed and tricky-but-terminated inputs."""
    import re

    from gemini_ocr_batch_spark.kernels.pdf_extract import (
        _iter_stream_bodies,
    )

    old = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
    cases = [
        b"stream\nABC\nendstream",
        b"stream\r\nABC\r\nendstream",
        b"junk stream\nA\nendstream mid stream\r\nB\nendstream tail",
        b"streamX no newline stream\nreal\nendstream",
        b"stream\nA\r\nendstream",          # \r stripped
        b"stream\nnested stream\n keyword\nendstream",
        # shared-newline edge (ADVICE r4): the newline after `stream`
        # must NOT double as the terminator newline — the regex needs a
        # second newline even for an empty body
        b"stream\nendstream",
        b"stream\n\nendstream",             # empty body, properly terminated
        b"stream\r\nendstream",
        b"stream\nendstream\nendstream",
    ]
    for blob in cases:
        assert list(_iter_stream_bodies(blob)) == [
            m.group(1) for m in old.finditer(blob)
        ], blob


def test_synth_pdf_escape_roundtrip():
    """The driver's synthesized PDF pages escape text PDF-style before
    embedding it in a literal string (__spark_entry__._synth_pages); the
    kernel must unescape back to the original for ANY text, so the oracle
    can always predict extracted == text + footer."""
    import re

    from gemini_ocr_batch_spark.kernels.dispatch import extract_document

    cases = [
        "plain words only",
        "with (parens) inside",
        "nested ((deep)) and )unbalanced(",
        "a back\\slash and a trailing one \\",
        "mixed \\(escape-looking\\) source text",
    ]
    for text in cases:
        escaped = re.sub(r"([\\()])", r"\\\1", text)
        content = (
            "BT /F1 12 Tf 1 0 0 1 72.0 720.0 Tm (" + escaped + ") Tj "
            "1 0 0 1 72.0 706.0 Tm (synthetic pdf page 9) Tj ET"
        )
        blob = (
            "%PDF-1.4\n1 0 obj << /Length " + str(len(content))
            + " >>\nstream\n" + content
            + "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
        ).encode()
        got, spans, kind, err = extract_document(blob, "https://x/9.pdf")
        assert err is None and kind == "pdf"
        assert got == text + "\nsynthetic pdf page 9", text


def test_tj_kerning_word_gaps():
    """A TJ array's large negative adjustments are author-drawn word
    gaps (real PDFs encode spaces this way instead of a ' ' glyph);
    small kerning tweaks must NOT split words."""
    content = (
        b"BT /F1 12 Tf 72 700 Td "
        b"[(Hel) -20 (lo) -250 (world) -179 (!)] TJ ET"
    )
    pdf = (
        b"%PDF-1.4\n4 0 obj << /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )
    text, _ = extract_pdf(pdf)
    # -20 and -179 are kerning (below the 180 threshold); -250 is a gap
    assert text == "Hello world!"
