"""Property-based robustness tests for the extraction kernels (hypothesis).

The reference has no property tests (SURVEY.md §5.1); these pin the two
invariants the pipeline depends on at 10^12-row scale where every weird
byte sequence WILL occur:

1. the kernel NEVER raises — any input becomes a success or a typed error
   row (reference contract: src/results.py:171-228);
2. on success, spans are in-bounds, monotone, non-overlapping, and tile
   the extracted text exactly (span integrity is what makes the extracted
   table consumable downstream).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from gemini_ocr_batch_spark.kernels import extract_document
from gemini_ocr_batch_spark.kernels.html_extract import extract_html
from gemini_ocr_batch_spark.kernels.pdf_extract import extract_pdf


def _check_invariants(text, spans, kind, err):
    if err is not None:
        assert text is None and spans is None
        assert err in {"EmptyDocument", "DecodeError", "PdfParseError",
                       "KernelError"}
        return
    assert isinstance(text, str)
    prev_end = None
    for s, e, k in spans:
        assert 0 <= s < e <= len(text)
        assert k in {"heading", "paragraph", "list", "table", "pdf_block"}
        if prev_end is not None:
            assert s == prev_end + 2  # blank-line separator
        prev_end = e
    if spans:
        assert prev_end == len(text)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_arbitrary_bytes_never_crash(blob):
    text, spans, kind, err = extract_document(blob, "https://x/a.html")
    _check_invariants(text, spans, kind, err)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=4096))
def test_arbitrary_text_as_html_never_crashes(s):
    text, spans = extract_html(s)
    _check_invariants(text, spans, "html", None)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_parser_never_crashes_on_garbage(blob):
    # Feed %PDF-prefixed garbage straight into the pdf kernel
    text, spans = extract_pdf(b"%PDF-1.4\n" + blob)
    for s, e, k in spans:
        assert 0 <= s < e <= len(text)
        assert k == "pdf_block"


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=1024))
def test_determinism_property(s):
    blob = s.encode("utf-8", errors="ignore")
    assert extract_document(blob, "u") == extract_document(blob, "u")
