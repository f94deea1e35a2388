"""Per-document dispatch: decode → sniff kind → run the right kernel.

Mirrors the reference's mime dispatch (extension → mime, reference:
src/file_api.py:23-25) with content sniffing as the authority, and the
reference's per-record never-crash error capture (reference:
src/results.py:171-228): every exception becomes a typed error row
(reference enum analog: src/enums.py:45-55).
"""

from __future__ import annotations

from gemini_ocr_batch_spark.kernels.html_extract import extract_html
from gemini_ocr_batch_spark.kernels.pdf_extract import extract_pdf

KIND_HTML = "html"
KIND_PDF = "pdf"

# error_type domain — keep in sync with schemas.ERROR_TYPES
_ERR_EMPTY = "EmptyDocument"
_ERR_DECODE = "DecodeError"
_ERR_PDF = "PdfParseError"
_ERR_KERNEL = "KernelError"

# A latin-1 decode never fails, so "undecodable" means: not valid UTF-8 AND
# carrying a control-character density no real text page has (binary data).
_CTRL = frozenset(
    chr(c) for c in range(0x20) if chr(c) not in ("\t", "\n", "\r", "\f")
)
_MAX_CTRL_FRACTION = 0.10


def sniff_kind(blob: bytes, url: str | None = None) -> str:
    """Content-sniff the document kind; URL extension is the tiebreaker."""
    if blob[:5] == b"%PDF-":
        return KIND_PDF
    if url and url.lower().endswith(".pdf") and b"%PDF" in blob[:1024]:
        return KIND_PDF
    return KIND_HTML


def _decode_html(blob: bytes) -> str:
    try:
        return blob.decode("utf-8")
    except UnicodeDecodeError:
        text = blob.decode("latin-1")
        n_ctrl = sum(1 for ch in text[:4096] if ch in _CTRL)
        if n_ctrl > _MAX_CTRL_FRACTION * max(1, min(len(text), 4096)):
            raise ValueError("binary garbage, not text") from None
        return text


def extract_document_detail(
    blob: bytes | None, url: str | None = None
) -> tuple[
    str | None,
    list[tuple[int, int, str]] | None,
    str | None,
    str | None,
    str | None,
]:
    """One document → (text, spans, content_kind, error_type, error_message).

    Success: (text, spans, kind, None, None). Failure: (None, None,
    kind|None, error_type, human-readable message). Never raises — the
    Spark task must survive any input (reference contract:
    src/results.py:96-228; the reference's failure log keeps the raw error
    message alongside the typed code, src/prefect_state.py:245-282).
    """
    if blob is None or len(blob) == 0:
        return None, None, None, _ERR_EMPTY, "empty or null document blob"
    kind = sniff_kind(blob, url)
    try:
        if kind == KIND_PDF:
            try:
                text, spans = extract_pdf(blob)
            except Exception as exc:  # noqa: BLE001 - typed row, never crash
                return None, None, kind, _ERR_PDF, repr(exc)
        else:
            try:
                decoded = _decode_html(blob)
            except ValueError as exc:
                return None, None, kind, _ERR_DECODE, repr(exc)
            text, spans = extract_html(decoded)
        return text, spans, kind, None, None
    except Exception as exc:  # noqa: BLE001 - last-resort typed capture
        return None, None, kind, _ERR_KERNEL, repr(exc)


def extract_document(
    blob: bytes | None, url: str | None = None
) -> tuple[str | None, list[tuple[int, int, str]] | None, str | None, str | None]:
    """One document → (extracted_text, spans, content_kind, error_type).

    Thin wrapper over :func:`extract_document_detail` that drops the
    error message — the golden-oracle/byte-identity surface.
    """
    text, spans, kind, err, _msg = extract_document_detail(blob, url)
    return text, spans, kind, err
