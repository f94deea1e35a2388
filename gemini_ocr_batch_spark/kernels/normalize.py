"""Unicode NFKC text normalization kernel.

Standard corpus-prep step ahead of tokenization and dedup (C4 and
RefinedWeb normalize before fingerprinting): NFKC folds compatibility
forms — fullwidth ＡＢＣ → ABC, ligature ﬁ → fi, superscript ² → 2,
NBSP → space, precomposed vs combining accents — so byte-different
renderings of the same text collapse to one fingerprint.  After NFKC,
zero-width characters (ZWSP/ZWNJ/ZWJ/BOM — invisible, NFKC-invariant,
and a classic dedup-evasion artifact) are removed.

Engine-only kernel (DuckDB has no NFKC, so no SQL oracle is possible):
the Spark operator (`operators/webtext.normalize_text`) runs a
vectorized pandas path, and :func:`normalize_text_py` here is the
independently-written pure-python twin it is fuzz-pinned against —
the same twin-fuzz pattern as the HTML/PDF extraction kernels.

The reference repo has no analog (its OCR output is consumed verbatim);
this is public corpus-prep practice, not a port.
"""

from __future__ import annotations

import unicodedata

# ZWSP, ZWNJ, ZWJ, BOM/ZWNBSP — removed after NFKC (NFKC keeps them)
ZERO_WIDTH = "\u200b\u200c\u200d\ufeff"
_ZW_TABLE = {ord(c): None for c in ZERO_WIDTH}


def normalize_text_py(text: str | None) -> str | None:
    """Pure-python twin of the Spark normalize path: NFKC, then strip
    zero-width characters.  None passes through (null-preserving)."""
    if text is None:
        return None
    return unicodedata.normalize("NFKC", text).translate(_ZW_TABLE)
