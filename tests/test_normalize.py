"""NFKC normalization kernel (r6): pandas-path vs pure-python twin fuzz
pin, Spark plumbing, and the dedup-collapse integration the operator
exists for."""

from __future__ import annotations

import pandas as pd

from gemini_ocr_batch_spark.kernels.normalize import (
    ZERO_WIDTH,
    normalize_text_py,
)

TRICKY = [
    "Ｆｕｌｌｗｉｄｔｈ　ｔｅｘｔ",          # fullwidth letters + ideographic space
    "ﬁne ﬂight ﬀ",                     # latin ligatures
    "café vs café",              # combining accent vs precomposed
    "x² + y³",               # superscripts
    "nb sp and thin",        # NBSP / thin space
    "zero​width‌join‍﻿",
    "Ⅻ ⅸ ℌ ℓ №5",                     # roman numerals, letterlike
    "ｶﾀｶﾅ ﾊﾝｶｸ",                       # halfwidth katakana
    "plain ascii stays",
    "",
]


def _pandas_path(s: pd.Series) -> pd.Series:
    # the exact expression the Spark UDF runs (see webtext.normalize_text)
    zw_re = "[" + ZERO_WIDTH + "]"
    return s.str.normalize("NFKC").str.replace(zw_re, "", regex=True)


def test_twin_agreement_on_tricky_corpus():
    got = _pandas_path(pd.Series(TRICKY, dtype="object"))
    want = [normalize_text_py(t) for t in TRICKY]
    assert list(got) == want


def test_twin_fuzz_pandas_vs_python():
    """Property fuzz: the vectorized pandas path and the pure-python twin
    agree on arbitrary unicode (the extraction-kernel twin-fuzz pattern)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=200))
    def run(text):
        got = _pandas_path(pd.Series([text], dtype="object"))[0]
        assert got == normalize_text_py(text)

    run()


def test_normalize_text_spark_plumbing(spark):
    from gemini_ocr_batch_spark.operators.webtext import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY)] + [(99, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in normalize_text(df).collect()}
    for i, t in enumerate(TRICKY):
        assert got[i] == normalize_text_py(t), t
    assert got[99] is None  # null-preserving
    # out_col form keeps the input column untouched
    both = normalize_text(df, out_col="text_norm").collect()[0]
    assert set(both.asDict()) == {"doc_id", "text", "text_norm"}


def test_normalize_collapses_variants_for_dedup(spark):
    """The point of the operator: NFC/NFKC/zero-width renderings of one
    text land in one exact-dedup cluster after normalization."""
    from gemini_ocr_batch_spark.operators.dedup import exact_dedup
    from gemini_ocr_batch_spark.operators.webtext import normalize_text

    variants = [
        (1, "fine caf\u00e9 No5"),                      # precomposed e-acute
        (2, "\ufb01ne cafe\u0301 No5"),                # ligature + combining
        (3, "fine\u200b caf\u00e9 \u21165"),          # zero-width + numero sign
        (4, "a genuinely different doc"),
    ]
    df = spark.createDataFrame(variants, "doc_id long, text string")
    before = exact_dedup(df).collect()
    assert len(before) == 4  # byte-different: exact dedup is blind
    after = {r["keep_id"]: r["group_size"]
             for r in exact_dedup(normalize_text(df)).collect()}
    assert after == {1: 3, 4: 1}  # docs 2 and 3 collapse onto doc 1


def test_config_flag_parses(tmp_path):
    from gemini_ocr_batch_spark.config import load_config

    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        "paths:\n  pages: /p\n  out: /o\n"
        "curation:\n  normalize_nfkc: true\n"
    )
    assert load_config(str(cfg_file)).curation.normalize_nfkc is True
    cfg_file.write_text("paths:\n  pages: /p\n  out: /o\n")
    assert load_config(str(cfg_file)).curation.normalize_nfkc is False
