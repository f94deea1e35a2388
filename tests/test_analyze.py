"""Reporting/maintenance query tests (reference: scripts/ suite)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.analyze import (
    clear_failures,
    export_failures_csv,
    failure_report,
    nuke,
)
from gemini_ocr_batch_spark.checkpoint import ParquetCheckpointStore


@pytest.fixture()
def failures_df(spark):
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(20):
        rows.append(
            (
                f"https://site{i % 3}.org/p/{i}.html",
                t0,
                ["DecodeError", "EmptyDocument", "PdfParseError"][i % 3],
                (i % 3) + 1,
                "run1",
                t0 + dt.timedelta(minutes=i),
            )
        )
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, error_type string, attempts int, "
        "run_id string, created_at timestamp",
    )


def test_failure_report(spark, failures_df):
    rep = failure_report(failures_df)
    by_error = rep["by_error"].collect()
    assert sum(r["n"] for r in by_error) == 20
    assert by_error[0]["n"] >= by_error[-1]["n"]  # desc order
    by_domain = {r["domain"]: r["n"] for r in rep["by_domain"].collect()}
    assert set(by_domain) == {"site0.org", "site1.org", "site2.org"}
    recent = rep["recent_per_error"].groupBy("error_type").count().collect()
    assert all(r["count"] <= 5 for r in recent)
    stats = rep["stats"].collect()[0]
    assert stats["total_failures"] == 20
    assert stats["max_attempts"] == 3


def test_clear_failures_and_nuke(spark, tmp_path):
    store = ParquetCheckpointStore(str(tmp_path / "ck"))
    ts = dt.datetime(2024, 1, 1)
    snap = spark.createDataFrame(
        [
            ("https://a.org/1", ts, "success", 1, None, ts),
            ("https://a.org/2", ts, "dead", 3, "DecodeError", ts),
            ("https://b.org/3", ts, "failed", 1, "KernelError", ts),
        ],
        "url string, warc_ts timestamp, status string, attempts int, "
        "last_error string, updated_at timestamp",
    )
    store.overwrite(snap)
    n = clear_failures(store, spark, url_prefix="https://a.org")
    assert n == 1  # only the a.org dead row matches prefix+status
    left = {r["url"]: r["status"] for r in store.read(spark).collect()}
    assert left == {"https://a.org/1": "success", "https://b.org/3": "failed"}
    n2 = clear_failures(store, spark)
    assert n2 == 1
    out = tmp_path / "o"
    (out / "extracted_all").mkdir(parents=True)
    nuke(str(out))
    assert not (out / "extracted_all").exists()


def test_export_csv(spark, failures_df, tmp_path):
    path = str(tmp_path / "csv")
    export_failures_csv(failures_df, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 20
    assert "created_at_iso" in back.columns


def test_curation_report(spark, tmp_path):
    from gemini_ocr_batch_spark.analyze import curation_report

    rows = [
        ("https://a.ex/1", True, True, True, True),
        ("https://a.ex/2", False, True, True, False),   # duplicate
        ("https://b.ex/3", True, False, True, False),   # low quality
        ("https://b.ex/4", False, False, False, False),  # fails all three
    ]
    flags = spark.createDataFrame(
        rows,
        "url string, is_canonical boolean, quality_ok boolean, "
        "repetition_ok boolean, keep boolean",
    )
    rep = curation_report(flags)
    totals = rep["totals"].collect()[0]
    assert (totals["total_docs"], totals["kept"]) == (4, 1)
    assert (totals["duplicates"], totals["low_quality"],
            totals["repetitive"]) == (2, 2, 1)
    reasons = {r["reason"]: r["n"] for r in rep["drop_reasons"].collect()}
    assert reasons == {"duplicate": 2, "low_quality": 2, "repetitive": 1}
    by_dom = {r["domain"]: r["n_dropped"]
              for r in rep["dropped_by_domain"].collect()}
    assert by_dom == {"a.ex": 1, "b.ex": 2}
