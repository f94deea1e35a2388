"""Job edge cases: empty input, all-failure input, single-retry budget."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gemini_ocr_batch_spark.checkpoint import ParquetCheckpointStore
from gemini_ocr_batch_spark.job import run_extraction_job
from gemini_ocr_batch_spark.schemas import PAGES_SCHEMA


def test_empty_input_is_clean_noop(spark, tmp_path):
    empty = spark.createDataFrame([], PAGES_SCHEMA)
    res = run_extraction_job(spark, empty, str(tmp_path / "out"))
    assert res.passes == 0
    assert res.extracted_rows == 0


def test_all_failures_dead_letter(spark, tmp_path):
    ts = dt.datetime(2024, 1, 1)
    rows = [(f"https://x/{i}", ts, b"", None, "en") for i in range(10)]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = str(tmp_path / "out")
    res = run_extraction_job(spark, pages, out, max_retries=2)
    assert res.passes == 2  # retried once, then dead
    store = ParquetCheckpointStore(str(tmp_path / "out" / "checkpoint"))
    ckpt = store.read(spark)
    assert ckpt.filter(F.col("status") == "dead").count() == 10
    assert ckpt.filter(F.col("status") != "dead").count() == 0
    assert store.pending(pages).count() == 0


def test_single_pass_budget_leaves_failed_retryable(spark, tmp_path):
    ts = dt.datetime(2024, 1, 1)
    rows = [(f"https://x/{i}", ts, b"", None, "en") for i in range(5)]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = str(tmp_path / "out")
    run_extraction_job(spark, pages, out, max_retries=1)
    store = ParquetCheckpointStore(str(tmp_path / "out" / "checkpoint"),
                                   max_retries=3)
    # with max_retries=1 at merge time the rows went dead after one attempt
    assert store.read(spark).filter(F.col("status") == "dead").count() == 5
