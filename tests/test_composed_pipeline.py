"""End-to-end composition: extraction output feeds the training-data
operators directly (the 100 TB pipeline story — extracted_text is the
`text` column of every downstream op)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.checkpoint import (
    IcebergCheckpointStore,
    iceberg_available,
)
from gemini_ocr_batch_spark.job import read_extracted, run_extraction_job
from gemini_ocr_batch_spark.operators.dedup import exact_dedup
from gemini_ocr_batch_spark.operators.textstats import (
    language_id,
    quality_score,
    token_count,
)


def test_extracted_feeds_training_ops(spark, pages_df, tmp_path):
    out = str(tmp_path / "out")
    run_extraction_job(spark, pages_df, out)
    docs = (
        read_extracted(spark, out)
        .filter(F.length("extracted_text") > 0)
        .select(
            F.xxhash64("url", "warc_ts").alias("doc_id"),
            F.col("extracted_text").alias("text"),
        )
    )
    n = docs.count()
    assert n > 0
    # dedup: datagen emits duplicate-url recrawls with identical blobs →
    # identical extracted text → real duplicate groups exist
    groups = exact_dedup(docs)
    assert groups.count() < n
    assert groups.agg(F.sum("group_size")).collect()[0][0] == n
    # quality + tokens + language over the extracted text
    q = quality_score(docs)
    assert q.filter((F.col("quality") < 0) | (F.col("quality") > 10000)).count() == 0
    tc = token_count(docs)
    assert tc.filter(F.col("ws_tokens") <= 0).count() == 0
    lid = language_id(docs)
    assert lid.count() == n
    assert set(
        r["pred_lang"] for r in lid.select("pred_lang").distinct().collect()
    ) <= {"en", "de", "fr", "es", "und"}


def test_iceberg_store_gated(spark):
    """No Iceberg jar in this sandbox: the backend must refuse cleanly."""
    assert not iceberg_available(spark)
    with pytest.raises(RuntimeError, match="Iceberg"):
        IcebergCheckpointStore(spark, "ckpt.checkpoint")
