"""The end-to-end extraction job with retry/dead-letter loop.

The reference's whole orchestration (reference: src/flow.py:423-498 wave
loop + scan + submit + poll + process) collapses into ONE DataFrame DAG per
pass, re-run at most ``max_retries`` times by a driver loop (SURVEY.md
§3.4: with a pure extractor, wave execution degenerates to the retry loop):

    pages ⟕̸ checkpoint  →  salt-by-size repartition  →  mapInPandas(extract)
          →  write extracted (success rows)  →  MERGE checkpoint
          →  append lineage  →  append failures

Idempotence: rerunning the job is a no-op once every key is success/dead —
the anti-join (checkpoint.pending) returns an empty frontier, exactly like
the reference's output-existence probe (reference: src/scanner.py:90-91).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.checkpoint import ParquetCheckpointStore
from gemini_ocr_batch_spark.lineage import append_lineage
from gemini_ocr_batch_spark.operators.extract import extract_pages
from gemini_ocr_batch_spark.schemas import EXTRACTED_USER_COLUMNS


class JobResult:
    def __init__(self) -> None:
        self.passes = 0
        self.extracted_rows = 0
        self.success_rows = 0
        self.failed_rows = 0
        self.wall_sec = 0.0

    @property
    def docs_per_sec(self) -> float:
        return self.extracted_rows / self.wall_sec if self.wall_sec else 0.0


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    max_retries: int = 3,
    n_partitions: int | None = None,
    run_id: str | None = None,
) -> JobResult:
    """Run extraction to completion (every key success or dead).

    Layout under ``out_dir``:
      extracted/   — success rows, append-only parquet
      checkpoint/  — snapshot store
      lineage/     — per-partition metrics, append-only
      failures/    — typed failure rows, append-only (reference:
                     failure_logs, src/database.py:101-125)
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    store = ParquetCheckpointStore(
        os.path.join(out_dir, "checkpoint"), max_retries=max_retries
    )
    extracted_path = os.path.join(out_dir, "extracted")
    lineage_path = os.path.join(out_dir, "lineage")
    failures_path = os.path.join(out_dir, "failures")

    result = JobResult()
    t_start = time.perf_counter()
    for pass_num in range(max_retries):
        frontier = store.pending(pages)
        # one cheap action to decide loop exit; the frontier plan is lazy
        if frontier.limit(1).count() == 0:
            break
        extracted = extract_pages(frontier, n_partitions=n_partitions)
        # One pass over the UDF output feeds four sinks; cache so the
        # extraction kernel runs once, not four times.
        extracted.persist()
        try:
            n_total = extracted.count()
            ok = extracted.filter(F.col("error_type").isNull())
            bad = extracted.filter(F.col("error_type").isNotNull())
            ok.select(*EXTRACTED_USER_COLUMNS).write.mode("append").parquet(
                extracted_path
            )
            append_lineage(extracted, run_id, pass_num, lineage_path)
            bad.select(
                "url",
                "warc_ts",
                "error_type",
                F.lit(pass_num + 1).cast("int").alias("attempts"),
                F.lit(run_id).alias("run_id"),
                F.current_timestamp().alias("created_at"),
            ).write.mode("append").parquet(failures_path)
            store.merge_results(extracted)
            n_bad = bad.count()
            result.passes += 1
            result.extracted_rows += n_total
            result.success_rows += n_total - n_bad
            result.failed_rows += n_bad
        finally:
            extracted.unpersist()
        if result.failed_rows == 0 and pass_num == 0:
            # all succeeded on the first pass — retry loop has nothing to do
            break
        # deterministic kernels: a retry of the same bytes fails identically,
        # so the loop exists for transient task-level faults; the anti-join
        # (success ∪ dead excluded) shrinks the frontier every pass.
    store.vacuum()
    result.wall_sec = time.perf_counter() - t_start
    return result


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "extracted"))
