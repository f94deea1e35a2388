"""The end-to-end extraction job with retry/dead-letter loop.

The reference's whole orchestration (reference: src/flow.py:423-498 wave
loop + scan + submit + poll + process) collapses into ONE DataFrame DAG per
pass, re-run at most ``max_retries`` times by a driver loop (SURVEY.md
§3.4: with a pure extractor, wave execution degenerates to the retry loop):

    pages ⟕̸ checkpoint → salt-by-size repartition → mapInPandas(extract)
          → ONE bulk write, hive-partitioned by (run_id, pass_num, is_ok)
          → checkpoint MERGE + lineage + failure log from column-pruned
            reads of that same parquet

Physical design (why one write): the kernel output is written exactly once
to ``extracted_all/run_id=R/pass_num=N/is_ok=…``. Everything downstream —
the success view, the failure log, the per-partition lineage rows, the
checkpoint delta — is a *metadata-cheap* read of that parquet (partition
pruning on is_ok, column pruning to the few small columns each consumer
needs). No ``persist()``: caching the bulk map output scales badly (block-
manager contention locally; impossible at 10^12 rows on a cluster), while
re-reading pruned columns from parquet is nearly free. The kernel job
itself doubles as the frontier-emptiness probe: an empty pass writes zero
rows and the loop exits — no separate anti-join pre-scan.

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
from pyspark.sql import types as T

from gemini_ocr_batch_spark.checkpoint import ParquetCheckpointStore
from gemini_ocr_batch_spark.lineage import lineage_rows
from gemini_ocr_batch_spark.operators.extract import extract_pages
from gemini_ocr_batch_spark.schemas import (
    EXTRACTED_SCHEMA,
    EXTRACTED_USER_COLUMNS,
    LINEAGE_SCHEMA,
)

# staged-pass schema: kernel output + the is_ok partition column
STAGED_SCHEMA = T.StructType(
    list(EXTRACTED_SCHEMA.fields)
    + [T.StructField("is_ok", T.BooleanType(), True)]
)


def _append_lineage_rows(rows, lineage_path: str, run_id: str,
                         pass_num: int) -> None:
    """Append collected lineage rows as one parquet file, driver-side."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(lineage_path, exist_ok=True)
    cols = {f.name: [r[f.name] for r in rows] for f in LINEAGE_SCHEMA.fields}
    table = pa.table(
        {
            "run_id": pa.array(cols["run_id"], pa.string()),
            "pass_num": pa.array(cols["pass_num"], pa.int32()),
            "partition_id": pa.array(cols["partition_id"], pa.int32()),
            "row_count": pa.array(cols["row_count"], pa.int64()),
            "success_count": pa.array(cols["success_count"], pa.int64()),
            "failure_count": pa.array(cols["failure_count"], pa.int64()),
            "bytes_in": pa.array(cols["bytes_in"], pa.int64()),
            "kernel_wall_ms": pa.array(cols["kernel_wall_ms"], pa.float64()),
            "extractor_version": pa.array(cols["extractor_version"], pa.string()),
            "started_at": pa.array(cols["started_at"], pa.timestamp("us")),
        }
    )
    pq.write_table(
        table, os.path.join(lineage_path, f"part-{run_id}-{pass_num}.parquet")
    )


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
      extracted_all/  — ALL kernel output, written once per pass, under
                        run_id=R/pass_num=N/is_ok=… hive paths
      checkpoint/     — snapshot store (atomic pointer swap)
      lineage/        — per-partition metrics, append-only
      failures/       — typed failure rows, append-only (reference:
                        failure_logs, src/database.py:101-125)
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    store = ParquetCheckpointStore(
        os.path.join(out_dir, "checkpoint"), max_retries=max_retries
    )
    all_path = os.path.join(out_dir, "extracted_all")
    lineage_path = os.path.join(out_dir, "lineage")
    failures_path = os.path.join(out_dir, "failures")

    result = JobResult()
    t_start = time.perf_counter()
    for pass_num in range(max_retries):
        frontier = store.pending(pages)
        # --- the one bulk job: kernel + single partitioned write ---
        staged_path = os.path.join(
            all_path, f"run_id={run_id}", f"pass_num={pass_num}"
        )
        extracted = extract_pages(frontier, n_partitions=n_partitions)
        (
            extracted.withColumn("is_ok", F.col("error_type").isNull())
            .write.mode("overwrite")  # fixed-run_id rerun re-derives the
            # identical pass (deterministic kernels + anti-join) — overwrite
            # keeps the documented rerun-is-a-no-op contract
            .partitionBy("is_ok")
            .parquet(staged_path)
        )
        # --- cheap derived jobs over the pass we just wrote ---
        staged = spark.read.schema(STAGED_SCHEMA).parquet(staged_path)
        # one tiny aggregate gives lineage rows AND the pass accounting;
        # collect it (≤ one row per physical partition) and append via a
        # direct driver-side pyarrow write — a Spark job for ≤64 rows costs
        # ~2 s of fixed scheduling/commit latency per pass
        lin_rows = lineage_rows(staged, run_id, pass_num).collect()
        if lin_rows:
            _append_lineage_rows(lin_rows, lineage_path, run_id, pass_num)
        n_total = sum(int(r["row_count"]) for r in lin_rows)
        n_bad = sum(int(r["failure_count"]) for r in lin_rows)
        if n_total == 0:
            break  # empty frontier — the job is complete
        # checkpoint MERGE reads only the 3 key/status columns
        store.merge_results(staged.select("url", "warc_ts", "error_type"))
        if n_bad:
            # failure log: partition-pruned (is_ok=false) + column-pruned
            staged.filter(~F.col("is_ok")).select(
                "url",
                "warc_ts",
                "error_type",
                F.lit(pass_num + 1).cast("int").alias("attempts"),
                F.lit(run_id).alias("run_id"),
                F.current_timestamp().alias("created_at"),
            ).coalesce(8).write.mode("append").parquet(failures_path)
        result.passes += 1
        result.extracted_rows += n_total
        result.success_rows += n_total - n_bad
        result.failed_rows += n_bad
        if n_bad == 0:
            break
        # deterministic kernels: a retry of the same bytes fails identically,
        # so the loop exists for transient task-level faults; the anti-join
        # (success ∪ dead excluded) shrinks the frontier every pass.
    store.vacuum()
    result.wall_sec = time.perf_counter() - t_start
    return result


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """The success-only extracted view: partition-pruned on is_ok=true."""
    return (
        spark.read.parquet(os.path.join(out_dir, "extracted_all"))
        # partition discovery types is_ok as a string ("true"/"false")
        .filter(F.col("is_ok") == "true")
        .select(*EXTRACTED_USER_COLUMNS)
    )
