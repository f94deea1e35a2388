"""Per-partition lineage/metrics capture (north_rule requirement).

Replaces the reference's failure_logs + Prefect artifact reporting
(reference: src/database.py:101-125, src/flow.py:149-198). The extraction
operator emits physical telemetry per row (partition_id, bytes_in,
kernel_ns); this module aggregates it to one row per physical partition and
appends to an append-only parquet table — the reference's append-only
failure-log pattern (reference: src/prefect_state.py:245-282).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gemini_ocr_batch_spark import EXTRACTOR_VERSION


def lineage_rows(extracted: DataFrame, run_id: str, pass_num: int) -> DataFrame:
    """Aggregate extracted rows → one lineage row per physical partition."""
    return (
        extracted.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum(
                F.when(F.col("error_type").isNull(), 1).otherwise(0)
            ).alias("success_count"),
            F.sum(
                F.when(F.col("error_type").isNotNull(), 1).otherwise(0)
            ).alias("failure_count"),
            F.sum("bytes_in").alias("bytes_in"),
            (F.sum("kernel_ns") / F.lit(1e6)).alias("kernel_wall_ms"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(pass_num).cast("int").alias("pass_num"),
            F.col("partition_id"),
            F.col("row_count"),
            F.col("success_count"),
            F.col("failure_count"),
            F.col("bytes_in"),
            F.col("kernel_wall_ms"),
            F.lit(EXTRACTOR_VERSION).alias("extractor_version"),
            F.current_timestamp().alias("started_at"),
        )
    )

