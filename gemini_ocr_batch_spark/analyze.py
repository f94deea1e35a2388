"""Reporting + maintenance over the engine's state tables.

Replaces the reference's scripts/ suite:
- analyze_failures.py (A3-A9 aggregations: counts, distinct, max, group-by
  error type, per-domain rollups, top-N, recency) — reference:
  scripts/analyze_failures.py:55-304.
- clear_failure_counts.py (predicate delete / retry-unlock, M6) —
  reference: scripts/clear_failure_counts.py:61-124.
- nuke_database.py (truncate-all, M7) — reference:
  scripts/nuke_database.py:89-123.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.checkpoint import KEY, ParquetCheckpointStore


def _domain(col):
    """url → host (the analog of the reference's key→state parse,
    scripts/analyze_failures.py:85-113)."""
    return F.regexp_extract(col, r"^(?i)[a-z]+://([^/]+)", 1)


def failure_report(failures: DataFrame) -> dict[str, DataFrame]:
    """The reference's analyze_failures query pack, set-at-a-time."""
    by_error = (
        failures.groupBy("error_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "error_type")
    )
    by_domain = (
        failures.withColumn("domain", _domain(F.col("url")))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "domain")
    )
    w = Window.partitionBy("error_type").orderBy(F.desc("created_at"), "url")
    recent_per_error = (
        failures.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("error_type", F.desc("created_at"))
    )
    stats = failures.agg(
        F.count(F.lit(1)).alias("total_failures"),
        F.countDistinct("url", "warc_ts").alias("distinct_keys"),
        F.max("attempts").alias("max_attempts"),
    )
    return {
        "by_error": by_error,
        "by_domain": by_domain,
        "recent_per_error": recent_per_error,
        "stats": stats,
    }


def clear_failures(store: ParquetCheckpointStore, spark: SparkSession,
                   url_prefix: str | None = None) -> int:
    """Predicate delete: reset failed/dead rows (optionally by url prefix)
    back to retryable — the reference's clear_failure_counts (M6)."""
    ckpt = store.read(spark)
    cond = F.col("status").isin("failed", "dead")
    if url_prefix:
        cond = cond & F.col("url").startswith(url_prefix)
    to_clear = ckpt.filter(cond)
    n = to_clear.count()
    remaining = ckpt.join(to_clear.select(*KEY), on=KEY, how="left_anti")
    store.overwrite(remaining)
    return n


def nuke(out_dir: str) -> None:
    """Truncate-all (M7): drop every state/output directory."""
    for sub in ("extracted_all", "_staging", "checkpoint", "lineage",
                "failures"):
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)


def export_failures_csv(failures: DataFrame, path: str) -> None:
    """CSV export sink (S10) — reference: scripts/analyze_failures.py:189-213."""
    (
        failures.withColumn(
            "created_at_iso",
            F.date_format("created_at", "yyyy-MM-dd'T'HH:mm:ss"),
        )
        .drop("created_at")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def curation_report(flags: DataFrame) -> dict[str, DataFrame]:
    """Reporting pack over a `curate` run's flags table (r4) — the
    corpus-prep counterpart of failure_report, set-at-a-time.

    Expects the (url/id, is_canonical, quality_ok, repetition_ok, keep)
    schema `webtext.run_curation_job` writes. The drop_reasons view
    attributes every dropped doc to each rule it failed (a doc can fail
    several)."""
    id_col = flags.columns[0]
    totals = flags.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.sum((~F.col("is_canonical")).cast("long")).alias("duplicates"),
        F.sum((~F.col("quality_ok")).cast("long")).alias("low_quality"),
        F.sum((~F.col("repetition_ok")).cast("long")).alias("repetitive"),
    )
    reasons = (
        flags.filter(~F.col("keep"))
        .select(
            id_col,
            F.explode(
                F.filter(
                    F.array(
                        F.when(~F.col("is_canonical"), F.lit("duplicate")),
                        F.when(~F.col("quality_ok"), F.lit("low_quality")),
                        F.when(~F.col("repetition_ok"), F.lit("repetitive")),
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias("reason"),
        )
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "reason")
    )
    by_domain = None
    if id_col == "url":
        by_domain = (
            flags.filter(~F.col("keep"))
            .withColumn("domain", _domain(F.col("url")))
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_dropped"))
            .orderBy(F.desc("n_dropped"), "domain")
        )
    out = {"totals": totals, "drop_reasons": reasons}
    if by_domain is not None:
        out["dropped_by_domain"] = by_domain
    return out
