"""Shared physical-layout helpers for the operator library."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition a small-split source so per-row-heavy operators feed
    every core.

    The bench/test tables arrive as ONE parquet split (a few MB), so a
    shingling/hashing/scoring map would run single-threaded while 31 cores
    idle — the repartition costs a tiny shuffle and wins ~cores×. At
    production scale the source has plenty of splits and this is a no-op,
    so the full-table shuffle never happens where it would hurt
    (same policy as extract_pages' salt="auto").
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        src = df.rdd.getNumPartitions()
    except Exception:  # streaming frames have no rdd
        return df
    if src < max(2, target // 2):
        return df.repartition(target)
    return df
