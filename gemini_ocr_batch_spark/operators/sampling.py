"""Deterministic, content-keyed sampling and split assignment.

Training-data pipelines cannot use engine RNG sampling (``TABLESAMPLE`` /
``df.sample``): the picked set would change with partitioning, retries, and
engine version, silently leaking rows across train/val/test. The
production-stable construction is HASH sampling — a row's fate is a pure
function of its key, so it is reproducible across engines, reshards, and
reruns, and any engine (here: DuckDB oracles) can verify it. Replaces the
role of per-run random sampling in the reference's scan filters
(reference: src/scanner.py:60-77 selects work deterministically by key
ranges — same spirit, hash instead of path fields).

Everything routes through the md5-prefix ``h60`` (functions/hashing) so the
DuckDB twin is exact: h60(key || salt) % 10_000 gives a stable 4-decimal
bucket in [0, 10000).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.functions.hashing import h60

_BUCKETS = 10_000


def _bucket(key_col: Column, salt: str) -> Column:
    return h60(F.concat(key_col.cast("string"), F.lit(salt))) % _BUCKETS


def bucket_sql_duckdb(key_expr: str, salt: str) -> str:
    """The DuckDB twin of ``_bucket`` for oracle queries."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'),"
        f" 1, 15))::BIGINT % {_BUCKETS})"
    )


def hash_sample(df: DataFrame, key_col: str, rate: float,
                salt: str = "sample") -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, keyed by content.

    Scale notes: a pure column predicate — no shuffle, no state, pushes
    into the scan's filter stage; the same key always samples the same way
    so incremental reruns never flip membership.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(round(rate * _BUCKETS))
    return df.filter(_bucket(F.col(key_col), salt) < F.lit(threshold))


def assign_splits(df: DataFrame, key_col: str,
                  weights: dict[str, float] | None = None,
                  salt: str = "split") -> DataFrame:
    """Add a ``split`` column (train/val/test…) by hash range.

    Content-stable: a document keeps its split across reruns and dataset
    growth — the property that prevents train/test leakage when the corpus
    is re-crawled. Weights must sum to 1 (±1e-9); ranges are assigned in
    the dict's insertion order.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = _bucket(F.col(key_col), salt)
    expr = None
    upper = 0
    names = list(weights)
    for name in names[:-1]:
        upper += int(round(weights[name] * _BUCKETS))
        cond = bucket < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def split_case_sql_duckdb(key_expr: str,
                          weights: dict[str, float] | None = None,
                          salt: str = "split") -> str:
    """DuckDB CASE twin of ``assign_splits`` (same ranges, same order)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = bucket_sql_duckdb(key_expr, salt)
    names = list(weights)
    parts = ["CASE"]
    upper = 0
    for name in names[:-1]:
        upper += int(round(weights[name] * _BUCKETS))
        parts.append(f"WHEN {b} < {upper} THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)
