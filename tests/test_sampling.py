"""Deterministic hash sampling / split assignment (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.operators.sampling import (
    assign_splits,
    hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("payload"),
    )


def test_hash_sample_rate_and_determinism(spark, docs):
    s1 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    assert s1 == s2  # deterministic, not RNG
    assert 0.07 <= len(s1) / 5000 <= 0.13  # ~10% ± hash variance
    # monotone: a higher rate strictly contains the lower-rate set
    s3 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    assert s1 <= s3
    # different salt → different (independent) sample
    s4 = {r["doc_id"] for r in
          hash_sample(docs, "doc_id", 0.1, salt="other").collect()}
    assert s4 != s1
    # edge rates
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == 5000
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)


def test_assign_splits_partition_and_stability(spark, docs):
    out = assign_splits(docs, "doc_id").collect()
    by_split: dict[str, set] = {}
    for r in out:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_split) == {"train", "val", "test"}
    # exhaustive + disjoint partition
    assert sum(len(v) for v in by_split.values()) == 5000
    assert 0.85 <= len(by_split["train"]) / 5000 <= 0.95
    # content-stable under corpus growth: the first half keeps its splits
    half = docs.filter(F.col("doc_id") < 2500)
    half_out = {r["doc_id"]: r["split"]
                for r in assign_splits(half, "doc_id").collect()}
    full_map = {r["doc_id"]: r["split"] for r in out}
    assert all(full_map[k] == v for k, v in half_out.items())
    with pytest.raises(ValueError):
        assign_splits(docs, "doc_id", weights={"a": 0.5, "b": 0.6})


def test_sample_predicate_stays_in_scan(spark, docs):
    """hash_sample is a pure filter — no shuffle in the plan."""
    plan = hash_sample(docs, "doc_id", 0.2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
