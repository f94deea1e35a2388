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

def test_shard_assign_determinism_and_balance(spark, docs):
    from gemini_ocr_batch_spark.operators.sampling import shard_assign

    out = shard_assign(docs, "doc_id", 16).collect()
    assert {r["shard"] for r in out} == set(range(16))
    # content-keyed: rerun identical
    again = shard_assign(docs, "doc_id", 16).collect()
    assert {r["doc_id"]: r["shard"] for r in out} == \
        {r["doc_id"]: r["shard"] for r in again}
    # count-balanced in expectation: each shard within 2x of ideal
    from collections import Counter

    sizes = Counter(r["shard"] for r in out)
    ideal = 5000 / 16
    assert all(ideal / 2 <= n <= ideal * 2 for n in sizes.values())
    # order_key is a full md5 hex digest
    assert all(len(r["order_key"]) == 32 for r in out[:10])
    # growth-stable: the first half keeps its shard under corpus growth
    half = docs.filter(F.col("doc_id") < 2500)
    from gemini_ocr_batch_spark.operators.sampling import shard_assign as sa

    half_map = {r["doc_id"]: r["shard"]
                for r in sa(half, "doc_id", 16).collect()}
    full_map = {r["doc_id"]: r["shard"] for r in out}
    assert all(full_map[k] == v for k, v in half_map.items())
    with pytest.raises(ValueError):
        shard_assign(docs, "doc_id", 0)


def test_write_training_shards_layout(spark, docs, tmp_path):
    """One file per shard dir, interleaved within-shard order, stats
    that account for every document and token."""
    import glob

    import pyarrow.parquet as pq

    from gemini_ocr_batch_spark.operators.sampling import (
        write_training_shards,
    )

    corpus = docs.withColumn(
        "doc_tokens", (F.col("doc_id") % 10 + 1).cast("bigint")
    )
    out = str(tmp_path / "shards")
    stats = write_training_shards(
        corpus, "doc_id", out, n_shards=8, token_col="doc_tokens"
    ).collect()
    assert [r["shard"] for r in stats] == list(range(8))
    assert sum(r["n_docs"] for r in stats) == 5000
    expected_tokens = sum(i % 10 + 1 for i in range(5000))
    assert sum(r["n_tokens"] for r in stats) == expected_tokens
    # token balance: hash assignment is independent of doc length
    ideal = expected_tokens / 8
    assert all(ideal * 0.8 <= r["n_tokens"] <= ideal * 1.2 for r in stats)
    # exactly one data file per shard directory
    for s in range(8):
        files = [f for f in glob.glob(f"{out}/shard={s}/*.parquet")]
        assert len(files) == 1, f"shard {s}: {files}"
        # within-file rows follow the interleaved order_key order
        tbl = pq.read_table(files[0], columns=["order_key"])
        keys = tbl.column("order_key").to_pylist()
        assert keys == sorted(keys)
    # deterministic rerun: same rows in the same order per shard
    out2 = str(tmp_path / "shards2")
    write_training_shards(
        corpus, "doc_id", out2, n_shards=8, token_col="doc_tokens"
    ).collect()
    for s in (0, 5):
        a = pq.read_table(glob.glob(f"{out}/shard={s}/*.parquet")[0],
                          columns=["doc_id"]).column("doc_id").to_pylist()
        b = pq.read_table(glob.glob(f"{out2}/shard={s}/*.parquet")[0],
                          columns=["doc_id"]).column("doc_id").to_pylist()
        assert a == b


def test_shard_layout_single_exchange(spark, docs):
    """The layout pass is exactly one shuffle: repartition on shard; the
    within-partition sort adds no Exchange."""
    from gemini_ocr_batch_spark.operators.sampling import shard_assign

    assigned = shard_assign(docs, "doc_id", 8)
    plan = (
        assigned.repartition(8, "shard")
        .sortWithinPartitions("shard", "order_key")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_shard_cli_verb(spark, sf_dir, tmp_path, capsys):
    import json

    from gemini_ocr_batch_spark.__main__ import main

    out = str(tmp_path / "cli_shards")
    rc = main([
        "shard", "--in", f"{sf_dir}/documents.parquet", "--out", out,
        "--shards", "4", "--key-col", "doc_id",
    ])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert meta["shards"] == 4 and meta["docs"] == n_docs
    assert meta["tokens"] and meta["tokens"] > 0
    back = spark.read.parquet(out)
    assert back.count() == n_docs
    assert "shard" in back.columns and "order_key" in back.columns

def test_pack_sequences_concat_chunk_model(spark):
    """The packing plan matches a python reference model of
    concat-and-chunk: offsets are the running sum in (shard, order_key)
    order, spans are integer-divided chunk indices."""
    import hashlib

    from gemini_ocr_batch_spark.operators.sampling import pack_sequences

    rows = [(f"doc{i}", (i * 37) % 900) for i in range(200)]
    rows.append(("empty", 0))  # zero-token doc: carries its boundary
    df = spark.createDataFrame(rows, ["key", "n_tokens"])
    out = pack_sequences(df, "key", "n_tokens", seq_len=256,
                         n_shards=2).collect()

    def h60_py(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # python model
    model = {}
    by_shard = {}
    for k, n in rows:
        shard = h60_py(k + "shard") % 2
        okey = hashlib.md5(f"shard|ord|{k}".encode()).hexdigest()
        by_shard.setdefault(shard, []).append((okey, k, n))
    for shard, docs_ in by_shard.items():
        off = 0
        for okey, k, n in sorted(docs_):
            model[k] = (shard, off, off // 256,
                        (off + max(n, 1) - 1) // 256)
            off += n
    for r in out:
        assert model[r["key"]] == (
            r["shard"], r["tok_offset"], r["seq_first"], r["seq_last"]
        ), r["key"]
    # per-shard sequence count identity: max(seq_last)+1 == ceil(total/L)
    import math

    for shard, docs_ in by_shard.items():
        total = sum(n for _, _, n in docs_)
        got_max = max(r["seq_last"] for r in out if r["shard"] == shard)
        assert got_max + 1 == max(math.ceil(total / 256), 1)
    with pytest.raises(ValueError):
        pack_sequences(df, "key", "n_tokens", seq_len=0)


def test_pack_sequences_single_slim_exchange(spark):
    """One shuffle, and text never enters the plan even when present."""
    from gemini_ocr_batch_spark.operators.sampling import pack_sequences

    df = spark.range(0, 1000).select(
        F.col("id").cast("string").alias("key"),
        (F.col("id") % 50).alias("n_tokens"),
        F.repeat(F.lit("x"), 500).alias("text"),
    )
    plan = pack_sequences(df, "key", "n_tokens", seq_len=128, n_shards=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "text" not in plan


def test_pack_sequences_duplicate_keys_deterministic(spark):
    # review regression: duplicate keys share an order_key; without the
    # __n secondary sort the running-sum offsets between the copies were
    # partition-layout-dependent.
    from gemini_ocr_batch_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [("k", 9), ("k", 5), ("x", 3)], ["doc_id", "n"]
    )
    def run(parts):
        plan = pack_sequences(
            df.repartition(parts), "doc_id", "n", seq_len=4, n_shards=1
        )
        return sorted(
            (r["doc_id"], r["n_tokens"], r["tok_offset"])
            for r in plan.collect()
        )
    one, eight = run(1), run(8)
    assert one == eight
    # within the dup pair, the smaller-n copy packs first
    k_rows = [r for r in one if r[0] == "k"]
    assert k_rows[0][1] == 5 and k_rows[1][1] == 9
    assert k_rows[1][2] == k_rows[0][2] + 5
