"""DSIR importance resampling (operators/dsir.py)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
    hashed_bucket_counts,
)

B = 10_000


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    toks = text.strip().lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


@pytest.fixture(scope="module")
def corpora(spark):
    # trusted: natural-ish template sentences; raw: half trusted-like,
    # half gibberish whose grams share no buckets by construction
    trusted_rows = [(i, "the cat sat on the mat today") for i in range(30)]
    raw_rows = []
    for i in range(20):
        raw_rows.append((i, "the cat sat on the mat again"))
    for i in range(20, 40):
        raw_rows.append((i, f"zx{i} qqj{i} wvv{i} pzf{i} klm{i}"))
    raw_rows.append((40, None))  # null text: unscorable
    trusted = spark.createDataFrame(trusted_rows, ["doc_id", "text"])
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    return trusted, raw, trusted_rows, raw_rows


def test_bucket_counts_match_python_hash(spark, corpora):
    trusted, _raw, trusted_rows, _ = corpora
    got = {r["bucket"]: r["c"]
           for r in hashed_bucket_counts(trusted).collect()}
    want: dict[int, int] = {}
    for _i, text in trusted_rows:
        for g in _grams(text):
            b = _h60(g + "dsir") % B
            want[b] = want.get(b, 0) + 1
    assert got == want


def test_log_weights_match_python_model(spark, corpora):
    trusted, raw, trusted_rows, raw_rows = corpora
    got = {r["doc_id"]: r for r in dsir_log_weights(raw, trusted).collect()}

    p: dict[int, int] = {}
    q: dict[int, int] = {}
    for _i, text in trusted_rows:
        for g in _grams(text):
            b = _h60(g + "dsir") % B
            p[b] = p.get(b, 0) + 1
    for _i, text in raw_rows:
        if text is None:
            continue
        for g in _grams(text):
            b = _h60(g + "dsir") % B
            q[b] = q.get(b, 0) + 1
    ptot, qtot = sum(p.values()), sum(q.values())
    lr_q = {
        b: math.floor(
            (math.log((p.get(b, 0) + 1) / (ptot + B))
             - math.log((q.get(b, 0) + 1) / (qtot + B))) * 10000 + 0.5
        )
        for b in set(p) | set(q)
    }
    for doc_id, text in [(0, raw_rows[0][1]), (25, raw_rows[25][1])]:
        want = sum(lr_q[_h60(g + "dsir") % B] for g in _grams(text))
        r = got[doc_id]
        assert r["n_grams"] == len(_grams(text))
        assert r["logw_x10000"] == want, doc_id
    # trusted-like raw docs weigh strictly above the gibberish docs
    assert got[0]["logw_x10000"] > got[25]["logw_x10000"]
    # null text: zero grams, NULL weight
    assert got[40]["n_grams"] == 0 and got[40]["logw_x10000"] is None


def test_resample_prefers_trusted_like_and_is_deterministic(spark, corpora):
    trusted, raw, _t, _r = corpora
    picked = dsir_resample(raw, trusted, k=15)
    ids = [r["doc_id"] for r in picked.collect()]
    assert len(ids) == 15
    assert 40 not in ids  # unscorable excluded
    # the trusted-like half dominates the picked set (identical weights
    # within each half, so Gumbel noise decides the margins — but the
    # weight gap between halves is >> the noise scale)
    assert sum(1 for i in ids if i < 20) >= 12
    # content-keyed determinism: rerun picks the identical ordered set
    assert [r["doc_id"] for r in dsir_resample(raw, trusted, k=15)
            .collect()] == ids
    with pytest.raises(ValueError):
        dsir_resample(raw, trusted, k=0)


def test_duplicate_id_rows_pool_into_one_weight_row(spark, corpora):
    trusted, _raw, _t, _r = corpora
    # a crawl with revisits: the same doc_id appears twice in the pool
    raw = spark.createDataFrame(
        [(0, "the cat sat"), (0, "the cat sat"), (1, "qqj wvv pzf")],
        ["doc_id", "text"],
    )
    w = {r["doc_id"]: r for r in dsir_log_weights(raw, trusted).collect()}
    assert len(w) == 2  # one row per id, not per input row
    assert w[0]["n_grams"] == 2 * len(_grams("the cat sat"))
    ids = [r["doc_id"] for r in dsir_resample(raw, trusted, k=2).collect()]
    assert sorted(ids) == [0, 1]  # no id occupies two top-k slots


def test_trusted_pred_equals_trusted_frame(spark, corpora):
    # r7 single-pass form: trusted_pred over the id column must produce
    # EXACTLY the rows of the two-corpora form with trusted = raw.filter
    # (the _q_dsir_weights restructure rests on this equivalence)
    _t_, raw, _tr, _rr = corpora
    pred = F.col("doc_id") % 5 == 0
    via_frame = dsir_log_weights(raw, raw.filter(pred)).collect()
    via_pred = dsir_log_weights(raw, None, trusted_pred=pred).collect()
    assert [r.asDict() for r in via_frame] == [r.asDict() for r in via_pred]
    with pytest.raises(ValueError):
        dsir_log_weights(raw, raw.filter(pred), trusted_pred=pred)
    with pytest.raises(ValueError):
        dsir_log_weights(raw, None)


def test_select_cli_verb(spark, tmp_path, corpora):
    from gemini_ocr_batch_spark.__main__ import main

    trusted, raw, _t, _r = corpora
    raw_path = str(tmp_path / "raw")
    trusted_path = str(tmp_path / "trusted")
    raw.write.parquet(raw_path)
    trusted.write.parquet(trusted_path)
    out = str(tmp_path / "picked")
    assert main(["select", "--corpus", raw_path, "--trusted", trusted_path,
                 "--k", "15", "--out", out]) == 0
    picked = spark.read.parquet(out)
    assert picked.count() == 15
    assert set(picked.columns) == {"doc_id", "text"}
    ids = {r["doc_id"] for r in picked.collect()}
    assert sum(1 for i in ids if i < 20) >= 12


def test_weights_plan_broadcast_ratio_slim_shuffles(spark, tmp_path,
                                                    corpora):
    trusted, _raw, _t, _r = corpora
    raw = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma doc "),
                 F.col("id").cast("string")).alias("text"),
    )
    raw.write.parquet(str(tmp_path / "raw"))
    raw = spark.read.parquet(str(tmp_path / "raw"))
    plan = dsir_log_weights(raw, trusted)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # every hash-partitioned exchange carries hashed/aggregated columns,
    # never the text itself
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line
