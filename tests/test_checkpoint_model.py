"""Model-based randomized check of the checkpoint MERGE semantics.

A pure-Python reference model applies the documented transition table
(reference: src/prefect_state.py:111-199 close-batch + failure-count
increments; src/scanner.py:87-88 dead-letter) to random pass sequences;
the store must agree exactly after every sequence. Merges alternate
between the Spark relational path and the driver-side DuckDB fast path,
so the test also pins the two implementations against each other on
histories neither unit test enumerates.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from gemini_ocr_batch_spark.checkpoint import ParquetCheckpointStore

_TS = dt.datetime(2024, 1, 1)
MAX_RETRIES = 3


def _model_apply(model: dict, batch: list[tuple[str, str | None]]) -> None:
    """The documented transition table, independently restated."""
    for url, err in batch:
        status, attempts, last_error = model.get(url, ("pending", 0, None))
        attempts += 1
        if err is None:
            status = "success"
            # last_error keeps the previous value (coalesce(new, old))
        else:
            last_error = err
            status = "dead" if attempts >= MAX_RETRIES else "failed"
        model[url] = (status, attempts, last_error)


def test_random_histories_match_model(spark, tmp_path):
    rng = random.Random(2024)
    urls = [f"https://m/{i}" for i in range(40)]
    errs = [None, None, None, "KernelError", "DecodeError"]

    for case in range(4):
        root = str(tmp_path / f"ck{case}")
        store = ParquetCheckpointStore(root, max_retries=MAX_RETRIES,
                                       n_buckets=4)
        model: dict[str, tuple[str, int, str | None]] = {}
        for pass_i in range(rng.randint(3, 6)):
            # job-shaped batches: only currently-open keys can appear in a
            # pass (the frontier anti-joins success/dead away) — attempts
            # bounds below are only promised for such histories
            open_urls = [
                u for u in urls
                if model.get(u, ("pending",))[0] not in ("success", "dead")
            ]
            if not open_urls:
                break
            batch_urls = rng.sample(
                open_urls, rng.randint(1, min(25, len(open_urls)))
            )
            batch = [(u, rng.choice(errs)) for u in batch_urls]
            _model_apply(model, batch)
            df = spark.createDataFrame(
                [(u, _TS, e) for u, e in batch],
                "url string, warc_ts timestamp, error_type string",
            )
            if pass_i % 2 == 0:
                store.merge_results(df)  # Spark relational path
            else:
                # driver-side path: stage the pass as parquet first
                staged = str(tmp_path / f"pass_{case}_{pass_i}")
                df.coalesce(1).write.mode("overwrite").parquet(staged)
                assert store.merge_results_local(staged) is True
        got = {
            r["url"]: (r["status"], r["attempts"], r["last_error"])
            for r in store.read(spark).collect()
        }
        assert got == model, f"case {case}: store diverged from model"
        # invariants the job relies on
        snap = store.read(spark)
        assert snap.filter(F.col("attempts") > MAX_RETRIES).count() == 0
        assert snap.filter(
            (F.col("status") == "dead") & (F.col("attempts") < MAX_RETRIES)
        ).count() == 0
        pending = store.pending(
            spark.createDataFrame(
                [(u, _TS, None, None, "en") for u in urls],
                "url string, warc_ts timestamp, html binary, text string, "
                "lang string",
            )
        ).count()
        n_open = sum(
            1 for s, _a, _e in model.values() if s not in ("success", "dead")
        ) + (len(urls) - len(model))
        assert pending == n_open


def test_recommended_buckets_scaling():
    """B sizing: sandbox corpora stay tiny; 10^12 keys -> 4096 buckets
    (the module-docstring deployment recipe), always a power of two, and
    merge cost therefore tracks touched buckets, not corpus size."""
    from gemini_ocr_batch_spark.checkpoint import ParquetCheckpointStore as S

    assert S.recommended_buckets(1_000) == 1
    assert S.recommended_buckets(S.ROWS_PER_BUCKET) == 1
    assert S.recommended_buckets(S.ROWS_PER_BUCKET + 1) == 2
    assert S.recommended_buckets(10**12) == 4096
    for n in (0, 1, 10**9, 10**12, 10**15):
        b = S.recommended_buckets(n)
        assert b & (b - 1) == 0  # power of two
    assert S.recommended_buckets(10**30) == 1 << 20  # hard cap
