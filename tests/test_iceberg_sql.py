"""String-level pinning of the Iceberg backend's SQL.

No Iceberg jar ships in this sandbox, so the MERGE INTO branch can't
execute — these tests pin the generated DDL/DML so the unexecutable path
can't silently rot (VERDICT r1 #10). The transition logic mirrored here is
the same one ParquetCheckpointStore.merge_results implements relationally
and tests/test_pipeline.py::test_checkpoint_merge_transitions executes.
"""

from __future__ import annotations

import re

from gemini_ocr_batch_spark.checkpoint import create_table_sql, merge_sql


def _squash(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def test_create_table_sql_shape():
    sql = _squash(create_table_sql("cat.db.ckpt"))
    assert "CREATE TABLE IF NOT EXISTS cat.db.ckpt" in sql
    # key + status columns, exactly the CHECKPOINT_SCHEMA fields
    for col in ("url STRING", "warc_ts TIMESTAMP", "status STRING",
                "attempts INT", "last_error STRING",
                "updated_at TIMESTAMP"):
        assert col in sql
    assert "USING iceberg" in sql
    # the scale lever: bucketed partitioning on the join key
    assert "PARTITIONED BY (bucket(256, url))" in sql


def test_merge_sql_transitions():
    sql = _squash(merge_sql("cat.db.ckpt", max_retries=3))
    assert "MERGE INTO cat.db.ckpt t" in sql
    assert "USING _ckpt_delta s" in sql
    assert "ON t.url = s.url AND t.warc_ts = s.warc_ts" in sql
    # success transition first (order matters: MATCHED clauses fire in order)
    first_matched = sql.index("WHEN MATCHED AND s.error_type IS NULL")
    second_matched = sql.index("WHEN MATCHED THEN UPDATE SET t.status = CASE")
    assert first_matched < second_matched
    assert "t.status = 'success'" in sql
    # success ALSO bumps attempts so all three twin merge paths (Iceberg,
    # Spark-Parquet, DuckDB-local) report identical cumulative counters
    assert ("WHEN MATCHED AND s.error_type IS NULL THEN UPDATE SET "
            "t.status = 'success', t.attempts = t.attempts + 1") in sql
    # failure transition: attempts+1, dead-letter once attempts+1 >= max
    assert "CASE WHEN t.attempts + 1 >= 3 THEN 'dead' ELSE 'failed' END" in sql
    assert "t.attempts = t.attempts + 1" in sql
    assert "t.last_error = s.error_type" in sql
    # insert branch: first attempt, dead immediately iff max_retries <= 1
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    assert ("CASE WHEN s.error_type IS NULL THEN 'success' "
            "WHEN 1 >= 3 THEN 'dead' ELSE 'failed' END") in sql


def test_merge_sql_max_retries_one_dead_letters_on_insert():
    sql = _squash(merge_sql("t", max_retries=1))
    assert "WHEN 1 >= 1 THEN 'dead'" in sql
    assert "CASE WHEN t.attempts + 1 >= 1 THEN 'dead'" in sql


def test_mark_running_sql_shape():
    from gemini_ocr_batch_spark.checkpoint import mark_running_sql

    sql = _squash(mark_running_sql("t"))
    assert "USING _ckpt_running s" in sql
    # never demotes a finished key
    assert "t.status NOT IN ('success', 'dead')" in sql
    assert "t.status = 'running'" in sql
    assert "VALUES ( s.url, s.warc_ts, 'running', 0, NULL" in sql


def test_iceberg_store_surface_matches_job_needs():
    """The job drives the store through this exact narrow surface —
    both backends must expose it (store injection in run_extraction_job)."""
    from gemini_ocr_batch_spark.checkpoint import (
        IcebergCheckpointStore,
        ParquetCheckpointStore,
    )

    for method in ("pending", "merge_results", "merge_results_local",
                   "mark_running", "vacuum", "read", "dead_letters"):
        assert hasattr(ParquetCheckpointStore, method), method
        assert hasattr(IcebergCheckpointStore, method), method
