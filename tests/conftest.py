"""Shared Spark fixtures. One local session per test run."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small + fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from gemini_ocr_batch_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def pages_rows():
    from gemini_ocr_batch_spark.datagen import generate_rows

    return generate_rows(240, seed=42)


@pytest.fixture(scope="session")
def pages_parquet(pages_rows, tmp_path_factory):
    from gemini_ocr_batch_spark.datagen import write_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    write_pages_parquet(pages_rows, path)
    return path


@pytest.fixture(scope="session")
def pages_df(spark, pages_parquet):
    return spark.read.parquet(pages_parquet)
