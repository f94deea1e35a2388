"""Mimic the driver's correctness gate: run every ``queries()`` entry on
Spark AND its ``oracle_sql()`` twin on DuckDB over the same parquet tables,
compare row count, column names, and values (order-insensitive).

Runs at sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif s.dtype == object:
            out[c] = s.astype(str)
        else:
            try:
                out[c] = s.astype("int64")
            except (TypeError, ValueError):
                out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()
for _name, (_fn, _sql) in entrymod.local_parity().items():
    # Local-only pairs ride the same parity gate but are not registered
    # with the driver (its correctness harness records at most 50 rows).
    assert _name not in QUERIES
    QUERIES[_name] = _fn
    ORACLES[_name] = _sql


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_driver_registry_capped_at_50():
    # The driver's correctness harness silently drops entries past 50
    # (observed in round 2: 51 registered -> 50 CORRECTNESS rows, losing
    # the only S4 check).  Pin the registry size so every registered
    # query is guaranteed a correctness row.
    assert len(entrymod.queries()) == 50
    assert "asset_metadata" in entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, ddb, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = ddb.execute(ORACLES[name]).df()
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), name
    # Strict dtype gate BEFORE normalization: the driver's value-hash is
    # type-sensitive, and DuckDB silently widens aggregates (sum(BIGINT)
    # -> HUGEINT, which pandas receives as float64/object).  _normalize's
    # astype("int64") would mask that drift — this class of bug escaped to
    # the driver in r1 (sessionize) and r2 (source_stats).  Fail here if
    # the oracle column leaves the integer family while Spark stays in it.
    for c in spark_pdf.columns:
        s_int = pd.api.types.is_integer_dtype(spark_pdf[c])
        d_int = pd.api.types.is_integer_dtype(duck_pdf[c])
        if s_int and not d_int:
            raise AssertionError(
                f"{name}.{c}: Spark yields {spark_pdf[c].dtype} but the "
                f"DuckDB oracle yields {duck_pdf[c].dtype} — likely a "
                "HUGEINT/DOUBLE widening; add an explicit CAST(... AS "
                "BIGINT) in the oracle SQL (driver hash is type-sensitive)"
            )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6,
                                  obj=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
