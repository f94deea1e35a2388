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


def _assert_driver_canon_safe(name: str, pdf: pd.DataFrame, side: str) -> None:
    """Mirror the driver's canonicalizer contract: it lexsorts EVERY output
    column through pandas without stringifying objects first, so a
    list/struct/array-typed column crashes it with ``TypeError: unhashable
    type`` (the r4 ``winnow_fingerprints`` err row — the local gate's
    ``astype(str)`` masked it).  Registered queries must emit scalar
    columns only; serialize containers with concat_ws/array_to_string."""
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype != object:
            continue
        bad = s.map(
            lambda v: isinstance(v, (list, tuple, dict, set))
            or type(v).__name__ == "ndarray"
        )
        if bad.any():
            raise AssertionError(
                f"{name}.{c} ({side}): container-typed value "
                f"{s[bad.idxmax()]!r} — the driver's canonicalizer cannot "
                "sort it; serialize the column (concat_ws Spark-side, "
                "array_to_string oracle-side, the group_collect pattern)"
            )


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
    if name in entrymod.queries():
        # Driver-registered queries face the driver's own canonicalizer:
        # no container columns, and a 0-row result would make the hash
        # comparison vacuous (r4: ann_ivf/range_filter/set_except all
        # "passed" on 0-vs-0 rows).  Empty-by-design queries would need an
        # explicit allowlist here — currently there are none.
        _assert_driver_canon_safe(name, spark_pdf, "spark")
        _assert_driver_canon_safe(name, duck_pdf, "oracle")
        assert len(spark_pdf) > 0, (
            f"{name}: registered query returned 0 rows — the driver's "
            "hash match would be vacuous; make the fixture non-empty"
        )
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


@pytest.mark.parametrize(
    "probe_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_fixture_sizes_within_oracle_series_caps(probe_dir):
    """Several oracles bound their per-document expansion with FIXED
    generate_series caps (DuckDB's generate_series cannot take a lateral
    column bound): 4096 chars for winnow_fingerprints, 1024 tokens for
    repetition_score/curation_flags, 512 shingle positions for the
    n-gram/minhash CTE, 64 lines for line_dedup.  If a regenerated
    fixture ever exceeded a cap the oracle would silently truncate and
    the mismatch would surface as a confusing value-hash diff — fail
    loudly here instead, at both the local (sf0.001) and driver (sf0.01)
    scale factors."""
    con = duckdb.connect()
    row = con.execute(
        f"""
        SELECT max(length(trim(lower(text)))),
               max(len(regexp_split_to_array(trim(lower(text)), '\\s+'))),
               max(len(string_split(text, chr(10))))
        FROM '{probe_dir}/documents.parquet'
        """
    ).fetchone()
    max_chars, max_tokens, max_lines = row
    assert max_chars <= 4096, "winnow oracle's generate_series cap exceeded"
    assert max_tokens <= 1024, (
        "repetition/curation oracles' generate_series cap exceeded"
    )
    assert max_tokens <= 512, "shingle CTE's generate_series cap exceeded"
    # line_dedup synthesizes 3 extra lines on top of the document text
    assert max_lines + 3 <= 64, "line_dedup oracle's line cap exceeded"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_flagship_extraction_covers_both_kernels(spark, sf_dir):
    # The synthesized crawl mixes HTML and minimal-PDF pages so the
    # driver-verified flagship routes through kernels/dispatch.py into
    # BOTH extraction kernels (VERDICT r4 missing #3: the PDF kernel had
    # engine tests but never a CORRECTNESS row).
    kinds = {
        r["content_kind"]
        for r in QUERIES["extract_main_text"](spark, sf_dir)
        .select("content_kind")
        .distinct()
        .collect()
    }
    assert kinds == {"html", "pdf"}
