"""Validated config source (S9) — mirrors the reference's config test
strategy (reference: test/unit/test_config.py:11-109: invalid YAML, missing
field, bad range ⇒ clear dotted-path messages; src/env.py .env semantics)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from gemini_ocr_batch_spark.config import (
    CONFIG_ENV_VAR,
    AppConfig,
    ConfigError,
    load_config,
    load_dotenv,
    resolve_config_path,
    validate_config,
)

FULL = """
paths:
  pages: /data/pages.parquet
  out: /data/out
filters:
  langs: [en, de]
  crawl_window:
    start: 2024-01-01
    end: 2024-06-30
execution:
  max_retries: 5
  partitions: 64
  track_inflight: true
checkpoint:
  backend: parquet
  n_buckets: 32
spark:
  master: local[8]
  shuffle_partitions: 8
"""


def _write(tmp_path, text, name="cfg.yaml"):
    p = tmp_path / name
    p.write_text(text, encoding="utf-8")
    return str(p)


def test_full_config_parses(tmp_path):
    cfg = load_config(_write(tmp_path, FULL))
    assert isinstance(cfg, AppConfig)
    assert cfg.paths.pages == "/data/pages.parquet"
    assert cfg.filters.langs == ["en", "de"]
    assert cfg.filters.crawl_window.start == dt.date(2024, 1, 1)
    assert cfg.filters.crawl_window.end == dt.date(2024, 6, 30)
    assert cfg.execution.max_retries == 5
    assert cfg.execution.track_inflight is True
    assert cfg.checkpoint.n_buckets == 32
    assert cfg.spark.master == "local[8]"


def test_minimal_config_gets_defaults(tmp_path):
    cfg = load_config(
        _write(tmp_path, "paths:\n  pages: /p\n  out: /o\n")
    )
    assert cfg.execution.max_retries == 3
    assert cfg.execution.partitions is None
    assert cfg.execution.track_inflight is False
    assert cfg.checkpoint.backend == "parquet"
    assert cfg.checkpoint.n_buckets == 16
    assert cfg.filters.langs is None and cfg.filters.crawl_window is None
    assert cfg.spark.master is None


def test_missing_required_field_names_path(tmp_path):
    with pytest.raises(ConfigError) as ei:
        load_config(_write(tmp_path, "paths:\n  out: /o\n"))
    assert "paths.pages: field required" in str(ei.value)


def test_bad_window_range_is_actionable(tmp_path):
    bad = FULL.replace("end: 2024-06-30", "end: 2023-01-01")
    with pytest.raises(ConfigError) as ei:
        load_config(_write(tmp_path, bad))
    msg = str(ei.value)
    assert "filters.crawl_window.end" in msg
    assert "must be >= filters.crawl_window.start" in msg


def test_invalid_yaml_is_actionable(tmp_path):
    with pytest.raises(ConfigError) as ei:
        load_config(_write(tmp_path, "paths: [unclosed\n"))
    assert "Invalid YAML" in str(ei.value)


def test_missing_file_is_actionable(tmp_path):
    with pytest.raises(ConfigError) as ei:
        load_config(str(tmp_path / "nope.yaml"))
    assert "Config file not found" in str(ei.value)


def test_non_mapping_root_rejected():
    with pytest.raises(ConfigError) as ei:
        validate_config(["a", "b"])  # type: ignore[arg-type]
    assert "expected mapping" in str(ei.value)


def test_all_errors_reported_at_once():
    with pytest.raises(ConfigError) as ei:
        validate_config(
            {
                "paths": {"pages": ""},
                "execution": {"max_retries": 0, "partitions": "lots"},
                "checkpoint": {"backend": "dynamo"},
                "filters": {"langs": "en"},
            }
        )
    msg = str(ei.value)
    for frag in (
        "paths.pages: must be a non-empty string",
        "paths.out: field required",
        "execution.max_retries: must be >= 1",
        "execution.partitions: must be an integer",
        "checkpoint.backend: must be one of parquet|iceberg",
        "filters.langs: must be a list of non-empty strings",
    ):
        assert frag in msg, frag


def test_iceberg_backend_requires_table():
    with pytest.raises(ConfigError) as ei:
        validate_config(
            {"paths": {"pages": "/p", "out": "/o"},
             "checkpoint": {"backend": "iceberg"}}
        )
    assert "checkpoint.iceberg_table: field required" in str(ei.value)


def test_dotenv_setdefault_semantics(tmp_path, monkeypatch):
    envf = tmp_path / ".env"
    envf.write_text(
        "# comment\nSPARK_GRAFT_TESTVAR='from_dotenv'\n"
        "SPARK_GRAFT_TESTVAR2=plain\nnot a kv line\n",
        encoding="utf-8",
    )
    monkeypatch.setenv("SPARK_GRAFT_TESTVAR", "from_env")
    monkeypatch.delenv("SPARK_GRAFT_TESTVAR2", raising=False)
    load_dotenv(str(envf))
    assert os.environ["SPARK_GRAFT_TESTVAR"] == "from_env"  # env wins
    assert os.environ["SPARK_GRAFT_TESTVAR2"] == "plain"
    monkeypatch.delenv("SPARK_GRAFT_TESTVAR2", raising=False)
    load_dotenv(str(tmp_path / "absent.env"))  # no-op, no raise


def test_resolve_config_path_precedence(monkeypatch):
    monkeypatch.setenv(CONFIG_ENV_VAR, "/from/env.yaml")
    assert resolve_config_path("/from/cli.yaml") == "/from/cli.yaml"
    assert resolve_config_path(None) == "/from/env.yaml"
    monkeypatch.delenv(CONFIG_ENV_VAR)
    assert resolve_config_path(None) is None


def test_cli_rejects_bad_config_without_spark(tmp_path, capsys):
    from gemini_ocr_batch_spark.__main__ import main

    bad = _write(tmp_path, "paths:\n  out: /o\n")
    rc = main(["run", "--config", bad])
    assert rc == 2
    assert "paths.pages: field required" in capsys.readouterr().err


def test_cli_requires_paths_from_somewhere(capsys):
    from gemini_ocr_batch_spark.__main__ import main

    rc = main(["run"])
    assert rc == 2
    assert "--pages" in capsys.readouterr().err


def test_apply_input_filters(spark):
    from gemini_ocr_batch_spark.config import CrawlWindow, FiltersConfig
    from gemini_ocr_batch_spark.job import apply_input_filters
    from gemini_ocr_batch_spark.schemas import PAGES_SCHEMA

    rows = [
        ("u1", dt.datetime(2024, 1, 15), b"x", None, "en"),
        ("u2", dt.datetime(2024, 7, 1), b"x", None, "en"),   # out of window
        ("u3", dt.datetime(2024, 3, 1), b"x", None, "fr"),   # wrong lang
        ("u4", dt.datetime(2024, 6, 30, 23, 59), b"x", None, "de"),  # edge in
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    f = FiltersConfig(
        langs=["en", "de"],
        crawl_window=CrawlWindow(dt.date(2024, 1, 1), dt.date(2024, 6, 30)),
    )
    got = {r["url"] for r in apply_input_filters(pages, f).collect()}
    assert got == {"u1", "u4"}
    assert apply_input_filters(pages, None) is pages
    # filters are plain predicates → pushed to the scan, not post-filtered
    plan = apply_input_filters(pages, f)._jdf.queryExecution().executedPlan()
    assert "Filter" in plan.toString()


def test_curation_section_defaults_and_validation():
    from gemini_ocr_batch_spark.config import (
        ConfigError,
        validate_config,
    )

    base = {"paths": {"pages": "/p", "out": "/o"}}
    cfg = validate_config(base)
    assert cfg.curation.min_quality_x10000 == 3000
    assert cfg.curation.max_rep_x10000 == 5000
    assert cfg.curation.curated_out is None

    cfg = validate_config(
        {**base, "curation": {"min_quality_x10000": 4200,
                              "max_rep_x10000": 2500,
                              "curated_out": "/cur"}}
    )
    assert cfg.curation.min_quality_x10000 == 4200
    assert cfg.curation.max_rep_x10000 == 2500
    assert cfg.curation.curated_out == "/cur"

    import pytest

    with pytest.raises(ConfigError) as exc:
        validate_config(
            {**base, "curation": {"min_quality_x10000": -1,
                                  "curated_out": ""}}
        )
    msg = str(exc.value)
    assert "curation.min_quality_x10000" in msg
    assert "curation.curated_out" in msg


def test_decontam_section_defaults_and_validation():
    base = {"paths": {"pages": "/p", "out": "/o"}}
    cfg = validate_config(base)
    assert cfg.decontam.ngram == 8
    assert cfg.decontam.min_overlap == 1
    assert cfg.decontam.benchmark_path is None
    assert cfg.decontam.flags_out is None

    cfg = validate_config(
        {**base, "decontam": {"ngram": 13, "min_overlap": 3,
                              "benchmark_path": "/b.parquet",
                              "flags_out": "/dec"}}
    )
    assert cfg.decontam.ngram == 13
    assert cfg.decontam.min_overlap == 3
    assert cfg.decontam.benchmark_path == "/b.parquet"
    assert cfg.decontam.flags_out == "/dec"

    import pytest

    with pytest.raises(ConfigError) as exc:
        validate_config(
            {**base, "decontam": {"ngram": 1, "benchmark_path": ""}}
        )
    msg = str(exc.value)
    assert "decontam.ngram" in msg
    assert "decontam.benchmark_path" in msg


def test_example_pipeline_config_stays_valid():
    """examples/pipeline.yaml documents every section; keep it loading
    cleanly so the docs cannot rot."""
    import os

    from gemini_ocr_batch_spark.config import load_config

    path = os.path.join(os.path.dirname(__file__), "..",
                        "examples", "pipeline.yaml")
    cfg = load_config(path)
    assert cfg.paths.pages == "/data/crawl/pages"
    assert cfg.filters.langs == ["en", "de"]
    assert cfg.filters.blocklist_path and cfg.filters.robots_path
    assert cfg.filters.url_patterns == ["/casino/", "\\.xxx/"]
    assert cfg.filters.keep_unknown_lang is True
    assert cfg.curation.normalize_nfkc and cfg.curation.gopher_rules
    assert cfg.decontam.ngram == 8
    assert cfg.sharding.n_shards == 64 and cfg.sharding.out


def test_lang_filter_keeps_unknown_lang_by_default(spark):
    # review regression: WARC-sourced pages carry lang=NULL; a strict
    # isin() silently extracted nothing from a crawl segment.
    from gemini_ocr_batch_spark.config import FiltersConfig
    from gemini_ocr_batch_spark.job import apply_input_filters
    from gemini_ocr_batch_spark.schemas import PAGES_SCHEMA

    rows = [
        ("u1", dt.datetime(2024, 1, 15), b"x", None, "en"),
        ("u2", dt.datetime(2024, 1, 16), b"x", None, "fr"),
        ("u3", dt.datetime(2024, 1, 17), b"x", None, None),  # crawl-native
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    default = apply_input_filters(pages, FiltersConfig(langs=["en"]))
    assert {r["url"] for r in default.collect()} == {"u1", "u3"}
    strict = apply_input_filters(
        pages, FiltersConfig(langs=["en"], keep_unknown_lang=False)
    )
    assert {r["url"] for r in strict.collect()} == {"u1"}


def test_sharding_section_validation():
    from gemini_ocr_batch_spark.config import ConfigError, validate_config

    import pytest

    base = {"paths": {"pages": "p", "out": "o"}}
    cfg = validate_config({**base, "sharding": {"n_shards": 8, "out": "s"}})
    assert cfg.sharding.n_shards == 8 and cfg.sharding.out == "s"
    # null n_shards must fail at LOAD, not crash the shard stage later
    with pytest.raises(ConfigError, match="sharding.n_shards"):
        validate_config({**base, "sharding": {"n_shards": None, "out": "s"}})
    with pytest.raises(ConfigError, match="sharding.out"):
        validate_config({**base, "sharding": {"out": "  "}})
    # benchmark_text_col: validated string with a 'text' default
    assert validate_config(base).decontam.benchmark_text_col == "text"
    cfg2 = validate_config(
        {**base, "decontam": {"benchmark_text_col": "body"}}
    )
    assert cfg2.decontam.benchmark_text_col == "body"
    with pytest.raises(ConfigError, match="decontam.benchmark_text_col"):
        validate_config({**base, "decontam": {"benchmark_text_col": ""}})
