"""Sources & sinks beyond plain parquet — the reference's I/O surface
(SURVEY.md §2.1) re-expressed: tolerant JSONL, CSV export, binary-file
ingestion."""

from gemini_ocr_batch_spark.sources.jsonl import (
    read_jsonl_tolerant,
    write_jsonl,
)

__all__ = ["read_jsonl_tolerant", "write_jsonl"]
