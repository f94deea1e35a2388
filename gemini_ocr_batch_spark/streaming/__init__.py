"""Structured Streaming surface.

The reference itself is a poll loop, not a stream (SURVEY.md §2.10:
``time.sleep`` polling, reference: src/flow.py:487-494) — its semantics are
fully served by the batch job + checkpoint resume. This module provides the
genuinely-streaming variants a continuous crawl ingest would use:
micro-batch extraction over a landing directory, watermarked windowed
aggregation, and a custom stateful operator.
"""
