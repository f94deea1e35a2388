"""Structured Streaming tests: micro-batch extraction, watermarked windows,
stateful sessionizer (+ its batch twin)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.datagen import generate_rows, write_pages_parquet
from gemini_ocr_batch_spark.streaming.pipeline import (
    sessionize_batch,
    sessionize_events,
    stream_extract,
    windowed_event_counts,
)


def test_stream_extract_drains_directory(spark, tmp_path):
    pages_dir = tmp_path / "pages_in"
    pages_dir.mkdir()
    rows = generate_rows(60, seed=3)
    write_pages_parquet(rows[:30], str(pages_dir / "a.parquet"))
    write_pages_parquet(rows[30:], str(pages_dir / "b.parquet"))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extract(spark, str(pages_dir), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == len(rows)
    assert got.filter(F.col("error_type").isNull()).count() > 0
    # exactly-once across restarts: draining again adds nothing
    q2 = stream_extract(spark, str(pages_dir), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(rows)


def test_windowed_event_counts_streaming(spark, sf_dir, tmp_path):
    events_path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema).parquet(os.path.dirname(events_path))
    )
    # reading the whole dir would pick up all tables; stage just events
    staged = tmp_path / "events_in"
    staged.mkdir()
    spark.read.parquet(events_path).write.parquet(str(staged / "e"))
    stream = spark.readStream.schema(schema).parquet(str(staged / "e"))
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts")
    # append mode emits only watermark-closed windows; batch-compute truth
    batch = windowed_event_counts(
        spark.read.parquet(events_path), window="1 hour", watermark="2 hours"
    )
    closed = got.count()
    assert closed > 0
    joined = got.join(
        batch.withColumnRenamed("n", "n_b"),
        ["window_start", "window_end", "event_type"],
    )
    assert joined.filter(F.col("n") != F.col("n_b")).count() == 0


def test_sessionize_batch_semantics(spark):
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (1, t0, 100),
        (1, t0 + dt.timedelta(minutes=10), 101),
        (1, t0 + dt.timedelta(hours=2), 102),  # gap > 30min → new session
        (2, t0, 200),
    ]
    df = spark.createDataFrame(
        [(u, ts, e) for u, ts, e in rows], "user_id long, ts timestamp, event_id long"
    )
    got = sessionize_batch(df).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2
    assert by_user[1][0]["n_events"] == 2
    assert by_user[1][1]["n_events"] == 1
    assert len(by_user[2]) == 1


def test_sessionize_stateful_streaming(spark, tmp_path):
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (1, t0, 100, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(minutes=5), 101, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(hours=3), 102, "view", 1.0, "{}"),
        (2, t0, 200, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        [(e, ts, u, et, v, p) for u, ts, e, et, v, p in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    staged = tmp_path / "ev"
    df.write.parquet(str(staged))
    stream = spark.readStream.schema(df.schema).parquet(str(staged))
    q = (
        sessionize_events(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions").collect()
    # user 1's first session (2 events) closed by the 3h gap within the
    # batch; open sessions remain in state (append mode)
    closed = {(r["user_id"], r["n_events"]) for r in got}
    assert (1, 2) in closed


def test_stream_dedup_exact(spark, tmp_path):
    """First occurrence of each text survives; later same-text rows within
    the watermark horizon are dropped; state is keyed by digest."""
    from gemini_ocr_batch_spark.streaming.pipeline import stream_dedup_exact

    staged = tmp_path / "dedup_in"
    staged.mkdir()
    ts = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", ts, b"", "same text", "en"),
        ("u2", ts + dt.timedelta(minutes=1), b"", "same text", "en"),
        ("u3", ts + dt.timedelta(minutes=2), b"", "other text", "en"),
        ("u4", ts + dt.timedelta(minutes=3), b"", "same text", "en"),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    df.write.parquet(str(staged / "p"))
    stream = spark.readStream.schema(df.schema).parquet(str(staged / "p"))
    q = (
        stream_dedup_exact(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select url, text from dedup_stream").collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["other text", "same text"]
    # exactly ONE survivor per digest; which duplicate survives is
    # processing-order (arrival) semantics, not event-time-min — within a
    # multi-partition micro-batch that choice is arbitrary by design
    kept = {r["text"]: r["url"] for r in got}
    assert kept["same text"] in {"u1", "u2", "u4"}
    assert kept["other text"] == "u3"


def test_stream_curate_matches_batch_keep_set(spark, tmp_path):
    """Streaming curation over a staged corpus == the batch curation
    keep SET per fingerprint (stream keeps first arrival, batch keeps
    min id — same survivor set per duplicate cluster), with
    quality/repetition filtering applied before state."""
    from pyspark.sql import functions as F

    from gemini_ocr_batch_spark.operators.webtext import curation_flags
    from gemini_ocr_batch_spark.streaming.pipeline import stream_curate

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "far away into the woods with a friend of the family for fun"
    )
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), good),
        (2, dt.datetime(2024, 1, 1, 0, 5), good),        # dup of 1
        (3, dt.datetime(2024, 1, 1, 0, 6), "spam " * 40),  # repetitive
        (4, dt.datetime(2024, 1, 1, 0, 7), good + " extra tail words"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, warc_ts timestamp, text string"
    )
    staged = tmp_path / "curate_in"
    df.write.parquet(str(staged))
    stream = spark.readStream.schema(df.schema).parquet(str(staged))
    q = (
        stream_curate(stream, min_quality_x10000=4000)
        .select("fingerprint")
        .writeStream.format("memory")
        .queryName("sc_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["fingerprint"] for r in spark.sql("select * from sc_out").collect()
    }
    batch = curation_flags(df, min_quality_x10000=4000)
    batch_keep_fps = {
        r["fingerprint"]
        for r in df.join(
            batch.filter("keep").select("doc_id"), "doc_id", "semi"
        )
        .select(
            F.md5(
                F.array_join(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+"), " "
                )
            ).alias("fingerprint")
        )
        .collect()
    }
    assert got == batch_keep_fps
    assert len(got) == 2  # the good cluster's survivor + the tail variant
