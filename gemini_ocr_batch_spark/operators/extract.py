"""The vectorized extraction operator: pages → extracted rows.

This is the Spark-side half of the reference's per-document map (reference:
src/batch_builder.py:23-43 request build + src/results.py:81-230 decode/
validate). The remote LLM is replaced by the deterministic kernels; the
plumbing is ``mapInPandas`` over Arrow batches — no per-row Python at the
DataFrame layer (BASELINE.json input_hint).

Skew handling (north_rule: "salted repartitioning by byte-size buckets"):
giant blobs make per-task work heavy-tailed. ``salt_by_size`` spreads rows
across ``n_partitions`` by (size_bucket, salt-of-url) so one task never
accumulates many giants, while small pages still pack densely.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gemini_ocr_batch_spark import EXTRACTOR_VERSION
from gemini_ocr_batch_spark.schemas import EXTRACTED_SCHEMA

# bytes of raw input kept on failure rows for forensics
_SAMPLE_BYTES = 240


def salt_by_size(pages: DataFrame, n_partitions: int, n_salt: int = 64) -> DataFrame:
    """Repartition by (log2-size bucket, salted url hash).

    ``width_bucket``-style bucketing by byte size puts giant blobs in their
    own buckets; the salt spreads each bucket uniformly. The html column
    itself is the payload, so this one shuffle is the only time blobs move.
    """
    bucketed = pages.withColumn(
        "_size_bucket",
        F.floor(F.log2(F.coalesce(F.length(F.col("html")), F.lit(0)) + F.lit(2))),
    ).withColumn("_salt", F.pmod(F.xxhash64("url", "warc_ts"), F.lit(n_salt)))
    return bucketed.repartition(n_partitions, "_size_bucket", "_salt").drop(
        "_size_bucket", "_salt"
    )


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch of pages in, extracted rows out.

    Runs the exact same ``extract_document`` the golden oracle runs
    (byte-identity gate). Per-batch wall time and the physical partition id
    are emitted per row for the lineage aggregation (north_rule:
    per-partition lineage rows).
    """
    # late imports: executed on the Python worker
    from pyspark import TaskContext

    from gemini_ocr_batch_spark.kernels import extract_document_detail

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1
    for pdf in it:
        t0 = time.perf_counter_ns()
        texts, spans_col, kinds, errors = [], [], [], []
        messages, samples, nbytes = [], [], []
        for blob, url in zip(pdf["html"], pdf["url"]):
            blob_b = bytes(blob) if blob is not None else None
            text, spans, kind, err, msg = extract_document_detail(blob_b, url)
            texts.append(text)
            spans_col.append(
                None
                if spans is None
                else [
                    {"start": s, "end": e, "kind": k} for s, e, k in spans
                ]
            )
            kinds.append(kind)
            errors.append(err)
            messages.append(msg)
            # failure forensics: a short lossless (latin-1) prefix of the
            # raw input so a failure class is debuggable without re-running
            # the kernel (reference failure log keeps the raw payload,
            # src/prefect_state.py:245-282)
            samples.append(
                blob_b[:_SAMPLE_BYTES].decode("latin-1")
                if err is not None and blob_b
                else None
            )
            nbytes.append(len(blob_b) if blob_b is not None else 0)
        elapsed = time.perf_counter_ns() - t0
        n = max(1, len(pdf))
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "extracted_text": pd.Series(texts, dtype="object"),
                "spans": pd.Series(spans_col, dtype="object"),
                "content_kind": pd.Series(kinds, dtype="object"),
                "extractor_version": EXTRACTOR_VERSION,
                "error_type": pd.Series(errors, dtype="object"),
                "error_message": pd.Series(messages, dtype="object"),
                "input_sample": pd.Series(samples, dtype="object"),
                "partition_id": pid,
                "bytes_in": pd.Series(nbytes, dtype="int64"),
                "kernel_ns": elapsed // n,
            }
        )


def _extract_batches_arrow(it):
    """mapInArrow kernel: pyarrow RecordBatch in/out — skips the pandas
    object-column round trip (list-of-struct spans are expensive to carry
    through pandas; building the Arrow ListArray directly is cheaper).
    The DEFAULT path since round 2: once the parser got ~2x faster, serde
    became the bottleneck and this measures ~1.3x the pandas twin at 32
    cores (118k vs 92k docs/s at sf0.1)."""
    import pyarrow as pa
    from pyspark import TaskContext

    from gemini_ocr_batch_spark.kernels import extract_document_detail

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1
    span_type = pa.list_(
        pa.struct(
            [
                pa.field("start", pa.int64(), nullable=False),
                pa.field("end", pa.int64(), nullable=False),
                pa.field("kind", pa.string(), nullable=False),
            ]
        )
    )
    for batch in it:
        t0 = time.perf_counter_ns()
        urls = batch.column("url").to_pylist()
        blobs = batch.column("html").to_pylist()
        texts, kinds, errs = [], [], []
        msgs, samples, nbytes = [], [], []
        # spans go straight to flattened Arrow buffers (offsets + struct
        # children + null mask) instead of one python dict PER SPAN —
        # measured ~100x faster array build; on span-dense real pages the
        # dict path was ~20% of total kernel wall
        sp_offsets, sp_starts, sp_ends, sp_kinds, sp_null = [0], [], [], [], []
        for url, blob in zip(urls, blobs):
            text, sp, kind, err, msg = extract_document_detail(blob, url)
            texts.append(text)
            if sp is None:
                sp_null.append(True)
            else:
                sp_null.append(False)
                for s, e, k in sp:
                    sp_starts.append(s)
                    sp_ends.append(e)
                    sp_kinds.append(k)
            sp_offsets.append(len(sp_starts))
            kinds.append(kind)
            errs.append(err)
            msgs.append(msg)
            samples.append(
                blob[:_SAMPLE_BYTES].decode("latin-1")
                if err is not None and blob
                else None
            )
            nbytes.append(len(blob) if blob is not None else 0)
        spans_arr = pa.ListArray.from_arrays(
            pa.array(sp_offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(sp_starts, pa.int64()),
                    pa.array(sp_ends, pa.int64()),
                    pa.array(sp_kinds, pa.string()),
                ],
                fields=list(span_type.value_type),
            ),
            mask=pa.array(sp_null),
        )
        elapsed = time.perf_counter_ns() - t0
        n = batch.num_rows  # constant columns must match row count exactly
        per_row_ns = elapsed // max(1, n)
        yield pa.record_batch(
            [
                batch.column("url"),
                batch.column("warc_ts"),
                pa.array(texts, pa.string()),
                spans_arr,
                pa.array(kinds, pa.string()),
                pa.array([EXTRACTOR_VERSION] * n, pa.string()),
                pa.array(errs, pa.string()),
                pa.array(msgs, pa.string()),
                pa.array(samples, pa.string()),
                pa.array([pid] * n, pa.int32()),
                pa.array(nbytes, pa.int64()),
                pa.array([per_row_ns] * n, pa.int64()),
            ],
            names=[
                "url", "warc_ts", "extracted_text", "spans", "content_kind",
                "extractor_version", "error_type", "error_message",
                "input_sample", "partition_id", "bytes_in", "kernel_ns",
            ],
        )


def extract_pages(
    pages: DataFrame,
    n_partitions: int | None = None,
    salt: bool | str = "auto",
    use_arrow: bool = True,
) -> DataFrame:
    """pages(url, warc_ts, html, ...) → extracted rows (EXTRACTED_SCHEMA).

    Column-prunes to exactly the three columns the kernel needs before any
    shuffle, so `text`/`lang` never move.

    ``salt`` policy — the blob column is the expensive thing to move, so
    the shuffle must pay for itself:
    - "auto" (default): salt only when the source partitioning cannot
      feed the target parallelism. A size-bounded file scan (parquet
      splits ≤ spark.sql.files.maxPartitionBytes) already bounds per-task
      byte work, so a well-split table skips the blob shuffle entirely
      (measured 2× kernel-stage throughput); a coarse source (few huge
      splits, or a collapsed post-join frontier) gets the full salted
      repartition.
    - True: always salt (pathological co-location, non-splittable blobs).
    - False: never (streaming frames, pre-partitioned input).
    """
    slim = pages.select("url", "warc_ts", "html")
    parts = n_partitions or pages.sparkSession.sparkContext.defaultParallelism
    if salt == "auto":
        try:
            src_parts = slim.rdd.getNumPartitions()
        except Exception:  # streaming frames have no rdd
            src_parts = parts
        # Planned byte-range splits LIE for coarse-row-group parquet: a
        # split yields rows only if a row-group start falls inside it, so
        # a single-row-group file plans N splits but N-1 are empty and
        # one task extracts everything (r3: 121k docs serialized onto one
        # core this way). inputFiles() is a driver-side metadata call; a
        # source with fewer files than target parallelism cannot be
        # TRUSTED to split, so it gets the salt shuffle — for a genuinely
        # many-row-group single file that shuffle is redundant but
        # harmless; for the pathological file it is a cores× win.
        try:
            # [] (not an exception) for in-memory/LocalRelation sources —
            # treat it like the non-file path, else every non-file source
            # would count as "0 files" and force a redundant salt shuffle
            n_files = len(slim.inputFiles()) or src_parts
        except Exception:  # non-file source (stream)
            n_files = src_parts
        effective = min(src_parts, max(n_files, 1))
        salt = effective < max(2, parts // 2)
    if salt:
        slim = salt_by_size(slim, parts)
    if use_arrow:
        return slim.mapInArrow(_extract_batches_arrow, schema=EXTRACTED_SCHEMA)
    return slim.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)
