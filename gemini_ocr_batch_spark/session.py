"""SparkSession factory with scale-aware defaults.

One place for every engine knob so tests, bench, and spark-submit runs get
identical physical behavior. The conf set mirrors SURVEY.md §4's physical
strategy: AQE on (runtime re-plan, skew-join split, partition coalesce),
Arrow on with a small batch size (big html blobs → bounded Arrow batches),
UTC session timezone (duckdb-oracle comparability), shuffle partitions sized
to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size for the pandas-UDF stages. Bigger batches amortize the
# per-batch Arrow/pandas overhead (measured ~1.8× throughput going
# 256→2048 on the extraction kernel); the size-bucket salting in
# operators/extract.py keeps giant blobs spread across tasks, but a
# deployment with multi-MB median blobs should lower this so one Arrow
# batch stays ≪ worker memory.
ARROW_MAX_RECORDS_PER_BATCH = 1024


def get_spark(
    app_name: str = "gemini_ocr_batch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("", "*") else int(n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        # split size tuned to the extraction kernel's CPU cost (~3 MB/s/core
        # of html), not to I/O: 8 MB splits → ~2-3 s tasks, per-task byte
        # work bounded (skew), and a modest table still feeds every core
        # without shuffling the blob column (extract_pages salt="auto")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        # Bound the vectorized parquet scan batch by ROWS: the default
        # 4096-row batches of heavy-tail binary blobs (~100 KB max rows)
        # reserve up to ~400 MB contiguous per task — at 32 concurrent
        # tasks under spark-submit's default 1g driver heap (where the
        # spark.driver.memory conf below arrives too late to matter) the
        # reader dies with "Cannot reserve additional contiguous bytes".
        # 512 rows bounds the batch at ~50 MB worst-case per task while
        # costing nothing on the narrow relational tables. This is a
        # runtime SQL conf, so it protects every launch mode.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # NOTE: only effective when THIS process launches the JVM
        # (python x.py). Under spark-submit the JVM pre-exists — pass
        # --driver-memory there (see README).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # zstd parquet output (guide §6): the extraction output at sf1.0
        # shrinks 160 MB → 100 MB at statistically equal write wall
        # (r7 A/B, both codecs within run-to-run noise) — on a single-
        # disk host fewer bytes written is the reliable win, and every
        # downstream re-read (checkpoint merge, curation, analyze)
        # scans ~40% fewer bytes
        .config("spark.sql.parquet.compression.codec", "zstd")
        # micros instead of INT96: smaller, and pyarrow reads it as
        # timestamp[us, UTC] — required by the driver-side merge/lineage
        # fast paths that re-read Spark-written pass output
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # task-side output commit (v2): no serial driver-side rename of N
        # output files per job — measurable on many-file sinks
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
    )
    # shuffle through tmpfs when available: blob-heavy shuffles (the salted
    # repartition moves the html column) are disk-bound on this host's
    # single vda; a RAM-rich node serves them from /dev/shm. Real clusters
    # point spark.local.dir at striped NVMe instead.
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if shm is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        shm = "/dev/shm/spark_local"
    if shm:
        builder = builder.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
