"""Resumable checkpoint store — the analog of the reference's
``SQLiteStateStore`` (reference: src/prefect_state.py:19-282, five SQLite
tables) collapsed into one keyed status table with MERGE semantics.

Two backends behind one narrow API, exactly the reference's store-protocol
duality (reference: src/prefect_state.py:285-346 swaps SQLite for an
in-memory store behind the same interface):

- ``ParquetCheckpointStore`` (sandbox + any vanilla Spark): versioned
  snapshot directories + an atomically-replaced ``_CURRENT`` pointer file.
  A "MERGE" = read current snapshot → full-outer combine with the delta →
  write a new snapshot dir → flip the pointer. Readers always see a
  complete snapshot; a crashed writer leaves only an unreferenced dir.
  At 10^12-key scale this is the fallback path; the rewrite cost is bounded
  by bucketing the snapshot on xxhash64(url) so only touched buckets
  rewrite (future work — the sandbox snapshot is single-digit MB).

- Iceberg (cluster runtimes with the jar): the same ``merge`` surface maps
  to ``MERGE INTO checkpoint t USING delta s ON t.url=s.url AND
  t.warc_ts=s.warc_ts WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN
  INSERT ...`` — gated behind an import/catalog check since no Iceberg jar
  ships in this sandbox.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.schemas import (
    CHECKPOINT_SCHEMA,
    STATUS_DEAD,
    STATUS_FAILED,
    STATUS_PENDING,
    STATUS_RUNNING,
    STATUS_SUCCESS,
)

_CURRENT = "_CURRENT"
_UNSET = object()  # sentinel: flip without a CAS check

KEY = ["url", "warc_ts"]


class CheckpointConflict(RuntimeError):
    """Another writer advanced the checkpoint mid-merge (lost-update guard)."""


class ParquetCheckpointStore:
    """Atomic snapshot-swap checkpoint over plain Parquet.

    Concurrency contract: SINGLE WRITER. The store does not serialize
    concurrent merges — it *fences* them: every merge records the snapshot
    version it read, and the pointer flip is a compare-and-swap that raises
    :class:`CheckpointConflict` if another writer flipped first. The losing
    merge's snapshot dir is left unreferenced (GC'd by vacuum) and no delta
    is silently dropped — the caller retries the merge from the new base.
    (The reference serializes writers in SQLite instead,
    reference: src/database.py:128-145.)
    """

    def __init__(self, root: str, max_retries: int = 3) -> None:
        self.root = root
        self.max_retries = max_retries
        os.makedirs(root, exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------------
    def _current_version(self) -> str | None:
        ptr = os.path.join(self.root, _CURRENT)
        if not os.path.exists(ptr):
            return None
        with open(ptr, encoding="utf-8") as f:
            name = f.read().strip()
        return name or None

    def _flip(self, new_version: str, expect=_UNSET) -> None:
        """Atomically point _CURRENT at ``new_version``.

        With ``expect`` set (a version name or None-for-fresh), this is a
        compare-and-swap under a short-lived exclusive lock file: if the
        pointer no longer equals ``expect``, raise CheckpointConflict
        instead of silently discarding the other writer's merge.
        """
        ptr = os.path.join(self.root, _CURRENT)
        lock = ptr + ".lock"
        fd = None
        for _ in range(500):  # the critical section is microseconds
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                time.sleep(0.005)
        if fd is None:
            raise CheckpointConflict(
                f"could not acquire {lock}; stale lock from a dead writer?"
            )
        try:
            if expect is not _UNSET and self._current_version() != expect:
                raise CheckpointConflict(
                    f"checkpoint advanced past {expect!r} during merge; "
                    "re-read and retry"
                )
            tmp = ptr + f".tmp.{os.getpid()}"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(new_version)
            os.replace(tmp, ptr)  # atomic on POSIX
        finally:
            os.close(fd)
            os.unlink(lock)

    def _next_version(self) -> str:
        cur = self._current_version()
        n = int(cur.split("_")[1]) + 1 if cur else 1
        # uuid suffix: concurrent writers racing to the same ordinal write
        # distinct snapshot dirs — the loser's is unreferenced, never a
        # half-clobbered winner
        return f"v_{n:08d}_{uuid.uuid4().hex[:8]}"

    def vacuum(self, keep: int = 2) -> None:
        """Drop all but the newest ``keep`` snapshot dirs (GC, safe anytime)."""
        versions = sorted(
            d for d in os.listdir(self.root) if d.startswith("v_")
        )
        cur = self._current_version()
        for d in versions[:-keep]:
            if d != cur:
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)

    # -- relational surface ----------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        cur = self._current_version()
        if cur is None:
            return spark.createDataFrame([], CHECKPOINT_SCHEMA)
        return spark.read.schema(CHECKPOINT_SCHEMA).parquet(
            os.path.join(self.root, cur)
        )

    def pending(self, pages: DataFrame) -> DataFrame:
        """The core resume query (north_rule: "idempotent resume via
        anti-join of pending vs completed").

        Declaratively the reference's scan_runnable_pages pending-set
        (reference: src/scanner.py:84-91 — drop completed, drop inflight,
        drop dead-lettered): pages ⟕̸ checkpoint[status ∈ {success, dead}].
        Key-only anti-join — the blob column never enters the join.
        """
        # fresh store: no join at all — an empty LocalRelation build side
        # has no stats, and a statically-planned SMJ would shuffle the
        # entire blob table for nothing
        if self._current_version() is None:
            return pages
        done = self.read(pages.sparkSession).filter(
            F.col("status").isin(STATUS_SUCCESS, STATUS_DEAD)
        ).select(*KEY)
        # join strategy is Catalyst's call: a small parquet snapshot has
        # stats and broadcasts automatically (autoBroadcastJoinThreshold);
        # at 10^9+ keys the done set is NOT broadcastable and must become a
        # sort-merge join on the bucketed key — forcing F.broadcast here
        # would OOM the driver
        return pages.join(done, on=KEY, how="left_anti")

    def merge_results(self, extracted: DataFrame) -> None:
        """MERGE the outcome of one extraction pass into the checkpoint.

        Analog of the reference's close-batch + increment-failure-counts
        transitions (reference: src/prefect_state.py:111-155,176-199):
        success → status=success; failure → attempts+1, status=failed, or
        dead once attempts ≥ max_retries (dead-letter predicate, reference:
        src/scanner.py:87-88).
        """
        spark = extracted.sparkSession
        base = self._current_version()  # CAS base: the snapshot this merge
        # is derived from — _flip(expect=base) raises CheckpointConflict if
        # another writer advanced the pointer meanwhile (lost-update guard)
        delta = extracted.select(
            "url",
            "warc_ts",
            F.when(F.col("error_type").isNull(), F.lit(STATUS_SUCCESS))
            .otherwise(F.lit(STATUS_FAILED))
            .alias("new_status"),
            F.col("error_type").alias("new_error"),
        )
        if base is None:
            # fresh store: the delta IS the snapshot — no join (an empty
            # LocalRelation build side would plan a full SMJ shuffle)
            self.overwrite(
                delta.select(
                    "url",
                    "warc_ts",
                    F.when(
                        (F.col("new_status") == STATUS_FAILED)
                        & (F.lit(1) >= F.lit(self.max_retries)),
                        F.lit(STATUS_DEAD),
                    )
                    .otherwise(F.col("new_status"))
                    .alias("status"),
                    F.lit(1).cast("int").alias("attempts"),
                    F.col("new_error").alias("last_error"),
                    F.current_timestamp().alias("updated_at"),
                ),
                expect=base,
            )
            return
        # pin the read to the CAS base so derive-base == check-base exactly
        old = spark.read.schema(CHECKPOINT_SCHEMA).parquet(
            os.path.join(self.root, base)
        )
        merged = (
            old.join(delta, on=KEY, how="full_outer")
            .select(
                "url",
                "warc_ts",
                F.when(F.col("new_status").isNull(), F.col("status"))
                .when(F.col("new_status") == STATUS_SUCCESS, F.lit(STATUS_SUCCESS))
                .when(
                    F.coalesce(F.col("attempts"), F.lit(0)) + 1
                    >= F.lit(self.max_retries),
                    F.lit(STATUS_DEAD),
                )
                .otherwise(F.lit(STATUS_FAILED))
                .alias("status"),
                (
                    F.coalesce(F.col("attempts"), F.lit(0))
                    + F.when(F.col("new_status").isNotNull(), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                )
                .cast("int")
                .alias("attempts"),
                F.coalesce(F.col("new_error"), F.col("last_error")).alias(
                    "last_error"
                ),
                F.when(
                    F.col("new_status").isNotNull(), F.current_timestamp()
                )
                .otherwise(F.col("updated_at"))
                .alias("updated_at"),
            )
        )
        self.overwrite(merged, expect=base)

    def mark_running(self, keys: DataFrame) -> None:
        """Stamp frontier keys as inflight (status=running) at pass start.

        Visibility analog of the reference's inflight marking (reference:
        src/prefect_state.py:335-346): a second operator/monitor can see
        which keys a live run owns. Deliberately WITHOUT lease semantics —
        ``pending`` still returns running keys, so a crashed run never
        strands work; the subsequent ``merge_results`` transitions them to
        success/failed/dead. Costs one snapshot rewrite — opt-in from the
        job (track_inflight=True).
        """
        spark = keys.sparkSession
        base = self._current_version()
        delta = keys.select(*KEY).withColumn("_inflight", F.lit(1))
        if base is None:
            self.overwrite(
                delta.select(
                    "url",
                    "warc_ts",
                    F.lit(STATUS_RUNNING).alias("status"),
                    F.lit(0).cast("int").alias("attempts"),
                    F.lit(None).cast("string").alias("last_error"),
                    F.current_timestamp().alias("updated_at"),
                ),
                expect=base,
            )
            return
        old = spark.read.schema(CHECKPOINT_SCHEMA).parquet(
            os.path.join(self.root, base)
        )
        merged = old.join(delta, on=KEY, how="full_outer").select(
            "url",
            "warc_ts",
            F.when(
                F.col("_inflight").isNotNull()
                & ~F.coalesce(F.col("status"), F.lit(STATUS_PENDING)).isin(
                    STATUS_SUCCESS, STATUS_DEAD
                ),
                F.lit(STATUS_RUNNING),
            )
            .otherwise(F.coalesce(F.col("status"), F.lit(STATUS_RUNNING)))
            .alias("status"),
            F.coalesce(F.col("attempts"), F.lit(0)).cast("int").alias(
                "attempts"
            ),
            F.col("last_error"),
            F.when(F.col("_inflight").isNotNull(), F.current_timestamp())
            .otherwise(F.col("updated_at"))
            .alias("updated_at"),
        )
        self.overwrite(merged, expect=base)

    def overwrite(self, snapshot: DataFrame, expect=_UNSET) -> None:
        version = self._next_version()
        out = os.path.join(self.root, version)
        snapshot.write.mode("overwrite").parquet(out)
        self._flip(version, expect=expect)

    def dead_letters(self, spark: SparkSession) -> DataFrame:
        """Keys retired after max_retries (reference: src/scanner.py:87-88)."""
        return self.read(spark).filter(F.col("status") == STATUS_DEAD)

    def counts_by_status(self, spark: SparkSession) -> DataFrame:
        return (
            self.read(spark)
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("status")
        )


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    """True when an Iceberg catalog is on the classpath+conf."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    return impl is not None and "iceberg" in str(impl).lower()


class IcebergCheckpointStore:
    """Iceberg backend: the same narrow API over a real MERGE INTO.

    This is the cluster-scale path named by the north_rule ("Iceberg
    checkpoint table keyed by (url, warc_ts)"): snapshot-isolated commits,
    no directory-swap dance, and the MERGE rewrites only the data files
    containing matched keys (bucket the table by url so those are few).
    No Iceberg jar ships in this sandbox, so construction raises unless
    ``iceberg_available`` — the Parquet store is the drop-in twin
    (reference analog: the SQLite/in-memory store duality,
    src/prefect_state.py:19 vs :285).
    """

    def __init__(self, spark: SparkSession, table: str,
                 max_retries: int = 3) -> None:
        if not iceberg_available(spark):
            raise RuntimeError(
                "no Iceberg catalog configured; use ParquetCheckpointStore"
            )
        self.spark = spark
        self.table = table
        self.max_retries = max_retries
        spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {table} (
                    url STRING, warc_ts TIMESTAMP, status STRING,
                    attempts INT, last_error STRING, updated_at TIMESTAMP
                ) USING iceberg
                PARTITIONED BY (bucket(256, url))"""
        )

    def read(self, spark: SparkSession | None = None) -> DataFrame:
        return self.spark.read.table(self.table)

    def pending(self, pages: DataFrame) -> DataFrame:
        done = self.read().filter(
            F.col("status").isin(STATUS_SUCCESS, STATUS_DEAD)
        ).select(*KEY)
        return pages.join(done, on=KEY, how="left_anti")

    def merge_results(self, extracted: DataFrame) -> None:
        extracted.select("url", "warc_ts", "error_type").createOrReplaceTempView(
            "_ckpt_delta"
        )
        self.spark.sql(
            f"""MERGE INTO {self.table} t
                USING _ckpt_delta s
                ON t.url = s.url AND t.warc_ts = s.warc_ts
                WHEN MATCHED AND s.error_type IS NULL THEN UPDATE SET
                    t.status = '{STATUS_SUCCESS}',
                    t.updated_at = current_timestamp()
                WHEN MATCHED THEN UPDATE SET
                    t.status = CASE WHEN t.attempts + 1 >= {self.max_retries}
                                    THEN '{STATUS_DEAD}'
                                    ELSE '{STATUS_FAILED}' END,
                    t.attempts = t.attempts + 1,
                    t.last_error = s.error_type,
                    t.updated_at = current_timestamp()
                WHEN NOT MATCHED THEN INSERT (
                    url, warc_ts, status, attempts, last_error, updated_at
                ) VALUES (
                    s.url, s.warc_ts,
                    CASE WHEN s.error_type IS NULL THEN '{STATUS_SUCCESS}'
                         WHEN 1 >= {self.max_retries} THEN '{STATUS_DEAD}'
                         ELSE '{STATUS_FAILED}' END,
                    1, s.error_type, current_timestamp()
                )"""
        )

    def dead_letters(self, spark: SparkSession | None = None) -> DataFrame:
        return self.read().filter(F.col("status") == STATUS_DEAD)
