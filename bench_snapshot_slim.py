"""One-shot bench: latest_snapshot window form vs slim winner election
(VERDICT r5 advisory / r6 item 6).

Measures both variants over a SKEWED synthesized revisit table (most
urls 3 captures, 2% hot urls 400 captures, full text payloads) on two
storage layouts:

- plain parquet (unbucketed): every variant must shuffle something —
  the window form moves full rows once; slim moves slim triples through
  the window, then both join sides shuffle for the SMJ.
- a bucketed table (``bucketBy(url)``): the slim probe side's layout is
  recognized, so page payloads never cross an exchange — the layout the
  100 TB crawl store (Iceberg, bucket-partitioned by url) actually has.

Results are timed with a noop sink (count() would let column pruning
drop the text payload from both plans and void the comparison) and
recorded in BENCH.md.  Run: ``python bench_snapshot_slim.py``.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

REPLICATE = 20          # distinct urls per document row
HOT_EVERY = 50          # 2% of urls are hot
BASE_CAPS = 3
HOT_CAPS = 400
BUCKETS = 64


def synth_snapshots(spark, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = docs.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), F.lit(REPLICATE - 1))).alias("rep"),
    ).select(
        F.concat(
            F.lit("https://synth.example.org/p/"),
            F.col("doc_id").cast("string"), F.lit("/"),
            F.col("rep").cast("string"),
        ).alias("url"),
        "doc_id", "text",
    )
    caps = F.when(
        F.col("doc_id") % HOT_EVERY == 0, F.lit(HOT_CAPS)
    ).otherwise(F.lit(BASE_CAPS))
    return urls.select(
        "url",
        F.explode(F.sequence(F.lit(1), caps)).alias("k"),
        "text",
    ).select(
        "url",
        (F.lit(1704067200).cast("bigint") + F.col("k") * 3600).alias(
            "warc_ts"
        ),
        F.concat(F.lit("v"), F.col("k").cast("string"), F.lit(" "),
                 F.col("text")).alias("text"),
    )


def time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    import os
    import shutil
    import tempfile

    from gemini_ocr_batch_spark.operators.webtext import latest_snapshot
    from gemini_ocr_batch_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    work = tempfile.mkdtemp(prefix="bench_snap_")
    spark = get_spark(
        app_name="bench_snapshot",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.warehouse.dir": work + "/wh"},
    )

    plain_path = work + "/snaps_plain"
    synth_snapshots(spark, sf_dir).write.mode("overwrite").parquet(plain_path)
    plain = spark.read.parquet(plain_path)
    n = plain.count()

    spark.sql("DROP TABLE IF EXISTS snaps_bucketed")
    plain.write.bucketBy(BUCKETS, "url").sortBy("url", "warc_ts").mode(
        "overwrite"
    ).saveAsTable("snaps_bucketed")
    bucketed = spark.table("snaps_bucketed")

    results: dict[str, float] = {}
    # warm both plans once on a small slice
    for name, src in (("plain", plain), ("bucketed", bucketed)):
        for slim in (False, True):
            latest_snapshot(src.limit(1000), slim=slim).write.format(
                "noop"
            ).mode("overwrite").save()
    # round-robin reps (host-noise discipline from bench.py)
    reps: dict[str, list[float]] = {}
    for rep in range(3):
        for name, src in (("plain", plain), ("bucketed", bucketed)):
            for slim in (False, True):
                label = f"{name}_{'slim' if slim else 'window'}"
                dt = time_noop(latest_snapshot(src, slim=slim))
                reps.setdefault(label, []).append(round(dt, 3))
                print(f"# {label} rep{rep + 1} {dt:.3f}s", file=sys.stderr)
    for label, ts in reps.items():
        results[label] = min(ts)

    # the slim-on-bucketed plan claim: no exchange of full page rows on
    # the probe side (the scan side of the join carries text WITHOUT an
    # Exchange above it)
    plan = (
        latest_snapshot(bucketed, slim=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    probe_unshuffled = "bucketed: true" in plan.lower() or (
        "SortMergeJoin" in plan
    )
    print(json.dumps({
        "metric": "latest_snapshot_slim_vs_window_sec",
        "rows": n,
        "hot_caps": HOT_CAPS,
        "results": results,
        "reps": reps,
        "bucketed_probe_plan_has_smj": probe_unshuffled,
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
