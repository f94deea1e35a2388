"""Per-query isolation bench + plan capture for the optimization rounds.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--plans OUTDIR] [--noop] q1 q2 ...

Times each named query from __spark_entry__ (queries() + local_parity())
with the SAME methodology as the frozen bench.py (.count() on the returned
DataFrame, best of N reps, sf0.001 warm pass first), optionally also with
the noop sink (guide §1.4: computes every column, defeating count()-side
column pruning), and writes `explain("formatted")` to
<plans>/<query>.txt when --plans is given.  bench.py itself stays frozen;
numbers quoted in OPTIMIZATION_r*.md come from here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--suffix", default="",
                    help="suffix for plan file names, e.g. _before")
    ap.add_argument("--noop", action="store_true",
                    help="also time with the noop sink (full materialize)")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from gemini_ocr_batch_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    qs.update({k: fn for k, (fn, _sql) in entrymod.local_parity().items()})

    warm_dir = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.001")
    warm_ok = os.path.isdir(warm_dir) and warm_dir != args.sf.rstrip("/")

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = qs[name]
        if warm_ok:
            fn(spark, warm_dir).count()
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        counts, noops = [], []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} count rep{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            counts.append(round(time.perf_counter() - t0, 3))
            if args.noop:
                spark.sparkContext.setJobDescription(f"{name} noop rep{rep}")
                t0 = time.perf_counter()
                (fn(spark, args.sf).write.format("noop")
                 .mode("overwrite").save())
                noops.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"count": counts, "count_min": min(counts)}
        if noops:
            out[name].update({"noop": noops, "noop_min": min(noops)})
        print(f"# {name}: count={counts} noop={noops}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf, "cpus": cpus, "results": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
