"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k. The dot product / norms are
  built-in higher-order functions (F.aggregate / F.zip_with) — JVM-side,
  whole-stage-codegen'd, no Python. At scale this is one pass + a top-k
  (TakeOrderedAndProject), embarrassingly parallel.

- ``lsh_topk``: random-hyperplane (sign) LSH. Hyperplanes are a tiny
  deterministic seeded matrix broadcast as a literal column; bucket =
  bit-packed signs. Probing searches only the query's bucket (optionally
  multi-probe by Hamming-1 neighbors) — the scale path when one pass over
  10^12 vectors is too much.

- ``embedding_near_dup_pairs``: all-pairs cosine ≥ τ within LSH buckets —
  the embedding-cosine near-dup dedup path.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.operators.util import spread_small_input


def _dot(a, b):  # Column helpers
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a, b):
    return (_dot(a, b) / (_norm(a) * _norm(b))).alias("cosine")


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector.

    Returns (id, rank, cosine) — deterministic tie-break by id.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = spread_small_input(embeddings).select(
        F.col(id_col),
        cosine_col(F.col(vec_col).cast("array<double>"), q),
    )
    # TakeOrderedAndProject (per-partition top-k, merged) — a global
    # un-partitioned row_number window would sort ALL rows in one task
    top = scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.col(id_col))  # over k rows only
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(id_col, "rank", "cosine")
        .orderBy("rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Deterministic seeded Gaussian hyperplanes (public LSH construction:
    Charikar, STOC 2002 — sign-random-projection)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Bit-packed sign bucket for a vector column (bigint)."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(vec_col, p) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit.cast("bigint"), i)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 13,
    multi_probe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's sign bucket.

    ``multi_probe`` ≥ 1 also probes every bucket within that Hamming
    distance of the query's bucket (multi-probe LSH, Lv et al., VLDB
    2007): a sign bit near the decision boundary flips easily, so the
    true neighbors concentrate in the Hamming-1 shell.  This costs
    ``1 + n_planes`` cells instead of 1 but rescues recall when the
    exact bucket is sparse — with 6 planes over 64 cells a small corpus
    can leave the exact bucket literally empty.

    At scale, write the table partitioned by bucket → the probe set is a
    literal IN list, so partition pruning makes this a metadata-bounded
    scan of the probed cells instead of a full pass.
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    vec_d = F.col(vec_col).cast("array<double>")
    with_bucket = spread_small_input(embeddings).select(
        F.col(id_col), vec_d.alias("v"), lsh_bucket_col(vec_d, planes).alias("bucket")
    )
    # driver-side: the query's bucket (pure python, same construction)
    qb = 0
    for i, plane in enumerate(planes):
        d = sum(a * b for a, b in zip(query_vec, plane))
        qb |= (1 if d >= 0 else 0) << i
    probes = {qb}
    frontier = {qb}
    for _ in range(max(0, multi_probe)):
        frontier = {b ^ (1 << i) for b in frontier for i in range(n_planes)}
        probes |= frontier
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = (
        with_bucket.filter(F.col("bucket").isin(sorted(probes)))
        .select(F.col(id_col), cosine_col(F.col("v"), q))
    )
    # TakeOrderedAndProject (per-partition top-k, merged) — a global
    # un-partitioned row_number window would sort ALL rows in one task
    top = scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.col(id_col))  # over k rows only
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(id_col, "rank", "cosine")
        .orderBy("rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, candidate-bounded by
    shared LSH bucket (vectors at cosine ~1 collide in all sign bits with
    high probability)."""
    first = embeddings.select(vec_col).first()
    dim = len(first[0]) if first else 0
    planes = hyperplanes(dim, n_planes, seed)
    vec_d = F.col(vec_col).cast("array<double>")
    with_bucket = spread_small_input(embeddings).select(
        F.col(id_col).alias("id"),
        vec_d.alias("v"),
        lsh_bucket_col(vec_d, planes).alias("bucket"),
    )
    a, b = with_bucket.alias("a"), with_bucket.alias("b")
    return (
        a.join(b, on="bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_col(F.col("a.v"), F.col("b.v")),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the kmeans-partitioned scale path
# ---------------------------------------------------------------------------
# Complements lsh_topk: where sign-LSH partitions by random hyperplanes,
# IVF learns the partitioning from the data (KMeans centroids), which
# gives much better recall-per-probe on clustered real-world embeddings.
# Build: one sampled KMeans fit + one assignment pass; store the index
# partitioned by centroid_id so a query's candidate scan is
# partition-pruned to n_probe/k_centroids of the corpus. Query: centroid
# distances are computed DRIVER-side (k_centroids × dim floats — tiny),
# then exact cosine within the probed cells only.


def _metadata_row_count(df: DataFrame):
    """Row count from parquet footer metadata — driver-side, zero data
    scanned. Returns None when the source is not local parquet files
    (in-memory, stream, object store without a local mirror)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or not all(f.startswith("file:") for f in files):
        return None
    try:
        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(f[len("file:"):]).metadata.num_rows
            for f in files
        )
    except Exception:
        return None


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest FIXED centroid (squared L2,
    lowest index wins ties) — pure JVM column expressions, no ML fit.

    The oracle-friendly twin of ``ivf_build``'s KMeans assignment: with
    literal centroids, the per-centroid distance is a left-associated
    fold any SQL engine can replay bit-for-bit, so the assignment (and
    hence the whole IVF index) is exactly reproducible outside Spark.
    Returns (id, v, centroid_id) — ``ivf_topk``'s index schema.
    """
    v = F.col(vec_col).cast("array<double>")
    dists = F.array(*[
        F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(c)) for c in cent]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        for cent in centroids
    ])
    return spread_small_input(embeddings).select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("centroid_id"),
    )


def ivf_build(
    embeddings: DataFrame,
    k_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    sample_frac: float | None = None,
):
    """Fit centroids and assign every vector to its nearest cell.

    Returns (index_df, centroids): index_df = (id, centroid_id, vec) —
    persist it with ``.write.partitionBy("centroid_id")`` so probes prune
    at the metadata level; centroids = list[list[float]] (driver-side,
    k×dim — small by construction).

    Scale notes: the KMeans fit runs on a SAMPLE (``sample_frac``,
    default min(1.0, 100_000·k/|corpus|) rows) — fitting on 10^12 rows is
    neither needed nor sane; assignment is one deterministic pass of JVM
    vector ops over the full corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    src = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    fit_src = src
    if sample_frac is None:
        # sizing only: prefer the parquet footer row count (driver-side
        # metadata, no scan) — a count() full pass just to pick a sample
        # fraction would be an extra pass over 10^12 rows
        n = _metadata_row_count(embeddings)
        if n is None:  # non-file source; small/test data, pay the pass
            n = src.count()
        target = 100_000 * k_centroids
        sample_frac = min(1.0, target / max(n, 1))
    if sample_frac < 1.0:
        fit_src = src.sample(fraction=sample_frac, seed=seed)
    km = KMeans(k=k_centroids, seed=seed, featuresCol="features")
    model = km.fit(fit_src.select(array_to_vector("v").alias("features")))
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    assigned = model.transform(
        src.select("id", "v", array_to_vector("v").alias("features"))
    ).select(
        "id", "v", F.col(km.getPredictionCol()).alias("centroid_id")
    )
    return assigned, centroids


def ivf_probe_order(
    centroids: list[list[float]], query_vec: list[float]
) -> list[int]:
    """Centroid indices by descending cosine to the query (driver-side,
    k×dim floats). Shared by ``ivf_topk`` and the entry-file oracle
    generator so both pick the identical probe set."""
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def cos(c):
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(query_vec, c)) / (qn * cn)

    return sorted(range(len(centroids)), key=lambda i: -cos(centroids[i]))


def ivf_write_index(
    index_df: DataFrame,
    centroids: list[list[float]],
    path: str,
) -> dict:
    """Persist an IVF index: cells as parquet PARTITIONED BY centroid_id
    (each cell its own directory, so a probe is a partition-pruned read
    that never opens unprobed cells' files) + the k×dim centroid matrix
    as a driver-side JSON sidecar (kilobytes; every searcher needs it in
    memory to rank probes anyway).

    This is the job form the in-memory ``ivf_build`` docstring promises:
    build once, then any number of searches pay only
    ``n_probe/k_centroids`` of the corpus per query.
    """
    import json
    import os

    cells = os.path.join(path, "cells")
    index_df.write.mode("overwrite").partitionBy("centroid_id").parquet(
        cells
    )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "centroids.json"), "w") as fh:
        json.dump({"centroids": centroids}, fh)
    return {
        "cells_path": cells,
        "k_centroids": len(centroids),
        "dim": len(centroids[0]) if centroids else 0,
    }


def ivf_read_index(spark, path: str):
    """(index_df, centroids) back from :func:`ivf_write_index`'s layout.
    The returned frame is the lazily-pruned scan — filter it by
    ``centroid_id`` literals BEFORE any action so only probed cell
    directories are ever read."""
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as fh:
        centroids = json.load(fh)["centroids"]
    index_df = spark.read.parquet(os.path.join(path, "cells"))
    return index_df, centroids


def ivf_search_persisted(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k over a PERSISTED IVF index: rank centroids driver-side,
    then :func:`ivf_topk` over the pruned scan — the literal
    ``centroid_id IN (...)`` predicate lands in the parquet scan's
    PartitionFilters (pinned by test), so unprobed cells cost nothing,
    not even a footer read."""
    index_df, centroids = ivf_read_index(spark, path)
    return ivf_topk(index_df, centroids, query_vec, k=k, n_probe=n_probe)


def run_index_job(
    spark,
    embeddings_path: str,
    out_dir: str,
    k_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> dict:
    """The ANN-service build job: embeddings parquet → persisted IVF
    index (sampled KMeans fit + one assignment pass + partitioned
    write), returning audit counts per cell."""
    embeddings = spark.read.parquet(embeddings_path)
    index_df, centroids = ivf_build(
        embeddings, k_centroids=k_centroids, id_col=id_col,
        vec_col=vec_col, seed=seed,
    )
    meta = ivf_write_index(index_df, centroids, out_dir)
    cells = spark.read.parquet(meta["cells_path"])
    sizes = {
        int(r["centroid_id"]): int(r["n"])
        for r in cells.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    meta["n_vectors"] = sum(sizes.values())
    meta["cell_sizes"] = [sizes.get(i, 0) for i in range(len(centroids))]
    return meta


def ivf_topk(
    index_df: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k by cosine: exact search within the ``n_probe``
    cells whose centroids are nearest the query.

    Returns (id, rank, cosine) with brute_force_topk's exact schema, so
    recall is directly measurable against it (tests pin recall@k).
    """
    probed = ivf_probe_order(centroids, query_vec)[: max(1, n_probe)]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = (
        index_df.filter(F.col("centroid_id").isin([int(p) for p in probed]))
        .select(F.col("id"), cosine_col(F.col("v"), q))
    )
    w = Window.orderBy(F.desc("cosine"), F.col("id"))
    return (
        scored.orderBy(F.desc("cosine"), "id")
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("id", "rank", "cosine")
    )
