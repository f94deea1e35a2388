"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator family from SURVEY.md §2 (plus
the training-data-pipeline operators) onto the driver's test tables;
``oracle_sql()`` carries the DuckDB twin for everything SQL-expressible.
Column names are aliased identically on both sides; float results are
either per-row math rounded to fixed decimals or exact decimal-accumulated
sums, so value hashes are engine-stable.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_WARC_TS = dt.datetime(2024, 1, 1)

# Synthetic page template for the flagship extraction query: the kernel
# must strip the nav/header/footer boilerplate and keep exactly the one
# main paragraph, so extracted_text == documents.text (SQL-checkable).
_HTML_PREFIX = (
    "<html><head><title>t</title><script>var x=1;</script></head><body>"
    "<header><div>Site Chrome Banner Thing</div></header>"
    '<nav><ul><li><a href="/a">alpha nav link</a></li>'
    '<li><a href="/b">beta nav link</a></li></ul></nav><article><p>'
)
_HTML_SUFFIX = (
    "</p></article><footer><p>Copyright 2024 Example Corp all rights "
    "reserved forever.</p></footer></body></html>"
)


def _synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-kind synthetic crawl over the documents table: every 4th
    document is a minimal PDF (two positioned text objects → two baselines
    for the line-clustering step), the rest the boilerplate-wrapped HTML
    page.  This routes the flagship extraction through BOTH kernels via
    kernels/dispatch.py content sniffing (the reference's per-record mime
    dispatch, src/file_api.py:23-25), and both outputs are predictable in
    SQL: HTML extracts to exactly ``text``; the PDF extracts to
    ``text || '\\n' || 'synthetic pdf page ' || doc_id`` (one column block
    → one span).  Text-in-parens is escaped PDF-style Spark-side; the
    kernel unescapes, so the oracle needs no escaping."""
    docs = _t(spark, sf_dir, "documents")
    is_pdf = F.col("doc_id") % 4 == 0
    url = F.concat(
        F.lit("https://synth.example.org/doc/"),
        F.col("doc_id").cast("string"),
        F.when(is_pdf, F.lit(".pdf")).otherwise(F.lit(".html")),
    )
    pdf_text = F.regexp_replace(F.col("text"), r"([\\()])", r"\\$1")
    pdf_content = F.concat(
        F.lit("BT /F1 12 Tf 1 0 0 1 72.0 720.0 Tm ("),
        pdf_text,
        F.lit(") Tj 1 0 0 1 72.0 706.0 Tm (synthetic pdf page "),
        F.col("doc_id").cast("string"),
        F.lit(") Tj ET"),
    )
    pdf_blob = F.concat(
        F.lit("%PDF-1.4\n1 0 obj << /Length "),
        F.length(pdf_content).cast("string"),
        F.lit(" >>\nstream\n"),
        pdf_content,
        F.lit("\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"),
    )
    html_blob = F.concat(
        F.lit(_HTML_PREFIX), F.col("text"), F.lit(_HTML_SUFFIX)
    )
    return docs.select(
        url.alias("url"),
        F.lit(_WARC_TS).cast("timestamp").alias("warc_ts"),
        F.encode(
            F.when(is_pdf, pdf_blob).otherwise(html_blob), "utf-8"
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


# ---------------------------------------------------------------------------
# entry: flagship — full extraction pipeline over synthesized pages
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: boilerplate-strip extraction over pages synthesized from
    the sf0.001 documents table (SURVEY.md §2.11 kernel + §2.1 scan)."""
    return _q_extract_main_text(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# individual queries (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------


def _q_extract_main_text(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.extract import extract_pages

    pages = _synth_pages(spark, sf_dir)
    out = extract_pages(pages, n_partitions=8)
    return out.select(
        "url",
        "extracted_text",
        F.size("spans").alias("n_spans"),
        "content_kind",
    ).orderBy("url")


def _q_prev_context_pipeline(spark, sf_dir):
    # W3 wired into the job output: extraction → lag() context carry over
    # (domain, warc_ts, url) — reference: src/batch_builder.py:90-109
    from gemini_ocr_batch_spark.job import with_prev_context
    from gemini_ocr_batch_spark.operators.extract import extract_pages

    pages = _synth_pages(spark, sf_dir)
    out = with_prev_context(extract_pages(pages, n_partitions=8), 500)
    return out.select("url", "domain", "prev_context").orderBy("url")


def _q_pending_anti_join(spark, sf_dir):
    # J1/S3: resume frontier = work items minus completed (left_anti).
    docs = _t(spark, sf_dir, "documents")
    done = docs.filter(F.col("doc_id") % 10 < 3).select("doc_id")
    return (
        docs.join(done, "doc_id", "left_anti")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _q_membership_filter(spark, sf_dir):
    # P1: state-membership filter analog.
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


def _q_range_filter(spark, sf_dir):
    # P2: inclusive time-range analog over event time.  The driver tables
    # span January 2024 only — the window sits mid-month so the filter
    # keeps a strict non-empty subset (the r1-r4 Feb-Mar window matched
    # zero rows at every sf: a 0-vs-0 hash "pass" that verified nothing).
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("ts").between("2024-01-10 00:00:00", "2024-01-20 23:59:59")
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


def _q_shape_predicate(spark, sf_dir):
    # P3: suffix/shape predicate via rlike + cast-null rejection.
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source").rlike("^src[0-4]$"))
        .filter(F.col("n_chars").cast("long").isNotNull())
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("source")
    )


def _q_key_format_parse(spark, sf_dir):
    # F1/F2/P5: composite key round-trip (concat_ws → split → cast).
    cust = _t(spark, sf_dir, "customer")
    keyed = cust.select(
        F.concat_ws(
            ":", F.col("c_custkey"), F.col("c_nationkey"), F.col("c_mktsegment")
        ).alias("key")
    )
    return keyed.select(
        "key",
        F.split(F.col("key"), ":").getItem(1).cast("int").alias("nation_parsed"),
    ).orderBy("key")


def _q_dependency_lag(spark, sf_dir):
    # J4/W1/W2: per-group ordered lag-1 dependency gate.
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lag("event_id").over(w).alias("prev_event_id"),
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                    > 3600 * 1_000_000
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("starts_chain"),
        )
        .orderBy("user_id", "event_id")
    )


def _q_lag_context(spark, sf_dir):
    # W3/L3: previous record's tail-of-text carried forward.
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            F.expr("right(lag(props) over "
                   "(partition by user_id order by ts, event_id), 20)")
            .alias("prev_ctx"),
        )
        .orderBy("event_id")
    )


def _q_group_collect(spark, sf_dir):
    # A1: per-book page-set aggregation analog.
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_set("event_type"))
            ).alias("types_seen"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


def _q_counts_by_group(spark, sf_dir):
    # A6: GROUP BY error_type ORDER BY count DESC analog.
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "event_type")
    )


def _q_derived_group_count(spark, sf_dir):
    # A7: group by a derived column (month bucket).
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("month", F.col("ts")).alias("month"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("month")
    )


def _q_upsert_counts(spark, sf_dir):
    # A8/M4: increment-merge = union old+delta then re-aggregate.
    ev = _t(spark, sf_dir, "events")
    old = ev.filter(F.col("event_id") % 2 == 0).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    delta = ev.filter(F.col("event_id") % 2 == 1).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        old.unionByName(delta)
        .groupBy("user_id")
        .agg(F.sum("cnt").alias("attempts"))
        .orderBy("user_id")
    )


def _q_topk_per_group(spark, sf_dir):
    # A9: top-3 per group via row_number window.
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey")
        .orderBy("o_orderpriority", "rn")
    )


def _q_ordered_limit(spark, sf_dir):
    # L1: deterministic ordered prefix (batch-fill analog).
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderdate", "o_orderkey")
        .select("o_orderkey", "o_orderdate")
        .limit(20)
    )


def _q_recency_limit(spark, sf_dir):
    # L2: recency sort + limit.
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), "event_id").select("event_id", "ts").limit(50)
    )


def _q_string_tail(spark, sf_dir):
    # L3/L4/F4: tail-of-string + tail-of-array slices.
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.expr("right(text, 30)").alias("tail_chars"),
        F.array_join(F.slice(toks, -3, 3), " ").alias("last_words"),
    ).orderBy("doc_id")


def _q_set_except(spark, sf_dir):
    # SO1: key-set difference.  The subtracted side is restricted by a
    # user_id modulus: the synthetic corpus gives every user every event
    # type, so the unrestricted click-minus-purchase difference was empty
    # at every sf (r1-r4: a vacuous 0-vs-0 row).
    ev = _t(spark, sf_dir, "events")
    first = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    second = (
        ev.filter(
            (F.col("event_type") == "purchase") & (F.col("user_id") % 3 == 0)
        )
        .select("user_id")
        .distinct()
    )
    return first.exceptAll(second).orderBy("user_id")


def _q_semi_join(spark, sf_dir):
    # SO3/J2-inverse: membership semi-join.
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(
            orders.select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_semi",
        )
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def _q_case_mapping(spark, sf_dir):
    # F13: exception→ErrorType CASE-chain analog.
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.when(F.col("event_type") == "error", "HARD_FAIL")
            .when(F.col("value") < 0, "NEGATIVE")
            .when(F.col("event_type").isin("click", "view"), "ENGAGEMENT")
            .otherwise("OTHER")
            .alias("category"),
        )
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("category")
    )


def _q_distinct_stats(spark, sf_dir):
    # A3/A4/A5: count, count-distinct, max.
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("user_id").alias("distinct_users"),
        F.floor(F.max("value") * 10000 + F.lit(0.5)).cast("bigint").alias("max_value"),
    )


def _q_pricing_summary(spark, sf_dir):
    # TPC-H Q1-shaped headline aggregate; decimal accumulation for
    # engine-stable sums.
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("decimal(28,4)").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("decimal(28,4)").alias("sum_base"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
                .cast("decimal(28,8)")
            ).cast("decimal(28,8)").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("sum_qty").cast("double").alias("sum_qty"),
            F.col("sum_base").cast("double").alias("sum_base"),
            F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_star_join(spark, sf_dir):
    # J3/J5: star-schema join with broadcast dims.
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("r_name")
    )


# -- training-data pipeline ops --------------------------------------------


def _q_dedup_exact(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


def _q_dedup_ngram_jaccard(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2
    )
    return out.select(
        "doc_a",
        "doc_b",
        F.floor(F.col("jaccard") * 10000 + F.lit(0.5)).cast("bigint").alias(
            "jaccard"
        ),
    ).orderBy("doc_a", "doc_b")


def _q_dedup_minhash_lsh(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), n=3, n_hashes=16, bands=4
    )


def _q_dedup_simhash(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"), bits=16)


def _q_simhash_near_pairs(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(
        _t(spark, sf_dir, "documents"), bits=16, max_hamming=3
    )


def _q_token_count(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.textstats import token_count

    return token_count(_t(spark, sf_dir, "documents"))


def _q_quality_score(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.textstats import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def _q_language_id(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.textstats import language_id

    return language_id(_t(spark, sf_dir, "documents"))


def _q_fingerprint(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.textstats import content_fingerprint

    return content_fingerprint(_t(spark, sf_dir, "documents"))


def _q_winnow_fingerprints(spark, sf_dir):
    # The fingerprint sequence is serialized to a CSV string (the
    # group_collect pattern): the driver's canonicalizer lexsorts every
    # output column through pandas, and a raw array<long> column is
    # unhashable there (the r4 `err` row).  Registered queries must emit
    # scalar columns only — tests/test_entry_parity.py now pins this.
    from gemini_ocr_batch_spark.operators.textstats import winnow_fingerprints

    out = winnow_fingerprints(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.size("fingerprints").alias("n_fp"),
        F.concat_ws(
            ",", F.transform(F.col("fingerprints"), lambda x: x.cast("string"))
        ).alias("fp_csv"),
    ).orderBy("doc_id")


# Fixed literal ANN query vector + IVF centroids: seeded Gaussians known
# to BOTH engines as inlined literals. No data-dependent `.first()` probe
# at query-construction time (the r3 bench paid a ~0.3 s extra job +
# 64-literal re-analysis per timed rep for it), parity holds at ANY sf,
# and the DuckDB oracles can replay assignment + top-k exactly.
def _seeded_gaussians(n: int, dim: int, seed: int) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n)]


def _unit(vec: list[float]) -> list[float]:
    import math

    n = math.sqrt(sum(x * x for x in vec)) or 1.0
    return [x / n for x in vec]


_ANN_DIM = 64
_ANN_QUERY_VEC = _seeded_gaussians(1, _ANN_DIM, 101)[0]
_IVF_K = 8
# UNIT-NORMALIZED: the driver embeddings live on the unit sphere, and the
# r4 raw Gaussian centroids (norm ≈ 8) collapsed the squared-L2 argmin to
# a single cell — every vector in cell 4, probes [7, 6] empty, so the
# ann_ivf "pass" compared 0 rows against 0 rows.  Unit directions spread
# the assignment across all 8 cells (sf0.01: 49-71 vectors per cell, 120
# in the two probed cells) so the probed top-k path is genuinely verified.
# The doubles are computed once here and inlined as repr literals on both
# engines, so assignment parity stays bit-for-bit.
_IVF_CENTROIDS = [_unit(v) for v in _seeded_gaussians(_IVF_K, _ANN_DIM, 103)]
_IVF_N_PROBE = 2


def _q_ann_bruteforce(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _ANN_QUERY_VEC, k=10).select("vec_id", "rank")


def _q_ann_lsh(spark, sf_dir):
    # multi_probe=1 (the Hamming-1 shell): with 6 planes over 64 cells
    # the query's EXACT bucket is empty at sf0.001, which made this row
    # vacuous at the local gate's scale — and exact-bucket-only recall is
    # fragile at any scale when buckets are sparse.
    from gemini_ocr_batch_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb, _ANN_QUERY_VEC, k=10, n_planes=6, multi_probe=1
    ).select("vec_id", "rank")


def _q_ann_ivf(spark, sf_dir):
    # IVF with FIXED literal centroids (no KMeans fit) so the assignment
    # and probed-cell top-k are exactly oracle-replayable; the fitted
    # (KMeans) path stays engine-tested in tests/test_similarity_textstats.
    from gemini_ocr_batch_spark.operators.similarity import ivf_assign, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    index = ivf_assign(emb, _IVF_CENTROIDS)
    out = ivf_topk(
        index, _IVF_CENTROIDS, _ANN_QUERY_VEC, k=10, n_probe=_IVF_N_PROBE
    )
    return out.select(F.col("id").alias("vec_id"), "rank")


def _q_ivf_cell_counts(spark, sf_dir):
    # Full-corpus IVF assignment check: every vector's argmin-centroid
    # must match the oracle's bit-for-bit (left-assoc distance folds), not
    # just the probed/top-k subset that ann_ivf exercises.
    from gemini_ocr_batch_spark.operators.similarity import ivf_assign

    emb = _t(spark, sf_dir, "embeddings")
    return (
        ivf_assign(emb, _IVF_CENTROIDS)
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n_vecs"), F.min("id").alias("min_id"))
        .orderBy("centroid_id")
    )


def _q_near_dedup_components(spark, sf_dir):
    # pairs → connected components → keep-list, end to end (the r3
    # flagship operators, driver-verified against a recursive-CTE
    # union-find oracle over the same LSH candidate pairs).
    from gemini_ocr_batch_spark.operators.dedup import near_dedup_keep_list

    docs = _t(spark, sf_dir, "documents")
    return near_dedup_keep_list(docs)


def _q_redact_pii(spark, sf_dir):
    # r4 webtext corpus-prep: the corpus has no PII, so a deterministic
    # contact line (derived from doc_id, replayable in SQL) is appended to
    # guarantee every row exercises both patterns non-trivially.
    from gemini_ocr_batch_spark.operators.webtext import redact_pii

    docs = _t(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    return redact_pii(seeded)


def _q_repetition_score(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.webtext import repetition_score

    return repetition_score(_t(spark, sf_dir, "documents"))


def _q_canonicalize_urls(spark, sf_dir):
    # mixed-case host, unsorted params, tracking params, fragment — every
    # canonicalization rule exercised on every row
    from gemini_ocr_batch_spark.operators.webtext import canonicalize_urls

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(
            F.lit("https://SYNTH.Example.org/Doc/"),
            F.col("doc_id").cast("string"),
            F.lit(".html?utm_source=x&b=2&a=1&fbclid=abc#frag"),
        ).alias("url")
    )
    return canonicalize_urls(pages)


def _q_windowed_counts(spark, sf_dir):
    # batch twin of the streaming watermark+window aggregation (§2.10):
    # tumbling 1h event-time windows; withWatermark is a no-op in batch
    from gemini_ocr_batch_spark.streaming.pipeline import (
        windowed_event_counts,
    )

    ev = _t(spark, sf_dir, "events")
    out = windowed_event_counts(ev, window="1 hour")
    return out.select(
        F.unix_micros(F.col("window_start")).alias("ws_us"),
        F.unix_micros(F.col("window_end")).alias("we_us"),
        "event_type",
        "n",
    ).orderBy("ws_us", "event_type")


def _q_hash_sample(spark, sf_dir):
    # deterministic content-keyed sampling (reproducible across engines,
    # reshards, and reruns — the training-data alternative to TABLESAMPLE)
    from gemini_ocr_batch_spark.operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.1).select(
        "doc_id", "lang"
    ).orderBy("doc_id")


def _q_split_assign(spark, sf_dir):
    # content-stable train/val/test assignment by hash range (no leakage
    # across reruns or corpus growth)
    from gemini_ocr_batch_spark.operators.sampling import assign_splits

    docs = _t(spark, sf_dir, "documents")
    out = assign_splits(docs, "doc_id")
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split")
    )


def _q_source_stats(spark, sf_dir):
    # per-source curation rollup (the per-domain stats every corpus
    # curation pass needs): volume + mean length per source
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.floor(
                F.avg("n_chars") * 100 + F.lit(0.5)
            ).cast("bigint").alias("mean_chars_x100"),
            F.count_distinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


def _q_embedding_near_dup(spark, sf_dir):
    # embedding-cosine near-dup pairs, LSH-bucket-bounded (never all-pairs)
    from gemini_ocr_batch_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    out = embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.2, n_planes=4
    )
    return out.select(
        "id_a",
        "id_b",
        F.floor(F.col("cosine") * 10000 + F.lit(0.5)).cast("bigint").alias(
            "cosine_r"
        ),
    ).orderBy("id_a", "id_b")


def _q_embedding_norm(spark, sf_dir):
    # per-row fold over the array — deterministic order both engines.
    emb = _t(spark, sf_dir, "embeddings")
    sumsq = F.aggregate(
        F.col("embedding").cast("array<double>"),
        F.lit(0.0),
        lambda acc, v: acc + v * v,
    )
    return emb.select(
        "vec_id",
        F.floor(F.sqrt(sumsq) * 10000 + F.lit(0.5)).cast("bigint").alias(
            "l2_norm"
        ),
    ).orderBy("vec_id")


def _q_asset_metadata(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.multimodal import asset_metadata

    docs = _t(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "utf-8").alias("asset"),
    )
    return asset_metadata(assets).select(
        "asset_id", "byte_size", "content_md5", "guessed_kind",
        "fake_width", "fake_height",
    ).orderBy("asset_id")


def _q_extraction_resume(spark, sf_dir):
    # J1 applied to our own engine tables: run extraction on synthesized
    # pages with a partial checkpoint → frontier is exactly the un-done set.
    from gemini_ocr_batch_spark.checkpoint import ParquetCheckpointStore
    import tempfile

    from gemini_ocr_batch_spark.operators.sampling import hash_sample

    pages = _synth_pages(spark, sf_dir)
    store = ParquetCheckpointStore(tempfile.mkdtemp(prefix="ckpt_entry_"))
    # "already done" set derived from the md5-bucket hash (NOT F.hash) so
    # the DuckDB oracle can recompute the expected pending frontier — this
    # makes the flagship resume anti-join driver-verified rather than
    # rows-only (VERDICT r2 §missing #4).
    done = hash_sample(pages, "url", 0.2, salt="resume_done")
    store.overwrite(
        done.select(
            "url",
            "warc_ts",
            F.lit("success").alias("status"),
            F.lit(1).cast("int").alias("attempts"),
            F.lit(None).cast("string").alias("last_error"),
            F.current_timestamp().alias("updated_at"),
        )
    )
    return (
        store.pending(pages).select("url", "lang").orderBy("url")
    )



def _q_json_path_extract(spark, sf_dir):
    # F9: nested JSON path extraction (reference: src/results.py:42-54).
    from gemini_ocr_batch_spark.functions.jsonops import json_path

    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        json_path("props", "$.k").cast("int").alias("k"),
    ).orderBy("event_id")


def _q_json_fence_rescue(spark, sf_dir):
    # F6+F7: code-fence strip + brace-window rescue (reference:
    # src/results.py:58-78) over synthesized fenced payloads.
    from gemini_ocr_batch_spark.functions.jsonops import (
        brace_rescue,
        json_path,
        strip_code_fence,
    )

    ev = _t(spark, sf_dir, "events")
    fenced = ev.select(
        "event_id",
        F.concat(
            F.lit("```json\n noise "), F.col("props"), F.lit(" noise\n```")
        ).alias("raw"),
    )
    rescued = fenced.select(
        "event_id", brace_rescue(strip_code_fence(F.col("raw"))).alias("j")
    )
    return rescued.select(
        "event_id", json_path(F.col("j"), "$.k").cast("int").alias("k")
    ).orderBy("event_id")


def _q_json_validate(spark, sf_dir):
    # F8: from_json schema validation; null ≙ ValidationError (reference:
    # src/results.py:156).
    from gemini_ocr_batch_spark.functions.jsonops import parse_validated

    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", parse_validated("props", "k int").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.col("p").isNotNull().cast("int").alias("valid"),
    ).orderBy("event_id")


def _q_sessionize(spark, sf_dir):
    # sessionization: lag + cumulative-sum session ids (batch twin of the
    # applyInPandasWithState streaming operator).
    from gemini_ocr_batch_spark.streaming.pipeline import sessionize_batch

    ev = _t(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_sec=3600).select(
        "user_id", "session_id", "session_start", "session_end", "n_events"
    )



def _q_slug(spark, sf_dir):
    # F3: slugify (lower, non-alnum→'-', collapse, trim) — reference:
    # src/flow.py:43-47.
    p = _t(spark, sf_dir, "part")
    slug = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("p_name")), "[^a-z0-9]+", "-"),
        "^-+|-+$",
        "",
    )
    return p.select("p_partkey", slug.alias("slug")).orderBy("p_partkey")


def _q_iso_format(spark, sf_dir):
    # F14: ISO timestamp formatting — reference:
    # scripts/analyze_failures.py:183.
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts_iso"),
    ).orderBy("event_id")



def _q_pivot(spark, sf_dir):
    # pivot: returnflag × linestatus quantity matrix (Catalyst built-in).
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
        .select(
            "l_returnflag",
            F.col("O").cast("double").alias("qty_o"),
            F.col("F").cast("double").alias("qty_f"),
        )
        .orderBy("l_returnflag")
    )


def _q_rollup(spark, sf_dir):
    # rollup: subtotals + grand total over (priority, status).
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("prio"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n",
        )
        .orderBy("prio", "status")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # flagship + engine ops
        "extract_main_text": _q_extract_main_text,
        "prev_context_pipeline": _q_prev_context_pipeline,
        "extraction_resume_antijoin": _q_extraction_resume,
        # scans/filters/projections (S*/P*/F*)
        "pending_anti_join": _q_pending_anti_join,
        # r6: membership_filter (P1 single-isin; shape_predicate + the
        # pushdown plan pin keep P1's semantics covered) retired to
        # local_parity() — the freed slot driver-registers decontaminate.
        "range_filter": _q_range_filter,
        "shape_predicate": _q_shape_predicate,
        "key_format_parse": _q_key_format_parse,
        # joins / windows (J*/W*)
        "dependency_lag": _q_dependency_lag,
        # NOTE: the driver's correctness harness records at most 50 query
        # rows; r2 registered 51 and the 51st (asset_metadata, the only S4
        # check) was silently dropped.  Redundant single-function scalar
        # checks (lag_context r3; slug, iso_format, string_tail r4) are
        # retired to `local_parity()` — same pytest oracle gate, not
        # driver-registered — to keep the registry at exactly 50 with
        # every real operator family inside (r4: the connected-components
        # keep-list and fixed-centroid IVF take the freed slots).
        "semi_join": _q_semi_join,
        "star_join": _q_star_join,
        # aggregations (A*)
        "group_collect": _q_group_collect,
        "counts_by_group": _q_counts_by_group,
        "derived_group_count": _q_derived_group_count,
        "upsert_counts": _q_upsert_counts,
        "topk_per_group": _q_topk_per_group,
        "distinct_stats": _q_distinct_stats,
        "pricing_summary": _q_pricing_summary,
        # r6 late rotation: pivot_matrix + rollup_totals (generic SQL
        # aggregate forms not mapped to any SURVEY §2 row; the family
        # stays driver-covered by pricing_summary / counts_by_group /
        # star_join) retired to local_parity() — the freed slots
        # driver-register the CCNet LM quality signal and DSIR
        # importance weighting, the two most product-critical late-r6
        # operators (see the "training-data pipeline" group below).
        # sorts/limits/set ops (L*/SO*)
        "ordered_limit": _q_ordered_limit,
        "set_except": _q_set_except,
        # training-data pipeline
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "dedup_simhash": _q_dedup_simhash,
        "simhash_near_pairs": _q_simhash_near_pairs,
        "token_count": _q_token_count,
        "quality_score": _q_quality_score,
        "language_id": _q_language_id,
        # r4: fingerprint + embedding_norm (single-expression checks whose
        # codepaths dedup_exact / the ANN queries already exercise) moved
        # to local_parity(); the freed slots register the webtext
        # corpus-prep operators redact_pii + repetition_score
        "redact_pii": _q_redact_pii,
        "repetition_score": _q_repetition_score,
        # r5: case_mapping + recency_limit (single-expression CASE chain /
        # sort-limit, both engine-trivial) retired to local_parity(); the
        # freed slots driver-register the r4 curation family (VERDICT r4
        # item 5): the composed curation decision and C4-style corpus-level
        # line dedup.
        "curation_flags": _q_curation_flags,
        "line_dedup": _q_line_dedup,
        "winnow_fingerprints": _q_winnow_fingerprints,
        # r6 rotation (VERDICT r5 item 1): json_path_extract retired to
        # local_parity() — F9 is fully exercised inside json_fence_rescue
        # (which composes F6+F7+F9) — and the two most product-critical
        # r5 operators take the freed slots: the eval-leakage sweep and
        # the Gopher line/symbol quality rules.
        "decontaminate": _q_decontaminate,
        "gopher_flags": _q_gopher_flags,
        # r6 late rotation (slots freed by pivot_matrix/rollup_totals):
        "ngram_logprob": _q_ngram_logprob,
        "dsir_weights": _q_dsir_weights,
        "json_fence_rescue": _q_json_fence_rescue,
        "json_validate": _q_json_validate,
        "sessionize": _q_sessionize,
        "near_dedup_components": _q_near_dedup_components,
        "ann_bruteforce": _q_ann_bruteforce,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "ivf_cell_counts": _q_ivf_cell_counts,
        "embedding_near_dup": _q_embedding_near_dup,
        "windowed_counts": _q_windowed_counts,
        "hash_sample": _q_hash_sample,
        "split_assign": _q_split_assign,
        "source_stats": _q_source_stats,
        "asset_metadata": _q_asset_metadata,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_TOKENS = "regexp_split_to_array(trim(lower(text)), '\\s+')"
_TOKENS_RAW = "regexp_split_to_array(trim(text), '\\s+')"

# static series bound (max tokens per doc is 100 in the driver tables;
# 512 leaves headroom) — DuckDB's generate_series cannot take a lateral
# column parameter, so cross-join a fixed range and filter.
_SHINGLES_CTE = f"""
tok AS (
  SELECT doc_id AS doc, {_TOKENS} AS toks FROM documents
),
sh AS (
  SELECT DISTINCT doc,
         array_to_string(toks[i : i + 2], ' ') AS shingle
  FROM tok, generate_series(1, 512) AS g(i)
  WHERE i <= len(toks) - 2
)
"""

_STOPWORDS_SQL = "['the','and','of','to','a','in','is','that','it','for','on','as','with']"

_LANG_MARKERS_SQL = """
lang_markers(lang, markers) AS (
  VALUES
    ('de', ['der','die','das','und','nicht','ist','ich','ein']),
    ('en', ['the','and','of','to','a','in','is','that']),
    ('es', ['el','la','los','y','es','una','que','no']),
    ('fr', ['le','la','les','et','est','une','que','pas'])
)
"""



def _minhash_oracle_sql(n_hashes: int = 16, bands: int = 4) -> str:
    """DuckDB twin of minhash_lsh_pairs: identical universal-hash params
    inlined as literals (single source of truth: dedup.minhash_params)."""
    from gemini_ocr_batch_spark.operators.dedup import MINHASH_P, minhash_params

    params = minhash_params(n_hashes)
    rows_per_band = n_hashes // bands
    mh_cols = ",\n                     ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = "\n              UNION ALL ".join(
        "SELECT doc, {band} AS band, md5({concat}) AS bucket FROM mh".format(
            band=band,
            concat=" || '|' || ".join(
                f"mh{band * rows_per_band + j}" for j in range(rows_per_band)
            ),
        )
        for band in range(bands)
    )
    return f"""
            WITH {_SHINGLES_CTE},
            based AS (
              SELECT doc,
                     CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT)
                       % {MINHASH_P} AS h
              FROM sh
            ),
            mh AS (
              SELECT doc,
                     {mh_cols}
              FROM based GROUP BY doc
            ),
            banded AS (
              {band_selects}
            )
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM banded a JOIN banded b USING (band, bucket)
            WHERE a.doc < b.doc
            ORDER BY doc_a, doc_b
        """


def _simhash_near_oracle_sql(bits: int = 16, max_hamming: int = 3) -> str:
    """DuckDB twin of simhash_near_pairs: same simhash CTE as the
    dedup_simhash oracle, then the pigeonhole band bucketing + exact
    Hamming verify via xor + bit_count (both native in DuckDB)."""
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    return f"""
            WITH tok AS (
              SELECT DISTINCT doc_id AS doc, t.token AS token
              FROM documents, unnest({_TOKENS}) AS t(token)
            ),
            th AS (
              SELECT doc,
                     CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS th
              FROM tok
            ),
            votes AS (
              SELECT doc, b.bit AS bit,
                     sum(CASE WHEN (th >> b.bit) & 1 = 1 THEN 1 ELSE -1 END)
                       AS v
              FROM th, generate_series(0, {bits - 1}) AS b(bit)
              GROUP BY doc, b.bit
            ),
            sig AS (
              SELECT doc,
                     CAST(sum(CASE WHEN v > 0
                              THEN (CAST(1 AS BIGINT) << bit)
                              ELSE 0 END) AS BIGINT) AS simhash
              FROM votes GROUP BY doc
            ),
            banded AS (
              SELECT doc, simhash, b.band AS band,
                     (simhash >> (b.band * {band_bits}))
                       & {(1 << band_bits) - 1} AS bucket
              FROM sig, generate_series(0, {n_bands - 1}) AS b(band)
            ),
            pairs AS (
              SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
                     CAST(bit_count(xor(a.simhash, b.simhash)) AS INT)
                       AS hamming
              FROM banded a JOIN banded b USING (band, bucket)
              WHERE a.doc < b.doc
            )
            SELECT doc_a, doc_b, hamming FROM pairs
            WHERE hamming <= {max_hamming}
            ORDER BY doc_a, doc_b
        """


def _bucket_expr_sql(dim: int, n_planes: int, seed: int) -> str:
    """Sign-LSH bucket as portable SQL: the seeded hyperplanes inlined as
    literals, each dot product an explicit left-associated sum matching
    Spark's F.aggregate fold bit-for-bit (single source of truth:
    similarity.hyperplanes)."""
    from gemini_ocr_batch_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    bit_terms = []
    for i, plane in enumerate(planes):
        dot = " + ".join(f"v[{j + 1}]*({c!r})" for j, c in enumerate(plane))
        bit_terms.append(
            f"(CASE WHEN (0.0 + {dot}) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return "\n                     + ".join(bit_terms)


def _embedding_near_dup_oracle_sql(dim: int = 64, n_planes: int = 4,
                                   seed: int = 13,
                                   threshold: float = 0.2) -> str:
    """DuckDB twin of embedding_near_dup_pairs (bucket-bounded pairs)."""
    return f"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ),
            b AS (
              SELECT vec_id, v,
                     {_bucket_expr_sql(dim, n_planes, seed)} AS bucket
              FROM e
            ),
            pairs AS (
              SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                     list_cosine_similarity(a.v, b2.v) AS c
              FROM b a JOIN b b2 USING (bucket)
              WHERE a.vec_id < b2.vec_id
            )
            SELECT id_a, id_b,
                   CAST(floor(c * 10000 + 0.5) AS BIGINT) AS cosine_r
            FROM pairs WHERE c >= {threshold!r}
            ORDER BY id_a, id_b
        """


def _ann_lsh_oracle_sql(dim: int = 64, n_planes: int = 6, seed: int = 13,
                        k: int = 10) -> str:
    """DuckDB twin of lsh_topk with multi_probe=1 (see _bucket_expr_sql
    for the hyperplane inlining / fold-order matching); the query vector
    is the fixed literal _ANN_QUERY_VEC, its bucket computed engine-side
    by the same bucket expression.  The Hamming-≤1 probe shell is
    expressed as ``xor(bucket, qb) IN (0, 1, 2, 4, ...)`` — identical
    membership to the Spark side's driver-computed literal IN list."""
    bucket_expr = _bucket_expr_sql(dim, n_planes, seed)
    probe_masks = ", ".join(["0"] + [str(1 << i) for i in range(n_planes)])
    return f"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ),
            b AS (
              SELECT vec_id, v,
                     {bucket_expr} AS bucket
              FROM e
            ),
            qraw AS (SELECT {_vec_sql_literal(_ANN_QUERY_VEC)} AS v),
            q AS (SELECT v AS qv, {bucket_expr} AS qb FROM qraw),
            scored AS (
              SELECT vec_id, list_cosine_similarity(v, qv) AS c
              FROM b, q WHERE xor(b.bucket, q.qb) IN ({probe_masks})
            )
            SELECT vec_id, rank FROM (
              SELECT vec_id,
                     row_number() OVER (ORDER BY c DESC, vec_id) AS rank
              FROM scored
            ) WHERE rank <= {k} ORDER BY rank
        """


def _vec_sql_literal(vec: list[float]) -> str:
    """A float vector as a DuckDB DOUBLE[] literal (repr round-trips
    doubles exactly)."""
    return "CAST([" + ", ".join(repr(float(v)) for v in vec) + "] AS DOUBLE[])"


def _ivf_index_ctes() -> str:
    """CTEs computing the fixed-centroid IVF assignment: per-centroid
    squared-L2 distance as an explicit left-associated sum (bit-for-bit
    the same doubles as Spark's F.aggregate fold in similarity.ivf_assign),
    argmin via list_position on the identical values."""
    dist_exprs = []
    for cent in _IVF_CENTROIDS:
        terms = " + ".join(
            f"(v[{j + 1}]-({c!r}))*(v[{j + 1}]-({c!r}))"
            for j, c in enumerate(cent)
        )
        dist_exprs.append(f"(0.0 + {terms})")
    dists = ",\n                       ".join(dist_exprs)
    return f"""
            e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ),
            dists AS (
              SELECT vec_id, v,
                     [{dists}] AS d
              FROM e
            ),
            idx AS (
              SELECT vec_id, v,
                     CAST(list_position(d, list_min(d)) - 1 AS INT)
                       AS centroid_id
              FROM dists
            )
    """


def _ann_ivf_oracle_sql(k: int = 10) -> str:
    """DuckDB twin of _q_ann_ivf: same fixed centroids, same probe set
    (similarity.ivf_probe_order — the identical driver-side Python both
    sides), exact top-k within the probed cells."""
    from gemini_ocr_batch_spark.operators.similarity import ivf_probe_order

    probed = ivf_probe_order(_IVF_CENTROIDS, _ANN_QUERY_VEC)[:_IVF_N_PROBE]
    probe_list = ", ".join(str(int(p)) for p in probed)
    return f"""
            WITH {_ivf_index_ctes()},
            scored AS (
              SELECT vec_id,
                     list_cosine_similarity(v, {_vec_sql_literal(_ANN_QUERY_VEC)}) AS c
              FROM idx WHERE centroid_id IN ({probe_list})
            )
            SELECT vec_id, rank FROM (
              SELECT vec_id,
                     row_number() OVER (ORDER BY c DESC, vec_id) AS rank
              FROM scored
            ) WHERE rank <= {k} ORDER BY rank
        """


def _ivf_cell_counts_oracle_sql() -> str:
    return f"""
            WITH {_ivf_index_ctes()}
            SELECT centroid_id, count(*) AS n_vecs, min(vec_id) AS min_id
            FROM idx GROUP BY centroid_id ORDER BY centroid_id
        """


def _near_dedup_components_oracle_sql() -> str:
    """Recursive-CTE union-find over the SAME LSH candidate pairs as
    Spark's minhash_lsh_pairs (shared _minhash_oracle_sql): component of
    a vertex = min id reachable from it; keep = is its own component."""
    return f"""
            WITH RECURSIVE pairs AS (
              {_minhash_oracle_sql()}
            ),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM pairs
            ),
            verts AS (SELECT DISTINCT src AS doc FROM edges),
            reach(src, dst) AS (
              SELECT doc, doc FROM verts
              UNION
              SELECT e.src, r.dst
              FROM edges e JOIN reach r ON r.src = e.dst
            ),
            comp AS (
              SELECT src AS doc, min(dst) AS component
              FROM reach GROUP BY src
            )
            SELECT doc AS doc_id, component, doc = component AS keep
            FROM comp ORDER BY doc_id
        """


def _winnow_kept_ctes() -> str:
    """Shared CTE chain computing each document's kept winnowing
    fingerprints (rows of ``kept`` where ``pm IS NULL OR m <> pm``):
    polynomial rolling hash over char 5-grams == the direct per-gram
    polynomial mod 2^31-1 (exact integers both sides), min per window of
    8 via a ROWS frame, consecutive-dedup via lag (out[-1] always equals
    the previous window's min, so value-lag is the identical rule).
    Used by the winnow_fingerprints and winnow_overlap_pairs oracles."""
    from gemini_ocr_batch_spark.operators.textstats import WINNOW_K, WINNOW_W

    B, M = 131, (1 << 31) - 1
    terms = " + ".join(
        f"ascii(substr(s, i+{j}, 1)) * CAST({B ** (WINNOW_K - 1 - j)} AS BIGINT)"
        for j in range(WINNOW_K)
    )
    return f"""
            d AS (
              SELECT doc_id,
                     array_to_string(regexp_split_to_array(
                       trim(lower(text)), '\\s+'), ' ') AS s
              FROM documents
            ),
            grams AS (
              SELECT doc_id, i, (({terms}) % {M}) AS h
              FROM d, generate_series(1, 4096) AS g(i)
              WHERE i <= length(s) - {WINNOW_K - 1}
            ),
            wins AS (
              SELECT doc_id, i,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                                           AND CURRENT ROW) AS m,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i)
                       AS rn
              FROM grams
            ),
            kept AS (
              SELECT doc_id, i, m,
                     lag(m) OVER (PARTITION BY doc_id ORDER BY i) AS pm
              FROM wins WHERE rn >= {WINNOW_W}
            )
    """


def _winnow_oracle_sql() -> str:
    """DuckDB twin of textstats.winnow_fingerprints (see
    :func:`_winnow_kept_ctes` for the hash construction)."""
    return f"""
            WITH {_winnow_kept_ctes()},
            fp AS (
              SELECT doc_id,
                     CAST(count(*) AS INT) AS n_fp,
                     list(m ORDER BY i) AS fingerprints
              FROM kept WHERE pm IS NULL OR m <> pm
              GROUP BY doc_id
            )
            SELECT docs.doc_id,
                   COALESCE(fp.n_fp, 0) AS n_fp,
                   array_to_string(COALESCE(fp.fingerprints, []), ',')
                     AS fp_csv
            FROM documents docs LEFT JOIN fp USING (doc_id)
            ORDER BY doc_id
        """


def _winnow_pairs_oracle_sql(min_common: int = 2, max_df: int = 25) -> str:
    """DuckDB twin of dedup.winnow_overlap_pairs: distinct kept
    fingerprints per document, stop-fingerprint df cap, self-joined,
    counted per pair."""
    return f"""
            WITH {_winnow_kept_ctes()},
            fps AS (
              SELECT DISTINCT doc_id AS doc, m AS fp
              FROM kept WHERE pm IS NULL OR m <> pm
            ),
            keepfp AS (
              SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_df}
            ),
            capped AS (
              SELECT doc, fp FROM fps JOIN keepfp USING (fp)
            )
            SELECT a.doc AS doc_a, b.doc AS doc_b,
                   count(*) AS n_common_fp
            FROM capped a JOIN capped b USING (fp)
            WHERE a.doc < b.doc
            GROUP BY 1, 2
            HAVING count(*) >= {min_common}
            ORDER BY doc_a, doc_b
        """


_SEEDED_PII_TEXT = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
)


def _redact_pii_oracle_sql() -> str:
    """DuckDB twin of webtext.redact_pii over the same seeded contact
    line (patterns are the shared Java/RE2-identical literals)."""
    from gemini_ocr_batch_spark.operators.webtext import EMAIL_RE, IPV4_RE

    return f"""
            WITH seeded AS (
              SELECT doc_id, {_SEEDED_PII_TEXT} AS text FROM documents
            ),
            step1 AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '{EMAIL_RE}'))
                          AS INT) AS n_emails,
                     regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g')
                       AS after_email
              FROM seeded
            )
            SELECT doc_id,
                   regexp_replace(after_email, '{IPV4_RE}', '<IP>', 'g')
                     AS text_redacted,
                   n_emails,
                   CAST(len(regexp_extract_all(after_email, '{IPV4_RE}'))
                        AS INT) AS n_ipv4
            FROM step1 ORDER BY doc_id
        """


def _repetition_score_oracle_sql() -> str:
    """DuckDB twin of webtext.repetition_score (word 2-grams; integral
    div at every boundary)."""
    return f"""
            WITH tok AS (
              SELECT doc_id AS doc, {_TOKENS} AS toks FROM documents
            ),
            g AS (
              SELECT doc, array_to_string(toks[i : i + 1], ' ') AS gram
              FROM tok, generate_series(1, 1024) AS gs(i)
              WHERE i <= len(toks) - 1
            ),
            pg AS (SELECT doc, gram, count(*) AS c FROM g GROUP BY doc, gram),
            pd AS (
              SELECT doc, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS total
              FROM pg GROUP BY doc
            )
            SELECT d.doc_id,
                   CAST(COALESCE((pd.top_c * 10000) // pd.total, 0)
                        AS BIGINT) AS rep_x10000,
                   COALESCE(pd.total, 0) AS n_grams
            FROM documents d LEFT JOIN pd ON pd.doc = d.doc_id
            ORDER BY d.doc_id
        """


def _canonicalize_urls_oracle_sql() -> str:
    from gemini_ocr_batch_spark.operators.webtext import TRACKING_PARAM_RE

    scheme_host = r"'^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)'"
    path = r"'^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)'"
    return f"""
            WITH pages AS (
              SELECT 'https://SYNTH.Example.org/Doc/' ||
                     CAST(doc_id AS VARCHAR) ||
                     '.html?utm_source=x&b=2&a=1&fbclid=abc#frag' AS url
              FROM documents
            ),
            split AS (
              SELECT url,
                     list_sort(list_filter(
                       string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')
                     )) AS kept
              FROM pages
            )
            SELECT url,
                   lower(regexp_extract(url, {scheme_host}, 1)) ||
                   regexp_extract(url, {path}, 1) ||
                   CASE WHEN len(kept) > 0
                        THEN '?' || array_to_string(kept, '&')
                        ELSE '' END AS url_canonical
            FROM split ORDER BY url
        """


def _hash_sample_oracle_sql() -> str:
    from gemini_ocr_batch_spark.operators.sampling import bucket_sql_duckdb

    return f"""
            SELECT doc_id, lang FROM documents
            WHERE {bucket_sql_duckdb("doc_id", "sample")} < 1000
            ORDER BY doc_id
        """


def _split_assign_oracle_sql() -> str:
    from gemini_ocr_batch_spark.operators.sampling import split_case_sql_duckdb

    return f"""
            WITH assigned AS (
              SELECT doc_id, {split_case_sql_duckdb("doc_id")} AS split
              FROM documents
            )
            SELECT split, count(*) AS n_docs,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM assigned GROUP BY split ORDER BY split
        """


def _extraction_resume_oracle_sql() -> str:
    # Twin of _q_extraction_resume: the "done" set is md5-bucket derived
    # (hash_sample salt="resume_done", rate 0.2 -> threshold 2000), so the
    # expected pending frontier is recomputable without the engine's state
    # store: pending = pages minus done, i.e. bucket >= 2000.
    from gemini_ocr_batch_spark.operators.sampling import bucket_sql_duckdb

    return f"""
            WITH pages AS (
              SELECT 'https://synth.example.org/doc/' ||
                     CAST(doc_id AS VARCHAR) ||
                     CASE WHEN doc_id % 4 = 0 THEN '.pdf'
                          ELSE '.html' END AS url, lang
              FROM documents
            )
            SELECT url, lang FROM pages
            WHERE {bucket_sql_duckdb("url", "resume_done")} >= 2000
            ORDER BY url
        """


def _q_curation_flags(spark, sf_dir):
    # corpus with synthesized exact duplicates (doc_id%7 texts replicated
    # under shifted ids — replayable in SQL) so the canonical-selection
    # axis of the curation decision is non-trivial
    from gemini_ocr_batch_spark.operators.webtext import curation_flags

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return curation_flags(docs.union(dups))


# Quality blend over a `text` column, x10000 fixed-point — same float op
# order as the quality_score oracle; shared by the curation_flags and
# stream_curate_twin oracles.
_QUALITY_X10000_SQL = f"""CAST(floor((
                 least(len({_TOKENS}) / 200.0, 1.0) * 0.4
                 + least(len(list_filter({_TOKENS},
                       x -> list_contains({_STOPWORDS_SQL}, x))) * 1.0
                     / greatest(len({_TOKENS}), 1) * 5.0, 1.0) * 0.3
                 + (1.0 - least((length(text) - length(regexp_replace(text,
                       '[\\.,;:!\\?]', '', 'g'))) * 1.0
                     / greatest(length(text), 1) * 10.0, 1.0)) * 0.2
                 + (1.0 - least((length(text) - length(regexp_replace(text,
                       '[A-Z]', '', 'g'))) * 1.0
                     / greatest(length(text), 1) * 5.0, 1.0)) * 0.1
               ) * 10000 + 0.5) AS BIGINT)"""


def _curation_flags_oracle_sql(min_q: int = 3000, max_rep: int = 5000) -> str:
    """DuckDB twin of webtext.curation_flags over the same dup-seeded
    corpus: quality blend and repetition formula expanded inline (same
    float op order as the quality_score / repetition_score oracles),
    canonical = min id per md5 fingerprint."""
    quality = _QUALITY_X10000_SQL
    return f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents
              WHERE doc_id % 7 = 0
            ),
            tok AS (
              SELECT doc_id, text, {_TOKENS} AS toks FROM corpus
            ),
            g AS (
              SELECT doc_id, array_to_string(toks[i : i + 1], ' ') AS gram
              FROM tok, generate_series(1, 1024) AS gs(i)
              WHERE i <= len(toks) - 1
            ),
            pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
            pd AS (
              SELECT doc_id, max(c) AS top_c,
                     CAST(sum(c) AS BIGINT) AS total
              FROM pg GROUP BY doc_id
            ),
            feat AS (
              SELECT t.doc_id,
                     md5(array_to_string(t.toks, ' ')) AS fingerprint,
                     {quality} AS q,
                     CAST(COALESCE((pd.top_c * 10000) // pd.total, 0)
                          AS BIGINT) AS rep
              FROM tok t LEFT JOIN pd USING (doc_id)
            ),
            flagged AS (
              SELECT doc_id,
                     doc_id = min(doc_id) OVER (PARTITION BY fingerprint)
                       AS is_canonical,
                     q >= {min_q} AS quality_ok,
                     rep <= {max_rep} AS repetition_ok
              FROM feat
            )
            SELECT doc_id, is_canonical, quality_ok, repetition_ok,
                   (is_canonical AND quality_ok AND repetition_ok) AS keep
            FROM flagged ORDER BY doc_id
        """


def _q_line_dedup(spark, sf_dir):
    # corpus-level line dedup over a synthesized multi-line corpus: each
    # doc = its (unique) text + two boilerplate lines shared across ALL
    # docs + one per-doc unique line — the shared lines must survive only
    # in the min-doc_id document
    from gemini_ocr_batch_spark.operators.webtext import line_dedup

    docs = _t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("subscribe to our newsletter"),
            F.concat(
                F.lit("unique line of doc "), F.col("doc_id").cast("string")
            ),
            F.lit("all rights reserved"),
        ).alias("text"),
    )
    return line_dedup(staged)


_LINE_DEDUP_ORACLE = """
            WITH staged AS (
              SELECT doc_id,
                     text || chr(10) || 'subscribe to our newsletter' ||
                     chr(10) || 'unique line of doc ' ||
                     CAST(doc_id AS VARCHAR) || chr(10) ||
                     'all rights reserved' AS text
              FROM documents
            ),
            arr AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM staged
            ),
            lines AS (
              SELECT doc_id, i - 1 AS line_no, ls[i] AS line
              FROM arr, generate_series(1, 64) AS g(i)
              WHERE i <= len(ls)
            ),
            ranked AS (
              SELECT doc_id, line_no, line,
                     row_number() OVER (PARTITION BY md5(line)
                                        ORDER BY doc_id, line_no) AS rn
              FROM lines
            ),
            rebuilt AS (
              SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY line_no)
                       AS text_deduped,
                     CAST(count(*) AS INT) AS n_kept
              FROM ranked WHERE rn = 1 GROUP BY doc_id
            )
            SELECT a.doc_id,
                   COALESCE(r.text_deduped, '') AS text_deduped,
                   CAST(len(a.ls) AS INT) AS n_lines,
                   COALESCE(r.n_kept, 0) AS n_kept
            FROM arr a LEFT JOIN rebuilt r USING (doc_id)
            ORDER BY a.doc_id
        """


def _q_stratified_sample(spark, sf_dir):
    # r5 data-mixing primitive: per-language keep rates, content-stable.
    from gemini_ocr_batch_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "doc_id", "lang",
        {"en": 0.5, "de": 1.0, "fr": 0.1}, default_rate=0.0,
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


_STRAT_RATES = {"en": 0.5, "de": 1.0, "fr": 0.1}


def _stratified_sample_oracle_sql() -> str:
    from gemini_ocr_batch_spark.operators.sampling import (
        stratified_case_sql_duckdb,
    )

    pred = stratified_case_sql_duckdb("doc_id", "lang", _STRAT_RATES, 0.0)
    return f"""
            SELECT doc_id, lang FROM documents
            WHERE {pred} ORDER BY doc_id
        """


def _q_decontaminate(spark, sf_dir):
    # r5 eval-leakage sweep: the "benchmark" is a deterministic slice of
    # the corpus itself (doc_id % 17) so exact members are flagged with
    # every gram and unrelated docs with none — both axes exercised.
    from gemini_ocr_batch_spark.operators.decontam import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0).select("text")
    return decontaminate(docs, bench, n=8, min_overlap=1)


def _decontaminate_oracle_sql(n: int = 8) -> str:
    """DuckDB twin of operators.decontam.decontaminate over the same
    %17-slice benchmark: distinct shingle strings per doc, hashed with
    the shared h60, probed against the benchmark's distinct hash set."""
    from gemini_ocr_batch_spark.functions.hashing import h60_sql_duckdb

    return f"""
            WITH tok AS (
              SELECT doc_id AS doc, {_TOKENS} AS toks FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc,
                     array_to_string(toks[i : i + {n - 1}], ' ') AS s
              FROM tok, generate_series(1, 1024) AS g(i)
              WHERE i <= len(toks) - {n - 1}
            ),
            shh AS (SELECT doc, {h60_sql_duckdb('s')} AS sh FROM sh),
            bench AS (
              SELECT DISTINCT sh FROM shh WHERE doc % 17 = 0
            ),
            hits AS (
              SELECT doc, CAST(count(*) AS BIGINT) AS n
              FROM shh JOIN bench USING (sh) GROUP BY doc
            )
            SELECT d.doc_id,
                   COALESCE(h.n, 0) AS n_overlap_grams,
                   COALESCE(h.n, 0) >= 1 AS contaminated
            FROM documents d LEFT JOIN hits h ON h.doc = d.doc_id
            ORDER BY d.doc_id
        """


def _q_winnow_overlap_pairs(spark, sf_dir):
    # max_df is the production posture: without it the synthetic corpus's
    # shared vocabulary connects ~every pair (122k pairs from 500 docs at
    # sf0.001 — the exact quadratic blowup the stop-fingerprint cap
    # exists to prevent).  An ABSOLUTE cap (a fingerprint in >25
    # documents is boilerplate) keeps the Spark query and the static
    # oracle literal identical at every sf.
    from gemini_ocr_batch_spark.operators.dedup import winnow_overlap_pairs

    docs = _t(spark, sf_dir, "documents")
    return winnow_overlap_pairs(docs, min_common=2, max_df=25)


def _q_corpus_token_stats(spark, sf_dir):
    from gemini_ocr_batch_spark.operators.textstats import corpus_token_stats

    return corpus_token_stats(_t(spark, sf_dir, "documents"), "lang")


def _corpus_token_stats_oracle_sql() -> str:
    qc = "quantile_cont(len(toks), {p})"
    pcts = ",\n                   ".join(
        f"CAST(floor({qc.format(p=p)} * 100 + 0.5) AS BIGINT) AS {a}"
        for p, a in ((0.5, "p50_x100"), (0.9, "p90_x100"),
                     (0.99, "p99_x100"))
    )
    return f"""
            WITH tok AS (
              SELECT lang, {_TOKENS} AS toks FROM documents
            )
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
                   CAST(floor(avg(len(toks)) * 100 + 0.5) AS BIGINT)
                     AS mean_tokens_x100,
                   {pcts}
            FROM tok GROUP BY lang ORDER BY lang
        """


def _q_gopher_flags(spark, sf_dir):
    # r5 Gopher line/symbol rules over a rule-exercising seeded corpus:
    # each doc_id%4 class appends content triggering a different rule
    # (bullets / '#' symbols / ellipsis line / numeric words), so every
    # ratio and flag varies — replayable in SQL.
    from gemini_ocr_batch_spark.operators.webtext import gopher_quality_flags

    docs = _t(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("\n- bullet one\n- bullet two"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" ### ###"))
        .when(F.col("doc_id") % 4 == 2, F.lit("\nto be continued..."))
        .otherwise(F.lit(" 12345 67890 13579"))
    )
    seeded = docs.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    # fixture-scaled thresholds: driver documents run 10-99 tokens with
    # ~0.7 stopword hits on average, so the published 50-word/2-stopword
    # floors would zero every flag; 20 words / 1 stopword keeps every
    # rule's pass/fail axis populated (the operator defaults stay at the
    # published values)
    return gopher_quality_flags(seeded, min_words=20, min_stopword_hits=1)


_GOPHER_FLAGS_ORACLE = """
            WITH seeded AS (
              SELECT doc_id,
                     text || CASE doc_id % 4
                       WHEN 0 THEN chr(10) || '- bullet one' || chr(10)
                                   || '- bullet two'
                       WHEN 1 THEN ' ### ###'
                       WHEN 2 THEN chr(10) || 'to be continued...'
                       ELSE ' 12345 67890 13579' END AS text
              FROM documents
            ),
            feat AS (
              SELECT doc_id,
                     CAST(length(text) - length(replace(text, '#', ''))
                          + length(text) - length(replace(text, '…', ''))
                          + (length(text) - length(regexp_replace(text,
                              '\\.\\.\\.', '', 'g'))) / 3 AS BIGINT)
                       AS sym,
                     CAST(len(regexp_split_to_array(trim(lower(text)),
                          '\\s+')) AS BIGINT) AS w,
                     CAST(len(list_filter(string_split(text, chr(10)),
                          l -> regexp_matches(l, '^\\s*[-*•]')))
                          AS BIGINT) AS b,
                     CAST(len(list_filter(string_split(text, chr(10)),
                          l -> regexp_matches(l,
                              '\\.\\.\\.\\s*$|…\\s*$'))) AS BIGINT) AS e,
                     CAST(len(string_split(text, chr(10))) AS BIGINT) AS l,
                     CAST(len(list_filter(regexp_split_to_array(
                          trim(lower(text)), '\\s+'),
                          x -> regexp_matches(x, '\\p{L}'))) AS BIGINT) AS a,
                     CAST(COALESCE(list_aggregate(list_transform(
                          regexp_split_to_array(trim(lower(text)), '\\s+'),
                          x -> length(x)), 'sum'), 0) AS BIGINT) AS c,
                     CAST(len(list_intersect(
                          regexp_split_to_array(trim(lower(text)), '\\s+'),
                          ['the','be','to','of','and','that','have','with']
                          )) AS BIGINT) AS s
              FROM seeded
            ),
            ratios AS (
              SELECT doc_id,
                     (sym * 10000) // greatest(w, 1)
                       AS symbol_ratio_x10000,
                     (b * 10000) // greatest(l, 1) AS bullet_frac_x10000,
                     (e * 10000) // greatest(l, 1)
                       AS ellipsis_frac_x10000,
                     (a * 10000) // greatest(w, 1) AS alpha_frac_x10000,
                     w AS n_words,
                     (c * 100) // greatest(w, 1) AS word_len_x100,
                     s AS stopword_hits
              FROM feat
            )
            SELECT doc_id, symbol_ratio_x10000, bullet_frac_x10000,
                   ellipsis_frac_x10000, alpha_frac_x10000,
                   n_words, word_len_x100, stopword_hits,
                   symbol_ratio_x10000 <= 1000 AS symbol_ok,
                   bullet_frac_x10000 <= 9000 AS bullet_ok,
                   ellipsis_frac_x10000 <= 3000 AS ellipsis_ok,
                   alpha_frac_x10000 >= 8000 AS alpha_ok,
                   (n_words >= 20 AND n_words <= 100000) AS word_count_ok,
                   (word_len_x100 >= 300 AND word_len_x100 <= 1000)
                     AS word_len_ok,
                   stopword_hits >= 1 AS stopword_ok,
                   (symbol_ratio_x10000 <= 1000
                    AND bullet_frac_x10000 <= 9000
                    AND ellipsis_frac_x10000 <= 3000
                    AND alpha_frac_x10000 >= 8000
                    AND n_words >= 20 AND n_words <= 100000
                    AND word_len_x100 >= 300 AND word_len_x100 <= 1000
                    AND stopword_hits >= 1) AS gopher_ok
            FROM ratios ORDER BY doc_id
        """


def _q_repeated_spans(spark, sf_dir):
    # r6 substring-level dedup: a 12-token sentence planted on every
    # doc_id%7==0 document guarantees cross-document 8-gram runs (5 full
    # windows inside the plant); natural verbatim repeats in the
    # synthetic corpus surface too — the oracle replays the same rule.
    from gemini_ocr_batch_spark.operators.dedup import repeated_spans

    docs = _t(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(" repeated span marker tokens alpha beta gamma"
                      " delta epsilon zeta eta theta"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return repeated_spans(seeded, k=8, min_docs=2)


def _repeated_spans_oracle_sql(k: int = 8) -> str:
    from gemini_ocr_batch_spark.functions.hashing import h60_sql_duckdb

    return f"""
            WITH seeded AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 7 = 0
                       THEN ' repeated span marker tokens alpha beta gamma'
                            || ' delta epsilon zeta eta theta'
                       ELSE '' END AS text
              FROM documents
            ),
            tok AS (
              SELECT doc_id AS doc, {_TOKENS} AS toks FROM seeded
            ),
            g AS (
              SELECT doc, i - 1 AS pos,
                     array_to_string(toks[i : i + {k - 1}], ' ') AS gram
              FROM tok, generate_series(1, 512) AS gs(i)
              WHERE i <= len(toks) - {k - 1}
            ),
            h AS (SELECT doc, pos, {h60_sql_duckdb('gram')} AS h FROM g),
            dup AS (
              SELECT h FROM h GROUP BY h
              HAVING count(DISTINCT doc) >= 2
            ),
            m AS (SELECT doc, pos FROM h JOIN dup USING (h)),
            r AS (
              SELECT doc, pos,
                     pos - row_number() OVER (PARTITION BY doc
                                              ORDER BY pos) AS grp
              FROM m
            )
            SELECT doc AS doc_id,
                   CAST(min(pos) AS INT) AS start_pos,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(count(*) + {k - 1} AS BIGINT) AS span_tokens
            FROM r GROUP BY doc, grp ORDER BY doc_id, start_pos
        """


def _q_domain_quality_stats(spark, sf_dir):
    # r6 per-domain curation rollup: three synthesized domains; every
    # doc_id%5==0 page carries an identical seeded body, so each domain
    # shows a predictable dup fraction and the quality mean mixes seeded
    # + natural texts — all replayed by the oracle.
    from gemini_ocr_batch_spark.operators.webtext import (
        domain_quality_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    domain = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("alpha.example"))
        .when(F.col("doc_id") % 3 == 1, F.lit("beta.example"))
        .otherwise(F.lit("gamma.example"))
    )
    pages = docs.select(
        F.concat(
            F.lit("https://"), domain, F.lit("/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("duplicate seeded body text here"),
        ).otherwise(F.col("text")).alias("text"),
    )
    return domain_quality_stats(pages)


def _domain_quality_stats_oracle_sql() -> str:
    return f"""
            WITH pages AS (
              SELECT CASE doc_id % 3
                       WHEN 0 THEN 'alpha.example'
                       WHEN 1 THEN 'beta.example'
                       ELSE 'gamma.example' END AS dom,
                     CASE WHEN doc_id % 5 = 0
                       THEN 'duplicate seeded body text here'
                       ELSE text END AS text
              FROM documents
            ),
            q AS (
              SELECT dom, md5(text) AS fp,
                     {_QUALITY_X10000_SQL} AS q
              FROM pages
            )
            SELECT dom AS domain,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_text,
                   CAST(((count(*) - count(DISTINCT fp)) * 10000)
                        // count(*) AS BIGINT) AS dup_frac_x10000,
                   CAST(CAST(sum(q) AS BIGINT) // count(*) AS BIGINT)
                     AS mean_quality_x10000
            FROM q GROUP BY dom ORDER BY domain
        """


def _q_shard_stats(spark, sf_dir):
    # r6 training-shard layout: content-keyed shard assignment + the
    # interleaved order_key, summarized per shard so the oracle checks
    # both the hash partition and the ordering key byte-for-byte.
    from gemini_ocr_batch_spark.operators.sampling import shard_assign

    docs = _t(spark, sf_dir, "documents")
    return (
        shard_assign(docs, "doc_id", 16)
        .groupBy(F.col("shard").cast("bigint").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("order_key").alias("first_key"),
            F.max("order_key").alias("last_key"),
        )
        .orderBy("shard")
    )


_SHARD_STATS_ORACLE = """
            SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                         || 'shard'), 1, 15))::BIGINT
                    % 16) AS shard,
                   count(*) AS n_docs,
                   min(md5('shard|ord|' || CAST(doc_id AS VARCHAR)))
                     AS first_key,
                   max(md5('shard|ord|' || CAST(doc_id AS VARCHAR)))
                     AS last_key
            FROM documents GROUP BY 1 ORDER BY shard
        """


def _q_snapshot_delta(spark, sf_dir):
    # r6 incremental-crawl delta: two snapshots synthesized from the
    # documents table by residue filters — %11==3 keys exist only in the
    # new crawl (added), %13==5 only in the old (removed), %7==0 rows
    # have their text perturbed (changed), the rest are unchanged — so
    # every CASE branch of the classifier fires.
    from gemini_ocr_batch_spark.operators.webtext import snapshot_delta

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 11 != 3).select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    new = docs.filter(F.col("doc_id") % 13 != 5).select(
        F.col("doc_id").cast("string").alias("url"),
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit("!"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_delta(old, new, key_col="url").orderBy("url")


_SNAPSHOT_DELTA_ORACLE = """
            WITH old_side AS (
              SELECT CAST(doc_id AS VARCHAR) AS url,
                     min(md5(coalesce(text, ''))) AS old_digest
              FROM documents WHERE doc_id % 11 <> 3 GROUP BY 1
            ),
            new_side AS (
              SELECT CAST(doc_id AS VARCHAR) AS url,
                     min(md5(coalesce(
                       CASE WHEN doc_id % 7 = 0 THEN text || '!'
                            ELSE text END, ''))) AS new_digest
              FROM documents WHERE doc_id % 13 <> 5 GROUP BY 1
            )
            SELECT coalesce(o.url, n.url) AS url,
                   old_digest, new_digest,
                   CASE WHEN old_digest IS NULL THEN 'added'
                        WHEN new_digest IS NULL THEN 'removed'
                        WHEN old_digest = new_digest THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM old_side o FULL OUTER JOIN new_side n ON o.url = n.url
            ORDER BY url
        """


def _q_pack_sequences(spark, sf_dir):
    # r6 training-sequence packing plan: concat-and-chunk spans at
    # seq_len=512 over the bpe-estimate token counts, 4 shards.
    from gemini_ocr_batch_spark.operators.sampling import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    with_tok = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.ceil(F.length(F.col("text")) / F.lit(4))
        .cast("bigint")
        .alias("n_tokens"),
    )
    plan = pack_sequences(
        with_tok, "doc_id", "n_tokens", seq_len=512, n_shards=4
    )
    return plan.select(
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        "order_key",
        "n_tokens",
        "tok_offset",
        "seq_first",
        "seq_last",
    ).orderBy("doc_id")


_PACK_SEQUENCES_ORACLE = """
            WITH t AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     coalesce(CAST(ceil(length(text) / 4.0) AS BIGINT), 0)
                       AS n
              FROM documents
            ),
            a AS (
              SELECT doc_id,
                     (('0x' || substr(md5(doc_id || 'shard'), 1, 15))
                        ::BIGINT % 4) AS shard,
                     md5('shard|ord|' || doc_id) AS order_key,
                     n
              FROM t
            ),
            o AS (
              SELECT doc_id, shard, order_key, n,
                     CAST(coalesce(sum(n) OVER (
                       PARTITION BY shard ORDER BY order_key, n
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS tok_offset
              FROM a
            )
            SELECT doc_id, shard, order_key,
                   n AS n_tokens, tok_offset,
                   tok_offset // 512 AS seq_first,
                   (tok_offset + greatest(n, 1) - 1) // 512 AS seq_last
            FROM o ORDER BY doc_id
        """


def _q_ngram_logprob(spark, sf_dir):
    # r6 CCNet-style LM quality signal: train a Laplace bigram model on
    # the corpus itself (min_count=2 prunes singleton grams), then score
    # every document by average per-gram log-prob in x10000 fixed-point
    # (integer sums — deterministic under any partitioning/engine).
    from gemini_ocr_batch_spark.operators.lm import (
        ngram_logprob,
        train_ngram_lm,
    )

    docs = _t(spark, sf_dir, "documents")
    uni, big = train_ngram_lm(docs, min_count=2)
    return ngram_logprob(docs, uni, big)


_NGRAM_LOGPROB_ORACLE = f"""
            WITH tok AS (
              SELECT doc_id, {_TOKENS} AS toks FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     array_to_string(toks[i : i + 1], ' ') AS g,
                     toks[i] AS w1
              FROM tok, generate_series(1, 512) AS gs(i)
              WHERE i <= len(toks) - 1
            ),
            uni AS (
              SELECT t AS w, count(*) AS c
              FROM tok, unnest(toks) AS u(t)
              GROUP BY t HAVING count(*) >= 2
            ),
            big AS (
              SELECT g, count(*) AS c FROM grams
              GROUP BY g HAVING count(*) >= 2
            ),
            v AS (SELECT count(*) AS v FROM uni),
            scored AS (
              SELECT grams.doc_id,
                     CAST(floor(ln(
                       (coalesce(big.c, 0) + 1)::DOUBLE
                       / (coalesce(uni.c, 0) + v.v)::DOUBLE
                     ) * 10000 + 0.5) AS BIGINT) AS lp_q
              FROM grams
              LEFT JOIN big USING (g)
              LEFT JOIN uni ON grams.w1 = uni.w
              CROSS JOIN v
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_grams,
                     sum(lp_q) AS sum_lp_x10000
              FROM scored GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(a.n_grams, 0) AS n_grams,
                   CAST(a.sum_lp_x10000 AS BIGINT) AS sum_lp_x10000,
                   CAST(a.sum_lp_x10000 // a.n_grams AS BIGINT)
                     AS avg_lp_x10000
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id
        """


_LM_BUCKET_CUTS = (-33920, -34160)  # ≈ terciles of the sf0.001 score
# distribution (span −36172..−32805) — all three buckets populated at
# the local gate, and FROZEN literals: the bucket assignment is a
# scan-side CASE both engines (CCNet freezes its cuts from a scored
# sample the same way; score_cut_points is the sampling helper)


def _q_lm_buckets(spark, sf_dir):
    # r6 CCNet corpus structuring: the ngram_logprob pipeline, then
    # head/middle/tail assignment at frozen literal cuts.
    from gemini_ocr_batch_spark.operators.lm import (
        ngram_logprob,
        perplexity_buckets,
        train_ngram_lm,
    )

    docs = _t(spark, sf_dir, "documents")
    uni, big = train_ngram_lm(docs, min_count=2)
    scores = ngram_logprob(docs, uni, big)
    return perplexity_buckets(
        scores, *_LM_BUCKET_CUTS
    ).select("doc_id", "avg_lp_x10000", "lm_bucket").orderBy("doc_id")


def _lm_buckets_oracle_sql() -> str:
    head, middle = _LM_BUCKET_CUTS
    return f"""
            WITH scores AS ({_NGRAM_LOGPROB_ORACLE}
            )
            SELECT doc_id, avg_lp_x10000,
                   CASE WHEN avg_lp_x10000 IS NULL THEN 'unscored'
                        WHEN avg_lp_x10000 >= {head} THEN 'head'
                        WHEN avg_lp_x10000 >= {middle} THEN 'middle'
                        ELSE 'tail' END AS lm_bucket
            FROM scores ORDER BY doc_id
        """


def _q_dsir_weights(spark, sf_dir):
    # r6 DSIR selection signal (Xie et al. 2023): hashed uni+bigram
    # importance weights of every document against a trusted target
    # (doc_id%5==0 — deterministic, ~20% of the corpus). Fixed-point
    # integer sums; the oracle replays the same md5 bucket hash.
    from gemini_ocr_batch_spark.operators.dsir import dsir_log_weights

    docs = _t(spark, sf_dir, "documents")
    # trusted is a PREDICATE slice of the pool, so the single-pass form
    # applies: p̂ derives from the same materialized gram stream as q̂ —
    # the corpus is tokenized+md5-hashed once, not 2.2× (r7 optimization;
    # result identical to dsir_log_weights(docs, docs.filter(pred))).
    return dsir_log_weights(docs, None,
                            trusted_pred=F.col("doc_id") % 5 == 0)


_DSIR_WEIGHTS_ORACLE = f"""
            WITH tok AS (
              SELECT doc_id, {_TOKENS} AS toks FROM documents
            ),
            grams AS (
              SELECT doc_id, t AS g FROM tok, unnest(toks) AS u(t)
              UNION ALL
              SELECT doc_id, array_to_string(toks[i : i + 1], ' ') AS g
              FROM tok, generate_series(1, 512) AS gs(i)
              WHERE i <= len(toks) - 1
            ),
            gb AS (
              SELECT doc_id,
                     (('0x' || substr(md5(g || 'dsir'), 1, 15))::BIGINT
                      % 10000) AS bucket
              FROM grams
            ),
            p AS (
              SELECT bucket, count(*) AS pc FROM gb
              WHERE doc_id % 5 = 0 GROUP BY bucket
            ),
            q AS (
              SELECT bucket, count(*) AS qc FROM gb GROUP BY bucket
            ),
            pt AS (SELECT coalesce(sum(pc), 0) AS ptot FROM p),
            qt AS (SELECT coalesce(sum(qc), 0) AS qtot FROM q),
            scored AS (
              SELECT gb.doc_id,
                     CAST(floor((
                       ln((coalesce(p.pc, 0) + 1)::DOUBLE
                          / (pt.ptot + 10000)::DOUBLE)
                       - ln((coalesce(q.qc, 0) + 1)::DOUBLE
                            / (qt.qtot + 10000)::DOUBLE)
                     ) * 10000 + 0.5) AS BIGINT) AS lr_q
              FROM gb
              LEFT JOIN p USING (bucket)
              LEFT JOIN q USING (bucket)
              CROSS JOIN pt CROSS JOIN qt
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_grams, sum(lr_q) AS logw
              FROM scored GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(a.n_grams, 0) AS n_grams,
                   CAST(a.logw AS BIGINT) AS logw_x10000
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id
        """


_SEMDEDUP_TAU = 0.3  # fixture embeddings are random 64-dim: max pair
# cosine ≈ 0.48, and 0.3 leaves a ~200-pair dup graph at sf0.001 — a
# populated, non-trivial component/election check at the local gate


def _q_semdedup_keep(spark, sf_dir):
    # r6 SemDeDup (Abbas et al. 2023): within-cell cosine pairs over the
    # SAME fixed unit centroids as ann_ivf, connected components, then
    # the per-component keep election (lowest quantized centroid-cosine
    # = most atypical wins, the paper's diversity-preserving rule).
    from gemini_ocr_batch_spark.operators.semdedup import semdedup_keep

    emb = _t(spark, sf_dir, "embeddings")
    out = semdedup_keep(emb, _IVF_CENTROIDS, tau=_SEMDEDUP_TAU)
    return out.select(
        F.col("id").alias("vec_id"),
        "centroid_id",
        "component",
        "cent_cos_x10000",
        "keep",
    )


def _semdedup_keep_oracle_sql() -> str:
    """DuckDB twin of semdedup_keep: the shared fixed-centroid IVF
    assignment CTEs, within-cell pairs at tau, recursive-CTE union-find
    (the near_dedup_components construction), and the same quantized
    centroid-cosine election."""
    cents = ",\n                     ".join(
        f"({i}, {_vec_sql_literal(c)})"
        for i, c in enumerate(_IVF_CENTROIDS)
    )
    return f"""
            WITH RECURSIVE {_ivf_index_ctes()},
            pairs AS (
              SELECT a.vec_id AS da, b.vec_id AS db
              FROM idx a JOIN idx b
                ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.v, b.v) >= {_SEMDEDUP_TAU!r}
            ),
            edges AS (
              SELECT da AS src, db AS dst FROM pairs
              UNION
              SELECT db AS src, da AS dst FROM pairs
            ),
            verts AS (SELECT DISTINCT src AS doc FROM edges),
            reach(src, dst) AS (
              SELECT doc, doc FROM verts
              UNION
              SELECT e.src, r.dst
              FROM edges e JOIN reach r ON r.src = e.dst
            ),
            comp AS (
              SELECT src AS doc, min(dst) AS component
              FROM reach GROUP BY src
            ),
            cents(cid, cv) AS (
              VALUES {cents}
            ),
            scored AS (
              SELECT i.vec_id, i.centroid_id, c.component,
                     CAST(floor(list_cosine_similarity(i.v, ct.cv)
                                * 10000 + 0.5) AS BIGINT)
                       AS cent_cos_x10000
              FROM idx i
              JOIN comp c ON c.doc = i.vec_id
              JOIN cents ct ON ct.cid = i.centroid_id
            )
            SELECT vec_id, centroid_id, component, cent_cos_x10000,
                   (row_number() OVER (PARTITION BY component
                      ORDER BY cent_cos_x10000, vec_id)) = 1 AS keep
            FROM scored ORDER BY vec_id
        """


_BM25_TERMS = ["vector", "hash", "scan"]


def _q_bm25_scores(spark, sf_dir):
    # r6 retrieval surface: BM25 over the whole corpus against a literal
    # term query. Per-term tf/df are HOF columns (no explode, no
    # shuffle); contributions quantize x10000 BEFORE the cross-term sum
    # so the score is an integer; the oracle recomputes N/df/avgdl in
    # SQL with the identical expression shape.
    from gemini_ocr_batch_spark.operators.retrieval import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    return bm25_scores(docs, _BM25_TERMS)


def _bm25_oracle() -> str:
    """The operator module owns the oracle generator (it must mirror the
    Spark expression shape term-for-term); the terms are pinned here."""
    from gemini_ocr_batch_spark.operators.retrieval import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_TERMS)


def _q_domain_pagerank(spark, sf_dir):
    # r6 crawl-authority signal: weighted damped PageRank over a
    # deterministic 13-domain multigraph synthesized from doc_id residues
    # (7 source domains, 13 target domains → d7..d12 are dangling, d0
    # carries self-loops — every semantic branch of the operator fires).
    # Ranks quantized at 1e-9: float-sum association differs across
    # engines only at ~1e-15 relative, far inside the grid.
    from gemini_ocr_batch_spark.operators.links import domain_pagerank

    docs = _t(spark, sf_dir, "documents")
    edges = (
        docs.select(
            F.concat(
                F.lit("d"), (F.col("doc_id") % 7).cast("string")
            ).alias("src_domain"),
            F.concat(
                F.lit("d"), ((F.col("doc_id") * 3) % 13).cast("string")
            ).alias("dst_domain"),
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    ranks = domain_pagerank(edges, iterations=8)
    return ranks.select(
        "domain",
        F.floor(F.col("rank") * 1e9 + F.lit(0.5))
        .cast("bigint")
        .alias("rank_x1e9"),
    ).orderBy("domain")


# DuckDB twin of the operator's power iteration: the recursive working
# table holds iteration k's (domain, rank) rows; correlated aggregate
# subqueries compute the weighted in-rank and the dangling mass exactly as
# the Spark loop does (edge-share static table, uniform dangling
# redistribution, base (1-d)/n, self-loops dropped AFTER the node set is
# fixed so self-only domains persist as dangling nodes).
_DOMAIN_PAGERANK_ORACLE = """
            WITH RECURSIVE
            raw AS (
              SELECT 'd' || (doc_id % 7) AS src,
                     'd' || ((doc_id * 3) % 13) AS dst,
                     CAST(count(*) AS DOUBLE) AS w
              FROM documents GROUP BY 1, 2
            ),
            nodes AS (
              SELECT DISTINCT domain FROM (
                SELECT src AS domain FROM raw
                UNION SELECT dst FROM raw)
            ),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
            edges AS (SELECT * FROM raw WHERE src <> dst),
            out_w AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
            share AS (
              SELECT e.src, e.dst, e.w / o.ow AS share
              FROM edges e JOIN out_w o USING (src)
            ),
            pr(it, domain, rank) AS (
              SELECT 0, domain, 1.0 / (SELECT n FROM nn) FROM nodes
              UNION ALL
              SELECT p.it + 1, p.domain,
                (0.15 / (SELECT n FROM nn))
                + 0.85 * (
                    coalesce((SELECT sum(s.share * p2.rank)
                              FROM share s
                              JOIN pr p2 ON p2.domain = s.src
                              WHERE s.dst = p.domain), 0)
                    + coalesce((SELECT sum(p3.rank) FROM pr p3
                                WHERE p3.domain NOT IN
                                      (SELECT src FROM out_w)), 0)
                      / (SELECT n FROM nn)
                  )
              FROM pr p
              WHERE p.it < 8
            )
            SELECT domain,
                   CAST(floor(rank * 1000000000 + 0.5) AS BIGINT)
                     AS rank_x1e9
            FROM pr WHERE it = 8 ORDER BY domain
        """


def _q_blocklist_flags(spark, sf_dir):
    # r6 URL/domain blocklist: hosts synthesized from doc_id%5 exercise
    # every match mode — exact host, direct + deep subdomain suffix,
    # pattern rule, and clean survivor — against a 2-domain blocklist.
    from gemini_ocr_batch_spark.operators.blocklist import blocklist_flags

    docs = _t(spark, sf_dir, "documents")
    host = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("ads.example.com"))
        .when(F.col("doc_id") % 5 == 1, F.lit("sub.tracker.net"))
        .when(F.col("doc_id") % 5 == 2, F.lit("good.org"))
        .when(F.col("doc_id") % 5 == 3, F.lit("deep.a.b.tracker.net"))
        .otherwise(F.lit("fun.org"))
    )
    path = (
        F.when(F.col("doc_id") % 5 == 4, F.lit("/casino/p/"))
        .otherwise(F.lit("/p/"))
    )
    pages = docs.select(
        F.concat(
            F.lit("https://"), host, path, F.col("doc_id").cast("string")
        ).alias("url")
    )
    blocked = spark.createDataFrame(
        [("ads.example.com",), ("tracker.net",)], "domain string"
    )
    return blocklist_flags(pages, blocked, patterns=["/casino/"])


_BLOCKLIST_FLAGS_ORACLE = """
            WITH pages AS (
              SELECT 'https://' ||
                     CASE doc_id % 5
                       WHEN 0 THEN 'ads.example.com'
                       WHEN 1 THEN 'sub.tracker.net'
                       WHEN 2 THEN 'good.org'
                       WHEN 3 THEN 'deep.a.b.tracker.net'
                       ELSE 'fun.org' END ||
                     CASE WHEN doc_id % 5 = 4 THEN '/casino/p/'
                          ELSE '/p/' END || doc_id AS url,
                     CASE doc_id % 5
                       WHEN 0 THEN 'ads.example.com'
                       WHEN 1 THEN 'sub.tracker.net'
                       WHEN 2 THEN 'good.org'
                       WHEN 3 THEN 'deep.a.b.tracker.net'
                       ELSE 'fun.org' END AS host
              FROM documents
            ),
            bl(domain) AS (VALUES ('ads.example.com'), ('tracker.net'))
            SELECT url,
                   (regexp_matches(url, '/casino/')
                    OR EXISTS (SELECT 1 FROM bl
                               WHERE host = domain
                                  OR host LIKE '%.' || domain)) AS blocked
            FROM pages ORDER BY url
        """


def _q_anchor_texts(spark, sf_dir):
    # r5 incoming-anchor aggregation over the synthesized crawl's edge
    # table: '/a' and '/b' each carry one constant anchor across every
    # HTML page — counts and the top-anchor join are SQL-predictable.
    from gemini_ocr_batch_spark.operators.links import (
        incoming_anchor_texts,
        page_links,
    )

    pages = _synth_pages(spark, sf_dir)
    return incoming_anchor_texts(page_links(pages), top_n=3)


_ANCHOR_TEXTS_ORACLE = """
            WITH links AS (
              SELECT nav.href, nav.anchor
              FROM documents,
                   (VALUES ('/a', 'alpha nav link'),
                           ('/b', 'beta nav link')) AS nav(href, anchor)
              WHERE doc_id % 4 <> 0
            ),
            c AS (
              SELECT href, anchor, count(*) AS n
              FROM links GROUP BY 1, 2
            ),
            e AS (
              SELECT href, anchor, n,
                     sum(n) OVER (PARTITION BY href) AS n_refs,
                     count(*) OVER (PARTITION BY href)
                       AS n_unique_anchors,
                     row_number() OVER (PARTITION BY href
                                        ORDER BY n DESC, anchor) AS rn
              FROM c
            )
            SELECT href, CAST(n_refs AS BIGINT) AS n_refs,
                   CAST(n_unique_anchors AS BIGINT) AS n_unique_anchors,
                   string_agg(anchor, '|' ORDER BY rn) AS top_anchors
            FROM e WHERE rn <= 3
            GROUP BY 1, 2, 3 ORDER BY href
        """


def _q_latest_snapshot(spark, sf_dir):
    # r5 crawl revisit resolution: 1-3 synthesized captures per url
    # (version-stamped text, epoch-second ts) — the operator must keep
    # exactly the newest and count the collapsed snapshots.
    from gemini_ocr_batch_spark.operators.webtext import latest_snapshot

    docs = _t(spark, sf_dir, "documents")
    snaps = docs.select(
        F.concat(
            F.lit("https://synth.example.org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.explode(
            F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
        ).alias("k"),
        "text",
    ).select(
        "url",
        (F.lit(1704067200).cast("bigint")
         + F.col("k").cast("bigint") * 3600).alias("warc_ts"),
        F.concat(
            F.lit("v"), F.col("k").cast("string"), F.lit(" "), F.col("text")
        ).alias("text"),
    )
    out = latest_snapshot(snaps)
    return out.select(
        "url",
        "n_snapshots",
        F.split(F.col("text"), " ").getItem(0).alias("version"),
    ).orderBy("url")


_LATEST_SNAPSHOT_ORACLE = """
            WITH snaps AS (
              -- generate_series cannot take a lateral column bound in
              -- DuckDB: cross-join the fixed 0-2 range and filter
              SELECT 'https://synth.example.org/doc/' || doc_id AS url, k
              FROM documents, generate_series(0, 2) AS g(k)
              WHERE k <= doc_id % 3
            )
            SELECT url, CAST(count(*) AS INT) AS n_snapshots,
                   'v' || CAST(max(k) AS VARCHAR) AS version
            FROM snaps GROUP BY url ORDER BY url
        """


def _q_page_links(spark, sf_dir):
    # r5 crawl-graph edge table over the synthesized mixed-kind crawl:
    # every HTML page carries exactly the two known nav links (the
    # boilerplate template), PDFs carry none — fully SQL-predictable.
    from gemini_ocr_batch_spark.operators.links import page_links

    pages = _synth_pages(spark, sf_dir)
    return page_links(pages).orderBy("url", "link_no")


_PAGE_LINKS_ORACLE = """
            WITH html_pages AS (
              SELECT 'https://synth.example.org/doc/' || doc_id ||
                     '.html' AS url
              FROM documents WHERE doc_id % 4 <> 0
            ),
            nav(link_no, href, anchor) AS (
              VALUES (0, '/a', 'alpha nav link'),
                     (1, '/b', 'beta nav link')
            )
            SELECT url, link_no, href, anchor
            FROM html_pages CROSS JOIN nav
            ORDER BY url, link_no
        """


def _q_page_metadata(spark, sf_dir):
    # r5 head-metadata extraction over the synthesized crawl: HTML pages
    # carry the constant template title 't' (no meta description, no
    # canonical link); PDFs yield a NULL row — 1:1 with the input.
    from gemini_ocr_batch_spark.operators.links import page_metadata

    pages = _synth_pages(spark, sf_dir)
    return page_metadata(pages).orderBy("url")


_PAGE_METADATA_ORACLE = """
            SELECT 'https://synth.example.org/doc/' || doc_id ||
                     CASE WHEN doc_id % 4 = 0 THEN '.pdf'
                          ELSE '.html' END AS url,
                   CASE WHEN doc_id % 4 = 0 THEN NULL ELSE 't' END AS title,
                   CAST(NULL AS VARCHAR) AS meta_description,
                   CAST(NULL AS VARCHAR) AS canonical_url
            FROM documents ORDER BY url
        """


def _q_stream_curate_twin(spark, sf_dir):
    # Batch-equivalence for the streaming curation pass (VERDICT r4 item
    # 6): documents + a replicated doc_id%5 subset (arriving 10 min later,
    # inside the 1 h watermark) streamed through stream_curate must keep
    # exactly one survivor per passing fingerprint.  The synthesized
    # duplicates are EXACT text replicas, so every cluster's members agree
    # on the quality/repetition flags — the case where stream (filter →
    # first-arrival dedup) and batch (min-id canonical → filter) provably
    # produce the same survivor fingerprint set (see the stream_curate
    # docstring caveat for case-variant clusters).
    import tempfile

    from gemini_ocr_batch_spark.streaming.pipeline import stream_curate

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "text",
    )
    dups = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.lit("2024-01-01 00:10:00").cast("timestamp").alias("warc_ts"),
        "text",
    )
    staged = tempfile.mkdtemp(prefix="sctwin_")
    base.union(dups).write.mode("overwrite").parquet(staged + "/pages")
    stream = spark.readStream.schema("warc_ts timestamp, text string").parquet(
        staged + "/pages"
    )
    q = (
        stream_curate(stream)
        .select("fingerprint")
        .writeStream.format("memory")
        .queryName("sctwin")
        .outputMode("append")
        .option("checkpointLocation", staged + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("SELECT fingerprint FROM sctwin ORDER BY fingerprint")


def _stream_curate_twin_oracle_sql(min_q: int = 3000,
                                   max_rep: int = 5000) -> str:
    """Expected stream_curate survivors: one fingerprint per distinct
    passing document (duplicates are exact replicas, so pass/fail is a
    property of the fingerprint)."""
    return f"""
            WITH tok AS (
              SELECT doc_id, text, {_TOKENS} AS toks FROM documents
            ),
            g AS (
              SELECT doc_id, array_to_string(toks[i : i + 1], ' ') AS gram
              FROM tok, generate_series(1, 1024) AS gs(i)
              WHERE i <= len(toks) - 1
            ),
            pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
            pd AS (
              SELECT doc_id, max(c) AS top_c,
                     CAST(sum(c) AS BIGINT) AS total
              FROM pg GROUP BY doc_id
            ),
            feat AS (
              SELECT t.doc_id,
                     md5(array_to_string(t.toks, ' ')) AS fingerprint,
                     {_QUALITY_X10000_SQL} AS q,
                     CAST(COALESCE((pd.top_c * 10000) // pd.total, 0)
                          AS BIGINT) AS rep
              FROM tok t LEFT JOIN pd USING (doc_id)
            )
            SELECT DISTINCT fingerprint FROM feat
            WHERE q >= {min_q} AND rep <= {max_rep}
            ORDER BY fingerprint
        """


def _q_stream_dedup_twin(spark, sf_dir):
    # Batch-equivalence for the streaming exact dedup (VERDICT r3 item 7):
    # documents + a replicated doc_id%5 subset are streamed through
    # stream_dedup_exact (a REAL availableNow stream — Spark rejects
    # dropDuplicatesWithinWatermark on batch frames), and the surviving
    # digest set must equal the batch exact-dedup distinct-digest set.
    import tempfile

    from gemini_ocr_batch_spark.streaming.pipeline import stream_dedup_exact

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "text",
    )
    dups = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.lit("2024-01-01 00:10:00").cast("timestamp").alias("warc_ts"),
        "text",
    )
    staged = tempfile.mkdtemp(prefix="sdtwin_")
    base.union(dups).write.mode("overwrite").parquet(staged + "/pages")
    stream = spark.readStream.schema("warc_ts timestamp, text string").parquet(
        staged + "/pages"
    )
    q = (
        stream_dedup_exact(stream)
        .select("content_hash")
        .writeStream.format("memory")
        .queryName("sdtwin")
        .outputMode("append")
        .option("checkpointLocation", staged + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("SELECT content_hash FROM sdtwin ORDER BY content_hash")


def local_parity() -> dict[str, tuple]:
    """(query, oracle SQL) pairs verified ONLY by the local pytest parity
    gate, not registered with the driver (its harness records at most 50
    rows; see the registry note in :func:`queries`)."""
    return {
        "lag_context": (
            _q_lag_context,
            """
            SELECT event_id,
                   right(lag(props) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 20) AS prev_ctx
            FROM events ORDER BY event_id
            """,
        ),
        # r4: redundant single-function scalar checks retired from the
        # driver registry to free slots for near_dedup_components /
        # ann_ivf / ivf_cell_counts (still oracle-gated here every run).
        "slug": (
            _q_slug,
            """
            SELECT p_partkey,
                   regexp_replace(regexp_replace(lower(p_name),
                       '[^a-z0-9]+', '-', 'g'), '^-+|-+$', '', 'g') AS slug
            FROM part ORDER BY p_partkey
            """,
        ),
        "iso_format": (
            _q_iso_format,
            """
            SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso
            FROM events ORDER BY event_id
            """,
        ),
        "canonicalize_urls": (
            _q_canonicalize_urls,
            _canonicalize_urls_oracle_sql(),
        ),
        # r5: retired from the driver registry (slots freed for the
        # curation family) but still oracle-gated here every pytest run.
        "case_mapping": (
            _q_case_mapping,
            """
            SELECT CASE WHEN event_type = 'error' THEN 'HARD_FAIL'
                        WHEN value < 0 THEN 'NEGATIVE'
                        WHEN event_type IN ('click','view') THEN 'ENGAGEMENT'
                        ELSE 'OTHER' END AS category,
                   count(*) AS n
            FROM events GROUP BY 1 ORDER BY category
            """,
        ),
        "recency_limit": (
            _q_recency_limit,
            """
            SELECT event_id, ts FROM events ORDER BY ts DESC, event_id LIMIT 50
            """,
        ),
        "fingerprint": (
            _q_fingerprint,
            f"""
            SELECT doc_id,
                   md5(array_to_string({_TOKENS}, ' ')) AS fingerprint
            FROM documents ORDER BY doc_id
            """,
        ),
        "embedding_norm": (
            _q_embedding_norm,
            """
            SELECT vec_id,
                   CAST(floor(sqrt(list_aggregate(
                     list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                     'sum')) * 10000 + 0.5) AS BIGINT) AS l2_norm
            FROM embeddings ORDER BY vec_id
            """,
        ),
        "stream_curate_twin": (
            _q_stream_curate_twin,
            _stream_curate_twin_oracle_sql(),
        ),
        # r5 training-data-pipeline additions (the driver registry is at
        # its 50-row cap; these ride the same DuckDB oracle gate here).
        "stratified_sample": (
            _q_stratified_sample,
            _stratified_sample_oracle_sql(),
        ),
        # r6 rotation: decontaminate + gopher_flags promoted to the
        # driver registry; the retired membership_filter (P1) and
        # json_path_extract (F9) ride the same gate here instead.
        "membership_filter": (
            _q_membership_filter,
            """
            SELECT lang, count(*) AS n_docs FROM documents
            WHERE lang IN ('en','de') GROUP BY lang ORDER BY lang
            """,
        ),
        "json_path_extract": (
            _q_json_path_extract,
            """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events ORDER BY event_id
            """,
        ),
        "winnow_overlap_pairs": (
            _q_winnow_overlap_pairs,
            _winnow_pairs_oracle_sql(),
        ),
        "corpus_token_stats": (
            _q_corpus_token_stats,
            _corpus_token_stats_oracle_sql(),
        ),
        "page_links": (
            _q_page_links,
            _PAGE_LINKS_ORACLE,
        ),
        "latest_snapshot": (
            _q_latest_snapshot,
            _LATEST_SNAPSHOT_ORACLE,
        ),
        "page_metadata": (
            _q_page_metadata,
            _PAGE_METADATA_ORACLE,
        ),
        "anchor_texts": (
            _q_anchor_texts,
            _ANCHOR_TEXTS_ORACLE,
        ),
        # r6 additions
        "blocklist_flags": (
            _q_blocklist_flags,
            _BLOCKLIST_FLAGS_ORACLE,
        ),
        "repeated_spans": (
            _q_repeated_spans,
            _repeated_spans_oracle_sql(),
        ),
        "domain_quality_stats": (
            _q_domain_quality_stats,
            _domain_quality_stats_oracle_sql(),
        ),
        "domain_pagerank": (
            _q_domain_pagerank,
            _DOMAIN_PAGERANK_ORACLE,
        ),
        "shard_stats": (
            _q_shard_stats,
            _SHARD_STATS_ORACLE,
        ),
        "snapshot_delta": (
            _q_snapshot_delta,
            _SNAPSHOT_DELTA_ORACLE,
        ),
        "pack_sequences": (
            _q_pack_sequences,
            _PACK_SEQUENCES_ORACLE,
        ),
        # r6 late rotation: ngram_logprob + dsir_weights promoted to the
        # driver registry; the retired pivot_matrix / rollup_totals
        # (generic SQL aggregate forms) ride the same gate here instead.
        "pivot_matrix": (
            _q_pivot,
            """
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN l_linestatus = 'O'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
                     AS qty_o,
                   CAST(sum(CASE WHEN l_linestatus = 'F'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
                     AS qty_f
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
            """,
        ),
        "rollup_totals": (
            _q_rollup,
            """
            SELECT coalesce(o_orderpriority, 'ALL') AS prio,
                   coalesce(o_orderstatus, 'ALL') AS status,
                   count(*) AS n
            FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
            ORDER BY prio, status
            """,
        ),
        "lm_buckets": (
            _q_lm_buckets,
            _lm_buckets_oracle_sql(),
        ),
        "bm25_scores": (
            _q_bm25_scores,
            _bm25_oracle(),
        ),
        "semdedup_keep": (
            _q_semdedup_keep,
            _semdedup_keep_oracle_sql(),
        ),
        "stream_dedup_twin": (
            _q_stream_dedup_twin,
            """
            SELECT DISTINCT md5(text) AS content_hash
            FROM documents ORDER BY content_hash
            """,
        ),
        "string_tail": (
            _q_string_tail,
            f"""
            SELECT doc_id,
                   right(text, 30) AS tail_chars,
                   array_to_string(list_slice({_TOKENS_RAW},
                        greatest(len({_TOKENS_RAW}) - 2, 1),
                        len({_TOKENS_RAW})), ' ') AS last_words
            FROM documents ORDER BY doc_id
            """,
        ),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_main_text": """
            SELECT 'https://synth.example.org/doc/' || doc_id ||
                     CASE WHEN doc_id % 4 = 0 THEN '.pdf' ELSE '.html' END
                     AS url,
                   CASE WHEN doc_id % 4 = 0
                        THEN text || chr(10) || 'synthetic pdf page ' || doc_id
                        ELSE text END AS extracted_text,
                   1 AS n_spans,
                   CASE WHEN doc_id % 4 = 0 THEN 'pdf' ELSE 'html' END
                     AS content_kind
            FROM documents ORDER BY url
        """,
        "prev_context_pipeline": """
            SELECT url, 'synth.example.org' AS domain,
                   lag(right(extracted_text, 500)) OVER (ORDER BY url)
                     AS prev_context
            FROM (
              SELECT 'https://synth.example.org/doc/' || doc_id ||
                       CASE WHEN doc_id % 4 = 0 THEN '.pdf'
                            ELSE '.html' END AS url,
                     CASE WHEN doc_id % 4 = 0
                          THEN text || chr(10) || 'synthetic pdf page '
                               || doc_id
                          ELSE text END AS extracted_text
              FROM documents
            ) ORDER BY url
        """,
        "pending_anti_join": """
            SELECT doc_id, lang FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 10 < 3)
            ORDER BY doc_id
        """,
        "range_filter": """
            SELECT event_type, count(*) AS n FROM events
            WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                         AND TIMESTAMP '2024-01-20 23:59:59'
            GROUP BY event_type ORDER BY event_type
        """,
        "shape_predicate": """
            SELECT source, count(*) AS n FROM documents
            WHERE regexp_matches(source, '^src[0-4]$')
              AND TRY_CAST(n_chars AS BIGINT) IS NOT NULL
            GROUP BY source ORDER BY source
        """,
        "key_format_parse": """
            WITH keyed AS (
              SELECT concat_ws(':', c_custkey, c_nationkey, c_mktsegment) AS key
              FROM customer
            )
            SELECT key,
                   CAST(string_split(key, ':')[2] AS INT) AS nation_parsed
            FROM keyed ORDER BY key
        """,
        "dependency_lag": """
            SELECT user_id, event_id,
                   lag(event_id) OVER w AS prev_event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > CAST(3600000000 AS BIGINT)
                        THEN 1 ELSE 0 END AS starts_chain
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, event_id
        """,
        "group_collect": """
            SELECT user_id,
                   array_to_string(list_sort(list(DISTINCT event_type)), ',')
                     AS types_seen,
                   count(*) AS n_events
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "counts_by_group": """
            SELECT event_type, count(*) AS n FROM events
            GROUP BY event_type ORDER BY n DESC, event_type
        """,
        "derived_group_count": """
            SELECT date_trunc('month', ts) AS month, count(*) AS n
            FROM events GROUP BY 1 ORDER BY month
        """,
        "upsert_counts": """
            WITH old AS (
              SELECT user_id, count(*) AS cnt FROM events
              WHERE event_id % 2 = 0 GROUP BY user_id
            ), delta AS (
              SELECT user_id, count(*) AS cnt FROM events
              WHERE event_id % 2 = 1 GROUP BY user_id
            ), unioned AS (
              SELECT * FROM old UNION ALL SELECT * FROM delta
            )
            SELECT user_id, CAST(sum(cnt) AS BIGINT) AS attempts FROM unioned
            GROUP BY user_id ORDER BY user_id
        """,
        "topk_per_group": """
            SELECT o_orderpriority, rn, o_orderkey FROM (
              SELECT o_orderpriority, o_orderkey,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey)
                       AS rn
              FROM orders
            ) WHERE rn <= 3 ORDER BY o_orderpriority, rn
        """,
        "ordered_limit": """
            SELECT o_orderkey, o_orderdate FROM orders
            ORDER BY o_orderdate, o_orderkey LIMIT 20
        """,
        "set_except": """
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase' AND user_id % 3 = 0
            ORDER BY user_id
        """,
        "semi_join": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            ORDER BY c_custkey
        """,
        "distinct_stats": """
            SELECT count(*) AS total,
                   count(DISTINCT user_id) AS distinct_users,
                   CAST(floor(max(value) * 10000 + 0.5) AS BIGINT) AS max_value
            FROM events
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        # r6 late rotation: pivot_matrix / rollup_totals oracles moved
        # to local_parity(); ngram_logprob / dsir_weights promoted here.
        "ngram_logprob": _NGRAM_LOGPROB_ORACLE,
        "dsir_weights": _DSIR_WEIGHTS_ORACLE,
        "star_join": """
            SELECT r_name, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS keep_id, md5(text) AS content_hash,
                   count(*) AS group_size
            FROM documents GROUP BY md5(text) ORDER BY keep_id
        """,
        "dedup_ngram_jaccard": f"""
            WITH {_SHINGLES_CTE},
            sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
            common AS (
              SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc < b.doc GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   CAST(floor(common * 1.0 / (sa.n_sh + sb.n_sh - common)
                              * 10000 + 0.5) AS BIGINT) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc = doc_a
            JOIN sizes sb ON sb.doc = doc_b
            WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= 0.2
            ORDER BY doc_a, doc_b
        """,
        "dedup_minhash_lsh": _minhash_oracle_sql(),
        "dedup_simhash": f"""
            WITH tok AS (
              SELECT DISTINCT doc_id AS doc, t.token AS token
              FROM documents, unnest({_TOKENS}) AS t(token)
            ),
            th AS (
              SELECT doc,
                     CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS th
              FROM tok
            ),
            votes AS (
              SELECT doc, b.bit AS bit,
                     sum(CASE WHEN (th >> b.bit) & 1 = 1 THEN 1 ELSE -1 END)
                       AS v
              FROM th, generate_series(0, 15) AS b(bit)
              GROUP BY doc, b.bit
            )
            SELECT doc AS doc_id,
                   CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                            ELSE 0 END) AS BIGINT) AS simhash
            FROM votes GROUP BY doc ORDER BY doc_id
        """,
        "token_count": f"""
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
                   CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est_tokens
            FROM documents ORDER BY doc_id
        """,
        "quality_score": f"""
            WITH feat AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len({_TOKENS}) AS n_tokens,
                     length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS n_punct,
                     length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
                     len(list_filter({_TOKENS},
                         x -> list_contains({_STOPWORDS_SQL}, x))) AS n_stop
              FROM documents
            )
            SELECT doc_id, n_tokens,
                   CAST(floor(n_chars * 1.0 / greatest(n_tokens, 1) * 10000 + 0.5) AS BIGINT) AS mean_word_len,
                   CAST(floor(n_punct * 1.0 / greatest(n_chars, 1) * 10000 + 0.5) AS BIGINT) AS punct_ratio,
                   CAST(floor(n_stop * 1.0 / greatest(n_tokens, 1) * 10000 + 0.5) AS BIGINT) AS stopword_ratio,
                   CAST(floor((
                     least(n_tokens / 200.0, 1.0) * 0.4
                     + least(n_stop * 1.0 / greatest(n_tokens, 1) * 5.0, 1.0) * 0.3
                     + (1.0 - least(n_punct * 1.0 / greatest(n_chars, 1) * 10.0, 1.0)) * 0.2
                     + (1.0 - least(n_upper * 1.0 / greatest(n_chars, 1) * 5.0, 1.0)) * 0.1
                   ) * 10000 + 0.5) AS BIGINT) AS quality
            FROM feat ORDER BY doc_id
        """,
        "language_id": f"""
            WITH {_LANG_MARKERS_SQL},
            hits AS (
              SELECT d.doc_id, m.lang,
                     len(list_filter({_TOKENS},
                         x -> list_contains(m.markers, x))) AS h
              FROM documents d CROSS JOIN lang_markers m
            ),
            best AS (
              SELECT doc_id, lang, h,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY h DESC, lang DESC) AS rn
              FROM hits
            )
            SELECT doc_id,
                   CASE WHEN h > 0 THEN lang ELSE 'und' END AS pred_lang,
                   h AS marker_hits
            FROM best WHERE rn = 1 ORDER BY doc_id
        """,
        "redact_pii": _redact_pii_oracle_sql(),
        "repetition_score": _repetition_score_oracle_sql(),
        "curation_flags": _curation_flags_oracle_sql(),
        "line_dedup": _LINE_DEDUP_ORACLE,
        "decontaminate": _decontaminate_oracle_sql(),
        "gopher_flags": _GOPHER_FLAGS_ORACLE,
        "json_fence_rescue": """
            WITH fenced AS (
              SELECT event_id,
                     '```json' || chr(10) || ' noise ' || props ||
                     ' noise' || chr(10) || '```' AS raw
              FROM events
            ),
            stripped AS (
              SELECT event_id,
                     regexp_replace(raw,
                       '^```[a-zA-Z]*\\n(.*)\\n```$', '\\1', 's') AS c
              FROM fenced
            ),
            rescued AS (
              SELECT event_id,
                     CASE WHEN strpos(c, '{') > 0
                           AND length(c) - strpos(reverse(c), '}') + 1
                               >= strpos(c, '{')
                          THEN substr(c, strpos(c, '{'),
                               length(c) - strpos(reverse(c), '}') + 1
                               - strpos(c, '{') + 1)
                     END AS j
              FROM stripped
            )
            SELECT event_id,
                   CAST(json_extract_string(j, '$.k') AS INT) AS k
            FROM rescued ORDER BY event_id
        """,
        "json_validate": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k,
                   CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS valid
            FROM events ORDER BY event_id
        """,
        "sessionize": """
            WITH gapped AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > CAST(3600000000 AS BIGINT)
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sessions AS (
              SELECT user_id, ts,
                     CAST(sum(new_session) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id
                                                 ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS session_id
              FROM gapped
            )
            SELECT user_id, session_id,
                   min(ts) AS session_start, max(ts) AS session_end,
                   CAST(count(*) AS INT) AS n_events
            FROM sessions GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        "ann_bruteforce": f"""
            WITH q AS (SELECT {_vec_sql_literal(_ANN_QUERY_VEC)} AS qv),
            scored AS (
              SELECT vec_id,
                     list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]), qv) AS c
              FROM embeddings, q
            )
            SELECT vec_id, rank FROM (
              SELECT vec_id,
                     row_number() OVER (ORDER BY c DESC, vec_id) AS rank
              FROM scored
            ) WHERE rank <= 10 ORDER BY rank
        """,
        "asset_metadata": """
            SELECT doc_id AS asset_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS byte_size,
                   md5(text) AS content_md5,
                   'unknown' AS guessed_kind,
                   CAST(CAST(('0x' || substr(md5(text), 1, 4)) AS INT) % 1920 + 1
                        AS INT) AS fake_width,
                   CAST(CAST(('0x' || substr(md5(text), 5, 4)) AS INT) % 1080 + 1
                        AS INT) AS fake_height
            FROM documents ORDER BY asset_id
        """,
        "simhash_near_pairs": _simhash_near_oracle_sql(),
        "ann_lsh": _ann_lsh_oracle_sql(),
        "ann_ivf": _ann_ivf_oracle_sql(),
        "ivf_cell_counts": _ivf_cell_counts_oracle_sql(),
        "near_dedup_components": _near_dedup_components_oracle_sql(),
        "winnow_fingerprints": _winnow_oracle_sql(),
        "embedding_near_dup": _embedding_near_dup_oracle_sql(),
        "windowed_counts": """
            SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us,
                   epoch_us(time_bucket(INTERVAL '1 hour', ts)
                            + INTERVAL '1 hour') AS we_us,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2, 3
            ORDER BY ws_us, event_type
        """,
        "hash_sample": _hash_sample_oracle_sql(),
        "split_assign": _split_assign_oracle_sql(),
        "source_stats": """
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(floor(avg(n_chars) * 100 + 0.5) AS BIGINT)
                     AS mean_chars_x100,
                   count(DISTINCT lang) AS n_langs
            FROM documents GROUP BY source ORDER BY source
        """,
        "extraction_resume_antijoin": _extraction_resume_oracle_sql(),
    }
