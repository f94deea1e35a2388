"""Crawl-graph operators: outlink edge table + domain-graph rollup.

The reference pipeline stops at per-document text; a web-scale corpus
additionally needs the LINK structure — seed discovery, domain authority
features, link-farm detection — so the edge table is a first-class
output here.

Scale shape: the kernel is an Arrow-batched ``mapInPandas`` projection
(text/blob never shuffles; edges are slim strings); the domain rollup
aggregates (src_domain, dst_domain) pairs with map-side partials, so the
shuffle carries domain-pair cardinality, not edge cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gemini_ocr_batch_spark.operators.util import spread_small_input


def page_links(pages: DataFrame, url_col: str = "url",
               html_col: str = "html") -> DataFrame:
    """(url, link_no, href, anchor) — one row per outlink, in document
    order.  Non-HTML blobs (PDFs, binary junk) and undecodable pages
    yield no rows; hrefless anchors are dropped by the kernel."""
    from gemini_ocr_batch_spark.kernels.dispatch import (
        _decode_html,
        sniff_kind,
    )
    from gemini_ocr_batch_spark.kernels.links import extract_links

    schema = f"{url_col} string, link_no int, href string, anchor string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            urls: list[str] = []
            nos: list[int] = []
            hrefs: list[str] = []
            anchors: list[str] = []
            for url, blob in zip(pdf[url_col], pdf[html_col]):
                if blob is None or len(blob) == 0:
                    continue
                b = bytes(blob)
                if sniff_kind(b, url) != "html":
                    continue
                try:
                    text = _decode_html(b)
                except ValueError:
                    continue
                for i, (href, anchor) in enumerate(extract_links(text)):
                    urls.append(url)
                    nos.append(i)
                    hrefs.append(href)
                    anchors.append(anchor)
            yield pd.DataFrame(
                {
                    url_col: pd.Series(urls, dtype="object"),
                    "link_no": pd.Series(nos, dtype="int32"),
                    "href": pd.Series(hrefs, dtype="object"),
                    "anchor": pd.Series(anchors, dtype="object"),
                }
            )

    return spread_small_input(pages.select(url_col, html_col)).mapInPandas(
        batches, schema
    )


def page_metadata(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(url, title, meta_description, canonical_url) — head metadata per
    HTML page (NULLs for absent fields; non-HTML blobs yield a row of
    NULLs so the output stays 1:1 with the input for joins).

    Title and meta description are standard corpus columns (dedup keys,
    quality features, search snippets); the canonical link feeds the
    same revisit-resolution path as webtext.canonicalize_urls.
    """
    from gemini_ocr_batch_spark.kernels.dispatch import (
        _decode_html,
        sniff_kind,
    )
    from gemini_ocr_batch_spark.kernels.links import extract_page_meta

    schema = (
        f"{url_col} string, title string, meta_description string, "
        "canonical_url string"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            urls, titles, descs, canons = [], [], [], []
            for url, blob in zip(pdf[url_col], pdf[html_col]):
                title = desc = canon = None
                if blob is not None and len(blob) > 0:
                    b = bytes(blob)
                    if sniff_kind(b, url) == "html":
                        try:
                            title, desc, canon = extract_page_meta(
                                _decode_html(b)
                            )
                        except ValueError:
                            pass
                urls.append(url)
                titles.append(title)
                descs.append(desc)
                canons.append(canon)
            yield pd.DataFrame(
                {
                    url_col: pd.Series(urls, dtype="object"),
                    "title": pd.Series(titles, dtype="object"),
                    "meta_description": pd.Series(descs, dtype="object"),
                    "canonical_url": pd.Series(canons, dtype="object"),
                }
            )

    return spread_small_input(pages.select(url_col, html_col)).mapInPandas(
        batches, schema
    )


def domain_link_stats(links: DataFrame, url_col: str = "url") -> DataFrame:
    """(src_domain, dst_domain, n_links, n_unique_hrefs) — the domain
    graph.  Relative hrefs (no host) resolve to the source domain."""
    src = F.coalesce(
        F.parse_url(F.col(url_col), F.lit("HOST")), F.col(url_col)
    )
    dst_host = F.parse_url(F.col("href"), F.lit("HOST"))
    dst = F.when(
        dst_host.isNull() | (dst_host == ""), src
    ).otherwise(dst_host)
    return (
        links.select(src.alias("src_domain"), dst.alias("dst_domain"), "href")
        .groupBy("src_domain", "dst_domain")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.count_distinct("href").alias("n_unique_hrefs"),
        )
        .orderBy("src_domain", "dst_domain")
    )
