"""STAC harvest sources (SURVEY.md §2.1 S1-S3).

The reference fetches everything sequentially on one thread: root GET
(app.py:54), collections GET (app.py:80), then pages of /search walked one
by one (pagination.py:5-61) with every item translated inline. Here the page
walk stays on the driver — it IS partition planning, each page URL becomes a
unit of parallel work — and the per-page item fetch + JSON parse fan out via
mapInPandas.

The fetch function is injectable (signature url -> (status_code, json_dict))
so tests run against a deterministic in-process fake API; `http_fetch` is
the requests-backed implementation for real clusters.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stac_to_geocore_spark.fixtures import STAC_COLLECTION_SCHEMA, STAC_ITEM_SCHEMA

Fetch = Callable[[str], tuple[int, dict]]


def http_fetch(url: str) -> tuple[int, dict]:
    import requests

    r = requests.get(url)
    return r.status_code, (r.json() if r.status_code == 200 else {})


def _next_link(links: list[dict]) -> str | None:
    """rel=next extraction (ref pagination.py:63-69)."""
    for link in links or []:
        if link.get("rel") == "next":
            return link.get("href")
    return None


def plan_pages(fetch: Fetch, search_url: str, max_pages: int = 10_000) -> list[str]:
    """Walk /search pagination and return the page-URL list (the partition
    plan). Reproduces the reference planner's semantics (pagination.py:5-61):

    - accumulate context.returned, compare against context.matched
    - keep only non-empty pages (returned > 0)
    - follow rel=next; stop on non-200, empty page list, or returned>=matched
      (Franklin emits a next link even on the last page — the whole reason
      the planner exists, ref docstring :9-11)
    """
    pages: list[str] = []
    url: str | None = search_url
    returned_total = 0
    matched = None
    while url and len(pages) < max_pages:
        status, body = fetch(url)
        if status != 200:
            break
        ctx = body.get("context", {})
        returned = ctx.get("returned", 0)
        matched = ctx.get("matched", matched)
        returned_total += returned
        if returned > 0:
            pages.append(url)
        if matched is not None and returned_total >= matched:
            break
        url = _next_link(body.get("links"))
    return pages


def fetch_items_df(
    spark: SparkSession,
    pages: list[str],
    fetch: Fetch,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed page fetch: one row per STAC item.

    Page URLs become a tiny DataFrame, repartitioned so each executor pulls
    its own pages; item JSON is parsed JVM-side via from_json with the
    explicit item schema (no schema inference in production paths).
    """
    if not pages:
        return spark.createDataFrame([], STAC_ITEM_SCHEMA)
    n = partitions or min(len(pages), spark.sparkContext.defaultParallelism * 2)
    pages_df = spark.createDataFrame([(u,) for u in pages], "url string").repartition(n)

    def pull(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for url in b["url"]:
                status, body = fetch(url)
                if status != 200:  # non-200 pages yield 0 rows (ref app P9)
                    continue
                for feat in body.get("features", []):
                    rows.append(json.dumps(feat))
            yield pd.DataFrame({"raw": rows})

    raw = pages_df.mapInPandas(pull, "raw string")
    return raw.select(F.from_json("raw", STAC_ITEM_SCHEMA).alias("item")).select("item.*")


def harvest(
    spark: SparkSession, api_root: str, fetch: Fetch = http_fetch
) -> tuple[dict, DataFrame, DataFrame]:
    """Full harvest (ref lambda_handler app.py:36-170 minus the sinks):
    returns (root_dict, collections_df, items_df)."""
    status, root = fetch(api_root)
    if status != 200:
        raise ConnectionError(f"root api returned {status} for {api_root}")
    status, colls_body = fetch(f"{api_root}/collections/")
    colls = colls_body.get("collections", []) if status == 200 else []
    colls_df = spark.createDataFrame(
        [json.dumps(c) for c in colls], "string"
    ).select(F.from_json("value", STAC_COLLECTION_SCHEMA).alias("c")).select("c.*")
    pages = plan_pages(fetch, f"{api_root}/search")
    items_df = fetch_items_df(spark, pages, fetch)
    return root, colls_df, items_df
