"""Paginated JSON source (S1/S2 — SURVEY.md §2.1).

The reference pulls pages of ≤30 nested shift docs over HTTP, following
``links.next`` until absent (reference etl/app/shift_data_processor.py:32-43,
146-152, 185-215). Here the page loop stays driver-side (it is control flow,
not data flow); each page body becomes a DataFrame with the explicit ingest
schema — no JSON inference ever (SURVEY.md §1.1).

For big ingests the right shape is unchanged: the driver only ever touches
page *URLs*; page *bodies* can be fetched executor-side by mapping a URL list
with mapInPandas (``distributed_fetch_df``) so 1000 executors pull pages in
parallel — the driver never holds more than one page's metadata.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable, Iterator
from functools import reduce
from urllib.parse import urljoin, urlparse

from pyspark.sql import DataFrame, SparkSession

from ..schemas import SHIFT_DOC_SCHEMA


def base_url(url: str) -> str:
    p = urlparse(url)
    return f"{p.scheme}://{p.netloc}{p.path}"


def next_url(page: dict, base: str) -> str | None:
    nxt = (page.get("links") or {}).get("next")
    return urljoin(base, nxt) if nxt else None


def iter_http_pages(
    url: str, fetch: Callable[[str], dict | None] | None = None
) -> Iterator[dict]:
    """S2 — follow links.next until absent. ``fetch`` is injectable for tests
    (the reference's tests mock requests.get the same way). A fetch failure
    stops the pipeline with ValueError, matching reference
    etl/app/shift_data_processor.py:202-204."""
    if fetch is None:  # pragma: no cover - network path
        import urllib.request

        def fetch(u: str) -> dict | None:
            try:
                with urllib.request.urlopen(u) as r:
                    return json.loads(r.read())
            except Exception:
                return None

    base = base_url(url)
    current: str | None = url
    while current:
        page = fetch(current)
        if page is None:
            raise ValueError("Failed to fetch data for the page.")
        yield page
        current = next_url(page, base)


def page_df(spark: SparkSession, page: dict) -> DataFrame:
    """S1 — one page body → DataFrame of nested shift docs (explicit schema)."""
    return spark.createDataFrame(page["results"], SHIFT_DOC_SCHEMA)


def docs_from_pages(spark: SparkSession, pages: Iterable[dict]) -> DataFrame:
    """Union all page DataFrames into one doc DataFrame. Lazy plan — no page
    data is retained driver-side beyond the dict being converted."""
    dfs = [page_df(spark, p) for p in pages]
    if not dfs:
        return spark.createDataFrame([], SHIFT_DOC_SCHEMA)
    return reduce(DataFrame.unionByName, dfs)


def distributed_fetch_df(
    spark: SparkSession,
    urls: list[str],
    fetch: Callable[[str], dict | None] | None = None,
) -> DataFrame:
    """Scale path: fetch page bodies executor-side. The driver distributes
    only URLs; each partition fetches and parses its pages, emitting nested
    docs with the fixed schema. JSON decode happens where the data lands."""
    sc = spark.sparkContext
    # createDataFrame(schema=...) binds rows POSITIONALLY — a Row built from
    # a dict whose JSON key order differs from the schema would misassign
    # columns silently. Emit schema-ordered tuples instead.
    field_names = [f.name for f in SHIFT_DOC_SCHEMA.fields]

    def fetch_partition(it):
        import json as _json
        import urllib.request

        for u in it:
            if fetch is not None:
                page = fetch(u)
            else:  # pragma: no cover - network path
                with urllib.request.urlopen(u) as r:
                    page = _json.loads(r.read())
            if page is None:
                raise ValueError(f"Failed to fetch {u}")
            for doc in page["results"]:
                yield tuple(doc.get(n) for n in field_names)

    rdd = sc.parallelize(urls, max(len(urls), 1)).mapPartitions(fetch_partition)
    return spark.createDataFrame(rdd, SHIFT_DOC_SCHEMA)
