"""Custom PySpark DataSource for the paginated shifts API — the
Spark-4-native expression of the reference's page loop
(`/root/reference/etl/app/shift_data_processor.py:185-215`).

``spark.read.format("shifts_api").option("base_url", ...)`` plans ONE
partition PER PAGE, so a 1000-executor cluster pulls pages concurrently
while the driver issues exactly one probe request (to learn ``size``).
This subsumes the imperative helpers in sources/pages.py: pagination
becomes partition planning, the fetch loop becomes ``read()``, and
everything downstream is ordinary DataFrame code.

Registration is per-session: ``register(spark)`` then
``spark.read.format("shifts_api")``. Rows are emitted as tuples matching
SHIFT_DOC_SCHEMA (nested children as tuples too — the Python DataSource
row protocol).
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import SHIFT_DOC_SCHEMA


class _PagePartition(InputPartition):
    def __init__(self, start: int, limit: int):
        self.start = start
        self.limit = limit


def _get(url: str) -> dict:
    with urllib.request.urlopen(url) as r:  # noqa: S310 - http test service
        return json.loads(r.read())


def _doc_to_tuple(doc: dict) -> tuple:
    return (
        doc.get("id"),
        doc.get("date"),
        doc.get("start"),
        doc.get("finish"),
        [
            (b.get("id"), b.get("start"), b.get("finish"), b.get("paid"))
            for b in doc.get("breaks") or []
        ],
        [
            (a.get("id"), a.get("value"), a.get("cost"))
            for a in doc.get("allowances") or []
        ],
        [
            (w.get("id"), w.get("date"), w.get("units"), w.get("cost"))
            for w in doc.get("award_interpretations") or []
        ],
    )


class ShiftsApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.base_url = options["base_url"]
        self.limit = int(options.get("page_size", 7))

    def partitions(self):
        # one driver-side probe to learn the corpus size; every page
        # thereafter is an independent input partition (executor-side)
        size = int(_get(f"{self.base_url}?start=0&limit=1")["size"])
        return [
            _PagePartition(start, self.limit)
            for start in range(0, max(size, 1), self.limit)
        ]

    def read(self, partition: _PagePartition):
        page = _get(
            f"{self.base_url}?start={partition.start}&limit={partition.limit}"
        )
        for doc in page["results"]:
            yield _doc_to_tuple(doc)


class ShiftsApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "shifts_api"

    def schema(self):
        return SHIFT_DOC_SCHEMA

    def reader(self, schema) -> ShiftsApiReader:
        return ShiftsApiReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ShiftsApiDataSource)
