"""Explicit schemas — never inferred on the ingest path.

The reference declares its source schema with Pydantic models
(reference api/app/models.py:12-44) and its sink schema as SQL DDL
(reference initdb.sql:3-46); the mapping between them is an explicit rename
dict (reference etl/app/shift_data_processor.py:105-115). This module is the
single Spark-side source of truth for both.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Raw nested shift document (ingest schema; FIXTURES.md §1)
# start/finish are epoch MILLISECONDS (reference api/app/models.py:35-36).
# --------------------------------------------------------------------------

BREAK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("start", T.LongType(), True),
        T.StructField("finish", T.LongType(), True),
        T.StructField("paid", T.BooleanType(), False),
    ]
)

ALLOWANCE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("cost", T.DoubleType(), False),
    ]
)

AWARD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("units", T.DoubleType(), False),
        T.StructField("cost", T.DoubleType(), False),
    ]
)

SHIFT_DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("start", T.LongType(), True),
        T.StructField("finish", T.LongType(), True),
        T.StructField("breaks", T.ArrayType(BREAK_SCHEMA), False),
        T.StructField("allowances", T.ArrayType(ALLOWANCE_SCHEMA), False),
        T.StructField("award_interpretations", T.ArrayType(AWARD_SCHEMA), False),
    ]
)

# Page envelope (reference api/app/models.py:46-65)
PAGE_SCHEMA = T.StructType(
    [
        T.StructField("results", T.ArrayType(SHIFT_DOC_SCHEMA), False),
        T.StructField(
            "links",
            T.StructType(
                [
                    T.StructField("base", T.StringType(), True),
                    T.StructField("prev", T.StringType(), True),
                    T.StructField("next", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("start", T.IntegerType(), True),
        T.StructField("limit", T.IntegerType(), True),
        T.StructField("size", T.IntegerType(), True),
    ]
)

# --------------------------------------------------------------------------
# Flattened relational tables (sink schema; reference initdb.sql:3-46)
# --------------------------------------------------------------------------

SHIFTS_SCHEMA = T.StructType(
    [
        T.StructField("shift_id", T.StringType(), False),
        T.StructField("shift_date", T.DateType(), False),
        T.StructField("shift_start", T.TimestampType(), True),
        T.StructField("shift_finish", T.TimestampType(), True),
        T.StructField("shift_cost", T.DecimalType(13, 4), True),
    ]
)

BREAKS_SCHEMA = T.StructType(
    [
        T.StructField("break_id", T.StringType(), False),
        T.StructField("shift_id", T.StringType(), False),
        T.StructField("break_start", T.TimestampType(), True),
        T.StructField("break_finish", T.TimestampType(), True),
        T.StructField("is_paid", T.BooleanType(), False),
    ]
)

ALLOWANCES_SCHEMA = T.StructType(
    [
        T.StructField("allowance_id", T.StringType(), False),
        T.StructField("shift_id", T.StringType(), False),
        T.StructField("allowance_value", T.DoubleType(), False),
        T.StructField("allowance_cost", T.DecimalType(13, 4), True),
    ]
)

AWARDS_SCHEMA = T.StructType(
    [
        T.StructField("award_id", T.StringType(), False),
        T.StructField("shift_id", T.StringType(), False),
        T.StructField("award_date", T.DateType(), False),
        T.StructField("award_units", T.DoubleType(), False),
        T.StructField("award_cost", T.DecimalType(13, 4), True),
    ]
)

KPIS_SCHEMA = T.StructType(
    [
        T.StructField("kpi_name", T.StringType(), False),
        T.StructField("kpi_date", T.DateType(), False),
        T.StructField("kpi_value", T.DecimalType(8, 2), True),
    ]
)

TABLE_SCHEMAS = {
    "shifts": SHIFTS_SCHEMA,
    "breaks": BREAKS_SCHEMA,
    "allowances": ALLOWANCES_SCHEMA,
    "award_interpretations": AWARDS_SCHEMA,
    "kpis": KPIS_SCHEMA,
}

# Primary keys / foreign keys (reference initdb.sql) — Spark enforces nothing,
# so these drive the pre-write validation pass in operators/quality.py.
PRIMARY_KEYS = {
    "shifts": "shift_id",
    "breaks": "break_id",
    "allowances": "allowance_id",
    "award_interpretations": "award_id",
}
FOREIGN_KEYS = {  # child -> (key, parent)
    "breaks": ("shift_id", "shifts"),
    "allowances": ("shift_id", "shifts"),
    "award_interpretations": ("shift_id", "shifts"),
}

# Driver testdata tables (TESTDATA.md / FIXTURES.md §6)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
