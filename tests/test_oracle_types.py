"""Guards against DuckDB oracle type-drift.

The driver hashes the Arrow-typed DuckDB result of every oracle_sql()
entry; types with no Spark equivalent (HUGEINT from SUM-of-int, unsigned
ints) hash-mismatch even when the Python-native values are identical —
the exact failure class behind the round-3/4 driver reds (q38, q40, x50,
x52, x53, x75, x78). Two tests pin it shut:

1. every registered oracle types clean in DuckDB at sf0.001, and
2. the local gate's exotic_type_problems() actually fires on an uncast
   SUM (a reverted-cast replica of Q38), so the guard can't rot.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from shifts_etl_spark.schemas import TESTDATA_TABLES
from tools.check_correctness import EXOTIC_DUCK_TYPES, exotic_type_problems

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_emits_exotic_types(con):
    bad = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = con.sql(sql)
        exotic = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) in EXOTIC_DUCK_TYPES
        ]
        if exotic:
            bad[name] = exotic
    assert not bad, (
        f"oracles emitting driver-unhashable DuckDB types: {bad} — "
        f"CAST(... AS BIGINT) the offending aggregates"
    )


def test_guard_fires_on_uncast_sum(con):
    # Reverted-cast replica of Q38's SUM(first_seen) OVER: DuckDB types
    # an uncast SUM of INTEGER window values as HUGEINT.
    uncast = """
    SELECT user_id,
           SUM(1) OVER (PARTITION BY user_id ORDER BY event_id) AS n
    FROM events WHERE user_id < 3
    """
    problems = exotic_type_problems("uncast_replica", con, uncast)
    assert problems, "guard must flag an uncast SUM window (HUGEINT)"
    assert "HUGEINT" in problems[0] and "'n'" in problems[0]

    cast = uncast.replace("SUM(1) OVER", "CAST(SUM(1) OVER").replace(
        "ORDER BY event_id)", "ORDER BY event_id) AS BIGINT)"
    )
    assert exotic_type_problems("cast_replica", con, cast) == []
