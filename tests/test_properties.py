"""Property-based invariants (hypothesis) over the flatten + KPI layers —
SURVEY §5's 'property-style spot checks', generalized to random nested docs."""

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from shifts_etl_spark.operators import flatten
from shifts_etl_spark.schemas import SHIFT_DOC_SCHEMA

EPOCH_MS = st.integers(min_value=1, max_value=2_000_000_000_000)
COST = st.floats(min_value=0.0, max_value=1000.0, allow_nan=False, width=32)


@st.composite
def shift_doc(draw, idx: int = 0):
    n_breaks = draw(st.integers(0, 2))
    n_allow = draw(st.integers(0, 3))
    n_awards = draw(st.integers(0, 3))
    uid = draw(st.uuids())
    day = draw(st.dates(dt.date(2020, 1, 1), dt.date(2024, 12, 31)))
    return {
        "id": str(uid),
        "date": day.isoformat(),
        "start": draw(st.one_of(st.none(), EPOCH_MS)),
        "finish": draw(st.one_of(st.none(), EPOCH_MS)),
        "breaks": [
            {
                "id": f"{uid}-b{i}",
                "start": draw(EPOCH_MS),
                "finish": draw(EPOCH_MS),
                "paid": draw(st.booleans()),
            }
            for i in range(n_breaks)
        ],
        "allowances": [
            {"id": f"{uid}-al{i}", "value": 0.5, "cost": draw(COST)}
            for i in range(n_allow)
        ],
        "award_interpretations": [
            {
                "id": f"{uid}-aw{i}",
                "date": day.isoformat(),
                "units": 1.0,
                "cost": draw(COST),
            }
            for i in range(n_awards)
        ],
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(shift_doc(), min_size=1, max_size=6, unique_by=lambda d: d["id"]))
def test_flatten_invariants(spark, docs):
    df = spark.createDataFrame(docs, SHIFT_DOC_SCHEMA)
    tables = flatten.flatten_all(df)

    # row-count conservation
    assert tables["shifts"].count() == len(docs)
    assert tables["breaks"].count() == sum(len(d["breaks"]) for d in docs)
    assert tables["allowances"].count() == sum(len(d["allowances"]) for d in docs)

    # cost fold == python reference semantics (round to 4)
    got = {r.shift_id: float(r.shift_cost) for r in tables["shifts"].collect()}
    for d in docs:
        want = round(
            math.fsum(a["cost"] for a in d["allowances"])
            + math.fsum(a["cost"] for a in d["award_interpretations"]),
            4,
        )
        assert abs(got[d["id"]] - want) < 1e-6, d["id"]

    # every child key exists in shifts (FK invariant by construction)
    orphans = tables["breaks"].join(
        tables["shifts"].select("shift_id"), "shift_id", "left_anti"
    )
    assert orphans.count() == 0


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(EPOCH_MS | st.none() | st.just(0), min_size=1, max_size=20))
def test_epoch_guard_properties(spark, values):
    from shifts_etl_spark.functions.scalars import epoch_ms_to_ts

    df = spark.createDataFrame([(v,) for v in values], "ms: long")
    out = df.select("ms", epoch_ms_to_ts("ms").alias("ts")).collect()
    for r in out:
        if r.ms is None or r.ms <= 0:
            assert r.ts is None
        else:
            want = dt.datetime.fromtimestamp(r.ms // 1000, dt.timezone.utc)
            assert r.ts.replace(tzinfo=dt.timezone.utc) == want
