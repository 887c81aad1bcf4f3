"""Arrow-batched user-defined AGGREGATES and co-grouped maps — the two
UDF quadrants the built-in operators don't already cover here (scalar
Pandas UDFs: simsearch/multimodal; grouped-map-with-state:
streaming/stateful.py; mapInPandas: multimodal).

Both are the sanctioned slow path: Arrow-batched, vectorized inside the
worker, and only justified when the semantics need real numpy/pandas —
a plain weighted mean stays JVM-side (`F.sum(x*w)/F.sum(w)`); the UDAF
exists to prove the surface and as the template for true custom
aggregates (e.g. exact medians of small groups).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F  # noqa: F401
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# DoubleType() not "double": the DDL-string form parses via the active
# session, which breaks importing this module before a session exists
@pandas_udf(DoubleType())
def weighted_mean(x: pd.Series, w: pd.Series) -> float:
    """GROUPED_AGG Pandas UDF: Σxw/Σw per group, one Arrow batch per
    group partition. NULL weights/values are dropped pairwise."""
    m = x.notna() & w.notna()
    sw = w[m].sum()
    return float((x[m] * w[m]).sum() / sw) if sw else None


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join via cogrouped applyInPandas + pd.merge_asof —
    the vectorized-Python twin of operators/asof.py (JVM union +
    carry-forward window), kept as a cross-validation oracle and as the
    template for per-key pandas logic Spark expressions can't reach.
    Both sides shuffle once on the key; each cogroup is two in-memory
    pandas frames, so per-key volume must fit a worker (the JVM variant
    has no such bound — prefer it in production). Payload column names
    must not collide with left-side names (same contract as any join)."""
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key, ts_col)]
    # re-alias the right side: when both frames derive from one source
    # their columns share expression ids and the cogroup plan dedupes the
    # "duplicate" right-side attributes away (observed: right.ts pruned)
    right = right.select([F.col(c).alias(c) for c in right.columns])
    l_cols = left.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in left.schema.fields
    )
    r_schema = {f.name: f for f in right.schema.fields}
    out_schema += f", asof_ts {r_schema[ts_col].dataType.simpleString()}"
    for c in payload_cols:
        out_schema += f", {c} {r_schema[c].dataType.simpleString()}"

    def join_group(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # an empty cogroup side arrives as a COLUMN-LESS frame (PySpark
        # quirk) — inner semantics drop those groups either way
        if l.empty or r.empty:
            return pd.DataFrame(columns=l_cols + ["asof_ts"] + payload_cols)
        r = r[[ts_col] + payload_cols].rename(columns={ts_col: "asof_ts"})
        merged = pd.merge_asof(
            l.sort_values(ts_col),
            r.sort_values("asof_ts"),
            left_on=ts_col,
            right_on="asof_ts",
            direction="backward",
        )
        return merged.dropna(subset=["asof_ts"])  # inner semantics

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(join_group, out_schema)
    )
