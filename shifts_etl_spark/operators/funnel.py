"""Product-analytics operators over the events stream: weekly cohort
retention and ordered funnel conversion — the two rollups every
large-scale event pipeline ships (and classic OLAP benchmarks model).

Extension ops beyond the reference surface (reference has no event
analytics; its query style is the KPI aggregate family,
etl/app/shift_data_processor.py:225-279). Both are pure built-in
expression pipelines: no Python in the hot path, every shuffle keyed and
map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the calendar
    week (ISO Monday truncation) of their first event; for every
    (cohort_week, week_offset) cell, how many cohort members were active
    that many calendar weeks later, and what fraction of the cohort that
    is. Offset 0 always holds the full cohort (a user's first event is in
    their cohort week), so ``retention`` starts at 1.0 and decays.

    Week offsets are calendar-week differences (datediff of the two
    Monday truncations / 7), not rolling 7-day buckets — exact integer
    date arithmetic that both Spark and DuckDB compute identically, with
    no epoch-precision wobble.

    Scale shape: the first-event time comes from a per-user window min
    (ONE shuffle keyed on user, no self-join); the activity matrix is a
    distinct over (cohort, offset, user) — map-side combinable, carrying
    (date, long, long) rows only; cohort sizes are the offset-0 slice of
    the same counts, broadcast back onto the |weeks|^2-row cell table.
    Nothing row-sized survives past the distinct."""
    w = Window.partitionBy(user_col)
    cohorted = events.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("event_week"),
        F.date_trunc("week", F.min(ts_col).over(w))
        .cast("date")
        .alias("cohort_week"),
    )
    active = cohorted.select(
        "cohort_week",
        (F.datediff("event_week", "cohort_week") / 7)
        .cast("long")
        .alias("week_offset"),
        "user_id",
    ).distinct()
    counts = active.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    sizes = counts.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return counts.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )


def funnel_conversion(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: a user reaches step i+1 only with an event of that
    type STRICTLY AFTER their step-i reach time (earliest valid time is
    kept at every step, which maximizes downstream reach). One row per
    step: users reaching it, conversion from the top of the funnel, and
    conversion from the previous step (step 1 pins both at 1.0 of
    itself).

    Scale shape: step i is one filtered scan of that event type joined
    to the current |users|-row reach frame on user (hash join, keyed
    shuffle) and re-minimized — k-1 bounded passes for a k-step funnel,
    never a per-user sort of full histories. The final conversions run
    on the k-row summary via a k-row window (sanctioned single-partition
    shape)."""
    reach = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(ts_col).alias("t"))
    )
    summaries = [
        reach.agg(
            F.lit(1).alias("step_idx"),
            F.lit(steps[0]).alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
    ]
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == s)
            .select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts2"))
            .join(reach, "user_id")
            .where(F.col("ts2") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ts2").alias("t"))
        )
        summaries.append(
            nxt.agg(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
        reach = nxt
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    w = Window.orderBy("step_idx")
    top = F.first("n_users").over(
        Window.orderBy("step_idx").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    prev = F.lag("n_users").over(w)
    return out.select(
        "step_idx",
        "step",
        "n_users",
        F.round(F.col("n_users").cast("double") / top, 6).alias("conv_from_top"),
        F.round(
            F.col("n_users").cast("double") / F.coalesce(prev, F.col("n_users")),
            6,
        ).alias("conv_from_prev"),
    )


def rfm_segments(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """RFM segmentation rollup: score every user 1-4 on Recency (days
    since last event, lower = better), Frequency (event count), and
    Monetary (summed value) against the corpus quartile boundaries, then
    report each (r, f, m) segment's population and mean behavior — the
    classic activity segmentation a growth pipeline feeds back into
    sampling and targeting.

    Scale shape: one per-user aggregate (keyed shuffle, map-side
    combinable) produces the |users|-row metric frame; quartile
    boundaries are ONE 1-row exact-percentile aggregate broadcast back
    (no global sort, no ntile over a single partition — the scoring is
    pure comparisons); the final rollup lands on <= 64 segment cells.
    Monetary rounds to 4 dp before scoring so partial-sum order wobble
    cannot flip a boundary comparison against the oracle."""
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.max(ts_col).alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(F.sum(value_col), 4).alias("monetary"),
    )
    glob = per_user.agg(
        F.max("last_ts").alias("now_ts"),
        F.percentile("frequency", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75)])).alias("f_q"),
        F.percentile("monetary", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75)])).alias("m_q"),
    )
    scored0 = per_user.crossJoin(F.broadcast(glob)).select(
        "user_id",
        "frequency",
        "monetary",
        F.datediff(F.col("now_ts").cast("date"), F.col("last_ts").cast("date"))
        .cast("long")
        .alias("recency_days"),
        "f_q",
        "m_q",
    )
    r_q = scored0.agg(
        F.percentile(
            "recency_days", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75)])
        ).alias("r_q")
    )

    def score(col, q, reverse=False):
        s = (
            F.when(col <= F.round(q[0], 6), 1)
            .when(col <= F.round(q[1], 6), 2)
            .when(col <= F.round(q[2], 6), 3)
            .otherwise(4)
        )
        return (F.lit(5) - s) if reverse else s

    scored = scored0.crossJoin(F.broadcast(r_q)).select(
        "user_id",
        "frequency",
        "monetary",
        # low recency_days = recent = best -> invert so 4 is best
        score(F.col("recency_days").cast("double"), F.col("r_q"), reverse=True).alias("r_score"),
        score(F.col("frequency").cast("double"), F.col("f_q")).alias("f_score"),
        score(F.col("monetary"), F.col("m_q")).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.avg("frequency"), 6).alias("avg_frequency"),
        F.round(F.avg("monetary"), 6).alias("avg_monetary"),
    )


def type_cooccurrence_lift(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Market-basket lift between event types: for every unordered type
    pair, the users exhibiting both, the support and confidence, and the
    lift over independence — which behaviors actually travel together
    (lift > 1) vs merely being common.

    Scale shape: the corpus collapses to distinct (user, type) rows
    first (keyed shuffle, map-side combinable); the pair self-join is
    co-partitioned on user with per-user fan-out bounded by C(|types|,
    2); marginals and the user total are type-sized / 1-row broadcasts
    onto the |types|^2-cell grid."""
    utypes = events.select(
        F.col(user_col).alias("user_id"), F.col(type_col).alias("etype")
    ).distinct()
    n_total = utypes.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_users_total")
    )
    marg = utypes.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_type")
    )
    a = utypes.select("user_id", F.col("etype").alias("type_a"))
    b = utypes.select("user_id", F.col("etype").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    ma = marg.select(F.col("etype").alias("type_a"), F.col("n_type").alias("n_a"))
    mb = marg.select(F.col("etype").alias("type_b"), F.col("n_type").alias("n_b"))
    nd = F.col("n_users_total").cast("double")
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(F.col("n_both") / nd, 6).alias("support"),
            F.round(
                F.col("n_both").cast("double") / F.col("n_a"), 6
            ).alias("confidence"),
            F.round(
                (F.col("n_both") * nd)
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


def session_top_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    top_k: int = 20,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top event-type paths by session: sessionize each user's stream at
    a ``gap_minutes`` inactivity gap (gaps-and-islands over the per-user
    window), render each session as its ordered '>'-joined type string,
    and return the ``top_k`` most common paths — the navigation summary
    every product pipeline reports.

    Determinism: events order by (ts, event_id) inside the session;
    gaps compare whole truncated seconds (identical to date_diff
    'second' semantics); the top-k tiebreak is (count desc, path asc).

    Scale shape: one keyed shuffle on user for the session window; the
    path assembly sorts structs WITHIN each (user, session) aggregate
    row (array_sort on the collected structs, not a second shuffle);
    path counts partially aggregate map-side; the final top-k is
    TakeOrdered (per-partition heads + driver merge of top_k rows),
    never a global sort."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    marked = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("etype"),
        F.when(gap > gap_minutes * 60, 1).otherwise(0).alias("is_new"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = marked.select(
        "user_id",
        "ts",
        "event_id",
        "etype",
        F.sum("is_new").over(w2).alias("session_no"),
    )
    paths = (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "etype"))
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                ">", F.transform("evs", lambda x: x["etype"])
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    return counts.orderBy(F.desc("n_sessions"), "path").limit(top_k)


def interarrival_profile(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    max_bucket: int = 17,
) -> DataFrame:
    """Per-type cadence profile: the distribution of inter-arrival gaps
    between a user's consecutive events, bucketed into power-of-2 second
    bands and attributed to the LATTER event's type — the signal that
    separates burst behaviors (errors, clicks) from slow cycles
    (purchases), and the input to bot/replay detection. One row per
    (event_type, gap_bucket): count and within-type share.

    Bucket rule (exact integer compares, no float log): bucket 0 holds
    gaps <= 1 s; bucket k holds gaps in (2^(k-1), 2^k] seconds;
    ``max_bucket`` is the overflow band. Gaps are whole truncated
    seconds (Spark unix_timestamp diff == DuckDB date_diff('second')),
    so both engines bucket identically.

    Scale shape: one keyed shuffle on user for the lag window; the
    profile collapses to |types| x |buckets| cells map-side; the
    within-type totals are a types-sized broadcast back onto the
    cells."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = (
        F.unix_timestamp(F.col(ts_col))
        - F.unix_timestamp(F.lag(ts_col).over(w))
    ).alias("gap_s")
    bucket = F.when(F.col("gap_s") <= 1, 0)
    for k in range(1, max_bucket):
        bucket = bucket.when(F.col("gap_s") <= (1 << k), k)
    bucket = bucket.otherwise(max_bucket)
    cells = (
        events.select(F.col(type_col).alias("event_type"), gap)
        .where(F.col("gap_s").isNotNull())
        .select("event_type", bucket.alias("gap_bucket"))
        .groupBy("event_type", "gap_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("n_gaps").cast("long").alias("n_type")
    )
    return cells.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "gap_bucket",
        "n_gaps",
        F.round(F.col("n_gaps").cast("double") / F.col("n_type"), 6).alias(
            "share"
        ),
    )


def hourly_bursts(
    events: DataFrame,
    z_threshold: float = 3.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Burst detection on the event stream: count each (event_type,
    hour) cell, z-score every cell against its type's mean/stddev hourly
    rate (population stddev over OBSERVED hours — silent hours are not
    zero-filled), and flag cells ``z_threshold`` deviations hot — the
    incident/abuse monitor a pipeline runs before trusting volume-
    sensitive downstream stats.

    Scale shape: events collapse to |types| x |hours| cells in one
    map-side-combinable aggregate; the per-type moments are a
    types-sized broadcast back onto the cells. z rounds to 6 dp to
    absorb partial-sum order wobble in the stddev."""
    cells = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("hour"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    stats = cells.groupBy("event_type").agg(
        F.avg("n_events").alias("mean_n"),
        F.stddev_pop("n_events").alias("sd_n"),
    )
    z = F.when(
        F.col("sd_n") > 0,
        F.round((F.col("n_events") - F.col("mean_n")) / F.col("sd_n"), 6),
    ).otherwise(F.lit(0.0))
    return cells.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hour",
        "n_events",
        F.round("mean_n", 6).alias("mean_hourly"),
        z.alias("z_score"),
        (z >= z_threshold).alias("is_burst"),
    )


def user_concentration(
    events: DataFrame,
    top_k: int = 10,
    user_col: str = "user_id",
) -> DataFrame:
    """Traffic-concentration audit: how dominated is the event stream by
    its heaviest users — the Herfindahl-Hirschman index (sum of squared
    user shares; 1/n_users = uniform, 1.0 = single user) plus the share
    held by the top ``top_k`` users. The skew early-warning for any
    per-user keyed operator downstream (a high HHI predicts hot keys).

    Scale shape: one per-user count (keyed, map-side combinable); HHI
    is a closed-form 1-row aggregate over those counts — NO global sort
    or rank; the top-k sum is TakeOrdered (per-partition heads), and its
    value is tie-invariant (equal counts swap users, not the sum)."""
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_u")
    )
    totals = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_u").cast("long").alias("n_events"),
        F.sum(F.col("n_u").cast("double") * F.col("n_u")).alias("sum_sq"),
    )
    top = (
        per_user.orderBy(F.desc("n_u"), "user_id")
        .limit(top_k)
        .agg(F.sum("n_u").cast("long").alias("top_events"))
    )
    return totals.crossJoin(F.broadcast(top)).select(
        "n_users",
        "n_events",
        F.round(
            F.col("sum_sq")
            / (F.col("n_events").cast("double") * F.col("n_events")),
            6,
        ).alias("hhi"),
        F.round(
            F.col("top_events").cast("double") / F.col("n_events"), 6
        ).alias(f"top{top_k}_share"),
    )


def acquisition_mix(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    cust_col: str = "o_custkey",
) -> DataFrame:
    """New-vs-returning mix by month: for every order month, how many
    orders and distinct customers it saw, how many of those customers
    were NEW (their first-ever order month), and the new share — the
    acquisition report that complements x107's retention matrix (that
    one follows cohorts forward; this one decomposes each period's
    mix).

    Scale shape: the first-order month is a per-customer window min
    (one keyed shuffle); the monthly rollup is one aggregate over
    (month, customer, is_new) rows with distinct counts — map-side
    combinable after the distinct."""
    w = Window.partitionBy(cust_col)
    base = orders.select(
        F.date_trunc("month", F.col(date_col)).cast("date").alias("month"),
        F.col(cust_col).alias("custkey"),
        F.date_trunc("month", F.min(date_col).over(w))
        .cast("date")
        .alias("first_month"),
    )
    return (
        base.select(
            "month",
            "custkey",
            (F.col("month") == F.col("first_month")).alias("is_new"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("custkey").cast("long").alias("n_customers"),
            F.countDistinct(
                F.when(F.col("is_new"), F.col("custkey"))
            )
            .cast("long")
            .alias("n_new_customers"),
        )
        .select(
            "month",
            "n_orders",
            "n_customers",
            "n_new_customers",
            F.round(
                F.col("n_new_customers").cast("double") / F.col("n_customers"),
                6,
            ).alias("new_customer_share"),
        )
    )


def transition_matrix(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    every (prev_type, next_type) pair observed consecutively within a
    user's history, the transition count, P(next | prev), the marginal
    P(next), and the lift of the conditional over the marginal — which
    behaviors actually FOLLOW each other vs merely being common (the
    sequence-model sanity check under x65's trigram counts).

    Scale shape: one keyed lag window on user; transitions collapse to
    |types|^2 cells map-side; row totals and the grand total are
    type-sized / 1-row broadcasts back onto the cells."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    trans = (
        events.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    from_tot = trans.groupBy("prev_type").agg(
        F.sum("n_trans").cast("long").alias("n_from")
    )
    to_tot = trans.groupBy("next_type").agg(
        F.sum("n_trans").cast("long").alias("n_to")
    )
    grand = trans.agg(F.sum("n_trans").cast("double").alias("n_all"))
    p_cond = F.col("n_trans").cast("double") / F.col("n_from")
    p_marg = F.col("n_to") / F.col("n_all")
    return (
        trans.join(F.broadcast(from_tot), "prev_type")
        .join(F.broadcast(to_tot), "next_type")
        .crossJoin(F.broadcast(grand))
        .select(
            "prev_type",
            "next_type",
            "n_trans",
            F.round(p_cond, 6).alias("p_next_given_prev"),
            F.round(p_marg, 6).alias("p_next"),
            F.round(p_cond / p_marg, 6).alias("lift"),
        )
    )


def rate_anomalies(
    events: DataFrame,
    top_k: int = 20,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Bot/replay-abuse audit: the ``top_k`` users by peak events-per-
    minute, with volume and active-minute context — superhuman burst
    rates are the first-line automation signal, and the rest of the
    per-user keyed pipeline wants these ids quarantined first.

    Scale shape: events collapse to (user, minute) cells in one map-
    side-combinable aggregate; the per-user rollup is a second keyed
    aggregate over cells; the final top-k is TakeOrdered with a (peak
    desc, user asc) total order — no global sort."""
    cells = events.groupBy(
        F.col(user_col).alias("user_id"),
        F.date_trunc("minute", F.col(ts_col)).alias("minute"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    per_user = cells.groupBy("user_id").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_active_minutes"),
        F.max("n").cast("long").alias("peak_per_minute"),
    )
    return (
        per_user.select(
            "user_id",
            "n_events",
            "n_active_minutes",
            "peak_per_minute",
            F.round(
                F.col("n_events").cast("double") / F.col("n_active_minutes"),
                4,
            ).alias("mean_per_active_minute"),
        )
        .orderBy(F.desc("peak_per_minute"), "user_id")
        .limit(top_k)
    )


def weekday_seasonality(
    orders: DataFrame,
    date_col: str = "o_orderdate",
) -> DataFrame:
    """Weekday-seasonality audit with a chi-square uniformity test: per
    ISO weekday (1 = Monday), the order count, its share, the expected
    uniform count, the relative deviation, and the day's chi-square
    contribution — sum the last column for the test statistic. Exact
    integer counts feed a closed-form statistic, so both engines agree
    bit-for-bit.

    Scale shape: one 7-cell aggregate off a row-local weekday
    projection; the total broadcasts back."""
    cells = orders.select(
        F.dayofweek(F.col(date_col)).alias("dow_sun1")
    ).select(
        # ISO: Monday = 1 ... Sunday = 7 (dayofweek is Sunday = 1)
        ((F.col("dow_sun1") + 5) % 7 + 1).cast("long").alias("weekday")
    ).groupBy("weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    tot = cells.agg(F.sum("n_orders").cast("double").alias("n_total"))
    e = F.col("n_total") / 7.0
    return cells.crossJoin(F.broadcast(tot)).select(
        "weekday",
        "n_orders",
        F.round(F.col("n_orders") / F.col("n_total"), 6).alias("share"),
        F.round(e, 4).alias("expected"),
        F.round(F.col("n_orders") / e - 1.0, 6).alias("deviation"),
        F.round(
            (F.col("n_orders") - e) * (F.col("n_orders") - e) / e, 6
        ).alias("chi2_contrib"),
    )


def value_streaks(
    events: DataFrame,
    top_k: int = 5,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hot-streak detection on the daily event-value series: the
    ``top_k`` longest runs of consecutive OBSERVED days whose daily mean
    value sits above the overall daily-mean average — the
    change-onset report a monitoring pipeline publishes when a metric
    runs hot for days at a time. One row per streak: start/end dates,
    length, and the streak's mean relative lift.

    Determinism: daily means compare as integer-micro quantities
    (value x 1e6 summed exactly / count), so the above/below split and
    every streak boundary are engine-exact.

    Scale shape: events collapse to |days| cells in one aggregate;
    islands number via the classic two-rank trick (day rank minus
    above-run rank is constant within a run) on the calendar-bounded
    cell frame; the top-k is TakeOrdered."""
    daily = events.groupBy(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col(value_col) * 1e6).cast("long")).alias("micro"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    glob = daily.agg(
        F.sum("micro").cast("double").alias("g_micro"),
        F.sum("n").cast("double").alias("g_n"),
    )
    marked = daily.crossJoin(F.broadcast(glob)).select(
        "day",
        (F.col("micro").cast("double") / F.col("n")).alias("day_mean_micro"),
        (F.col("g_micro") / F.col("g_n")).alias("glob_mean_micro"),
        (
            F.col("micro").cast("double") / F.col("n")
            > F.col("g_micro") / F.col("g_n")
        ).alias("above"),
    )
    from pyspark.sql import Window

    runs = (
        marked.where(F.col("above"))
        .select(
            "day",
            "day_mean_micro",
            "glob_mean_micro",
            (
                F.row_number().over(Window.orderBy("day"))
            ).alias("rk"),
        )
        .select(
            "*",
            F.date_sub(F.col("day"), F.col("rk")).alias("anchor"),
        )
    )
    return (
        runs.groupBy("anchor")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(
                F.avg(
                    F.col("day_mean_micro") / F.col("glob_mean_micro") - 1.0
                ),
                6,
            ).alias("mean_lift"),
        )
        .drop("anchor")
        .orderBy(F.desc("n_days"), "start_day")
        .limit(top_k)
    )


def deseasonalized_anomalies(
    orders: DataFrame,
    z_threshold: float = 2.0,
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
) -> DataFrame:
    """Weekday-adjusted daily revenue anomalies: divide each day's
    revenue by its ISO-weekday seasonal factor (weekday mean over the
    global daily mean), z-score the deseasonalized series, and emit the
    days beyond ``z_threshold`` — the x125/x136 composition that stops
    a Sunday from paging just for being a Sunday.

    Scale shape: orders collapse to |days| integer-cents cells in one
    aggregate; the 7-row weekday factor table and 1-row global moments
    broadcast back. z rounds at 6 dp (the hourly_bursts convention)."""
    daily = orders.groupBy(F.col(date_col).alias("day")).agg(
        F.sum(F.round(F.col(price_col) * 100).cast("long")).alias("rev_cents")
    )
    daily = daily.select("day", "rev_cents", F.dayofweek("day").alias("weekday"))
    wk = daily.groupBy("weekday").agg(F.avg("rev_cents").alias("wk_mean"))
    glob = daily.agg(F.avg("rev_cents").alias("g_mean"))
    deseason = (
        daily.join(F.broadcast(wk), "weekday")
        .crossJoin(F.broadcast(glob))
        .select(
            "day",
            "weekday",
            "rev_cents",
            (F.col("rev_cents") / (F.col("wk_mean") / F.col("g_mean"))).alias("adj"),
        )
    )
    moments = deseason.agg(
        F.avg("adj").alias("m"), F.stddev_pop("adj").alias("sd")
    )
    z = F.when(
        F.col("sd") > 0, F.round((F.col("adj") - F.col("m")) / F.col("sd"), 6)
    ).otherwise(F.lit(0.0))
    return (
        deseason.crossJoin(F.broadcast(moments))
        .select(
            "day",
            "weekday",
            F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("adj") / 100.0, 2).alias("deseasonalized"),
            z.alias("z_score"),
        )
        .where(F.abs(F.col("z_score")) >= z_threshold)
        .orderBy("day")
    )


def heavy_user_profile(
    events: DataFrame,
    top_k: int = 20,
    n_salts: int = 16,
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Skew-proof heavy-user profile: per user, event count, exact
    distinct event-type count, and exact micro-summed value — built so
    no single reducer ever owns a hot user's full event stream, the
    pattern that keeps a power-law user distribution (one user = 5% of
    a 100 TB stream) from OOMing a task:

      * counts/sums pre-combine per (user, salt) — ``n_salts``
        deterministic md5 shards — then fold salt partials per user, so
        the widest exchange carries at most ``n_salts`` rows per user;
      * COUNT(DISTINCT type) runs as the two-stage pair collapse —
        dedupe on (user, type) first (the type key spreads a hot user
        across reducers), then count pairs per user — never a
        distinct-set held in one aggregation buffer.

    Result (top ``top_k`` by event count, user id tie-break) is plan-
    for-plan equal to the naive single groupBy — the oracle proves it.

    Determinism: integer counts, integer-micro value sums; the salt is
    content-addressed (md5 of event id), not random."""
    salt = (
        F.ascii(F.substring(F.md5(F.col("event_id").cast("string")), 1, 1))
        % n_salts
    )
    partial = (
        events.select(
            F.col(user_col).alias("user_id"),
            salt.alias("salt"),
            F.round(F.col(value_col) * 1e6).cast("long").alias("micro"),
        )
        .groupBy("user_id", "salt")
        .agg(
            F.count(F.lit(1)).cast("long").alias("pn"),
            F.sum("micro").alias("pmicro"),
        )
    )
    folded = partial.groupBy("user_id").agg(
        F.sum("pn").cast("long").alias("n_events"),
        F.sum("pmicro").alias("micro"),
    )
    pairs = (
        events.select(
            F.col(user_col).alias("user_id"), F.col(type_col).alias("t")
        )
        .groupBy("user_id", "t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    )
    return (
        folded.join(pairs, "user_id")
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.round(F.col("micro") / 1e6, 4).alias("total_value"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(top_k)
    )


def revenue_trend(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
    group_col: str = "o_orderpriority",
) -> DataFrame:
    """Revenue time-trend per group: population OLS of daily revenue on
    the day index (days since the global first order date), one row per
    group with (n_days, slope per day, intercept, r2) — the
    trend-detection rollup behind "is this segment growing or decaying",
    and the regression twin of x125's moving average.

    Determinism: daily revenue quantizes to integer cents and the day
    index is an exact integer, so the regression moments are sums of
    exact products; slope/intercept/r2 round at 4/4/6 dp.

    Scale shape: orders collapse to (group, day) cells in one
    map-side-combinable aggregate; the global min date is a broadcast
    1-row scalar; the regression is a G-cell aggregate via the built-in
    regr_* family (JVM-side, no UDF)."""
    daily = orders.groupBy(
        F.col(group_col).alias("grp"),
        F.col(date_col).alias("day"),
    ).agg(
        F.sum(F.round(F.col(price_col) * 100).cast("long")).alias("cents")
    )
    t0 = daily.agg(F.min("day").alias("d0"))
    pts = daily.crossJoin(F.broadcast(t0)).select(
        "grp",
        F.datediff("day", "d0").cast("double").alias("x"),
        (F.col("cents").cast("double") / 100.0).alias("y"),
    )
    return pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.regr_slope("y", "x"), 4).alias("slope_per_day"),
        F.round(F.regr_intercept("y", "x"), 4).alias("intercept"),
        F.round(F.regr_r2("y", "x"), 6).alias("r2"),
    ).select(
        F.col("grp").alias(group_col),
        "n_days",
        "slope_per_day",
        "intercept",
        "r2",
    )


def basket_lift(
    lineitem: DataFrame,
    part: DataFrame,
    min_pair_orders: int = 2,
) -> DataFrame:
    """Market-basket association mining at the brand level: for every
    pair of brands co-purchased in the same order, the support and the
    lift P(a,b) / (P(a)·P(b)) — the classic affinity signal behind
    "customers who bought X" (brand-level, so the pair space is
    bounded at |brands|² regardless of corpus size). One row per
    unordered brand pair with at least ``min_pair_orders`` co-orders.

    Scale shape: the lineitem->part attachment is a partkey-keyed
    equi join (co-partitioned shuffle; part is NOT broadcast — at 100
    TB the dimension outgrows a broadcast); baskets collapse to
    distinct (order, brand) rows (<= 25 per order); the pair self-join
    is orderkey-keyed with per-order fan-out bounded by |brands|²; the
    rollup and the brand marginals are brand-keyed cells with the
    1-row order total broadcast back. Lift folds from exact integer
    counts, rounded at 6 dp."""
    items = lineitem.select("l_orderkey", "l_partkey").join(
        part.select(
            F.col("p_partkey").alias("l_partkey"), "p_brand"
        ),
        "l_partkey",
    )
    baskets = items.select(
        F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
    ).distinct()
    n_orders = baskets.groupBy().agg(
        F.count_distinct("okey").cast("double").alias("n_orders")
    )
    marg = baskets.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_brand")
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(b, "okey")
        .where(F.col("a.brand") < F.col("b.brand"))
        .groupBy(
            F.col("a.brand").alias("brand_a"),
            F.col("b.brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_orders)
    )
    return (
        pairs.join(
            marg.select(
                F.col("brand").alias("brand_a"),
                F.col("n_brand").alias("n_a"),
            ),
            "brand_a",
        )
        .join(
            marg.select(
                F.col("brand").alias("brand_b"),
                F.col("n_brand").alias("n_b"),
            ),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(F.col("n_pair") / F.col("n_orders"), 6).alias("support"),
            F.round(
                F.col("n_pair") * F.col("n_orders")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Rolling N-day active users — the WAU/MAU family, computed EXACTLY
    at scale: per calendar day, how many distinct users appeared in the
    trailing ``window_days`` window, plus the window's event volume.

    The scale trick: a naive sliding COUNT(DISTINCT) re-scans N days of
    raw events per day. Instead the stream collapses once to (user, day)
    cells (the only corpus-sized aggregate), each cell fans out to the N
    window-ends it contributes to (xN on the CELL frame, which is
    |users|x|days| at worst — orders of magnitude under the event
    count), and the distinct-(window, user) count folds per window end.
    Emitted window ends clamp to the observed max day (broadcast 1-row).

    All integer counts — engine-exact."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    cells = (
        events.select(F.col(user_col).alias("u"), day.alias("day"))
        .groupBy("u", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    maxd = cells.agg(F.max("day").alias("max_day"))
    fanned = cells.select(
        "u",
        "n",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), window_days - 1),
            )
        ).alias("win_end"),
    ).crossJoin(F.broadcast(maxd)).where(F.col("win_end") <= F.col("max_day"))
    return (
        fanned.groupBy("win_end")
        .agg(
            F.count_distinct("u").cast("long").alias("active_users"),
            F.sum("n").cast("long").alias("n_events"),
        )
        .select(
            F.col("win_end").alias("day"),
            "active_users",
            "n_events",
        )
    )


def session_timeout_sweep(
    events: DataFrame,
    timeouts_s: tuple[int, ...] = (300, 900, 1800, 3600),
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Sessionization sensitivity sweep: how many sessions (and how
    many events per session) the corpus yields at each inactivity
    timeout — the table that justifies the 30-minute default before a
    pipeline bakes it in. n_sessions(t) = n_users + #(inter-event gaps
    > t), so ONE pass over per-user ordered gaps answers every
    threshold: one aggregate emits the conditional counts, then a
    constant-width stack unpivots to a row per timeout.

    Scale shape: the lag window partitions by user (no global
    ordering); the sweep is a 1-row aggregate fanned to |timeouts|
    rows. Gaps compare in integer MICROseconds (unix_micros /
    epoch_us), so sub-second timestamps can't truncate differently
    across engines; only events-per-session divides (round 6)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), "event_id")
    gaps = events.select(
        F.col(user_col).alias("u"),
        (
            F.unix_micros(F.col(ts_col))
            - F.unix_micros(F.lag(ts_col).over(w))
        ).alias("gap"),
    )
    aggs = [
        F.sum(
            F.when(F.col("gap") > int(t) * 1_000_000, 1).otherwise(0)
        ).cast("long").alias(f"g{t}")
        for t in timeouts_s
    ]
    one = gaps.agg(
        F.count_distinct("u").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *aggs,
    )
    stacked = ", ".join(
        f"{int(t)}L, g{int(t)}" for t in timeouts_s
    )
    return one.selectExpr(
        "n_users",
        "n_rows",
        f"stack({len(timeouts_s)}, {stacked}) as (timeout_s, n_breaks)",
    ).select(
        "timeout_s",
        (F.col("n_users") + F.col("n_breaks")).alias("n_sessions"),
        F.round(
            F.col("n_rows").cast("double")
            / (F.col("n_users") + F.col("n_breaks")),
            6,
        ).alias("events_per_session"),
    )


def conversion_latency(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert distribution: per user, the lag from the FIRST
    ``from_type`` event to the first ``to_type`` event after it; one
    summary row with the converter count, conversion rate among users
    who ever emitted ``from_type``, and exact mean / interpolated
    p50/p90 latency in seconds — the product-analytics companion to
    x108's step-conversion counts (how MANY convert) answering how FAST
    they do.

    Determinism: lags are integer microseconds (unix_micros) divided
    once at the end; percentiles interpolate over exact integers.

    Scale shape: two user-keyed min-aggregates folded in ONE pass
    (conditional mins), then a 1-row summary — no window, no self-join."""
    t = F.unix_micros(F.col(ts_col))
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(F.when(F.col(type_col) == from_type, t)).alias("t_from"),
    )
    # first to_type AFTER the user's first from_type: one more
    # conditional min keyed on the broadcast-free same-pass trick is
    # impossible without t_from, so re-aggregate the joined stream —
    # both aggregates and the join are user-keyed (co-partitioned).
    with_from = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"), t.alias("t")
    ).join(per_user.where(F.col("t_from").isNotNull()), "u")
    conv = with_from.groupBy("u").agg(
        F.min("t_from").alias("t_from"),
        F.min(
            F.when(
                (F.col("et") == to_type) & (F.col("t") >= F.col("t_from")),
                F.col("t"),
            )
        ).alias("t_to"),
    )
    lag_s = (F.col("t_to") - F.col("t_from")) / 1e6
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_with_view"),
        F.count("t_to").cast("long").alias("n_converted"),
        F.round(
            F.count("t_to") / F.count(F.lit(1)).cast("double"), 6
        ).alias("conversion_rate"),
        F.round(F.avg(lag_s), 4).alias("mean_latency_s"),
        F.round(F.percentile(lag_s, F.lit(0.5)), 4).alias("p50_latency_s"),
        F.round(F.percentile(lag_s, F.lit(0.9)), 4).alias("p90_latency_s"),
    )


def wilson_error_rates(
    events: DataFrame,
    top_k: int = 20,
    z: float = 1.96,
    error_type: str = "error",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Statistically-sound error-rate screening: per user, the error
    share with its Wilson score interval, ranked by the LOWER bound —
    the ranking that can't be gamed by tiny samples (1 error in 1 event
    is a 100% rate but a near-zero lower bound), the same math behind
    Reddit's comment sort. Top ``top_k`` users by lower bound.

    Determinism: counts are integers; the Wilson closed form evaluates
    per row from exact integers (identical IEEE expression both
    engines), rounded at 6 dp; ties break on user id.

    Scale shape: one user-keyed map-side-combinable aggregate, then
    TakeOrdered."""
    cells = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            (F.col(type_col) == error_type).cast("long")
        ).cast("long").alias("n_errors"),
    )
    n = F.col("n_events").cast("double")
    p = F.col("n_errors") / n
    z2 = float(z) * float(z)
    # grouped EXACTLY like the oracle SQL — ((p + z2/2n) -+ z*sqrt(...))
    # / (1 + z2/n) as ONE final division — so the IEEE op sequence is
    # identical across engines before the 6 dp round
    half = F.lit(float(z)) * F.sqrt((p * (1 - p) + z2 / (4 * n)) / n)
    lo = ((p + z2 / (2 * n)) - half) / (1 + z2 / n)
    hi = ((p + z2 / (2 * n)) + half) / (1 + z2 / n)
    return (
        cells.select(
            "user_id",
            "n_events",
            "n_errors",
            F.round(p, 6).alias("error_share"),
            F.round(lo, 6).alias("wilson_lo"),
            F.round(hi, 6).alias("wilson_hi"),
        )
        .orderBy(F.desc("wilson_lo"), "user_id")
        .limit(top_k)
    )


def churn_risk(
    orders: DataFrame,
    customer: DataFrame,
    min_orders: int = 3,
    factor: float = 2.0,
) -> DataFrame:
    """Churn-risk rollup against each customer's OWN cadence: a
    customer is at risk when their silence since the last order exceeds
    ``factor`` x their personal median inter-order gap — the
    personalized baseline that doesn't mislabel a quarterly buyer as
    churned after 30 days. Per market segment: eligible customers
    (>= ``min_orders`` orders), at-risk count/share, and the median of
    the personal median gaps.

    Determinism: gaps are integer day diffs; medians interpolate over
    exact integers (halves exact in binary); the anchor is the global
    max order date (broadcast 1-row).

    Scale shape: one custkey-keyed lag window (partitioned, no global
    sort), one custkey aggregate, a custkey-keyed join to customer,
    segment cells."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        "o_orderdate",
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).alias("gap"),
    )
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.max("o_orderdate").alias("last_date"),
        F.percentile(F.col("gap").cast("double"), F.lit(0.5)).alias("med_gap"),
    ).where(F.col("n_orders") >= min_orders)
    anchor = orders.agg(F.max("o_orderdate").alias("max_date"))
    flagged = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        "med_gap",
        (
            F.datediff("max_date", "last_date")
            > F.lit(float(factor)) * F.col("med_gap")
        ).cast("long").alias("at_risk"),
    )
    seg = flagged.join(
        customer.select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        ),
        "o_custkey",
    )
    return seg.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("at_risk").cast("long").alias("n_at_risk"),
        F.round(
            F.sum("at_risk").cast("double") / F.count(F.lit(1)), 6
        ).alias("at_risk_share"),
        F.round(F.percentile("med_gap", F.lit(0.5)), 4).alias(
            "median_personal_gap_days"
        ),
    )


def transition_dwell(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Dwell-time profile per event-type transition: for every
    (prev_type -> type) pair a user performs consecutively, the count,
    exact mean and interpolated median dwell seconds — the timing layer
    x128's transition-count matrix lacks (two transitions can be
    equally common but one takes 2 s and one takes 2 h; only the timing
    separates a bot path from a human one).

    Determinism: dwell is an integer microsecond diff (unix_micros)
    divided once at the end; percentiles interpolate over exact
    integers.

    Scale shape: one user-keyed lag window (partitioned, never global),
    then a |types|^2-cell aggregate."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), "event_id")
    t = F.unix_micros(F.col(ts_col))
    trans = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("event_type"),
        (t - F.lag(t).over(w)).alias("dwell_us"),
    ).where(F.col("prev_type").isNotNull())
    return trans.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("dwell_us") / 1e6, 4).alias("mean_dwell_s"),
        F.round(
            F.percentile(F.col("dwell_us").cast("double"), F.lit(0.5)) / 1e6,
            4,
        ).alias("p50_dwell_s"),
    )


def retention_halflife(
    events: DataFrame,
    max_offset: int = 8,
    min_points: int = 3,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Retention half-life per weekly cohort: fit ln(retention) ~
    week_offset on the cohort's decay curve (offsets 1..``max_offset``,
    positive retention only) and report the implied half-life
    -ln(2)/slope — the single number that compares cohort stickiness
    across product changes, distilled from x107's full matrix.

    Scale shape: rides :func:`cohort_retention` (cell-sized frames
    throughout); the fit is a |cohorts|-cell regr_* aggregate. Only
    cohorts with >= ``min_points`` usable points and a negative slope
    report a half-life."""
    ret = cohort_retention(events, ts_col, user_col)
    pts = ret.where(
        (F.col("week_offset") >= 1)
        & (F.col("week_offset") <= max_offset)
        & (F.col("retention") > 0)
    )
    fit = pts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.regr_slope(
            F.log("retention"), F.col("week_offset").cast("double")
        ).alias("slope"),
    ).where(F.col("n_points") >= min_points)
    ln2 = 0.6931471805599453
    return fit.select(
        "cohort_week",
        "n_points",
        F.round("slope", 6).alias("decay_slope"),
        F.when(
            F.col("slope") < 0, F.round(F.lit(ln2) / -F.col("slope"), 4)
        ).alias("halflife_weeks"),
    )


def decile_mobility(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """User value-decile mobility between the first and second half of
    the observation window (split at the midpoint date): a 10x10-cell
    transition matrix of (decile_then -> decile_now) with counts and
    row shares — the churn/upsell mobility view behind "are whales
    stable or rotating". Users active in both halves only.

    Determinism: per-half user value folds in integer micros; decile
    edges are two exact-percentile 1-row aggregates broadcast back;
    banding compares micros against the edges with > (ties sink).

    Scale shape: two user-keyed aggregates from one cell frame, two
    broadcast edge rows, a <=100-cell rollup."""
    bounds = events.agg(
        F.min(ts_col).alias("t0"), F.max(ts_col).alias("t1")
    )
    tagged = events.crossJoin(F.broadcast(bounds)).select(
        F.col(user_col).alias("u"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("micro"),
        (
            F.unix_micros(F.col(ts_col))
            <= (F.unix_micros(F.col("t0")) + F.unix_micros(F.col("t1"))) / 2
        ).alias("first_half"),
    )
    per_user = tagged.groupBy("u").agg(
        F.sum(F.when(F.col("first_half"), F.col("micro"))).alias("v1"),
        F.sum(F.when(~F.col("first_half"), F.col("micro"))).alias("v2"),
    ).where(F.col("v1").isNotNull() & F.col("v2").isNotNull())
    qs = [i / 10.0 for i in range(1, 10)]
    edges = per_user.agg(
        F.percentile(F.col("v1").cast("double"), F.lit(qs)).alias("e1"),
        F.percentile(F.col("v2").cast("double"), F.lit(qs)).alias("e2"),
    )

    def band(col, edges_col):
        return 1 + F.aggregate(
            edges_col,
            F.lit(0),
            lambda acc, e: acc + F.when(col.cast("double") > e, 1).otherwise(0),
        )

    banded = per_user.crossJoin(F.broadcast(edges)).select(
        band(F.col("v1"), F.col("e1")).alias("decile_then"),
        band(F.col("v2"), F.col("e2")).alias("decile_now"),
    )
    cells = banded.groupBy("decile_then", "decile_now").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    rows = cells.groupBy("decile_then").agg(
        F.sum("n_users").cast("long").alias("row_total")
    )
    return cells.join(F.broadcast(rows), "decile_then").select(
        "decile_then",
        "decile_now",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.col("row_total"), 6
        ).alias("row_share"),
    )


def new_vs_returning(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly new-vs-returning decomposition: per calendar week, active
    users split into first-ever-seen-this-week (new) and returning —
    the growth-accounting view that says whether activity is
    acquisition or retention. Shares at 6 dp.

    Scale shape: first-seen week is a per-user window min (ONE
    user-keyed shuffle); weekly activity is a distinct (week, user)
    cell frame; the rollup is |weeks| cells. All integer counts."""
    w = Window.partitionBy(user_col)
    weekly = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
        F.date_trunc("week", F.min(ts_col).over(w))
        .cast("date")
        .alias("first_week"),
    ).distinct()
    return weekly.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("active_users"),
        F.sum((F.col("week") == F.col("first_week")).cast("long"))
        .cast("long")
        .alias("new_users"),
        (
            F.count(F.lit(1))
            - F.sum((F.col("week") == F.col("first_week")).cast("long"))
        )
        .cast("long")
        .alias("returning_users"),
        F.round(
            F.sum((F.col("week") == F.col("first_week")).cast("long"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("new_share"),
    )


def activity_heatmap(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Weekday x hour activity heatmap with deviation scoring: each of
    the (up to) 168 cells reports its event count, share of total, and
    the ratio to the uniform-cell expectation — the load-shape table
    behind capacity planning and anomaly baselines (x116 z-scores
    hours within a type; this is the weekly shape of everything).

    Scale shape: one map-side-combinable 168-cell aggregate + a
    broadcast 1-row total. Integer counts; shares/ratios at 6 dp."""
    cells = events.groupBy(
        F.dayofweek(ts_col).alias("weekday"),
        F.hour(ts_col).alias("hour"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    tot = cells.agg(
        F.sum("n_events").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_cells"),
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "weekday",
        "hour",
        "n_events",
        F.round(F.col("n_events") / F.col("total"), 6).alias("share"),
        F.round(
            F.col("n_events") / (F.col("total") / F.col("n_cells")), 6
        ).alias("load_ratio"),
    )


def cusum_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """CUSUM change-point detection on the daily event-value series:
    per observed day, the cumulative deviation of the daily mean from
    the overall level plus the classic one-sided CUSUM statistics, with
    the most-likely change day ranked first — the drift monitor that
    catches a slow metric shift long before any single day trips a
    z-score gate (x116/x142 flag spikes; this flags sustained drift).

    The max(0, prev + dev) CUSUM recursion is not a plain window sum,
    but it collapses to one: S+_t = P_t - min(0, min_{j<=t} P_j) and
    S-_t = max(0, max_{j<=t} P_j) - P_t where P is the prefix sum of
    deviations — so both sides ride ordinary cumulative-sum/min/max
    windows.

    Determinism: daily means come from exact integer-micro sums; every
    float fold after that (the overall level and all prefix series) is
    an ORDERED window over the |days| cell frame, so both engines add
    the same doubles in the same day order — bit-identical, no
    partial-aggregate merge-order wobble. Rounding is output-only.

    Scale shape: events collapse to |days| integer cells in one
    map-side-combinable aggregate; the windows run on the bounded cell
    frame (a deliberate single-partition stage over days, never
    events)."""
    daily = events.groupBy(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col(value_col) * 1e6).cast("long")).alias("micro"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    full = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    upto = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    base = daily.select(
        "day",
        (F.col("micro").cast("double") / F.col("n") / 1e6).alias("day_mean"),
    )
    leveled = base.select(
        "day",
        "day_mean",
        (
            F.sum("day_mean").over(full) / F.count(F.lit(1)).over(full)
        ).alias("level"),
    )
    prefixed = leveled.select(
        "day",
        "day_mean",
        "level",
        F.sum(F.col("day_mean") - F.col("level")).over(upto).alias("p"),
    )
    scored = prefixed.select(
        "day",
        "day_mean",
        "level",
        "p",
        (F.col("p") - F.least(F.min("p").over(upto), F.lit(0.0))).alias("s_pos"),
        (F.greatest(F.max("p").over(upto), F.lit(0.0)) - F.col("p")).alias("s_neg"),
    )
    ranked = scored.select(
        "day",
        F.round("day_mean", 6).alias("day_mean"),
        F.round("level", 6).alias("level"),
        F.round("p", 6).alias("cusum"),
        F.round("s_pos", 6).alias("s_pos"),
        F.round("s_neg", 6).alias("s_neg"),
        F.row_number()
        .over(
            Window.orderBy(
                F.round(F.greatest("s_pos", "s_neg"), 6).desc(), F.col("day")
            )
        )
        .cast("long")
        .alias("change_rank"),
    )
    return ranked.orderBy("day")


def revenue_autocorrelation(
    orders: DataFrame,
    max_lag: int = 7,
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
) -> DataFrame:
    """Daily-revenue autocorrelation function at lags 1..``max_lag``:
    Pearson r between the observed-day revenue series and its
    lag-shifted self, pairing only days where BOTH endpoints were
    observed — the time-series health check that tells a monitoring
    pipeline whether yesterday predicts today (weekly shopping rhythm
    shows up as a lag-7 spike; x136 tests the weekday margin, this
    measures the serial dependence directly).

    Determinism: days collapse to exact integer-cents cells; the pair
    moments (sum x, sum y, sum xy, sum x^2, sum y^2) fold as ORDERED
    full-frame windows per lag over the bounded pair frame, so both
    engines add identical doubles in identical day order; r is closed
    form off those sums, rounded at 6 dp, NULL when either side has
    zero variance.

    Scale shape: orders collapse to |days| cells once; the lag spine
    (``max_lag`` literals) explodes over CELLS, never orders, and the
    shifted join is cell-keyed — bounded at |days| x max_lag rows."""
    daily = orders.groupBy(F.col(date_col).cast("date").alias("day")).agg(
        F.sum(F.round(F.col(price_col) * 100).cast("long")).alias("rev_cents")
    )
    lags = F.explode(
        F.array(*[F.lit(i) for i in range(1, max_lag + 1)])
    ).alias("lag")
    cur = daily.select(lags, "day", F.col("rev_cents").alias("x"))
    prev = daily.select(
        F.col("day").alias("prev_day"), F.col("rev_cents").alias("y")
    )
    pairs = cur.join(
        prev, F.expr("date_sub(day, lag) = prev_day"), "inner"
    ).select(
        "lag",
        "day",
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
    )
    full = (
        Window.partitionBy("lag")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    moments = pairs.select(
        "lag",
        "day",
        F.count(F.lit(1)).over(full).cast("double").alias("np"),
        F.sum("x").over(full).alias("sx"),
        F.sum("y").over(full).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(full).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(full).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(full).alias("syy"),
        F.row_number()
        .over(Window.partitionBy("lag").orderBy("day"))
        .alias("rn"),
    ).where(F.col("rn") == 1)
    varx = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (varx > 0) & (vary > 0),
        F.round(
            (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(varx * vary),
            6,
        ),
    )
    return moments.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("np").cast("long").alias("n_pairs"),
        r.alias("pearson_r"),
    ).orderBy("lag")


def calendar_coverage(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Calendar completeness audit per event type: against the full
    day spine between the corpus-wide first and last observed day,
    report how many days each type was silent, its coverage share, and
    the first/last silent day — the ingestion-gap monitor that catches
    a feed that quietly stopped emitting one event class (x116 scores
    hour volume; this catches whole missing days, including types that
    were dark at the edges of the window).

    Scale shape: events collapse to (type, day) cells in one
    map-side-combinable aggregate; the day spine is one sequence()
    over the broadcast 1-row min/max — |days| rows — crossed with the
    |types| distinct list, so the anti-join runs on bounded cell
    frames, never events. All-integer outputs plus one 6 dp share."""
    obs = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("_n"))
    span = events.agg(
        F.min(F.date_trunc("day", F.col(ts_col)).cast("date")).alias("d0"),
        F.max(F.date_trunc("day", F.col(ts_col)).cast("date")).alias("d1"),
    )
    spine = span.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = obs.select("event_type").distinct()
    grid = types.crossJoin(spine)
    missing = grid.join(obs, ["event_type", "day"], "left_anti")
    miss = missing.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_missing"),
        F.min("day").alias("first_missing"),
        F.max("day").alias("last_missing"),
    )
    per_type = obs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_observed")
    )
    return (
        per_type.join(miss, "event_type", "left")
        .select(
            "event_type",
            "n_days_observed",
            F.coalesce("n_missing", F.lit(0)).cast("long").alias("n_missing"),
            F.round(
                F.col("n_days_observed")
                / (
                    F.col("n_days_observed")
                    + F.coalesce("n_missing", F.lit(0))
                ).cast("double"),
                6,
            ).alias("coverage"),
            "first_missing",
            "last_missing",
        )
        .orderBy("event_type")
    )


def session_depth_profile(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Session depth distribution under power-of-2 depth buckets
    (1, 2, 3-4, 5-8, ...): per bucket the session count, share, and
    running cumulative share — with the bounce rate (depth-1 sessions)
    falling out as the first row. x111 names WHAT paths sessions take
    and x154 sweeps the timeout; this is the engagement-depth shape
    product teams actually page on.

    Determinism: sessionization compares whole truncated seconds (the
    x111 convention); depths and bucket bounds are pure integers; the
    only floats are the two 6 dp shares, and the cumulative share folds
    on the ORDERED bounded bucket frame.

    Scale shape: one keyed shuffle on user for the session window; the
    per-session depth is a keyed count; buckets collapse to <= 64
    cells; the 1-row total broadcasts back and the cumulative window
    runs over the cell frame."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    marked = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.when(gap > gap_minutes * 60, 1).otherwise(0).alias("is_new"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = marked.select(
        "user_id", F.sum("is_new").over(w2).alias("session_no")
    )
    depths = sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("long").alias("depth")
    )
    # bucket lower bound: 1, 2, 3, 5, 9, ... (lo = 2^(k-1)+1 for k>=1)
    exp = F.ceil(F.log2(F.col("depth"))).cast("long")
    buckets = depths.select(
        F.when(F.col("depth") <= 2, F.col("depth"))
        .otherwise(F.pow(F.lit(2.0), (exp - 1).cast("double")).cast("long") + 1)
        .alias("bucket_lo"),
        F.when(F.col("depth") <= 2, F.col("depth"))
        .otherwise(F.pow(F.lit(2.0), exp.cast("double")).cast("long"))
        .alias("bucket_hi"),
    )
    cells = buckets.groupBy("bucket_lo", "bucket_hi").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    tot = cells.agg(F.sum("n_sessions").cast("double").alias("total"))
    cum = Window.orderBy("bucket_lo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bucket_lo",
            "bucket_hi",
            "n_sessions",
            F.round(F.col("n_sessions") / F.col("total"), 6).alias("share"),
            F.round(
                F.sum("n_sessions").over(cum) / F.col("total"), 6
            ).alias("cum_share"),
        )
        .orderBy("bucket_lo")
    )


def activity_powerlaw(
    events: DataFrame,
    xmin: int = 2,
    user_col: str = "user_id",
) -> DataFrame:
    """Power-law fit of the user-activity distribution: the continuous
    MLE alpha_hat = 1 + n / sum(ln(x_i / (xmin - 0.5))) (Clauset-
    Shalizi-Newman's discrete approximation) over per-user event
    counts at least ``xmin`` — the one-number heavy-tail summary
    behind capacity planning and bot screens (x119's HHI says how
    concentrated; alpha says how the tail DECAYS).

    Determinism: per-user counts collapse to the integer activity
    histogram first; the single float fold (sum of c_x * ln(...))
    runs as an ordered full-frame window over the bounded cell frame,
    so both engines add identical doubles in identical x order.

    Scale shape: one user-keyed count, one histogram aggregate
    (max-activity cells), windows on the cell frame only."""
    per_user = events.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    hist = per_user.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    full = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tail_c = F.when(F.col("x") >= xmin, F.col("c")).otherwise(F.lit(0))
    tail_ln = F.when(
        F.col("x") >= xmin,
        F.col("c").cast("double")
        * F.log(F.col("x").cast("double") / (xmin - 0.5)),
    ).otherwise(F.lit(0.0))
    scored = hist.select(
        "x",
        F.sum("c").over(full).cast("long").alias("n_users"),
        F.sum(tail_c).over(full).cast("long").alias("n_tail"),
        F.max("x").over(full).alias("max_activity"),
        F.sum(tail_ln).over(full).alias("ln_sum"),
        F.row_number().over(Window.orderBy("x")).alias("rn"),
    ).where(F.col("rn") == 1)
    return scored.select(
        F.lit(xmin).cast("long").alias("xmin"),
        "n_users",
        "n_tail",
        "max_activity",
        F.when(
            F.col("ln_sum") > 0,
            F.round(
                1.0 + F.col("n_tail").cast("double") / F.col("ln_sum"), 6
            ),
        ).alias("alpha"),
    )


def theilsen_trend(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: the median of all
    pairwise day-to-day slopes plus the median-residual intercept —
    the outlier-proof companion to x149's OLS line (one promo spike
    drags a least-squares slope; the median slope shrugs it off).

    Determinism: revenue quantizes to integer cents and the day index
    is an exact integer, so every pairwise slope is an exact rational
    in a double; the medians interpolate identically in both engines
    (the x126 quantile convention). Output rounds at 6 dp.

    Scale shape: orders collapse to |days| integer cells ONCE; the
    pairwise self-join is |days|^2/2 over CELLS (bounded by the
    calendar, not the data — 1 year is ~66k pairs at any corpus
    size); medians are exact percentile aggregates on those pairs."""
    daily = orders.groupBy(F.col(date_col).cast("date").alias("day")).agg(
        F.sum(F.round(F.col(price_col) * 100).cast("long")).alias("cents")
    )
    t0 = daily.agg(F.min("day").alias("d0"))
    cells = daily.crossJoin(F.broadcast(t0)).select(
        F.datediff("day", "d0").cast("long").alias("t"), "cents"
    )
    a, b = cells.alias("a"), cells.alias("b")
    slopes = a.join(b, F.col("a.t") < F.col("b.t")).select(
        (
            (F.col("b.cents") - F.col("a.cents")).cast("double")
            / (F.col("b.t") - F.col("a.t")).cast("double")
        ).alias("slope")
    )
    fit = slopes.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.percentile(F.col("slope"), F.lit(0.5)).alias("slope_c"),
    )
    resid = cells.crossJoin(F.broadcast(fit)).select(
        "n_pairs",
        "slope_c",
        (F.col("cents").cast("double") - F.col("slope_c") * F.col("t"))
        .alias("r"),
    )
    out = resid.groupBy("n_pairs", "slope_c").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.percentile(F.col("r"), F.lit(0.5)).alias("icept_c"),
    )
    return out.select(
        "n_days",
        "n_pairs",
        F.round(F.col("slope_c") / 100.0, 6).alias("slope_per_day"),
        F.round(F.col("icept_c") / 100.0, 6).alias("intercept"),
    )


def forecast_backtest(
    orders: DataFrame,
    season: int = 7,
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
) -> DataFrame:
    """Forecast-accuracy backtest of the two zero-parameter baselines
    every revenue forecast must beat: the naive carry-forward
    (yesterday's revenue) and the seasonal naive (the value one
    ``season`` ago), scored by MAE and their ratio (MASE with the
    naive as the scale) — the q46-forecast QA gate: if a model can't
    beat lag-7, it ships nothing.

    Determinism: all errors are absolute differences of integer-cents
    day cells summed exactly; the three ratios are closed-form off
    exact longs, rounded at 6 dp.

    Scale shape: orders collapse to |days| cells once; both baselines
    are cell-keyed calendar self-joins; the scorecard is one 1-row
    fold."""
    daily = orders.groupBy(F.col(date_col).cast("date").alias("day")).agg(
        F.sum(F.round(F.col(price_col) * 100).cast("long")).alias("cents")
    )
    prev = daily.select(F.col("day").alias("pday"), F.col("cents").alias("pc"))

    def _pairs(lag):
        return (
            daily.join(prev, F.expr(f"date_sub(day, {lag}) = pday"))
            .select(F.abs(F.col("cents") - F.col("pc")).alias("e"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("e").cast("long").alias("s"),
            )
        )
    nv = _pairs(1).select(
        F.col("n").alias("n_naive"), F.col("s").alias("s_naive")
    )
    sn = _pairs(season).select(
        F.col("n").alias("n_seasonal"), F.col("s").alias("s_seasonal")
    )
    tot = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    mae_n = F.col("s_naive").cast("double") / F.col("n_naive") / 100.0
    mae_s = F.col("s_seasonal").cast("double") / F.col("n_seasonal") / 100.0
    return (
        tot.crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(sn))
        .select(
            "n_days",
            "n_naive",
            "n_seasonal",
            F.round(mae_n, 6).alias("mae_naive"),
            F.round(mae_s, 6).alias("mae_seasonal"),
            F.when(F.col("s_naive") > 0, F.round(mae_s / mae_n, 6)).alias(
                "mase_seasonal"
            ),
        )
    )


def weekly_mix_psi(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Population-stability drift over time: per ISO week, the PSI of
    that week's event-type mix against the all-time mix under add-1
    smoothing (zero cells included via the full week x type grid) —
    x77 compares two populations at one time; this is the same
    statistic as a TIME SERIES, the dashboard that catches a feed
    whose composition is quietly rotating.

    Determinism: all probabilities are exact integer rationals under
    add-1 smoothing; the per-week PSI folds as an ordered window over
    the type cells of each week, so both engines add identical doubles
    in identical type order. 6 dp output.

    Scale shape: events collapse to (week, type) cells once; the grid
    is |weeks| x |types| (both bounded frames); totals broadcast."""
    cells = events.groupBy(
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
        F.col(type_col).alias("etype"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    weeks = cells.groupBy("week").agg(
        F.sum("n").cast("long").alias("n_week")
    )
    types = cells.groupBy("etype").agg(
        F.sum("n").cast("long").alias("n_type")
    )
    grand = cells.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.countDistinct("etype").cast("long").alias("n_types"),
    )
    grid = weeks.crossJoin(types).crossJoin(F.broadcast(grand))
    filled = grid.join(cells, ["week", "etype"], "left").select(
        "week",
        "etype",
        "n_week",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_wt"),
        "n_type",
        "n_all",
        "n_types",
    )
    p = (F.col("n_wt").cast("double") + 1.0) / (
        F.col("n_week").cast("double") + F.col("n_types")
    )
    q = (F.col("n_type").cast("double") + 1.0) / (
        F.col("n_all").cast("double") + F.col("n_types")
    )
    termed = filled.select(
        "week",
        "n_week",
        "etype",
        ((p - q) * F.log(p / q)).alias("term"),
    )
    wk = Window.partitionBy("week").orderBy("etype").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = termed.select(
        "week",
        F.col("n_week").alias("n_events"),
        F.sum("term").over(wk).alias("psi"),
        F.row_number()
        .over(Window.partitionBy("week").orderBy("etype"))
        .alias("rn"),
    ).where(F.col("rn") == 1)
    return scored.select(
        "week", "n_events", F.round("psi", 6).alias("psi")
    ).orderBy("week")


def cohort_ltv(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    cust_col: str = "o_custkey",
    price_col: str = "o_totalprice",
    max_offset: int = 12,
) -> DataFrame:
    """Weekly-cohort LTV curves: for each acquisition cohort (ISO week
    of a customer's first order) and week offset, the active-customer
    count, period revenue, cumulative revenue, and cumulative revenue
    PER COHORT MEMBER — x107 tracks who comes back; this tracks what
    they're worth, the payback-period table growth teams steer by.

    Determinism: revenue folds as exact integer cents; the cumulative
    walk is an ordered window along each cohort's offset cells; the
    per-member division happens after the exact fold, at 6 dp.

    Scale shape: one per-customer window min for the cohort week; the
    rollup lands on (cohort, offset) cells (weeks^2-bounded); cohort
    sizes come from the offset-0 cells, broadcast-joined back."""
    w = Window.partitionBy("custkey")
    based = orders.select(
        F.col(cust_col).alias("custkey"),
        F.date_trunc("week", F.col(date_col)).cast("date").alias("wk"),
        F.round(F.col(price_col) * 100).cast("long").alias("cents"),
    ).withColumn("cohort", F.min("wk").over(w))
    cells = (
        based.select(
            "cohort",
            ((F.datediff("wk", "cohort") / 7).cast("long")).alias("offset"),
            "custkey",
            "cents",
        )
        .where(F.col("offset") <= max_offset)
        .groupBy("cohort", "offset")
        .agg(
            F.countDistinct("custkey").cast("long").alias("n_active"),
            F.sum("cents").alias("rev_cents"),
        )
    )
    sizes = cells.where(F.col("offset") == 0).select(
        "cohort", F.col("n_active").alias("cohort_size")
    )
    cum = Window.partitionBy("cohort").orderBy("offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "offset",
            "n_active",
            "cohort_size",
            F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
            F.round(F.sum("rev_cents").over(cum) / 100.0, 2).alias(
                "cum_revenue"
            ),
            F.round(
                F.sum("rev_cents").over(cum)
                / F.col("cohort_size").cast("double")
                / 100.0,
                6,
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort", "offset")
    )


def basket_diversity(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    customer: DataFrame,
) -> DataFrame:
    """Per-segment purchase-diversity profile: each customer's brand
    entropy (how spread their lineitems are across brands), rolled up
    per market segment with mean, median, and the single-brand share —
    the loyalty-vs-variety lens x109's RFM can't see (two customers
    with identical spend can be a one-brand loyalist and a brand
    grazer).

    Determinism: per-customer entropy folds as an ordered window over
    that customer's brand cells, then QUANTIZES to integer micro-nats
    before any cross-customer aggregation (the x124 lesson: averaging
    raw doubles across partitions is merge-order roulette); segment
    means/medians run on exact longs.

    Scale shape: brand attachment is partkey-keyed (part never
    broadcasts in full at 100 TB), customer attachment custkey-keyed;
    cells are (customer, brand); every rollup is keyed and
    map-side-combinable."""
    cust_lines = lineitem.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_partkey").alias("p_partkey"),
    ).join(
        orders.select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("custkey"),
        ),
        "okey",
    ).join(part.select("p_partkey", "p_brand"), "p_partkey")
    cells = cust_lines.groupBy("custkey", "p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wcust = Window.partitionBy("custkey").orderBy("p_brand").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = cells.select(
        "custkey",
        "p_brand",
        "n",
        F.sum("n").over(wcust).cast("double").alias("ncust"),
    )
    p = F.col("n").cast("double") / F.col("ncust")
    folded = with_tot.select(
        "custkey",
        F.sum(-p * F.log(p)).over(wcust).alias("h"),
        F.count(F.lit(1)).over(wcust).cast("long").alias("n_brands"),
        F.row_number()
        .over(Window.partitionBy("custkey").orderBy("p_brand"))
        .alias("rn"),
    ).where(F.col("rn") == 1)
    quant = folded.select(
        "custkey",
        F.round(F.col("h") * 1e6).cast("long").alias("h_micro"),
        "n_brands",
    )
    seg = quant.join(
        customer.select(
            F.col("c_custkey").alias("custkey"), "c_mktsegment"
        ),
        "custkey",
    )
    return (
        seg.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(
                F.sum("h_micro").cast("double")
                / F.count(F.lit(1))
                / 1e6,
                6,
            ).alias("mean_entropy"),
            F.round(
                F.percentile(F.col("h_micro").cast("double"), F.lit(0.5))
                / 1e6,
                6,
            ).alias("p50_entropy"),
            F.round(
                F.sum(F.when(F.col("n_brands") == 1, 1).otherwise(0))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("single_brand_share"),
        )
        .orderBy("segment")
    )


def markov_entropy_rate(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Entropy rate of the event stream's first-order Markov chain:
    sum over states of P(state) x H(next | state), against the ln(T)
    ceiling, with predictability = 1 - rate/ln(T) — x128 prints the
    whole transition matrix; this is its one-number compression: how
    forecastable is the next user action?

    The empirical source-state marginal (transitions FROM each state
    over all transitions) weights the rows, so the statistic is the
    plug-in entropy rate of the observed chain.

    Determinism: all probabilities are exact integer rationals off the
    |types|^2 transition cells; both entropy folds are ordered windows
    (per-state over next types, then global over states). 6 dp.

    Scale shape: one keyed lag window on user; everything after runs
    on type-bounded cell frames."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    trans = (
        events.select(
            F.lag(type_col).over(w).alias("a"),
            F.col(type_col).alias("b"),
        )
        .where(F.col("a").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    wrow = Window.partitionBy("a").orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = trans.select(
        "a", "b", "n_ab",
        F.sum("n_ab").over(wrow).cast("double").alias("n_a"),
    )
    pc = F.col("n_ab").cast("double") / F.col("n_a")
    rows = with_tot.select(
        "a",
        "n_a",
        F.sum(-pc * F.log(pc)).over(wrow).alias("h_row"),
        F.row_number().over(Window.partitionBy("a").orderBy("b")).alias("rn"),
    ).where(F.col("rn") == 1)
    wall = Window.orderBy("a").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    folded = rows.select(
        "a",
        F.sum("n_a").over(wall).alias("n_all"),
        F.sum(F.col("n_a") * F.col("h_row")).over(wall).alias("hsum"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_states"),
        F.row_number().over(Window.orderBy("a")).alias("rn2"),
    ).where(F.col("rn2") == 1)
    rate = F.col("hsum") / F.col("n_all")
    max_h = F.log(F.col("n_states").cast("double"))
    return folded.select(
        F.col("n_all").cast("long").alias("n_transitions"),
        "n_states",
        F.round(rate, 6).alias("entropy_rate"),
        F.round(max_h, 6).alias("max_entropy"),
        F.when(F.col("n_states") > 1, F.round(1.0 - rate / max_h, 6))
        .alias("predictability"),
    )


def peak_concurrency(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Peak concurrent sessions — the sweep-line maximum of
    simultaneously-open user sessions (30-min-gap sessionization,
    CLOSED intervals: a session opening at the exact instant another
    closes counts as overlap, so ties process +1 before -1 and the
    peak is the conservative capacity number).

    x179 bins load by wall-clock hour; this answers the sizing
    question those bins blur: how many sessions were open AT ONCE at
    the worst moment.

    Determinism: boundary deltas collapse by (instant, sign) first, so
    the sweep key (2 x epoch-micros + sign) is unique and the prefix
    walk is a pure integer fold in one global order.

    Scale shape: sessionization is one keyed window; boundaries are 2
    rows per session collapsed to distinct instants; the global prefix
    rides scalable_running_sum (equi-depth buckets, ONE data exchange,
    no single-partition stage); the peak is a 1-row max joined back to
    find its first instant."""
    from .windows import scalable_running_sum

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    marked = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.when(gap > gap_minutes * 60, 1).otherwise(0).alias("is_new"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = marked.select(
        "user_id", "ts", F.sum("is_new").over(w2).alias("session_no")
    ).groupBy("user_id", "session_no").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    starts = sess.select(F.col("t0").alias("t"), F.lit(1).alias("sign"))
    ends = sess.select(F.col("t1").alias("t"), F.lit(-1).alias("sign"))
    bounds = (
        starts.unionByName(ends)
        .groupBy("t", "sign")
        .agg(F.sum("sign").cast("long").alias("delta"))
        .select(
            "t",
            "delta",
            (
                F.unix_micros("t") * 2
                + F.when(F.col("sign") == -1, 1).otherwise(0)
            ).alias("okey"),
        )
    )
    running = scalable_running_sum(bounds, "okey", "delta", "conc")
    n_sess = sess.agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    peak = running.agg(F.max("conc").cast("long").alias("peak_concurrency"))
    first = (
        running.join(
            F.broadcast(peak),
            F.col("conc") == F.col("peak_concurrency"),
        )
        .agg(F.min("t").alias("first_peak_ts"))
    )
    return (
        n_sess.crossJoin(F.broadcast(peak))
        .crossJoin(F.broadcast(first))
        .select("n_sessions", "peak_concurrency", "first_peak_ts")
    )


def km_survival(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    cust_col: str = "o_custkey",
    max_days: int = 365,
) -> DataFrame:
    """Kaplan-Meier survival of the customer reorder process: each
    consecutive-order gap is a complete "reorder" event, the stretch
    from a customer's LAST order to the corpus anchor date is a
    right-censored duration, and the KM product-limit estimator gives
    S(t) = P(no reorder within t days) — x161 flags who looks churned
    today; this is the curve that DEFINES churn horizons honestly
    (naive "mean gap" math ignores the censored tails and
    underestimates survival).

    Determinism: durations are exact integer days; at-risk and event
    counts are integers on |distinct durations| cells; the product
    limit folds as exp(cumulative ln) over the ORDERED duration frame.
    6 dp survival.

    Scale shape: one customer-keyed lag window, one 1-row anchor
    broadcast, then everything on duration cells (bounded by
    ``max_days``)."""
    base = orders.select(
        F.col(cust_col).alias("custkey"),
        F.col(date_col).cast("date").alias("day"),
    )
    gaps = base.select(
        "custkey",
        "day",
        F.datediff("day", F.lag("day").over(Window.partitionBy("custkey").orderBy("day"))).alias("gap"),
        F.row_number()
        .over(Window.partitionBy("custkey").orderBy(F.desc("day")))
        .alias("rdesc"),
    )
    events = gaps.where(F.col("gap").isNotNull()).select(
        F.col("gap").cast("long").alias("t"), F.lit(1).alias("is_event")
    )
    anchor = base.agg(F.max("day").alias("anchor"))
    censored = (
        gaps.where(F.col("rdesc") == 1)
        .crossJoin(F.broadcast(anchor))
        .select(
            F.datediff("anchor", "day").cast("long").alias("t"),
            F.lit(0).alias("is_event"),
        )
    )
    durs = events.unionByName(censored).where(F.col("t") <= max_days)
    cells = durs.groupBy("t").agg(
        F.sum("is_event").cast("long").alias("d"),
        F.sum(1 - F.col("is_event")).cast("long").alias("c"),
    )
    upto = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    tot = cells.agg(F.sum(F.col("d") + F.col("c")).cast("long").alias("n0"))
    risky = cells.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "c",
        (
            F.col("n0")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(upto), F.lit(0))
        ).cast("long").alias("n_risk"),
    )
    cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the last duration cell can absorb everyone at risk (d == n_risk):
    # its factor is exactly 0, so survival pins to 0 from there instead
    # of feeding ln(0)
    ln_term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(
            1.0 - F.col("d").cast("double") / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    zero_seen = F.max(
        F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    ).over(cum)
    surv = risky.where(F.col("d") > 0).select(
        "t",
        "n_risk",
        "d",
        F.when(zero_seen == 1, F.lit(0.0))
        .otherwise(F.exp(F.sum(ln_term).over(cum)))
        .alias("s"),
    )
    return surv.select(
        F.col("t").alias("t_days"),
        "n_risk",
        F.col("d").alias("n_events"),
        F.round("s", 6).alias("survival"),
    ).orderBy("t_days")


def path_trigrams(
    events: DataFrame,
    top_k: int = 20,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Frequent 3-step behavior motifs: every consecutive
    (a -> b -> c) triple INSIDE a 30-min session, counted and ranked —
    x111 counts whole session paths (which fragment across long
    sessions); sliding trigrams find the recurring sub-journeys those
    paths share, the event-stream analog of x65's text trigrams.

    Scale shape: one keyed session window; two lags on the same
    ordered partition (one shuffle); triples collapse to |types|^3
    cells map-side; TakeOrdered top-k; share against the broadcast
    1-row triple total."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    marked = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("etype"),
        F.when(gap > gap_minutes * 60, 1).otherwise(0).alias("is_new"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = marked.select(
        "user_id", "ts", "event_id", "etype",
        F.sum("is_new").over(w2).alias("session_no"),
    )
    w3 = Window.partitionBy("user_id", "session_no").orderBy(
        "ts", "event_id"
    )
    triples = sess.select(
        F.lag("etype", 2).over(w3).alias("t1"),
        F.lag("etype", 1).over(w3).alias("t2"),
        F.col("etype").alias("t3"),
    ).where(F.col("t1").isNotNull())
    cells = triples.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    tot = cells.agg(F.sum("n_occurrences").cast("double").alias("total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(">", "t1", "t2", "t3").alias("motif"),
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n_occurrences"), "motif")
        .limit(top_k)
    )


def stickiness(
    events: DataFrame,
    short_days: int = 7,
    long_days: int = 28,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """DAU/WAU/MAU stickiness per day: daily actives, trailing 7- and
    28-day actives (EXACT, via the x153 cell fan-out — never a
    re-scan of raw events), and the dau/mau + wau/mau ratios — the
    habit-formation dashboard number. Days earlier than ``long_days``
    after the first observed day are emitted too (their windows are
    simply shorter), matching the live-dashboard convention.

    All integer counts; two 6 dp ratios."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    cells = (
        events.select(F.col(user_col).alias("u"), day.alias("day"))
        .groupBy("u", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    maxd = cells.agg(F.max("day").alias("max_day"))

    def _fan(window_days, name):
        return (
            cells.select(
                "u",
                F.explode(
                    F.sequence(
                        F.col("day"),
                        F.date_add(F.col("day"), window_days - 1),
                    )
                ).alias("day2"),
            )
            .crossJoin(F.broadcast(maxd))
            .where(F.col("day2") <= F.col("max_day"))
            .groupBy("day2")
            .agg(F.count_distinct("u").cast("long").alias(name))
            .withColumnRenamed("day2", "day")
        )

    dau = cells.groupBy("day").agg(
        F.count_distinct("u").cast("long").alias("dau")
    )
    wau = _fan(short_days, "wau")
    mau = _fan(long_days, "mau")
    return (
        dau.join(wau, "day").join(mau, "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.round(F.col("dau") / F.col("mau").cast("double"), 6).alias(
                "dau_mau"
            ),
            F.round(F.col("wau") / F.col("mau").cast("double"), 6).alias(
                "wau_mau"
            ),
        )
        .orderBy("day")
    )


def attribution_credit(
    events: DataFrame,
    conversion_type: str = "purchase",
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-touch vs last-touch conversion attribution: every
    ``conversion_type`` event credits (a) the event type that opened
    its session and (b) the event type immediately before it — both
    'direct' when the conversion itself opens the session. The two
    models' credit tables disagree exactly where funnel debates live
    (x108 measures ordered reach; this divides the credit).

    Determinism: pure integer counting on session windows; shares at
    6 dp against the broadcast 1-row conversion total.

    Scale shape: one keyed session window; first/prev types come from
    the same ordered partition (no extra shuffle); credits collapse to
    |types|+1 cells per model, combined full-outer."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    marked = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("etype"),
        F.when(gap > gap_minutes * 60, 1).otherwise(0).alias("is_new"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = marked.select(
        "user_id", "ts", "event_id", "etype",
        F.sum("is_new").over(w2).alias("session_no"),
    )
    w3 = Window.partitionBy("user_id", "session_no").orderBy(
        "ts", "event_id"
    )
    conv = sess.select(
        "etype",
        F.when(
            F.row_number().over(w3) == 1, F.lit("direct")
        ).otherwise(F.first("etype").over(w3)).alias("first_touch"),
        F.coalesce(F.lag("etype").over(w3), F.lit("direct")).alias(
            "last_touch"
        ),
    ).where(F.col("etype") == conversion_type)
    ft = conv.groupBy(F.col("first_touch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("first_touch_credits")
    )
    lt = conv.groupBy(F.col("last_touch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("last_touch_credits")
    )
    tot = conv.agg(F.count(F.lit(1)).cast("double").alias("n_conv"))
    return (
        ft.join(lt, "channel", "full")
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.coalesce("first_touch_credits", F.lit(0)).cast("long")
            .alias("first_touch_credits"),
            F.coalesce("last_touch_credits", F.lit(0)).cast("long")
            .alias("last_touch_credits"),
            F.round(
                F.coalesce("first_touch_credits", F.lit(0)) / F.col("n_conv"),
                6,
            ).alias("first_touch_share"),
            F.round(
                F.coalesce("last_touch_credits", F.lit(0)) / F.col("n_conv"),
                6,
            ).alias("last_touch_share"),
        )
        .orderBy("channel")
    )


def aa_calibration(
    events: DataFrame,
    z_crit: float = 1.96,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """A/A experiment-harness calibration: split users into two arms by
    the deterministic md5 bucket (the x24 split convention, mod 2) and
    two-sample z-test four per-user metrics (event count, error count,
    active days, value in cents). On a correct harness every metric is
    balanced; a skewed z flags broken assignment hashing or a metric
    pipeline that leaks the split key — the audit teams run BEFORE
    trusting any real A/B readout.

    Determinism: all four metrics are integer-exact per user (value is
    summed in cents), so arm sums are order-independent; z is closed
    form off those sums. Zero pooled SE → NULL z, balanced = equal
    means.

    Scale shape: one per-user aggregate (shuffle on user), a 4-metric
    melt, and a 1-row-per-metric conditional fold — never events."""
    h = F.md5(F.col(user_col).cast("string"))
    arm_bit = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 2
    per_user = (
        events.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).cast("double").alias("m_events"),
            F.sum(
                F.when(F.col(type_col) == "error", 1).otherwise(0)
            ).cast("double").alias("m_errors"),
            F.countDistinct(F.date_trunc("day", F.col(ts_col)))
            .cast("double").alias("m_days"),
            F.sum(F.round(F.col(value_col) * 100).cast("long"))
            .cast("double").alias("m_cents"),
        )
        .select(
            F.when(arm_bit == 0, F.lit("a")).otherwise(F.lit("b")).alias("arm"),
            F.explode(
                F.create_map(
                    F.lit("events_per_user"), F.col("m_events"),
                    F.lit("errors_per_user"), F.col("m_errors"),
                    F.lit("active_days_per_user"), F.col("m_days"),
                    F.lit("value_cents_per_user"), F.col("m_cents"),
                )
            ).alias("metric", "v"),
        )
    )
    folded = per_user.groupBy("metric").agg(
        F.sum(F.when(F.col("arm") == "a", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == "b", 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == "a", F.col("v")).otherwise(0.0)).alias("s_a"),
        F.sum(F.when(F.col("arm") == "b", F.col("v")).otherwise(0.0)).alias("s_b"),
        F.sum(F.when(F.col("arm") == "a", F.col("v") * F.col("v")).otherwise(0.0)).alias("ss_a"),
        F.sum(F.when(F.col("arm") == "b", F.col("v") * F.col("v")).otherwise(0.0)).alias("ss_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    mean_a, mean_b = F.col("s_a") / na, F.col("s_b") / nb
    var_a = (F.col("ss_a") - F.col("s_a") * F.col("s_a") / na) / (na - 1)
    var_b = (F.col("ss_b") - F.col("s_b") * F.col("s_b") / nb) / (nb - 1)
    se = F.sqrt(var_a / na + var_b / nb)
    z = (mean_a - mean_b) / se
    return folded.select(
        "metric",
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.when(se > 0, F.round(z, 6)).alias("z"),
        F.when(se > 0, F.abs(z) < z_crit).otherwise(mean_a == mean_b).alias("balanced"),
    ).orderBy("metric")


def markov_prediction(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-1 next-event prediction accuracy of the x128 transition
    matrix used as a predictor: per previous type, the argmax next
    type (ties → lexicographic min) and the share of observed
    transitions it gets right — the decision-metric companion to
    x201's entropy rate (how USABLE the sequence structure is, not
    just how much of it exists).

    Scale shape: one keyed lag window → |types|^2 transition cells;
    the argmax and accuracy derive from the cells alone."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    cells = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wp = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), F.col("next_type")
    )
    best = (
        cells.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select(
            "prev_type",
            F.col("next_type").alias("predicted"),
            F.col("n").alias("n_correct"),
        )
    )
    totals = cells.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("n_transitions")
    )
    return (
        totals.join(best, "prev_type")
        .select(
            "prev_type",
            "predicted",
            "n_transitions",
            "n_correct",
            F.round(
                F.col("n_correct") / F.col("n_transitions").cast("double"), 6
            ).alias("accuracy"),
        )
        .orderBy("prev_type")
    )


def bot_regularity(
    events: DataFrame,
    min_gaps: int = 5,
    cv_threshold: float = 0.1,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Bot/automation screen by inter-event regularity: a human's
    gaps between events are bursty (coefficient of variation near or
    above 1); a scheduler fires on a clock (CV near 0). Per user with
    at least ``min_gaps`` gaps: mean gap, CV (sample sd / mean), and
    the bot_like flag (CV <= threshold, or an all-zero-gap replay) —
    the traffic-hygiene filter run before user events are trusted as
    training signal.

    Determinism: gaps are integer seconds; n / sum / sum-of-squares
    are exact integers in doubles, CV is closed form off them (IEEE
    sqrt is correctly rounded, so 6-dp rounding is stable).

    Scale shape: one keyed lag window, one per-user 3-sum fold —
    events never leave their user partition."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = (
        F.unix_timestamp(F.col(ts_col))
        - F.unix_timestamp(F.lag(ts_col).over(w))
    ).cast("double")
    gaps = events.select(
        F.col(user_col).alias("user_id"), gap.alias("g")
    ).where(F.col("g").isNotNull())
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").alias("s"),
        F.sum(F.col("g") * F.col("g")).alias("ss"),
    ).where(F.col("n_gaps") >= min_gaps)
    n = F.col("n_gaps").cast("double")
    mean = F.col("s") / n
    var = (F.col("ss") - F.col("s") * F.col("s") / n) / (n - 1)
    cv = F.sqrt(var) / mean
    return agg.select(
        "user_id",
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.when(mean > 0, F.round(cv, 6)).alias("cv"),
        ((mean == 0) | ((mean > 0) & (cv <= cv_threshold))).alias("bot_like"),
    ).orderBy("user_id")


def ab_power_curve(
    events: DataFrame,
    ns: tuple[int, ...] = (1000, 10000, 100000, 1000000),
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """A/B test power planning off observed metric variance: for each
    candidate per-arm sample size, the minimum detectable effect (MDE,
    80% power / 5% two-sided alpha) on mean per-user value —
    MDE = (z_{a/2} + z_b) * sqrt(2 * var / n). The sizing artifact a
    team reads BEFORE launching the experiment x211 calibrates.

    Determinism: per-user values sum in integer cents, so the corpus
    moments are exact; the curve is closed form off one 1-row fold
    against literal z constants (1.96 / 0.8416).

    Scale shape: one per-user aggregate, one 1-row moment fold, a
    4-literal grid explode."""
    z_total = 2.8015852181129683  # z_{0.025} + z_{0.2}
    per_user = events.groupBy(user_col).agg(
        F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("cents")
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    grid = mom.select(
        "n_users",
        "s",
        "ss",
        F.explode(F.array(*[F.lit(n) for n in ns])).alias("n_per_arm"),
    )
    nu = F.col("n_users").cast("double")
    mean = F.col("s") / nu / 100.0
    # s*s in double (long*long would wrap at ~3e9 total cents)
    var = (
        F.col("ss") - F.col("s") * F.col("s").cast("double") / nu
    ) / (nu - 1) / 10000.0
    mde = F.lit(z_total) * F.sqrt(2.0 * var / F.col("n_per_arm"))
    return grid.select(
        "n_per_arm",
        "n_users",
        F.round(mean, 6).alias("metric_mean"),
        F.round(F.sqrt(var), 6).alias("metric_sd"),
        F.round(mde, 6).alias("mde_abs"),
        F.when(mean > 0, F.round(mde / mean, 6)).alias("mde_rel"),
    ).orderBy("n_per_arm")


def mix_rate_decomposition(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    seg_col: str = "o_orderpriority",
    value_col: str = "o_totalprice",
) -> DataFrame:
    """Two-period mix-vs-rate decomposition of average order value
    (the Oaxaca/price-volume bridge): split the observed date span at
    its midpoint, then attribute the change in the overall mean to
    (a) MIX — segments gaining or losing share at their old rates —
    and (b) RATE — segments repricing at their new shares:
    delta = sum (sh2-sh1)*r1 + sum sh2*(r2-r1), which telescopes
    exactly to mean2 - mean1. The 'why did the metric move' artifact.

    Determinism: counts and integer-cents sums are exact; shares and
    rates are rationals; contributions round at 6 dp.

    Scale shape: one 1-row date-span fold broadcast into a segmented
    aggregate; everything downstream is |segments| cells."""
    span = orders.agg(
        F.min(F.col(date_col).cast("date")).alias("d0"),
        F.max(F.col(date_col).cast("date")).alias("d1"),
    ).select(
        "d0",
        F.date_add(
            F.col("d0"), (F.datediff("d1", "d0") / 2).cast("int")
        ).alias("mid"),
    )
    seg = orders.crossJoin(F.broadcast(span)).select(
        F.col(seg_col).alias("segment"),
        F.when(F.col(date_col).cast("date") <= F.col("mid"), 1)
        .otherwise(2).alias("period"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    cells = seg.groupBy("segment").agg(
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("period") == 2, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("period") == 1, F.col("cents")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("period") == 2, F.col("cents")).otherwise(0)).alias("s2"),
    )
    tot = cells.agg(
        F.sum("n1").cast("double").alias("t1"),
        F.sum("n2").cast("double").alias("t2"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    sh1, sh2 = F.col("n1") / F.col("t1"), F.col("n2") / F.col("t2")
    r1 = F.when(F.col("n1") > 0, F.col("s1") / F.col("n1").cast("double") / 100.0).otherwise(F.lit(0.0))
    r2 = F.when(F.col("n2") > 0, F.col("s2") / F.col("n2").cast("double") / 100.0).otherwise(F.lit(0.0))
    return j.select(
        "segment",
        "n1",
        "n2",
        F.round(sh1, 6).alias("share_1"),
        F.round(sh2, 6).alias("share_2"),
        F.round(r1, 6).alias("rate_1"),
        F.round(r2, 6).alias("rate_2"),
        F.round((sh2 - sh1) * r1, 6).alias("mix_contrib"),
        F.round(sh2 * (r2 - r1), 6).alias("rate_contrib"),
    ).orderBy("segment")


def absorption_conversion(
    events: DataFrame,
    conversion_type: str = "purchase",
    n_iterations: int = 25,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Eventual-conversion probability by state (absorbing Markov
    chain): model each session as a chain over event types with two
    absorbing states — ``conversion_type`` (value 1) and session END
    (value 0) — and solve a = P·a by ``n_iterations`` Jacobi sweeps.
    a(t) answers 'a user currently at t: how likely do they convert
    before the session dies?' — the forward-looking funnel number
    x108's ordered reach can't give.

    Determinism: the transition matrix is (|types|+1)^2 integer-count
    cells, collected to the driver (bounded by construction, the
    kmeans-centroid precedent); the Jacobi sums run in sorted
    next-state order so the oracle's ordered list_aggregate folds the
    identical IEEE sequence.

    Scale shape: one keyed session-lag window over events, one
    |types|^2-cell aggregate, then driver-side iteration on the tiny
    matrix; the result is a |types|-row literal frame."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    marked = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("t"),
        F.when(gap > gap_minutes * 60, 1).otherwise(0).alias("is_new"),
    )
    w2 = Window.partitionBy("u").orderBy("ts", "eid")
    sess = marked.select(
        "t", F.sum("is_new").over(w2).alias("sn"), "u", "ts", "eid"
    )
    w3 = Window.partitionBy("u", "sn").orderBy("ts", "eid")
    pairs = sess.select(
        F.col("t").alias("a"),
        F.coalesce(F.lead("t").over(w3), F.lit("__END__")).alias("b"),
    ).where(F.col("a") != conversion_type)
    cells = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    # driver-side Jacobi on the bounded (|types|+1)^2 matrix
    from collections import defaultdict

    out_tot: dict = defaultdict(int)
    for r in cells:
        out_tot[r.a] += r.n
    trans = defaultdict(list)  # a -> [(b, p)] sorted by b
    for r in sorted(cells, key=lambda r: (r.a, r.b)):
        trans[r.a].append((r.b, r.n / out_tot[r.a]))
    states = sorted(trans)
    a_val = {s: 0.0 for s in states}
    a_val[conversion_type] = 1.0
    a_val["__END__"] = 0.0
    for _ in range(n_iterations):
        new = {}
        for s in states:
            acc = 0.0
            for b, p in trans[s]:  # sorted by b: ordered IEEE fold
                acc += p * a_val.get(b, 0.0)
            new[s] = acc
        a_val.update(new)
    # full-precision values: the ordered IEEE folds are bit-identical
    # across engines, while Python round() (banker's) and SQL round()
    # (half-away) could disagree at an exact 6-dp boundary
    rows = [(s, out_tot[s], a_val[s]) for s in states] + [
        (conversion_type, 0, 1.0)
    ]
    return (
        events.sparkSession.createDataFrame(
            rows, schema="state string, n_out_transitions long, p_convert double"
        )
        .orderBy("state")
    )
