"""Remaining TPC-H query shapes (Q2, Q6, Q8, Q9, Q11, Q12, Q15, Q16,
Q17, Q18, Q19, Q20), adapted to the driver's testdata schema, completing
the full 22-shape TPC-H coverage together with the shapes already in
plans/relational.py (Q1=a6, Q3=q17, Q4=q36, Q5=q18, Q7=q22, Q10=q24,
Q13=q37, Q14=q25, Q21=q34, Q22=q35).

The testdata has no PARTSUPP table; where a shape needs the
part-supplier relation, the DISTINCT (l_partkey, l_suppkey) projection
of lineitem stands in for it (noted per query). Monetary aggregates are
ROUND()ed identically on both sides; quantity totals use
CAST(SUM(..) AS BIGINT) (integral doubles sum exactly, making
threshold comparisons engine-exact).

Reference-shape parity: the reference's single KPI query
(/root/reference/etl/app/shift_data_processor.py:225-279) is the same
join-aggregate-subquery family these shapes exercise at full breadth.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window, functions as F

from ..sources.tables import load_table as _t


# --------------------------------------------------------------------------
# Q2 shape — minimum-cost supplier (correlated MIN, decorrelated)
# --------------------------------------------------------------------------

def q45_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each LARGE part of size 15, the supplier
    that shipped it in the SMALLEST total quantity (cost proxy; the
    correlated `= (SELECT MIN ...)` pattern), with supplier/nation
    detail. Decorrelated as a rank-1 window over the (part, supplier)
    aggregate instead of a min-join, so the part key is shuffled once.
    Quantity totals are integral doubles -> exact across engines; ties
    broken by suppkey. Scale notes: the aggregate shuffles (partkey,
    suppkey) pairs only; part and the supplier->nation dims broadcast;
    the window partitions by partkey (parallelism = #parts)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cost = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
    )
    w = Window.partitionBy("p_partkey").orderBy("total_qty", "l_suppkey")
    return (
        cost.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "n_name",
            "total_qty",
            F.round("s_acctbal", 2).alias("s_acctbal"),
        )
        .orderBy("p_partkey")
    )


Q45_SQL = """
WITH cost AS (
  SELECT p_partkey, p_name, l_suppkey,
         CAST(SUM(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_size = 15 AND p_type = 'LARGE'
  GROUP BY 1, 2, 3
),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                               ORDER BY total_qty, l_suppkey) AS rn
  FROM cost
)
SELECT p_partkey, p_name, s_suppkey, s_name, n_name, total_qty,
       ROUND(s_acctbal, 2) AS s_acctbal
FROM best
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE rn = 1
ORDER BY p_partkey
"""


# --------------------------------------------------------------------------
# Q6 shape — forecast revenue change (pure filter + scalar aggregate)
# --------------------------------------------------------------------------

def q46_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: revenue delta from discount elimination — one
    tight filter (date range + discount band + quantity cap) feeding a
    single-row SUM. Scale notes: every predicate reaches the parquet
    scan (PushedFilters); the aggregate is a map-side partial + 1-row
    final, no data movement beyond 32 partial rows."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q46_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q8 shape — national market share within a region
# --------------------------------------------------------------------------

def q47_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_5 suppliers' share of revenue delivered
    to ASIA-region customers, per order year — the conditional-sum /
    total-sum ratio over a 4-dim star join. Scale notes: all dims
    (nation x2, region, customer-side path) broadcast; the single fact
    shuffle is the orders join on o_orderkey; the year aggregate is
    map-side combinable. Share rounded to 6 dp (ulp-stable)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n_c = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_asia = (
        c.join(F.broadcast(n_c), c.c_nationkey == n_c.n_nationkey)
        .join(F.broadcast(r), n_c.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    supp = s.join(F.broadcast(n_s), s.s_nationkey == F.col("sn_key")).select(
        "s_suppkey", "sn_name"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_asia), o.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("sn_name") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


Q47_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(CASE WHEN sn.n_name = 'NATION_5'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = cn.n_regionkey
  WHERE r_name = 'ASIA')
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# Q9 shape — product-type profit by nation and year
# --------------------------------------------------------------------------

def q48_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit per supplier-nation per order year for
    PROMO-type parts; with no partsupp table, supply cost is proxied as
    60% of p_retailprice per unit. Scale notes: part filter broadcasts
    into the fact scan; the only big shuffle is lineitem->orders on
    orderkey; the (nation, year) aggregate is map-side combinable.
    Profit reported in whole currency units as an exact bigint — at
    sf0.1 the ~2.3e7-magnitude double sum differs between engines at
    the half-cent boundary, so 2-dp rounding is not engine-stable
    (observed: 22707462.22 vs .21); whole-unit rounding keeps the
    comparison 100x away from the ulp noise."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 0).cast("bigint").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q48_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)
                      - 0.6 * p_retailprice * l_quantity), 0) AS BIGINT)
         AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_type = 'PROMO'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# Q11 shape — important stock (HAVING vs global-fraction scalar)
# --------------------------------------------------------------------------

def q49_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose shipped value from NATION_3
    suppliers exceeds 0.1% of that nation's total shipped value — the
    grouped-aggregate-vs-global-scalar HAVING pattern. Scale notes: the
    1-row global total cross-joins (broadcast) into the HAVING filter,
    so the grouped frame streams once; value totals are exact-rounded
    identically on both sides before the comparison is applied to a
    strictly-greater threshold scaled by 1000 (no boundary floats)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    nat_li = li.join(
        F.broadcast(
            s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
                "s_suppkey"
            )
        ),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    )
    per_part = nat_li.groupBy("l_partkey").agg(
        F.sum("l_quantity").cast("bigint").alias("part_qty")
    )
    total = nat_li.agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_qty") * 1000 > F.col("total_qty"))
        .select(
            F.col("l_partkey").alias("partkey"),
            "part_qty",
            F.round(F.col("part_qty") / F.col("total_qty"), 6).alias("share"),
        )
        .orderBy(F.desc("part_qty"), "partkey")
    )


Q49_SQL = """
WITH nat_li AS (
  SELECT l_partkey, l_quantity FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3')
),
per_part AS (
  SELECT l_partkey, CAST(SUM(l_quantity) AS BIGINT) AS part_qty
  FROM nat_li GROUP BY 1
),
total AS (SELECT CAST(SUM(l_quantity) AS BIGINT) AS total_qty FROM nat_li)
SELECT l_partkey AS partkey, part_qty,
       ROUND(part_qty / CAST(total_qty AS DOUBLE), 6) AS share
FROM per_part CROSS JOIN total
WHERE part_qty * 1000 > total_qty
ORDER BY part_qty DESC, partkey
"""


# --------------------------------------------------------------------------
# Q12 shape — shipping buckets vs order priority (conditional agg)
# --------------------------------------------------------------------------

def q50_priority_by_linestatus(spark, sf_dir):
    """TPC-H Q12 shape: per line status (standing in for ship mode),
    counts of critical (1-URGENT/2-HIGH) vs other-priority orders for
    lines shipped in a window — the CASE-sum conditional aggregation.
    Scale notes: date filter pushes to the scan; one shuffle join on
    orderkey; 2-row output from a map-side-combinable aggregate."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(crit.cast("bigint")).alias("high_line_count"),
            F.sum((~crit).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q50_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# Q15 shape — top supplier (aggregate CTE + scalar MAX equality)
# --------------------------------------------------------------------------

def q51_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) whose shipped quantity in a
    quarter EQUALS the maximum over all suppliers — the view + scalar
    MAX pattern, tie-preserving. Quantity totals are exact bigints so
    the equality is engine-safe (revenue is reported but not compared
    against the max). Scale notes: one aggregate shuffle on suppkey;
    the 1-row max broadcasts back; supplier dim broadcasts."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum("l_quantity").cast("bigint").alias("total_qty"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue"),
    )
    mx = rev.agg(F.max("total_qty").alias("max_qty"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_qty") == F.col("max_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_qty", "total_revenue")
        .orderBy("s_suppkey")
    )


Q51_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(l_quantity) AS BIGINT) AS total_qty,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_qty, total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_qty = (SELECT MAX(total_qty) FROM rev)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q16 shape — supplier diversity with NOT IN exclusion
# --------------------------------------------------------------------------

def q52_part_supplier_diversity(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) for non-PROMO parts outside Brand#1, excluding suppliers with
    any returned line ('R' standing in for complaints) — the NOT IN
    anti-join + COUNT(DISTINCT) pattern. The part-supplier relation is
    the DISTINCT (l_partkey, l_suppkey) projection of lineitem (no
    partsupp in the testdata). Scale notes: the exclusion list is ids
    only (broadcast anti-join); the distinct-count aggregate shuffles
    (brand, type, size, suppkey) ids."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    )
    bad_supp = (
        li.where(F.col("l_returnflag") == "R").select("l_suppkey").distinct()
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q52_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (
    SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q17 shape — small-quantity-order revenue (correlated AVG)
# --------------------------------------------------------------------------

def q53_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: average yearly revenue lost if ECONOMY
    Brand#23 lines below 20% of their part's average quantity were not
    filled — the correlated AVG-per-part subquery, decorrelated into a
    grouped aggregate re-joined (broadcast, it is |parts| rows) onto
    the fact. Scale notes: two passes over the same filtered fact
    (Catalyst reuses the scan via exchange reuse under AQE); the final
    result is one row."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "ECONOMY")
    )
    fact = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = fact.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        fact.join(F.broadcast(avg_q), fact.l_partkey == F.col("ak"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q53_SQL = """
WITH fact AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#23' AND p_type = 'ECONOMY'
),
avg_q AS (
  SELECT l_partkey AS ak, AVG(l_quantity) AS avg_qty FROM fact GROUP BY 1
)
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_lines
FROM fact JOIN avg_q ON l_partkey = ak
WHERE l_quantity < 0.2 * avg_qty
"""


# --------------------------------------------------------------------------
# Q18 shape — large-volume customers (grouped HAVING feeding IN)
# --------------------------------------------------------------------------

def q54_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: customers with any order totalling > 250 units
    — the GROUP BY ... HAVING inside an IN-subquery, decorrelated to a
    semi join on the qualifying orderkeys. Scale notes: the HAVING
    aggregate shuffles (orderkey, qty) only; qualifying keys broadcast
    into the semi join; customer dim broadcasts; quantity thresholds
    compare exact bigints."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("order_qty"))
        .where(F.col("order_qty") > 250)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").cast("string").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "order_qty",
        )
        .orderBy(F.desc("order_qty"), "o_orderkey")
    )


Q54_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
       ROUND(o_totalprice, 2) AS totalprice, order_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS order_qty
      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250) big
  ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY order_qty DESC, o_orderkey
"""


# --------------------------------------------------------------------------
# Q19 shape — disjunctive band predicates (OR-of-ANDs revenue)
# --------------------------------------------------------------------------

def q55_banded_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue from three disjoint (brand, quantity
    band, size band) clauses OR-ed together — the disjunctive-predicate
    join Catalyst must not expand into a cartesian. Scale notes: the
    part dim broadcasts; the OR-of-ANDs is a post-join filter on the
    broadcast hash join (partkey equi-key extracted by the optimizer);
    single-row rounded output."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return j.where(band).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q55_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""


# --------------------------------------------------------------------------
# Q20 shape — dominant suppliers (nested aggregate threshold)
# --------------------------------------------------------------------------

def q56_dominant_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped more than 30% of some
    SMALL part's 1997 total — the nested per-(part,supplier) aggregate
    compared against a per-part aggregate, feeding a DISTINCT supplier
    list (semi-join semantics). Scale notes: both aggregates share the
    partkey shuffle key; the per-part totals broadcast (|parts| rows);
    exact bigint quantities make the 30% threshold engine-safe
    (scaled to avoid float boundaries)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    s = _t(spark, sf_dir, "supplier")
    fact = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    per_ps = fact.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("bigint").alias("ps_qty")
    )
    per_p = fact.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").cast("bigint").alias("p_qty")
    )
    dominant = (
        per_ps.join(F.broadcast(per_p), per_ps.l_partkey == F.col("pk"))
        .where(F.col("ps_qty") * 10 > F.col("p_qty") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(dominant), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q56_SQL = """
WITH fact AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'SMALL'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
),
per_ps AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS ps_qty
  FROM fact GROUP BY 1, 2
),
per_p AS (
  SELECT l_partkey AS pk, CAST(SUM(l_quantity) AS BIGINT) AS p_qty
  FROM fact GROUP BY 1
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps JOIN per_p ON l_partkey = pk
  WHERE ps_qty * 10 > p_qty * 3)
ORDER BY s_suppkey
"""


TPCH = {
    "q45_min_cost_supplier": (q45_min_cost_supplier, Q45_SQL),
    "q46_forecast_revenue": (q46_forecast_revenue, Q46_SQL),
    "q47_market_share": (q47_market_share, Q47_SQL),
    "q48_product_profit": (q48_product_profit, Q48_SQL),
    "q49_important_parts": (q49_important_parts, Q49_SQL),
    "q50_priority_by_linestatus": (q50_priority_by_linestatus, Q50_SQL),
    "q51_top_supplier": (q51_top_supplier, Q51_SQL),
    "q52_part_supplier_diversity": (q52_part_supplier_diversity, Q52_SQL),
    "q53_small_qty_revenue": (q53_small_qty_revenue, Q53_SQL),
    "q54_large_volume_customers": (q54_large_volume_customers, Q54_SQL),
    "q55_banded_revenue": (q55_banded_revenue, Q55_SQL),
    "q56_dominant_suppliers": (q56_dominant_suppliers, Q56_SQL),
}
