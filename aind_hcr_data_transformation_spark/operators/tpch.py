"""Extended TPC-H-shaped query suite (SURVEY §2.4 joins, §2.5 A5, §2.7 O4).

Q1/Q3/Q5/Q10 live in :mod:`relational`; this module widens the decision-
support surface with eleven more TPC-H-derived queries, adapted to the
synthetic corpus' schema subset (no ``partsupp`` table, no
``l_shipmode``/``l_receiptdate``/``l_commitdate``/``p_container``
columns — each adaptation is noted on the query it affects).

The reference (a CZI→Zarr ETL job) has no relational surface; its closest
analog remains the driver-side metadata broadcast
(``zeiss_job.py:123-130,145-157``), restated here as ``broadcast()`` hints
on dimension tables.

Scale notes (100 TB): every query shuffles only on its aggregation or
join keys. Fact-fact joins (orders⋈lineitem) are shuffle hash/sort-merge
on the join key; dimensions (region, nation, supplier, filtered part)
broadcast so the fact side never reshuffles for them. All date/brand/size
predicates sit on scan columns → parquet pushdown. Revenue arithmetic is
decimal-routed (``dsum``/``dround``) so results are partition-order
independent — see ``functions/compat.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compat import (
    dround,
    dsum,
    dsum_round,
    sql_round,
    sql_sum,
    sql_sum_round,
)
from ..tables import load_table


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi join)
# ---------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted: priority counts of orders having at least one
    lineitem shipped more than 90 days after the order date (the corpus
    lacks ``l_commitdate``/``l_receiptdate``, so late *shipment* stands in
    for late *receipt*).

    EXISTS compiles to a left-semi join — the build side carries only
    ``l_orderkey``+``l_shipdate``, and the semi join short-circuits on
    first match, so no row multiplication ever happens.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (pure filter + agg: the pushdown showcase)
# ---------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-row filter-aggregate with every predicate on a
    scan column — the plan is scan(PushedFilters) → partial agg → one-row
    exchange → final agg; at 100 TB the shuffle carries 32 rows total.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum_round(F.col("l_extendedprice") * F.col("l_discount"), 2).alias(
            "revenue"
        )
    )


Q6_SQL = f"""
SELECT {sql_sum_round("l_extendedprice * l_discount", 2)} AS revenue
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume NATION_1 ↔ NATION_2 by ship year.

    supplier and both nation copies broadcast (dimension pattern);
    orders⋈lineitem is the only fact-fact shuffle. The disjunctive
    nation-pair predicate applies after the broadcast joins, before the
    aggregation, so the shuffled agg input is already pair-filtered.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            dsum_round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT
  supp_nation, cust_nation, l_year,
  {sql_sum_round("volume", 2)} AS revenue
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
    l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of ASIA-customer PROMO-part revenue by
    order year.

    Share = conditional-sum / total-sum, both decimal-routed, divided once
    per output row (two exact operands → deterministic IEEE quotient).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cr_key") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(
                F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
            ).alias("_nation_vol"),
            dsum(vol).alias("_total_vol"),
        )
        .select(
            "o_year",
            dround(F.col("_nation_vol") / F.col("_total_vol"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT
  o_year,
  {sql_round("nation_vol / total_vol", 6)} AS mkt_share
FROM (
  SELECT
    CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
    {sql_sum("CASE WHEN n2.n_name = 'NATION_3' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")} AS nation_vol,
    {sql_sum("l.l_extendedprice * (1 - l.l_discount)")} AS total_vol
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
  GROUP BY 1
)
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: per-(supplier-nation, year) revenue for parts
    whose name contains 'gear'. The corpus has no ``partsupp``, so profit
    omits the ``ps_supplycost * l_quantity`` term — this is gross revenue,
    not margin (documented deviation).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            dsum_round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = f"""
SELECT
  n.n_name AS nation,
  CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
  {sql_sum_round("l.l_extendedprice * (1 - l.l_discount)", 2)} AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double aggregate)
# ---------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 adapted: histogram of per-customer order counts,
    excluding URGENT orders (the corpus lacks ``o_comment``, so the
    classic NOT-LIKE-special-requests filter becomes a priority filter).

    Two aggregations: per-customer count after a left outer join (NULL →
    0 via count of the nullable key), then the count-of-counts. The
    second agg's input is one row per customer — tiny relative to orders.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14 — promotion effect
# ---------------------------------------------------------------------------


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO parts.
    Conditional-sum/total-sum over a broadcast part join, single output row.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-03-01").cast("timestamp"),
            F.lit("1996-03-31").cast("timestamp"),
        )
    )
    p = load_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum(
                F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
            ).alias("_promo"),
            dsum(vol).alias("_total"),
        )
        .select(
            dround(F.lit(100.0) * F.col("_promo") / F.col("_total"), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


Q14_SQL = f"""
SELECT {sql_round("CAST(100.0 AS DOUBLE) * promo / total", 4)} AS promo_revenue_pct
FROM (
  SELECT
    {sql_sum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")} AS promo,
    {sql_sum("l.l_extendedprice * (1 - l.l_discount)")} AS total
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate BETWEEN TIMESTAMP '1996-03-01' AND TIMESTAMP '1996-03-31'
)
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier (aggregate → max → equality join back)
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum revenue in 1996 Q1.

    The revenue-per-supplier aggregate is computed once and reused for
    both the max and the equality filter (Spark caches nothing here — the
    self-use compiles to two scans of the same shuffle output under AQE;
    at scale, persist() the intermediate if the recompute dominates).
    Revenue is decimal-rounded BEFORE the max/equality so the comparison
    is on bit-stable doubles in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1996-03-31").cast("timestamp"),
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    {sql_sum_round("l_extendedprice * (1 - l_discount)", 2)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r
JOIN supplier s ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (pre-agg join replaces correlated avg)
# ---------------------------------------------------------------------------


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adapted: average yearly revenue lost if Brand#1 orders
    below 20% of the part's mean quantity were not taken (corpus lacks
    ``p_container``; the brand filter alone selects the part subset).

    The correlated ``avg(l_quantity)`` subquery is decorrelated into a
    per-part pre-aggregate joined back — one extra shuffle on
    ``l_partkey`` instead of a per-row subquery. The 20% comparison is
    ``5 * l_quantity < avg_qty`` (integer scaling, no 0.2 float literal —
    cross-engine exact; quantities are integral doubles so the per-part
    sums and the derived mean are IEEE-exact in both engines).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li_p = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    avg_qty = li_p.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li_p.join(avg_qty, F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") * 5 < F.col("avg_qty"))
        .agg(
            dround(dsum("l_extendedprice") / 7, 2).alias("avg_yearly"),
        )
    )


Q17_SQL = f"""
SELECT {sql_round(sql_sum("l.l_extendedprice") + " / 7", 2)} AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
JOIN (
  SELECT l2.l_partkey AS ap_key, avg(l2.l_quantity) AS avg_qty
  FROM lineitem l2
  JOIN part p2 ON l2.l_partkey = p2.p_partkey AND p2.p_brand = 'Brand#1'
  GROUP BY l2.l_partkey
) a ON l.l_partkey = a.ap_key
WHERE l.l_quantity * 5 < a.avg_qty
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume orders (having over fact-fact join, deterministic top-k)
# ---------------------------------------------------------------------------


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: the 100 largest orders above 250 total quantity.

    The quantity HAVING filter runs on the lineitem-only aggregate BEFORE
    the joins — orders and customer join against the (tiny) qualifying
    set, not the raw fact table. The sort adds ``o_orderkey`` as the
    final tiebreak so the LIMIT-100 row SET is deterministic cross-engine
    (quantity sums over integral doubles are exact).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey")
        )
        .limit(100)
    )


Q18_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       b.sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250
) b
JOIN orders o   ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 — disjunctive predicate revenue
# ---------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted: revenue from three disjunctive
    (brand, size-range, quantity-range) branches (corpus lacks
    ``p_container``/``l_shipmode``; brand+size carry the selectivity).

    The OR-of-ANDs sits on join output columns; the part side is
    pre-filtered to the union of the three brands before broadcasting so
    the broadcast table stays small even at full part-table scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#3", "Brand#5")
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(branch).agg(
        dsum_round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
        ).alias("revenue")
    )


Q19_SQL = f"""
SELECT {sql_sum_round("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE
     (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
      AND l.l_quantity BETWEEN 1 AND 11)
  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 25
      AND l.l_quantity BETWEEN 10 AND 20)
  OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 1 AND 35
      AND l.l_quantity BETWEEN 20 AND 30)
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
}

ORACLES = {
    "q4_order_priority": Q4_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q14_promo_effect": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
}
