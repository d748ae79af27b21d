"""TPC-H-shaped analytic queries over the fixture star schema.

SURVEY.md §2.7: the reference implements no joins, aggregation, or
subqueries at all - its FK model (e.g. contact.AccountId -> account.Id,
reference data/salesforce_medium_scale.recipe.yml:78-79,136-137) defers
every analytic shape to downstream consumers. This module registers the
classic downstream shapes - the TPC-H queries expressible over the
fixture columns (no partsupp table, no l_commitdate/l_receiptdate /
p_container columns; those queries are adapted to available columns) -
written Spark-first and scored against the DuckDB oracle.

Scale notes applied throughout:

- dimensions (region/nation/customer/supplier/part at warehouse ratios)
  are broadcast, so every dim hop stays shuffle-free on the fact side;
- float aggregates are decimal-stabilized (`_helpers`) so parallel
  partial aggregation is order-independent;
- every LIMIT/top-k orders by a unique tiebreak key;
- correlated subqueries are expressed as the decorrelated join Catalyst
  would produce, keeping the plan explicit and AQE-optimizable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._helpers import DEC, SQL_DEC, davg, dsum, sql_davg, sql_dsum, t
from .registry import register

def _rev():
    """Per-lineitem revenue expression (built lazily: Column
    construction needs an active SparkContext, and this module is
    imported at registry load before any session exists)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
           {sql_dsum(_SQL_REV, "revenue")}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped BUILDING-segment orders by revenue.

    Plan shape: customer filter is broadcast into orders, orders into
    lineitem via the join; both date filters reach the parquet scans
    (PushedFilters), so at 100 TB only the post-cutoff slice of
    lineitem is read. Tie broken by l_orderkey for a deterministic
    LIMIT set.
    """
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT year(o.o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                         THEN CAST({_SQL_REV} AS {SQL_DEC})
                         ELSE CAST(0 AS {SQL_DEC}) END) AS DOUBLE)
             / CAST(SUM(CAST({_SQL_REV} AS {SQL_DEC})) AS DOUBLE)
             AS mkt_share
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n1   ON c.c_nationkey = n1.n_nationkey
    JOIN region r    ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n2   ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY year(o.o_orderdate)
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (adapted: no p_type filter year window): NATION_3
    suppliers' share of revenue into ASIA-region customers, per year.

    The same nation table joins twice under different roles (customer
    nation -> region filter; supplier nation -> share numerator) -
    alias-disambiguated. Every dim is broadcast; numerator and
    denominator are separate exact decimal sums so the final division
    is one identical IEEE op in both engines.
    """
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").alias("n1")
    n2 = t(spark, sf_dir, "nation").alias("n2")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _rev().cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("n2.n_name") == "NATION_3", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
           {sql_dsum(_SQL_REV, "revenue")}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returned items
    ('R' lineitems) in 1996. Returnflag + date predicates push to the
    lineitem/orders scans; customer and nation broadcast."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted to available columns (the fixtures carry no
    l_commitdate/l_receiptdate/l_shipmode): per order priority, how
    many lineitems shipped more than 90 days after the order date.
    Timestamp interval arithmetic inside a conditional aggregate."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT year(l.l_shipdate) AS ship_year,
           100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST({_SQL_REV} AS {SQL_DEC})
                                 ELSE CAST(0 AS {SQL_DEC}) END) AS DOUBLE)
                 / CAST(SUM(CAST({_SQL_REV} AS {SQL_DEC})) AS DOUBLE)
             AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY year(l.l_shipdate)
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (per ship-year instead of one month): percentage of
    revenue from PROMO-type parts. Part is broadcast; numerator and
    denominator are exact decimal sums, then 100*num/den runs the same
    IEEE ops in both engines."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    vol = _rev().cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(vol).cast("double")
            ).alias("promo_share_pct")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum(_SQL_REV, "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue in 1996 Q1.

    The scalar MAX subquery is expressed as a 1-row broadcast
    cross-join against the same cached revenue aggregate - computed
    once, used for both the max and the equality filter (Catalyst's
    ReuseExchange makes the second read free; equality on doubles is
    safe because both sides come from the identical decimal sum).
    """
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev(), "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    WITH pavg AS (
      SELECT l_partkey, {sql_davg("l_quantity", "avg_qty")}
      FROM lineitem GROUP BY l_partkey)
    SELECT {sql_dsum("l.l_extendedprice", "sum_price")},
           CAST(SUM(CAST(l.l_extendedprice AS {SQL_DEC})) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pavg  ON l.l_partkey = pavg.l_partkey
    WHERE p.p_brand = 'Brand#2'
      AND l.l_quantity < 0.2 * pavg.avg_qty
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from small-quantity Brand#2 orders - the
    correlated per-part AVG subquery, decorrelated into a group-by +
    self-join (exactly Catalyst's rewrite, stated explicitly).

    The per-part average is decimal-stabilized, so the 0.2*avg
    threshold is the same double in both engines and the filter is
    deterministic.
    """
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    pavg = l.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        davg("l_quantity", "avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(pavg, l.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice", "sum_price"),
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0).alias(
                "avg_yearly"
            ),
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle=f"""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {sql_dsum("l.l_quantity", "sum_qty")}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS {SQL_DEC})) AS DOUBLE) > 300)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders with total quantity > 300 and their customers.

    The IN-subquery is a left-semi join against the qualifying-order
    aggregate. At scale the semi join's right side (qualifying keys) is
    tiny -> broadcast, so the big lineitem re-scan never shuffles on
    the probe side.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("q"))
        .filter(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        l.join(F.broadcast(big), l.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum(_SQL_REV, "revenue")}
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under a 3-way disjunction of (brand, size,
    quantity) bands - the classic OR-predicate pushdown test. Catalyst
    extracts the common join key and pushes the brand/size disjunction
    to the part scan; part broadcasts so the OR is evaluated map-side.
    """
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#17")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(20, 50)
        & (F.col("l_quantity") >= 20)
    )
    return j.filter(cond).agg(dsum(_rev(), "revenue"))


@register(
    "tpch_q22_idle_customers",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {sql_davg("c_acctbal", "a")} FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           {sql_dsum("c.c_acctbal", "totacctbal")}
    FROM customer c
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: nationkey instead of the absent phone
    country code, and "idle since 1999" instead of "never ordered" -
    every fixture customer has at least one order): wealthy customers
    with no order after the cutoff, per nation. Composes a scalar AVG
    subquery (broadcast 1-row cross join), an anti join against the
    filtered orders (the NOT EXISTS decorrelation), and a final
    aggregate."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal", "a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: the fixtures have no l_commitdate/
    l_receiptdate, so "late" = any line shipped >30 days after the
    order date): order count per priority among late orders in 1997.

    The EXISTS is expressed directly as a LEFT SEMI join - the
    qualifying order set is built in one pass over lineitem, each
    order counted once no matter how many late lines it has. The
    non-equi shipdate clause rides on the hash join as a post-probe
    filter; the orders date window is pushed to the parquet scan, so
    at 100 TB both sides prune to the year before shuffling.
    """
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {sql_dsum(_SQL_REV, "revenue")}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 1996 revenue from orders where the supplier and the
    customer share an ASIA nation, per nation.

    The distinguishing shape is the NON-JOIN-KEY equality
    c_nationkey = s_nationkey tying two different dimension hops
    together; it rides the supplier broadcast join as a probe filter.
    customer/supplier/nation/region all broadcast, so the only
    shuffle is lineitem->orders; the date window prunes the orders
    scan first.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase if mid-band discounts were dropped -
    a pure scan-filter-aggregate with NO join and NO groupBy key.

    All three predicates are scan-pushable (PushedFilters on
    l_shipdate/l_discount/l_quantity), so the 100 TB plan is: prune
    row groups by min/max stats, aggregate partials per partition,
    reduce 32 one-row partials. The cheapest possible query shape -
    the plan must never shuffle row data, only partials.
    """
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum(_SQL_REV, "revenue")}
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
       OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (adapted: no shipdate year window - the fixture span
    is the window): bilateral trade volume between NATION_18 and
    NATION_19 per direction and year — a pair chosen because it has
    bilateral trade at EVERY fixture scale (NATION_1/NATION_2 had no
    common orders at sf0.001, making the hash match vacuous).

    The nation dimension joins twice under different roles with a
    cross-role disjunction; expressing the pair filter AFTER both
    broadcast joins lets Catalyst keep each nation hop a broadcast
    and apply the disjunction as a cheap post-probe filter instead of
    a cross product. year() is int32 in Spark, int64 in DuckDB - cast
    to long at the source (STATE.md determinism rule).
    """
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_rev(), "revenue"))
    )


@register(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
                    - 60 * CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)
                         * CAST(FLOOR(l_quantity + 0.5) AS BIGINT))
                AS DOUBLE) / 10000 AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: no partsupp table, so supply cost is proxied
    as 60% of p_retailprice): profit on parts whose name contains
    'widget' (a token actually present in the fixture generator's
    part-name vocabulary — Q9's classic '%green%' has no fixture
    analog and a digit pattern matches nothing), per supplier nation
    and order year.

    Four dimension hops broadcast around a single lineitem->orders
    shuffle; the LIKE filter prunes part BEFORE the broadcast, so the
    hash table only holds qualifying parts. The profit arithmetic is
    EXACT-INTEGER ten-thousandths of a dollar — pc*(100-dp) - 60*rc*q
    over floor(x*100 + 0.5) cents — summed without rounding and
    divided once at the end: the per-row DOUBLE form
    price*(1-disc) - 0.6*retail*qty cast to DECIMAL(18,6) carried the
    pinned near-tie rounding fragility (Java shortest-repr HALF_UP vs
    DuckDB exact-binary rounding), which the round-6 extreme-numerics
    sweep actually tripped; on 2-dp money the two forms are equal, and
    the integer form is portable for any input while
    sum |pc*(100-dp)| stays under 2^53 (fixture scales: ~1e15).
    """
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    cents = lambda c: F.floor(F.col(c) * 100 + 0.5).cast("long")  # noqa: E731
    profit_tenk = cents("l_extendedprice") * (
        100 - cents("l_discount")
    ) - F.lit(60) * cents("p_retailprice") * F.floor(
        F.col("l_quantity") + 0.5
    ).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_tenk).cast("double") / 10000).alias("sum_profit"))
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the customer-order-count histogram (how many
    customers placed exactly k non-urgent orders), keeping
    zero-order customers via the outer join.

    Two-level aggregation: the first groupBy is on the join key
    itself, so Catalyst reuses the join's hash partitioning and the
    second (histogram) aggregation shuffles only (count, partial)
    pairs - vocabulary-sized fan-in. COUNT(o_orderkey) counts
    non-null matches only, preserving the 0 bucket; the priority
    predicate lives in the JOIN's ON clause (filtering before the
    join would drop customers, filtering after would corrupt the
    outer semantics).
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#19'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: no partsupp, so the part-supplier relation
    is derived from lineitem; no NOT-IN-complaints subquery - the
    fixtures have no supplier comments): distinct supplier count per
    surviving (brand, type, size).

    All three part predicates (two <>, one IN-list) are pushed to the
    part scan before the broadcast build. COUNT(DISTINCT) expands to
    a two-phase aggregate (dedup on group+suppkey, then count) -
    scale-safe because the dedup shuffle key includes the group, so
    skewed brands spread across reducers.
    """
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#19")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )
