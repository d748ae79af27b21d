"""Core relational operator surface.

SURVEY.md §2.7: the reference implements none of these (no joins, no
group-by, no windows, no set ops - relationships are loaded as plain FK
columns and joined downstream by consumers). They come free from Spark
SQL; this module registers the demonstration set the driver scores
against the DuckDB oracle, written Spark-first (DataFrame API,
broadcast hints for dims, decimal-stabilized float aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._helpers import DEC, SQL_DEC, davg, dsum, sql_davg, sql_dsum, t
from .registry import register

# --------------------------------------------------------------------------
# Flagship: scan + filter + 4 joins + agg + sort in one query.
# Dim tables (region/nation/customer at sf<=1) are broadcast so the only
# shuffle is the final group-by; lineitem->orders is the one big join and
# AQE picks its strategy at runtime.
# --------------------------------------------------------------------------


@register(
    "flagship_revenue_by_region",
    oracle=f"""
    SELECT r.r_name AS region,
           COUNT(*) AS n_items,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def flagship_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region: lineitem x orders x customer x nation x region.

    The reference never joins (SURVEY §2.7) - its FK model
    (contact.AccountId -> account.Id, reference
    data/salesforce_medium_scale.recipe.yml:78-79) implies exactly this
    downstream consumer query shape. Dimensions are broadcast: at 100 TB
    the fact-side stays shuffle-free for every dim hop.
    """
    lineitem = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@register(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter + groupBy + 8 aggregates.

    Map-side partial aggregation makes this a single small shuffle of
    (flag,status) partials regardless of input size - the canonical
    scale-safe aggregation shape.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            "sum_charge",
        ),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------------
# Joins: inner / left / semi / anti / broadcast.
# --------------------------------------------------------------------------


@register(
    "join_inner_orders_customer",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 200000
    """,
)
def join_inner_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders->customer with a selective fact-side filter.

    Filter is applied before the join so Catalyst pushes it to the scan
    (PushedFilters) and the join input shrinks first.
    """
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    customer = t(spark, sf_dir, "customer")
    return orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice", "c_mktsegment"
    )


@register(
    "join_left_customer_order_stats",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           {sql_dsum("o.o_totalprice", "total_spent")}
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (NULL-count = 0)."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice", "total_spent"),
        )
    )


@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join == EXISTS: customers having >=1 order, no fanout."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join == NOT EXISTS: customers with no HIGH-VALUE
    (>300k) order. The anti-join runs against a filtered order subset
    (every fixture customer has at least one order, so a bare
    no-orders predicate would be vacuously empty — the filter keeps
    the result non-trivial at every scale while exercising the same
    left_anti plan, with the totalprice filter pushed below the
    join)."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_broadcast_revenue_by_brand",
    oracle=f"""
    SELECT p.p_brand AS brand,
           COUNT(*) AS n_items,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_broadcast_revenue_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join: part is a dim, lineitem never shuffles
    for the join (only the tiny per-brand partial aggregates move)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


# --------------------------------------------------------------------------
# Multi-dimensional aggregation: rollup / cube / grouping sets.
# --------------------------------------------------------------------------


@register(
    "agg_rollup_region_nation",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers,
           {sql_dsum("c.c_acctbal", "total_acctbal")}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region->nation: subtotals + grand total in one pass
    (Catalyst expands to a single Expand + aggregate, no re-scan)."""
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(F.count("*").alias("n_customers"), dsum("c_acctbal", "total_acctbal"))


@register(
    "agg_cube_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sql_dsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping combinations."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"), dsum("l_quantity", "sum_qty")
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "total_price")}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (by-status, by-priority, grand total)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) AS DOUBLE) AS total_price
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# Window functions.
# --------------------------------------------------------------------------


@register(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank_in_cust
      FROM orders) x
    WHERE rank_in_cust <= 3
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the scale-safe top-k-per-group pattern
    (one hash shuffle on the partition key, heap-free row_number)."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_cust", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


@register(
    "window_running_sum_per_user",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS {SQL_DEC})) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_value
    FROM events
    """,
)
def window_running_sum_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum of event value per user (decimal-stabilized so frame
    evaluation order can't perturb the double)."""
    events = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id, ts,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS delta_value
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: per-user delta between consecutive event values (first row NULL).
    Per-row double subtraction is deterministic - no stabilization needed."""
    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
    )


# --------------------------------------------------------------------------
# Set operations / distinct.
# --------------------------------------------------------------------------


@register(
    "setop_union_nation_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer and supplier nation keys."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "setop_intersect_nation_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_intersect_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except_nation_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < -800
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0
    """,
)
def setop_except_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): nations with deeply-negative
    customers but no negative-balance supplier. (The unfiltered
    customer-vs-supplier difference is vacuously empty — every fixture
    nation has both — so both sides carry a filter to keep the set
    difference non-trivial at every scale while exercising the same
    EXCEPT plan.)"""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < -800)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


@register(
    "distinct_market_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_market_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (map-side partial dedup then tiny shuffle)."""
    return t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@register(
    "count_distinct_customers_per_nation",
    oracle="""
    SELECT c_nationkey, COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(*) AS n_rows
    FROM customer GROUP BY c_nationkey
    """,
)
def count_distinct_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group (Catalyst expands to two-phase agg)."""
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("*").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# Scalar function library (string / date / math / conditional).
# --------------------------------------------------------------------------


@register(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           REGEXP_EXTRACT(p_name, '^(\\w+)', 1) AS first_word,
           TRIM(CONCAT('  ', p_name, '  ')) AS name_trimmed
    FROM part
    """,
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: upper/length/substring/concat/replace/
    regexp_extract/trim - all JVM-side codegen'd expressions."""
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
    )


@register(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
           DATE_TRUNC('month', o_orderdate) AS order_month_start,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           EPOCH(o_orderdate)::BIGINT AS order_epoch
    FROM orders
    """,
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function surface over the order timestamp (UTC session TZ
    pinned so extraction matches DuckDB's naive-UTC semantics)."""
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        # Rendered as a string: DATE round-trips through pandas as python
        # date objects on the Spark side but datetime64 on the DuckDB
        # side - a representation mismatch, not a value one.
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
    )


@register(
    "scalar_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_disc,
           CAST(CEIL(l_extendedprice) AS DOUBLE) AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS DOUBLE) AS price_floor,
           CAST(ROUND(l_discount * 100, 0) AS DOUBLE) AS disc_pct,
           CAST(FLOOR(l_quantity + 0.5) AS BIGINT) % 7 AS qty_mod7,
           ROUND(SQRT(GREATEST(l_extendedprice, 0)), 6) AS price_sqrt,
           ROUND(LN(GREATEST(l_extendedprice, 0) + 1), 6) AS price_ln
    FROM lineitem
    """,
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface. sqrt/ln rounded to 6dp: Java Math vs C libm
    may differ in the last ulp; rounding absorbs it deterministically.

    Two hardenings from the extreme-numerics sweep (round 6), both
    no-ops on the generator's nonnegative integral-quantity data:
    qty_mod7 goes through the explicit floor(x+0.5) convention
    (Spark's CAST(double AS BIGINT) TRUNCATES while DuckDB's ROUNDS
    half-even — the pinned cast boundary), and sqrt/ln take
    GREATEST(x, 0) so negative prices yield a defined value in both
    engines instead of Spark NaN vs a DuckDB raise."""
    li = t(spark, sf_dir, "lineitem")
    nn_price = F.greatest(F.col("l_extendedprice"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        # Round only near-integer values: ROUND on arbitrary products
        # diverges between Java BigDecimal HALF_UP and C libm at .005
        # boundaries; near-integers can't sit on a boundary.
        F.round(F.col("l_discount") * 100, 0).cast("double").alias("disc_pct"),
        (F.floor(F.col("l_quantity") + 0.5).cast("long") % 7).alias("qty_mod7"),
        F.round(F.sqrt(nn_price), 6).alias("price_sqrt"),
        F.round(F.log(nn_price + 1), 6).alias("price_ln"),
    )


@register(
    "case_when_price_bands",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                WHEN o_totalprice < 300000 THEN 'high'
                ELSE 'jumbo' END AS price_band,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "band_total")}
    FROM orders GROUP BY 1
    """,
)
def case_when_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    orders = t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .when(F.col("o_totalprice") < 300000, "high")
        .otherwise("jumbo")
    )
    return (
        orders.groupBy(band.alias("price_band"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "band_total"))
    )


@register(
    "pivot_qty_by_flag_status",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS {SQL_DEC}) END) AS DOUBLE) AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS {SQL_DEC}) END) AS DOUBLE) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_qty_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT linestatus into columns (explicit value list -> single pass,
    no extra job to discover pivot values)."""
    li = t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
    )
    return piv.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_filled"),
    )


@register(
    "topk_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part) x
    WHERE rn <= 2
    """,
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 priciest parts per brand (row_number, unique tiebreak)."""
    part = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


@register(
    "subquery_orders_above_avg",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) AS DOUBLE) / COUNT(o_totalprice)
      FROM orders)
    """,
)
def subquery_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: orders above the global average price.

    Spark-first shape: compute the 1-row aggregate, broadcast-cross-join
    it, filter - identical plan to Catalyst's scalar subquery rewrite.
    """
    orders = t(spark, sf_dir, "orders")
    avg_df = orders.agg(davg("o_totalprice", "avg_price"))
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "null_handling_functions",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(o.o_orderpriority, 'NO_ORDER') AS priority,
           IFNULL(o.o_totalprice, 0.0) AS price_or_zero,
           NULLIF(c.c_mktsegment, 'BUILDING') AS segment_or_null,
           (o.o_orderkey IS NULL) AS has_no_order
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def null_handling_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface over outer-join output: coalesce / ifnull /
    nullif / IS NULL."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("o_orderpriority", F.lit("NO_ORDER")).alias("priority"),
        F.ifnull("o_totalprice", F.lit(0.0)).alias("price_or_zero"),
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("segment_or_null"),
        F.isnull("o_orderkey").alias("has_no_order"),
    )


@register(
    "having_active_customers",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "total_spent")}
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def having_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING: post-aggregation filter (Catalyst folds it into the
    aggregate's output filter - no second pass)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_spent"))
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "array_norms_by_label",
    oracle="""
    SELECT label, COUNT(*) AS n_vectors,
           CAST(SUM(list_sum(list_transform(generate_series(1, len(embedding)),
                  i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1e15)
                       AS BIGINT)))) AS DOUBLE) / 1e15 AS total_sq_norm
    FROM embeddings GROUP BY label
    """,
)
def array_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions feeding an aggregation: squared
    norms (fixed-point, engine-independent) summed per label - arrays
    never leave the map side."""
    from ..operators.similarity import _dot_fixed

    emb = t(spark, sf_dir, "embeddings")
    sq = _dot_fixed(F.col("embedding"), F.col("embedding"))
    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            (F.sum(sq).cast("double") / F.lit(1e15)).alias("total_sq_norm"),
        )
    )


@register(
    "string_agg_nations_per_region",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
)
def string_agg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG WITHIN GROUP - deterministic
    because the ORDER BY is part of the aggregate)."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("sa_nation")
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
               COUNT(*) AS n_nations
        FROM sa_nation GROUP BY n_regionkey
        """
    )


@register(
    "percentile_prices_by_status",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentile_prices_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation - Spark `percentile` and
    DuckDB `quantile_cont` are bit-compatible). The approximate
    (t-digest) variant is `approx_distinct_and_quantiles`."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "windowed_event_counts",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum("value", "total_value")}
    FROM events GROUP BY 1, 2
    """,
)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch mode (same epoch-aligned
    window semantics as the Structured Streaming path in
    streaming.incremental.windowed_counts)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack(): wide measures -> long (measure, value) rows
    in a single pass (no 3x re-scan like the UNION ALL oracle)."""
    return t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
        "'discount', l_discount) AS (measure, value)",
    )


@register("approx_distinct_and_quantiles")
def approx_distinct_and_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates: HyperLogLog++ distinct counts and
    t-digest quantiles - sketch-based, constant memory at any scale.
    Sketch internals are engine-specific -> rows-only; pytest bounds
    the error against exact values."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", 0.5).alias("approx_median_value"),
        )
    )


@register("sample_events")
def sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed - reproducible within Spark
    (split-deterministic) but partition-layout-dependent, hence
    rows-only; pytest checks the sampled fraction and determinism."""
    return t(spark, sf_dir, "events").sample(fraction=0.1, seed=42)


@register(
    "sort_limit_top_events",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
)
def sort_limit_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT -> TakeOrderedAndProject (per-partition top-k then
    k-way merge on the driver; never a full sort at scale). Unique
    (ts, event_id) tiebreak makes the selected set deterministic."""
    return (
        t(spark, sf_dir, "events")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# --------------------------------------------------------------------------
# Scale-technique demonstrations + scalar-library breadth (round-1 tail).
# --------------------------------------------------------------------------


@register(
    "skew_salted_join_supplier",
    oracle=f"""
    SELECT s.s_name AS supplier, COUNT(*) AS n_items,
           {sql_dsum("l.l_quantity", "total_qty")}
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    """,
)
def skew_salted_join_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join (functions/skew.py): the fact side's key is fanned out
    `salt` ways and the dim side replicated, splitting any hot key across
    reducers. Result must be bit-identical to the plain join the oracle
    runs - salting is a physical rewrite, not a semantic one. (The
    reference's FK distributions are skewed by design:
    data/salesforce_medium_scale.recipe.yml random_reference weights.)"""
    from ..functions.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    supp = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = salted_join(li, supp, on="l_suppkey", salt=8)
    return joined.groupBy(F.col("s_name").alias("supplier")).agg(
        F.count("*").alias("n_items"), dsum("l_quantity", "total_qty")
    )


@register(
    "scalar_bit_functions",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS key_and,
           o_orderkey | 15 AS key_or,
           xor(o_orderkey, 85) AS key_xor,
           (o_orderkey & 7) << 2 AS key_shl,
           o_orderkey >> 2 AS key_shr,
           CAST(bit_count(o_orderkey) AS BIGINT) AS key_bits
    FROM orders
    """,
)
def scalar_bit_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (&, |, xor, shifts, popcount) - all
    JVM-side codegen'd expressions."""
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("key_and"),
        k.bitwiseOR(F.lit(15)).alias("key_or"),
        k.bitwiseXOR(F.lit(85)).alias("key_xor"),
        F.shiftleft(k.bitwiseAND(F.lit(7)), 2).cast("long").alias("key_shl"),
        F.shiftright(k, 2).cast("long").alias("key_shr"),
        F.bit_count(k).cast("long").alias("key_bits"),
    )


@register(
    "scalar_array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS e_first,
           CAST(embedding[-1] AS DOUBLE) AS e_last,
           CAST(list_max(embedding) AS DOUBLE) AS e_max,
           CAST(list_min(embedding) AS DOUBLE) AS e_min
    FROM embeddings
    """,
)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface over the embedding column: size /
    element_at (1-based, negative = from end, same as DuckDB lists) /
    array_max / array_min. float32 -> double casts are exact widenings,
    so both engines see identical values."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("e_first"),
        F.element_at("embedding", -1).cast("double").alias("e_last"),
        F.array_max("embedding").cast("double").alias("e_max"),
        F.array_min("embedding").cast("double").alias("e_min"),
    )


@register(
    "scalar_regexp_functions",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_type, '[aeiou]', '#', 'g') AS type_masked,
           regexp_matches(p_name, '^[a-m]') AS name_low_alpha,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
           regexp_extract(p_type, '(\\w+) (\\w+)', 2) AS type_word2
    FROM part
    """,
)
def scalar_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: replace-all / match / count / group extract.
    Patterns restricted to the syntax subset where Java regex (Spark)
    and RE2 (DuckDB) agree - char classes, anchors, \\w, groups."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_type", "[aeiou]", "#").alias("type_masked"),
        F.col("p_name").rlike("^[a-m]").alias("name_low_alpha"),
        F.regexp_count(F.col("p_name"), F.lit("[aeiou]")).cast("long").alias("n_vowels"),
        F.regexp_extract("p_type", r"(\w+) (\w+)", 2).alias("type_word2"),
    )


@register(
    "window_range_frame_sum",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY EPOCH(o_orderdate)::BIGINT
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS trailing_7d_total
    FROM orders
    """,
)
def window_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): per customer,
    the trailing-7-day order total. Ordered by epoch seconds so both
    engines use the same numeric RANGE semantics; decimal-stabilized
    sum (frame contents are a set - partial-sum order still differs)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w)
        .cast("double")
        .alias("trailing_7d_total"),
    )


@register(
    "scalar_string_functions2",
    oracle="""
    SELECT p_partkey,
           translate(p_brand, '#', 'N') AS brand_translated,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           rpad(p_type, 16, '.') AS type_padded,
           reverse(p_brand) AS brand_rev,
           left(p_name, 5) AS name_left,
           right(p_name, 3) AS name_right,
           repeat(p_brand, 2) AS brand_twice,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
           string_split(p_type, ' ')[1] AS type_head
    FROM part
    """,
)
def scalar_string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-library tranche: translate / lpad / rpad / reverse /
    left / right / repeat / strpos (instr) / split+element_at. initcap
    is Spark-only (DuckDB lacks it) so it stays out of the oracle set."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_brand", "#", "N").alias("brand_translated"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad("p_type", 16, ".").alias("type_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_name", 1, 5).alias("name_left"),
        F.substring(F.col("p_name"), -3, 3).alias("name_right"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.element_at(F.split("p_type", " "), 1).alias("type_head"),
    )


@register(
    "window_rank_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(dense_rank() OVER w AS BIGINT) AS drank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window tranche: ntile / percent_rank / cume_dist /
    dense_rank in one window pass (single hash-partition shuffle on
    o_custkey, per-partition sort; absent in the reference - free from
    Spark, SURVEY §2.7). Ordering is made unique with the o_orderkey
    tie-break so rank-derived doubles are deterministic; int ranks cast
    to BIGINT for cross-engine schema agreement."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(w).cast("long").alias("drank"),
    )


@register(
    "scalar_map_functions",
    oracle="""
    WITH m AS (
      SELECT event_id,
             map(['type', 'user'],
                 [event_type, CAST(user_id AS VARCHAR)]) AS mm
      FROM events)
    SELECT event_id,
           mm['type'][1] AS m_type,
           mm['user'][1] AS m_user,
           mm['missing'][1] AS m_missing,
           CAST(cardinality(mm) AS BIGINT) AS m_size,
           array_to_string(map_keys(mm), ',') AS m_keys,
           array_to_string(map_values(mm), ',') AS m_vals
    FROM m
    """,
)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type scalar surface: construct (map_from_arrays), point
    lookup incl. missing key -> NULL, size, keys/values flattened to
    strings. DuckDB map extraction yields a LIST, so the oracle
    unwraps with [1] and list outputs go through array_to_string -
    scalar columns on both sides keep the driver hash comparable."""
    ev = t(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("user")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "user").alias("m_user"),
        F.element_at(m, "missing").alias("m_missing"),
        F.size(m).cast("long").alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
        F.array_join(F.map_values(m), ",").alias("m_vals"),
    )


@register(
    "histogram_event_values",
    oracle="""
    SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
    """,
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor-bucketing: one partial-aggregated
    shuffle of (bucket, count) - the distributed histogram primitive
    (floor of the identical IEEE division is engine-exact, unlike
    engine-specific width_bucket edge conventions)."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy(
        F.floor(F.col("value") / 10.0).cast("long").alias("bucket")
    ).agg(F.count("*").cast("long").alias("n"))


@register(
    "zscore_order_prices",
    oracle="""
    WITH s AS (
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS mu,
             CAST(SUM(CAST(FLOOR(o_totalprice * o_totalprice * 1e6)
                           AS DECIMAL(38,0))) AS DOUBLE)
               / (1e6 * COUNT(*)) AS ex2
      FROM orders GROUP BY o_orderstatus)
    SELECT o.o_orderkey, o.o_orderstatus,
           (o.o_totalprice - s.mu) / sqrt(s.ex2 - s.mu * s.mu) AS z
    FROM orders o JOIN s ON o.o_orderstatus = s.o_orderstatus
    """,
)
def zscore_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature standardization (z-score), the ML-pipeline
    normalization step: group moments from ORDER-INDEPENDENT fixed
    point sums (prices are exact at 2dp -> DECIMAL(18,6) sum is exact;
    squares go through FLOOR at 1e-6 into DECIMAL(38,0) so no rounding
    ambiguity and no int64 overflow), broadcast back, then one
    identical IEEE subtract/divide per row on both engines. At scale:
    tiny stats table broadcast, map-side standardization, no second
    shuffle of the fact table."""
    orders = t(spark, sf_dir, "orders")
    stats = orders.groupBy("o_orderstatus").agg(
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count("*")).alias(
            "mu"
        ),
        (
            F.sum(
                F.floor(F.col("o_totalprice") * F.col("o_totalprice") * F.lit(1e6))
                .cast("decimal(38,0)")
            ).cast("double")
            / (F.lit(1e6) * F.count("*"))
        ).alias("ex2"),
    )
    return (
        orders.join(F.broadcast(stats), "o_orderstatus")
        .select(
            "o_orderkey",
            "o_orderstatus",
            (
                (F.col("o_totalprice") - F.col("mu"))
                / F.sqrt(F.col("ex2") - F.col("mu") * F.col("mu"))
            ).alias("z"),
        )
    )


@register(
    "setop_except_all_suppkeys",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_quantity < 25
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def setop_except_all_suppkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL - multiset difference (per-key multiplicities
    subtract, unlike the distinct EXCEPT already covered). Spark plans
    it as an aggregate on counts, one shuffle keyed by the value.
    (Quantity threshold 25, not 10: the smaller side's multiplicities
    were everywhere dominated by the 'R' side on the fixtures, making
    the result vacuously empty.)"""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") < 25).select("l_suppkey").exceptAll(
        li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    )


@register(
    "setop_intersect_all_nationkeys",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT c_nationkey FROM customer WHERE c_acctbal > 0
    """,
)
def setop_intersect_all_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL - multiset intersection (min of per-key
    multiplicities)."""
    c = t(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_nationkey"
    ).intersectAll(c.filter(F.col("c_acctbal") > 0).select("c_nationkey"))


@register(
    "subquery_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice < 1000)
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL subquery planner
    (Catalyst decorrelates to a left-semi + left-anti join - same
    physical shape as the explicit join queries, arrived at from SQL).
    """
    t(spark, sf_dir, "customer").createOrReplaceTempView("q_exists_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("q_exists_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM q_exists_customer c
        WHERE EXISTS (SELECT 1 FROM q_exists_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM q_exists_orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice < 1000)
        """
    )


@register(
    "join_full_outer_nation_activity",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_rich_customers
               FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_rich_suppliers
               FROM supplier WHERE s_acctbal > 3000 GROUP BY s_nationkey)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           c.n_rich_customers, s.n_rich_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (completes the join-type surface: inner, left,
    semi, anti, cross elsewhere): per-nation high-balance customer
    counts vs supplier counts, where each side can miss nations the
    other has. Aggregate-then-join keeps the outer join's input tiny
    (<= #nations rows per side) regardless of table scale."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_rich_customers"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 3000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_rich_suppliers"))
    )
    return c.join(s, c.c_nk == s.s_nk, "full_outer").select(
        F.coalesce("c_nk", "s_nk").cast("int").alias("nationkey"),
        "n_rich_customers",
        "n_rich_suppliers",
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-position window functions (first_value / last_value /
    nth_value) over each customer's order history - the whole-partition
    frame, deduplicated to one row per customer. Tie broken by
    o_orderkey so the frame order (and thus nth_value) is
    deterministic in both engines."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    ).distinct()


@register(
    "stats_corr_regression",
    oracle="""
    WITH ints AS (
      SELECT l_returnflag,
             CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qi,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS pi
      FROM lineitem),
    m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(qi) AS DOUBLE) AS sx,
             CAST(SUM(pi) AS DOUBLE) AS sy,
             CAST(SUM(qi * qi) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(pi AS HUGEINT) * pi) AS DOUBLE) AS syy,
             CAST(SUM(qi * pi) AS DOUBLE) AS sxy
      FROM ints GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
           (sxy - sx * sy / n) / n AS covar_pop_qty_cents,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS regr_slope_cents,
           (sy - sx * (n * sxy - sx * sy) / (n * sxx - sx * sx)) / n
             AS regr_intercept_cents
    FROM m
    """,
)
def stats_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covar_pop / regression slope +
    intercept) per return flag. Built from moment sums instead of the
    engines' incremental corr/covar kernels (whose float accumulation
    is order-dependent and engine-specific): the moments are computed
    EXACTLY in integer space (quantity is integral; price has 2
    decimals -> cents via floor(x*100+0.5), the near-integer rounding
    both engines agree on), summed without rounding (decimal(38,0) /
    HUGEINT), and only then converted to double - a single correctly
    rounded integer conversion in both engines. The closed-form
    arithmetic after that is the identical IEEE op sequence.

    Decimal-SCALED sums (the dsum pattern) are NOT enough here:
    casting an arbitrary double like price^2 to decimal rounds
    HALF_UP in Java but to-nearest-even in C, and those per-row
    divergences accumulate. Exact integers sidestep rounding
    entirely. Single-pass partial aggregation, same shape as the
    native kernels at any scale."""
    l = t(spark, sf_dir, "lineitem")
    # floor(x + 0.5), not a bare int cast: Spark's CAST(double AS
    # BIGINT) truncates while DuckDB's rounds half-even — explicit on
    # BOTH sides so non-integral quantities keep the oracle exact
    # (round-6 extreme-numerics sweep).
    x = F.floor(F.col("l_quantity") + 0.5)
    y = F.floor(F.col("l_extendedprice") * 100 + 0.5)
    m = l.select("l_returnflag", x.alias("qi"), y.alias("pi")).groupBy(
        "l_returnflag"
    ).agg(
        F.count("*").alias("n"),
        F.sum("qi").cast("double").alias("sx"),
        F.sum("pi").cast("double").alias("sy"),
        F.sum(F.col("qi") * F.col("qi")).cast("double").alias("sxx"),
        F.sum(F.col("pi").cast("decimal(38,0)") * F.col("pi")).cast("double").alias("syy"),
        F.sum(F.col("qi") * F.col("pi")).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        "n",
        ((n * sxy - sx * sy)
         / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
         ).alias("corr_qty_price"),
        ((sxy - sx * sy / n) / n).alias("covar_pop_qty_cents"),
        slope.alias("regr_slope_cents"),
        ((sy - sx * slope) / n).alias("regr_intercept_cents"),
    )


@register(
    "generator_posexplode_tokens",
    oracle="""
    WITH tk AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tk
      FROM documents WHERE doc_id < 100),
    ex AS (
      SELECT doc_id, unnest(generate_series(1, len(tk))) AS i, tk
      FROM tk WHERE doc_id % 50 <> 0)
    SELECT doc_id, i - 1 AS pos, tk[i] AS token FROM ex
    UNION ALL
    SELECT doc_id, NULL, NULL FROM tk WHERE doc_id % 50 = 0
    """,
)
def generator_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator-function surface: posexplode_outer over a token array
    that is NULLed for every 50th doc - outer semantics keep those
    docs as a single (NULL, NULL) row where plain posexplode would drop
    them. Map-side expansion, no shuffle."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    arr = F.when(
        F.col("doc_id") % 50 != 0, F.split(F.lower("text"), " ")
    )
    return d.select(
        "doc_id", F.posexplode_outer(arr).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


@register(
    "scalar_json_functions2",
    oracle="""
    WITH j AS (
      SELECT c_custkey,
             CAST(to_json(struct_pack(id := c_custkey, seg := c_mktsegment))
                  AS VARCHAR) AS doc
      FROM customer)
    SELECT c_custkey, doc,
           json_extract_string(doc, '$.seg') AS seg_extracted,
           CAST(json_extract(doc, '$.id') AS BIGINT) AS id_parsed,
           json_valid(doc) AS is_valid
    FROM j
    """,
)
def scalar_json_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON function tranche 2: serialize (to_json over a struct),
    path-extract (get_json_object), schema'd re-parse (from_json), and
    validity probe. Round-trips a struct through its JSON string form -
    all JVM-side expressions, map-only."""
    c = t(spark, sf_dir, "customer")
    doc = F.to_json(
        F.struct(F.col("c_custkey").alias("id"), F.col("c_mktsegment").alias("seg"))
    )
    parsed = F.from_json(F.col("doc"), "id BIGINT, seg STRING")
    return (
        c.select("c_custkey", doc.alias("doc"))
        .select(
            "c_custkey",
            "doc",
            F.get_json_object("doc", "$.seg").alias("seg_extracted"),
            parsed.getField("id").alias("id_parsed"),
            F.get_json_object("doc", "$.id").isNotNull().alias("is_valid"),
        )
    )


@register(
    "scalar_higher_order_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           len(list_filter(embedding, x -> x < 0)) > 0 AS has_neg,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE) AS sumsq,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS sorted_first
    FROM embeddings
    """,
)
def scalar_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a first-class surface: filter /
    exists / transform+aggregate (sum-of-squares fold, left-to-right in
    both engines so the doubles agree exactly) / array_sort. These are
    interpreted (no codegen) - fine for scalar use; hot loops get the
    Arrow/pandas tier instead (see operators/similarity.py lessons)."""
    e = t(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.exists(v, lambda x: x < 0).alias("has_neg"),
        F.aggregate(
            v,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        ).alias("sumsq"),
        F.element_at(F.array_sort(v), 1).cast("double").alias("sorted_first"),
    )


@register(
    "percentile_disc_order_prices",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders)
    SELECT o_orderpriority,
           MAX(n) AS n_orders,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                    THEN o_totalprice END) AS p50_disc,
           MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                    THEN o_totalprice END) AS p90_disc
    FROM ranked GROUP BY o_orderpriority
    """,
)
def percentile_disc_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles (p50/p90 of order price per
    priority): the value at rank ceil(q*n) under a deterministic total
    order - no float interpolation, so the result is an actual data
    value both engines agree on exactly (the approximate twin is
    approx_distinct_and_quantiles). One shuffle on the group key; the
    rank formula is written out identically in both engines rather
    than trusting percentile_disc tie-break conventions."""
    o = t(spark, sf_dir, "orders")
    wr = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    at = lambda q: F.max(
        F.when(
            F.col("rn") == F.ceil(q * F.col("n")).cast("long"),
            F.col("o_totalprice"),
        )
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"),
        at(0.5).alias("p50_disc"),
        at(0.9).alias("p90_disc"),
    )


@register(
    "join_null_safe_equality",
    oracle="""
    WITH c AS (SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
               FROM customer WHERE c_custkey < 200),
         s AS (SELECT DISTINCT NULLIF(c_mktsegment, 'BUILDING') AS seg
               FROM customer)
    SELECT c.c_custkey, c.seg
    FROM c JOIN s ON c.seg IS NOT DISTINCT FROM s.seg
    """,
)
def join_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match NULL keys instead of dropping - the semantics merge keys
    with optional columns need. BUILDING is NULLed on both sides so
    the null-match path is actually exercised."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 200)
        .select("c_custkey", F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg"))
    )
    s = (
        t(spark, sf_dir, "customer")
        .select(F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg"))
        .distinct()
        .select(F.col("seg").alias("s_seg"))
    )
    return (
        c.join(F.broadcast(s), c["seg"].eqNullSafe(s["s_seg"]))
        .select("c_custkey", "seg")
    )


@register(
    "fuzzy_levenshtein_part_names",
    oracle="""
    WITH a AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 30),
         b AS (SELECT p_partkey, p_name FROM part)
    SELECT a.p_partkey,
           MIN(CAST(levenshtein(a.p_name, b.p_name) AS BIGINT)) AS nearest_dist
    FROM a JOIN b ON a.p_partkey <> b.p_partkey
    GROUP BY a.p_partkey
    """,
)
def fuzzy_levenshtein_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: for each probe part, the distance
    to its nearest other part name (levenshtein agrees exactly between
    engines - integer DP). The probe side is tiny and broadcast; at
    scale the probe x corpus product is bounded by blocking (length
    bands / first-char buckets) exactly like the LSH banding used for
    near-dup."""
    a = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 30)
        .select(F.col("p_partkey").alias("a_key"), F.col("p_name").alias("a_name"))
    )
    b = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("b_key"), F.col("p_name").alias("b_name")
    )
    return (
        b.crossJoin(F.broadcast(a))
        .filter(F.col("a_key") != F.col("b_key"))
        .groupBy(F.col("a_key").alias("p_partkey"))
        .agg(
            F.min(F.levenshtein("a_name", "b_name")).cast("long").alias("nearest_dist")
        )
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL FILTER-clause conditional aggregation (ANSI syntax, same
    text in both engines) - the declarative twin of the CASE WHEN
    aggregates used elsewhere; Catalyst compiles both to the same
    partial/final aggregate."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("q_filter_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
        FROM q_filter_orders GROUP BY o_orderstatus
        """
    )
