"""Nonparametric statistics tranche: Mann-Whitney U, two-sample
Kolmogorov-Smirnov, Gini coefficient.

The reference ships no statistics executor (SURVEY.md §2.7); these
extend the profiling / experimentation layer (`stats_ab_test_
conversion`, `stats_chi_square_independence`) with the rank-based
tests an A/B platform needs when the metric is NOT normal: U-test for
location shift, KS for full-distribution drift, Gini for concentration
monitoring.

Execution pattern shared by all three: every rank-based statistic is
computed from the DISTINCT-VALUE TABLE (value, per-group counts), not
by ranking raw rows — rank sums, ECDF gaps and pairwise |xi-xj| totals
are all linear combinations of per-value cumulative counts/sums. The
windows therefore run over #distinct-values rows (cents-quantized
metric values: bounded, thousands not billions), never over the raw
event stream; the raw data contributes one map-side-combinable
groupBy. At unbounded distinct cardinality the cross-value running
sums decompose exactly like `interval_max_concurrency`'s two-level
prefix sum.

Determinism: the moments are EXACT BIGINTs (cents quantization via
floor(x*100+0.5), the near-integer rounding both engines agree on;
tie terms t^3-t; cross products cumA*nB), converted to double once —
BIGINT->double is IEEE round-to-nearest in both engines — followed by
an identical IEEE expression (the house rule from
`stats_corr_regression`). The SQL template is shared VERBATIM between
Spark and the DuckDB oracle; only the table name is substituted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._helpers import t
from .registry import register

# ---------------------------------------------------------------------------
# Mann-Whitney U / Wilcoxon rank-sum test (click vs purchase values).
# ---------------------------------------------------------------------------

_MW_SQL = """
WITH ab AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
  FROM {events} WHERE event_type IN ('click', 'purchase')),
g AS (
  SELECT x, CAST(SUM(ia) AS BIGINT) AS a, COUNT(*) AS t
  FROM ab GROUP BY x),
c AS (
  SELECT x, a, t,
         COALESCE(CAST(SUM(t) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS BIGINT), 0) AS cb
  FROM g),
m AS (
  SELECT CAST(SUM(a * (2 * cb + t + 1)) AS BIGINT) AS s2ra,
         CAST(SUM(t * t * t - t) AS BIGINT) AS ties,
         CAST(SUM(a) AS BIGINT) AS na,
         CAST(SUM(t) AS BIGINT) AS n
  FROM c)
SELECT na AS n_a, n - na AS n_b,
       (CAST(s2ra AS DOUBLE) - CAST(na * (na + 1) AS DOUBLE)) / 2 AS u_a,
       (CAST(s2ra - na * (na + 1) - na * (n - na) AS DOUBLE) / 2)
         / sqrt(CAST(na AS DOUBLE) * (n - na)
                * ((CAST(n + 1 AS DOUBLE))
                   - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))) / 12)
         AS z
FROM m
"""


@register("stats_mann_whitney_u", oracle=_MW_SQL.format(events="events"))
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test (click vs purchase event values) with the
    normal approximation and full tie correction — the nonparametric
    complement of `stats_ab_test_conversion` for non-normal metrics.
    Midranks never materialize per row: the doubled rank sum
    2*R_A = sum(a_v * (2*cumBelow_v + t_v + 1)) over DISTINCT values is
    an exact BIGINT (the .5 midranks scale away), the tie term is
    sum(t^3 - t), and z = (U_A - n_A n_B/2) / sqrt(n_A n_B ((N+1) -
    ties/(N(N-1)))/12) is one identical IEEE expression from those
    integers (verified == numpy midrank reference on the fixtures).
    Raw rows hit one combinable groupBy; the running count runs over
    distinct cents values only."""
    t(spark, sf_dir, "events").createOrReplaceTempView("st_mw_events")
    return spark.sql(_MW_SQL.format(events="st_mw_events"))


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distance.
# ---------------------------------------------------------------------------

_KS_SQL = """
WITH ab AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
  FROM {events} WHERE event_type IN ('click', 'purchase')),
g AS (
  SELECT x, CAST(SUM(ia) AS BIGINT) AS a, CAST(SUM(1 - ia) AS BIGINT) AS b
  FROM ab GROUP BY x),
c AS (
  SELECT CAST(SUM(a) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
         CAST(SUM(b) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
  FROM g),
c2 AS (
  SELECT ca, cb,
         MAX(ca) OVER () AS na, MAX(cb) OVER () AS nb
  FROM c)
SELECT na AS n_a, nb AS n_b,
       CAST(MAX(ABS(ca * nb - cb * na)) AS BIGINT) AS d_numer,
       CAST(MAX(ABS(ca * nb - cb * na)) AS DOUBLE)
         / (CAST(na AS DOUBLE) * nb) AS ks_stat
FROM c2 GROUP BY na, nb
"""


@register("stats_ks_two_sample", oracle=_KS_SQL.format(events="events"))
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the click and
    purchase value distributions — the drift detector for full-shape
    changes that mean-based monitors miss. D = max_v |F_A(v) - F_B(v)|
    is computed as an INTEGER max of |cumA*n_B - cumB*n_A| over the
    distinct-value ECDF (division by n_A*n_B deferred to one final
    IEEE op), so the max is exact and order-independent. ECDFs are
    cumulative counts over distinct cents values; raw rows contribute
    one combinable groupBy, scanned ONCE — the sample totals are the
    final running-sum values (MAX over the cumulative columns), not a
    second aggregation of the source (a separate total CTE would make
    Spark rescan the raw table: no CTE reuse without caching)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("st_ks_events")
    return spark.sql(_KS_SQL.format(events="st_ks_events"))


# ---------------------------------------------------------------------------
# Gini coefficient (concentration of order revenue).
# ---------------------------------------------------------------------------

_GINI_SQL = """
WITH x AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM {orders}),
g AS (SELECT v, COUNT(*) AS c FROM x GROUP BY v),
w AS (
  SELECT v, c,
         COALESCE(CAST(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS BIGINT), 0) AS nb,
         COALESCE(CAST(SUM(v * c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                        PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS sb
  FROM g),
m AS (
  SELECT CAST(SUM(c * (v * nb - sb)) AS BIGINT) AS sumdiff,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(v * c) AS BIGINT) AS s
  FROM w)
SELECT n AS n_orders,
       CAST(s AS DOUBLE) / n AS mean_cents,
       CAST(sumdiff AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) AS gini
FROM m
"""


@register("stats_gini_order_prices", oracle=_GINI_SQL.format(orders="orders"))
def stats_gini_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order revenue (customer-concentration /
    inequality monitor). Uses the mean-absolute-difference identity
    G = sum_ij |xi-xj| / (2 n^2 mu) with the pairwise total computed in
    O(#distinct) instead of O(n^2): over value-sorted distinct cents,
    sum_{i<j}(xj-xi) = sum_v c_v * (v*countBelow_v - sumBelow_v) — all
    exact BIGINTs (fits 2^63 through ~10^8 orders at cent scale; the
    production path swaps the accumulator to DECIMAL(38,0) beyond
    that, at which point the result column must stay decimal — see the
    2^53 lesson in `stats_skew_kurtosis`). One combinable groupBy over
    raw orders; running sums over distinct values only; a single final
    division."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("st_gini_orders")
    return spark.sql(_GINI_SQL.format(orders="st_gini_orders"))


# ---------------------------------------------------------------------------
# Quantile feature binning (equal-frequency discretization).
# ---------------------------------------------------------------------------

_QBIN_SQL = """
WITH x AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM {orders}),
g AS (SELECT v, COUNT(*) AS c FROM x GROUP BY v),
cum AS (
  SELECT v, CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cc
  FROM g),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
b AS (
  SELECT MIN(CASE WHEN cc >= (n + 3) {div} 4 THEN v END) AS q1,
         MIN(CASE WHEN cc >= (n + 1) {div} 2 THEN v END) AS q2,
         MIN(CASE WHEN cc >= (3 * n + 3) {div} 4 THEN v END) AS q3
  FROM cum CROSS JOIN tot)
SELECT CAST(1 + (CASE WHEN v > q1 THEN 1 ELSE 0 END)
              + (CASE WHEN v > q2 THEN 1 ELSE 0 END)
              + (CASE WHEN v > q3 THEN 1 ELSE 0 END) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(v) AS min_cents, MAX(v) AS max_cents
FROM x CROSS JOIN b
GROUP BY 1
"""


@register(
    "feature_quantile_binning",
    oracle=_QBIN_SQL.format(orders="orders", div="//"),
)
def feature_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quartile) feature binning — the discretization
    step of feature engineering / drift monitors. Boundaries are EXACT
    order statistics picked by integer rank on the distinct-value
    cumulative counts (rank ceil(q*n) as (q*n + k) DIV d — no float
    percentile kernels, no per-row ROW_NUMBER), broadcast to a
    map-side bucket assignment 1 + sum of boundary exceedances (ties
    land deterministically in the lower bucket). Raw rows contribute
    one combinable groupBy; everything else is distinct-value-sized.
    The only engine-dialect split is integer division (DIV vs //)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("st_qbin_orders")
    return spark.sql(_QBIN_SQL.format(orders="st_qbin_orders", div="DIV"))


# ---------------------------------------------------------------------------
# Join-key skew profile (the pre-flight check for every big join).
# ---------------------------------------------------------------------------

_SKEW_SQL = """
WITH k AS (
  SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS c
  FROM {lineitem} GROUP BY l_suppkey),
g AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS f FROM k GROUP BY c),
w AS (
  SELECT c, f,
         COALESCE(CAST(SUM(f) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS BIGINT), 0) AS nb,
         COALESCE(CAST(SUM(c * f) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED
                                        PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS sb
  FROM g),
m AS (
  SELECT CAST(SUM(f * (c * nb - sb)) AS BIGINT) AS sumdiff,
         CAST(SUM(f) AS BIGINT) AS nk,
         CAST(SUM(c * f) AS BIGINT) AS nr,
         MAX(c) AS maxc
  FROM w)
SELECT nk AS n_keys, nr AS n_rows, maxc AS max_count,
       CAST(nr AS DOUBLE) / nk AS mean_count,
       CAST(maxc AS DOUBLE) * nk / nr AS skew_ratio,
       CAST(sumdiff AS DOUBLE) / (CAST(nk AS DOUBLE) * CAST(nr AS DOUBLE))
         AS gini_counts
FROM m
"""


@register(
    "profile_key_skew_lineitem", oracle=_SKEW_SQL.format(lineitem="lineitem")
)
def profile_key_skew_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for lineitem.l_suppkey — the pre-flight
    diagnostic that decides between a plain shuffle join, `functions.
    skew.salted_join`, and AQE skew splitting: key/row counts, max and
    mean per-key cardinality, their ratio (hot-key factor), and the
    Gini of the per-key count distribution (reusing
    `stats_gini_order_prices`' O(#distinct) pairwise identity on the
    counts-of-counts table — three nested combinable aggregations,
    each output smaller than the last). All moments exact BIGINTs;
    three final IEEE divisions."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("st_skew_lineitem")
    return spark.sql(_SKEW_SQL.format(lineitem="st_skew_lineitem"))


# ---------------------------------------------------------------------------
# Order-independent table content checksum (replication verification).
# ---------------------------------------------------------------------------

_CHECKSUM_DUCK = """
WITH h AS (
  SELECT CAST(('0x' || substring(md5(
           CAST(o_orderkey AS STRING) || '|' ||
           CAST(o_custkey AS STRING) || '|' ||
           o_orderstatus || '|' ||
           CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING)
           || '|' || strftime(o_orderdate, '%Y-%m-%d') || '|' ||
           o_orderpriority), 1, 8)) AS UBIGINT) AS h32
  FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(h32) AS BIGINT) AS content_checksum
FROM h
"""


@register("checksum_orders_table", oracle=_CHECKSUM_DUCK)
def checksum_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table content checksum: md5 each row's
    canonical serialization (pipe-joined columns, cents-quantized
    floats, explicit date format — the two engine-dialect seams), take
    32 bits, SUM. Commutative, so partition/scan order never matters,
    and mergeable across shards — the cheap replication/migration
    verifier that complements `ParquetLake.diff` (which row-diffs; this
    fingerprints in one pass, O(1) output). This very query is the
    engine-vs-engine check the whole oracle harness runs, distilled
    into an operator."""
    o = t(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    h32 = F.conv(F.substring(F.md5(row_str), 1, 8), 16, 10).cast("bigint")
    return o.select(h32.alias("h32")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("h32").cast("bigint").alias("content_checksum"),
    )
