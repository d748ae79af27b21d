"""Robust-statistics / time-weighted analytics tranche: MAD outlier
fences, winsorized summary statistics, per-user time-weighted average
(TWAP), and hour-of-day seasonal baselines with residual anomalies.

The reference ships no statistics executor (SURVEY.md §2.7); these
extend the experimentation/monitoring layer (`stats_iqr_outliers_
events`, `window_rolling_anomaly_zscore`) with the ROBUST versions a
production data-quality monitor actually runs: median/MAD fences are
immune to the very outliers they hunt (mean/stddev fences are not),
winsorization is the standard heavy-tail-safe summary, TWAP is the
canonical irregular-sampling average (plain AVG over-weights bursts),
and seasonal baselines separate time-of-day effect from true anomaly.

Execution pattern (the house distinct-value discipline from
`stats_queries.py`): every order statistic is an exact integer rank
pick over the DISTINCT-VALUE cumulative-count table, never a per-row
ROW_NUMBER over raw events — raw rows contribute exactly one
map-side-combinable groupBy, and all second-pass math (absolute
deviations, clamps, outlier counts) runs over the distinct-value table
too, which is bounded by the cents-quantized value domain, not the row
count. Determinism: exact BIGINT moments; BIGINT->double is IEEE
round-to-nearest in both engines; one final IEEE division per double
output; the robust-fence comparison `dev*10000 > 44478*mad` keeps the
3*1.4826 MAD-consistency constant in integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._helpers import t
from .registry import register

# ---------------------------------------------------------------------------
# Median-absolute-deviation outlier fences (robust z-score).
# ---------------------------------------------------------------------------

_MAD_SQL = """
WITH x AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM {events}),
g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY v),
cum AS (
  SELECT v, CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cc
  FROM g),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
med AS (
  SELECT MIN(CASE WHEN cc >= (n + 1) {div} 2 THEN v END) AS m
  FROM cum CROSS JOIN tot),
d AS (SELECT ABS(v - m) AS dv, c FROM g CROSS JOIN med),
dg AS (SELECT dv, CAST(SUM(c) AS BIGINT) AS c FROM d GROUP BY dv),
dcum AS (
  SELECT dv,
         CAST(SUM(c) OVER (ORDER BY dv ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cc
  FROM dg),
mad AS (
  SELECT MIN(CASE WHEN cc >= (n + 1) {div} 2 THEN dv END) AS md
  FROM dcum CROSS JOIN tot)
SELECT MIN(t.n) AS n_events,
       MIN(me.m) AS median_cents,
       MIN(ma.md) AS mad_cents,
       CAST(SUM(CASE WHEN d.dv * 10000 > 44478 * ma.md THEN d.c ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM d CROSS JOIN mad ma CROSS JOIN tot t CROSS JOIN med me
"""


@register("stats_mad_outliers_events", oracle=_MAD_SQL.format(events="events", div="//"))
def stats_mad_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier fences via the median absolute deviation: median
    and MAD are exact lower-median order statistics (rank (n+1) DIV 2)
    picked by integer rank on distinct-value cumulative counts, and a
    row is an outlier when |x - med| > 3 * 1.4826 * MAD — evaluated as
    the all-integer `dev*10000 > 44478*mad`, so no float ever enters
    the comparison. Unlike the mean/stddev fences
    (`window_rolling_anomaly_zscore`), a handful of extreme values
    cannot drag the fence itself. Raw events hit ONE combinable
    groupBy; the deviation distribution is derived from the
    distinct-value table (bounded by the cents domain), not from raw
    rows, so the second pass is value-domain-sized. The only dialect
    split is integer division (DIV vs //)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("rb_mad_events")
    return spark.sql(_MAD_SQL.format(events="rb_mad_events", div="DIV"))


# ---------------------------------------------------------------------------
# Winsorized summary statistics (heavy-tail-safe mean).
# ---------------------------------------------------------------------------

_WINSOR_SQL = """
WITH x AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM {orders}),
g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY v),
cum AS (
  SELECT v, CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cc
  FROM g),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
b AS (
  SELECT MIN(CASE WHEN cc >= (5 * n + 99) {div} 100 THEN v END) AS lo,
         MIN(CASE WHEN cc >= (95 * n + 99) {div} 100 THEN v END) AS hi
  FROM cum CROSS JOIN tot)
SELECT MIN(t.n) AS n_orders,
       MIN(b.lo) AS p05_cents,
       MIN(b.hi) AS p95_cents,
       CAST(SUM((CASE WHEN g.v < b.lo THEN b.lo
                      WHEN g.v > b.hi THEN b.hi
                      ELSE g.v END) * g.c) AS BIGINT) AS winsorized_sum_cents,
       CAST(SUM((CASE WHEN g.v < b.lo THEN b.lo
                      WHEN g.v > b.hi THEN b.hi
                      ELSE g.v END) * g.c) AS DOUBLE) / MIN(t.n)
         AS winsorized_mean_cents
FROM g CROSS JOIN b CROSS JOIN tot t
"""


@register(
    "feature_winsorized_stats",
    oracle=_WINSOR_SQL.format(orders="orders", div="//"),
)
def feature_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized order-price summary: clamp values to the exact
    p05/p95 order statistics (rank ceil(q*n) as (q*n + 99) DIV 100 on
    distinct-value cumulative counts — same machinery as
    `feature_quantile_binning`), then sum the clamped cents as exact
    BIGINTs. The heavy-tail-safe mean every pricing/feature pipeline
    wants instead of a raw AVG that one fat-finger order can move. The
    clamp-and-sum runs over the DISTINCT-VALUE table weighted by
    counts (value-domain-sized), not over raw rows; raw orders hit one
    combinable groupBy. Only dialect split: DIV vs //."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("rb_wins_orders")
    return spark.sql(_WINSOR_SQL.format(orders="rb_wins_orders", div="DIV"))


# ---------------------------------------------------------------------------
# Per-user time-weighted average (TWAP over irregular samples).
# ---------------------------------------------------------------------------

_TWAP_SQL = """
WITH v AS (
  SELECT user_id, event_id, {us}(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM {events}),
seg AS (
  SELECT user_id, cents,
         LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
           AS dur_us
  FROM v)
SELECT user_id,
       CAST(COUNT(dur_us) AS BIGINT) AS n_segments,
       CAST(SUM(cents * dur_us) AS BIGINT) AS weighted_sum,
       CAST(SUM(cents * dur_us) AS DOUBLE) / CAST(SUM(dur_us) AS DOUBLE)
         AS twap_cents
FROM seg
WHERE dur_us IS NOT NULL
GROUP BY user_id
HAVING SUM(dur_us) > 0
"""


@register(
    "timeseries_twap_user", oracle=_TWAP_SQL.format(events="events", us="epoch_us")
)
def timeseries_twap_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value (TWAP): each observation
    holds until the next one, so its weight is the exact
    integer-microsecond gap from one LEAD (ties broken by event_id;
    the last observation has no successor and carries zero weight —
    the standard left-closed TWAP convention). Plain AVG over-weights
    burst periods; TWAP is the correct average for irregularly sampled
    gauges (prices, balances, sensor readings). Both accumulators are
    exact BIGINTs (cents * micros <= ~1.5e17 at the fixture domain;
    at larger spans the production path drops to millisecond weights
    to stay under 2^63), and the final division is one IEEE op on
    identically rounded doubles. Single shuffle on user_id; the
    aggregate after the LAG/LEAD window is combinable. Dialect split:
    epoch accessor only (unix_micros vs epoch_us)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("rb_twap_events")
    return spark.sql(_TWAP_SQL.format(events="rb_twap_events", us="unix_micros"))


# ---------------------------------------------------------------------------
# Hour-of-day seasonal baseline + residual anomaly.
# ---------------------------------------------------------------------------

_SEASONAL_SQL = """
WITH x AS (
  SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hod,
         value, CAST(value AS DECIMAL(18,6)) AS dv
  FROM {events}),
w AS (
  SELECT event_type, hod, value,
         CAST(SUM(dv) OVER (PARTITION BY event_type, hod) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY event_type, hod) AS mu
  FROM x)
SELECT event_type, hod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(mu) AS baseline_mean,
       MAX(value - mu) AS max_pos_residual
FROM w
GROUP BY event_type, hod
"""


@register("events_seasonal_baseline", oracle=_SEASONAL_SQL.format(events="events"))
def events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline per event type, plus the largest
    positive residual against that baseline — the decomposition step
    that keeps a 3 a.m. traffic dip from paging as an anomaly. The
    baseline mean is decimal-stabilized (exact DECIMAL window sum ->
    one IEEE division; the house `davg` rule, in window form), the
    residual `value - mu` is then the identical IEEE subtraction in
    both engines, and MAX picks a single row's value — no float is
    ever re-accumulated. The window and the GROUP BY share the
    (event_type, hod) key, so Catalyst plans ONE shuffle and the
    aggregation runs on already-partitioned data. At 100 TB the
    (type, hour) grid is 24 x #types — tiny state, unbounded input."""
    t(spark, sf_dir, "events").createOrReplaceTempView("rb_seas_events")
    return spark.sql(_SEASONAL_SQL.format(events="rb_seas_events"))


# ---------------------------------------------------------------------------
# DAU/MAU stickiness (engagement ratio).
# ---------------------------------------------------------------------------

_STICKINESS_SQL = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM {events}),
daily AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d),
monthly AS (
  SELECT date_trunc('month', d) AS month,
         CAST(SUM(dau) AS BIGINT) AS sum_dau,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1),
mau AS (
  SELECT date_trunc('month', d) AS month,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM du GROUP BY 1)
SELECT m.month, m.n_days, m.sum_dau, u.mau,
       CAST(m.sum_dau AS DOUBLE) / m.n_days AS avg_dau,
       CAST(m.sum_dau AS DOUBLE) / m.n_days / u.mau AS stickiness
FROM monthly m JOIN mau u ON m.month = u.month
"""


@register("events_stickiness_dau_mau", oracle=_STICKINESS_SQL.format(events="events"))
def events_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — the canonical engagement ratio
    (what fraction of the monthly audience shows up on an average
    day). One distinct-(day, user) pass feeds both the daily counts
    and the monthly distinct-user counts; all moments are exact
    BIGINTs, and avg_dau / stickiness are the identical two-division
    IEEE chain in both engines. The distinct pass partial-aggregates
    map-side, daily/monthly rollups are day- and month-grain tiny; at
    100 TB the only real shuffle is the (day, user) dedup, keyed well
    below user-cardinality skew thresholds."""
    t(spark, sf_dir, "events").createOrReplaceTempView("rb_stick_events")
    return spark.sql(_STICKINESS_SQL.format(events="rb_stick_events"))


# ---------------------------------------------------------------------------
# Pairwise correlation matrix (single-scan exact moments).
# ---------------------------------------------------------------------------

_CORRMAT_SQL = """
WITH x AS (
  SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS p,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS d,
         CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT) AS t
  FROM {lineitem}),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS sq,  CAST(SUM(p) AS BIGINT) AS sp,
         CAST(SUM(d) AS BIGINT) AS sd,  CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(q*q) AS BIGINT) AS sqq, CAST(SUM(p*p) AS BIGINT) AS spp,
         CAST(SUM(d*d) AS BIGINT) AS sdd, CAST(SUM(t*t) AS BIGINT) AS stt,
         CAST(SUM(q*p) AS BIGINT) AS sqp, CAST(SUM(q*d) AS BIGINT) AS sqd,
         CAST(SUM(q*t) AS BIGINT) AS sqt, CAST(SUM(p*d) AS BIGINT) AS spd,
         CAST(SUM(p*t) AS BIGINT) AS spt, CAST(SUM(d*t) AS BIGINT) AS sdt
  FROM x),
pairs AS (
  SELECT v1, v2,
         CASE v1 WHEN 'quantity' THEN sq WHEN 'price' THEN sp
                 WHEN 'discount' THEN sd ELSE st END AS sx,
         CASE v1 WHEN 'quantity' THEN sqq WHEN 'price' THEN spp
                 WHEN 'discount' THEN sdd ELSE stt END AS sxx,
         CASE v2 WHEN 'price' THEN sp WHEN 'discount' THEN sd ELSE st END AS sy,
         CASE v2 WHEN 'price' THEN spp WHEN 'discount' THEN sdd
                 ELSE stt END AS syy,
         CASE v1 || '|' || v2
           WHEN 'quantity|price' THEN sqp WHEN 'quantity|discount' THEN sqd
           WHEN 'quantity|tax' THEN sqt WHEN 'price|discount' THEN spd
           WHEN 'price|tax' THEN spt ELSE sdt END AS sxy,
         n
  FROM m CROSS JOIN (VALUES
    ('quantity', 'price'), ('quantity', 'discount'), ('quantity', 'tax'),
    ('price', 'discount'), ('price', 'tax'), ('discount', 'tax')
  ) AS lbl(v1, v2))
SELECT v1, v2, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
FROM pairs
"""


@register(
    "stats_correlation_matrix_lineitem",
    oracle=_CORRMAT_SQL.format(lineitem="lineitem"),
)
def stats_correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise Pearson correlation matrix over lineitem's four
    measures in ONE SCAN: every sum, square and cross-product is an
    exact BIGINT moment from a single combinable aggregation
    (quantization: integer dollars for price — cents squared would
    pass 2^63 at sf1 — and percent points for the rates), then the six
    (v1, v2) cells unfold by a CROSS JOIN against a 6-row VALUES
    literal, NOT six UNION'd subqueries (which would re-scan the fact
    table per cell — no CTE materialization without a checkpoint).
    Each corr is the textbook (n*Sxy - SxSy) / (sqrt(...) * sqrt(...))
    evaluated once in doubles from the exact integers — identical IEEE
    chain in both engines. The matrix generalizes
    `stats_corr_regression` (one pair) to the feature-screening pass a
    modeling pipeline runs first."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("rb_corr_lineitem")
    return spark.sql(_CORRMAT_SQL.format(lineitem="rb_corr_lineitem"))


# ---------------------------------------------------------------------------
# Weighted exact median (quantity-weighted price).
# ---------------------------------------------------------------------------

_WMEDIAN_SQL = """
WITH x AS (
  SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q
  FROM {lineitem}),
g AS (SELECT v, CAST(SUM(q) AS BIGINT) AS w, CAST(COUNT(*) AS BIGINT) AS c
      FROM x GROUP BY v),
cum AS (
  SELECT v,
         CAST(SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cw,
         CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cc
  FROM g),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw, CAST(SUM(c) AS BIGINT) AS tc
        FROM g)
SELECT MIN(t.tw) AS total_weight,
       MIN(CASE WHEN cw >= (tw + 1) {div} 2 THEN v END) AS weighted_median_cents,
       MIN(CASE WHEN cc >= (tc + 1) {div} 2 THEN v END) AS unweighted_median_cents
FROM cum CROSS JOIN tot t
"""


@register(
    "stats_weighted_median_price",
    oracle=_WMEDIAN_SQL.format(lineitem="lineitem", div="//"),
)
def stats_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted exact median of line price (the 'median dollar
    spent', not the 'median line') next to the plain row median — the
    two disagree whenever quantity correlates with price, which is
    exactly what a pricing monitor needs to see. Same distinct-value
    rank-pick machinery as the MAD/winsorize tranche, with the
    cumulative counter summing integer QUANTITY weights instead of
    rows; both medians read off one cumulative pass. Only dialect
    split: DIV vs //."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("rb_wm_lineitem")
    return spark.sql(_WMEDIAN_SQL.format(lineitem="rb_wm_lineitem", div="DIV"))


# ---------------------------------------------------------------------------
# Percent-of-parent hierarchical report (nation within region within total).
# ---------------------------------------------------------------------------

_SHARE_SQL = """
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS rev_dec
  FROM {orders} o
  JOIN {customer} c ON o.o_custkey = c.c_custkey
  JOIN {nation} n ON c.c_nationkey = n.n_nationkey
  JOIN {region} r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name)
SELECT region, nation,
       CAST(rev_dec AS DOUBLE) AS nation_rev,
       CAST(rev_dec AS DOUBLE)
         / CAST(SUM(rev_dec) OVER (PARTITION BY region) AS DOUBLE)
         AS share_of_region,
       CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER () AS DOUBLE)
         AS share_of_total
FROM rev
"""


@register(
    "report_revenue_share_hierarchy",
    oracle=_SHARE_SQL.format(
        orders="orders", customer="customer", nation="nation", region="region"
    ),
)
def report_revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent revenue report: each nation's revenue with its
    share of the region and of the grand total — the hierarchical BI
    staple one level up from `window_ratio_to_report` (two parent
    grains in one pass). The fact scan collapses to nation grain first
    (exact DECIMAL sums), so both share windows run over ~25 rows —
    window cost is grain-sized, never fact-sized. Crucially the PARENT
    sums stay DECIMAL through the window (a double window sum
    re-accumulates in engine-specific order and drifted a last ulp —
    caught by the hash gate), so every double is born from one cast +
    one IEEE division."""
    for name in ("orders", "customer", "nation", "region"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"rb_sh_{name}")
    return spark.sql(
        _SHARE_SQL.format(
            orders="rb_sh_orders",
            customer="rb_sh_customer",
            nation="rb_sh_nation",
            region="rb_sh_region",
        )
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (CRM staple on the order history).
# ---------------------------------------------------------------------------

_RFM_SQL = """
WITH m AS (
  SELECT o_custkey AS custkey,
         MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM {orders} GROUP BY o_custkey),
scored AS (
  SELECT custkey, frequency, monetary_cents,
         NTILE(3) OVER (ORDER BY last_order DESC, custkey) AS r_score,
         NTILE(3) OVER (ORDER BY frequency DESC, custkey) AS f_score,
         NTILE(3) OVER (ORDER BY monetary_cents DESC, custkey) AS m_score
  FROM m)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(monetary_cents) AS BIGINT) AS segment_revenue_cents,
       MIN(custkey) AS example_custkey
FROM scored GROUP BY r_score, f_score, m_score
"""


@register("report_rfm_segments", oracle=_RFM_SQL.format(orders="orders"))
def report_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation over the order history — THE CRM analysis for
    exactly the Salesforce-shaped data the reference pipelines
    (SURVEY §1.1): customers tertiled by recency, frequency and
    monetary value (1 = best), rolled up to the 27 RFM cells with
    size and revenue. One combinable groupBy collapses orders to
    customer grain; the three NTILEs then run over CUSTOMER-grain
    rows (not orders), totally ordered with a custkey tie-break so
    both engines cut identical tertiles. Monetary is exact cents."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("rb_rfm_orders")
    return spark.sql(_RFM_SQL.format(orders="rb_rfm_orders"))


# ---------------------------------------------------------------------------
# ROC-AUC from rank statistics (Mann-Whitney identity).
# ---------------------------------------------------------------------------

_AUC_SQL = """
WITH ab AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM {events} WHERE event_type IN ('click', 'purchase')),
g AS (
  SELECT x, CAST(SUM(pos) AS BIGINT) AS p, COUNT(*) AS t
  FROM ab GROUP BY x),
c AS (
  SELECT x, p, t,
         COALESCE(CAST(SUM(t) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS BIGINT), 0) AS cb
  FROM g),
m AS (
  SELECT CAST(SUM(p * (2 * cb + t + 1)) AS BIGINT) AS s2rp,
         CAST(SUM(p) AS BIGINT) AS np,
         CAST(SUM(t) AS BIGINT) AS n
  FROM c)
SELECT np AS n_positive, n - np AS n_negative,
       (CAST(s2rp - np * (np + 1) AS DOUBLE) / 2)
         / (CAST(np AS DOUBLE) * (n - np)) AS auc
FROM m
"""


@register("eval_auc_value_separates_purchase", oracle=_AUC_SQL.format(events="events"))
def eval_auc_value_separates_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of `value` as a classifier score for purchase-vs-click —
    via the exact rank identity AUC = U_pos / (n_pos * n_neg), i.e.
    the probability a random positive outscores a random negative
    (ties count half, handled exactly by the doubled midrank sum from
    `stats_mann_whitney_u`). The model-evaluation twin of the U test:
    same distinct-value midrank algebra, all BIGINTs, one final IEEE
    division — no per-row ranking, no threshold sweep (the AUC needs
    neither)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("rb_auc_events")
    return spark.sql(_AUC_SQL.format(events="rb_auc_events"))


# ---------------------------------------------------------------------------
# Time-to-convert distribution (funnel latency histogram).
# ---------------------------------------------------------------------------

_TTC_SQL = """
WITH s AS (
  SELECT user_id, MIN({us}(ts)) AS signup_us
  FROM {events} WHERE event_type = 'signup' GROUP BY user_id),
p AS (
  SELECT e.user_id, MIN({us}(e.ts)) AS purchase_us
  FROM {events} e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND {us}(e.ts) >= s.signup_us
  GROUP BY e.user_id),
gaps AS (
  SELECT p.user_id, (purchase_us - signup_us) {div} 3600000000 AS gap_hours
  FROM p JOIN s ON p.user_id = s.user_id)
SELECT gap_hours,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM gaps GROUP BY gap_hours
"""


@register(
    "funnel_time_to_convert",
    oracle=_TTC_SQL.format(events="events", us="epoch_us", div="//"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: hours from each user's FIRST
    signup to their first purchase at-or-after it, histogrammed by
    whole hours — the latency profile behind the funnel counts
    (`funnel_signup_view_purchase` says HOW MANY convert; this says
    HOW FAST, which sets the attribution window and the nurture-email
    timer). Conditional-min stage chaining (the funnel pattern), exact
    integer microseconds bucketed by integer division — three
    combinable aggregations, no window, no per-row ranking. Dialect
    splits: epoch accessor and DIV."""
    t(spark, sf_dir, "events").createOrReplaceTempView("rb_ttc_events")
    return spark.sql(
        _TTC_SQL.format(events="rb_ttc_events", us="unix_micros", div="DIV")
    )


# ---------------------------------------------------------------------------
# Benford first-digit conformance (fraud/data-entry screen).
# ---------------------------------------------------------------------------

# Benford probabilities log10(1+1/d) as exact rational constants
# (numerators per 1e9) — no engine logarithm ever runs.
_BENFORD_NUM = [301029996, 176091259, 124938737, 96910013, 79181246,
                66946790, 57991947, 51152522, 45757491]

_BENFORD_SQL = """
WITH x AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS {str}),
                        1, 1) AS BIGINT) AS d
  FROM {orders} WHERE o_totalprice >= 1),
obs AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY d),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM obs),
bp AS (
  SELECT * FROM (VALUES {bvalues}) AS t(d, p_num))
SELECT bp.d AS digit,
       CAST(COALESCE(obs.c, 0) AS BIGINT) AS n_observed,
       CAST(bp.p_num AS DOUBLE) / 1000000000 AS benford_p,
       CAST(COALESCE(obs.c, 0) AS DOUBLE) / MIN(tot.n) OVER () AS observed_p,
       (CAST(COALESCE(obs.c, 0) AS DOUBLE)
          - CAST(MIN(tot.n) OVER () AS DOUBLE) * bp.p_num / 1000000000)
       * (CAST(COALESCE(obs.c, 0) AS DOUBLE)
          - CAST(MIN(tot.n) OVER () AS DOUBLE) * bp.p_num / 1000000000)
       / (CAST(MIN(tot.n) OVER () AS DOUBLE) * bp.p_num / 1000000000)
         AS chi2_term
FROM bp LEFT JOIN obs ON obs.d = bp.d CROSS JOIN tot
"""


def _benford_values() -> str:
    return ", ".join(f"({d + 1}, {n})" for d, n in enumerate(_BENFORD_NUM))


@register(
    "stats_benford_first_digit",
    oracle=_BENFORD_SQL.format(
        orders="orders", bvalues=_benford_values(), str="VARCHAR"
    ),
)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the
    classic fraud / fabricated-data detector (organic multiplicative
    amounts follow P(d) = log10(1+1/d); invented numbers don't).
    Digit extraction is pure string arithmetic on the integer part;
    the expected probabilities are HARD-CODED exact rationals
    (numerators per 1e9), so no engine logarithm ever runs, and each
    chi-square term is one identical IEEE expression from exact
    counts. Synthetic uniform fixtures FAIL Benford loudly — which is
    itself the demonstration: the screen flags non-organic data.
    Per-digit rows so the analyst sees where conformance breaks."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("rb_bf_orders")
    return spark.sql(
        _BENFORD_SQL.format(
            orders="rb_bf_orders", bvalues=_benford_values(), str="STRING"
        )
    )


# ---------------------------------------------------------------------------
# Business-day lead times (calendar arithmetic without DOW dialects).
# ---------------------------------------------------------------------------

# cumBus(n) = business days in epoch-days [0..n] (1970-01-01 = Thursday):
# 5*((n+3) DIV 7) + LEAST((n+3)%7 + 1, 5) - 3 — pure integer arithmetic,
# so no engine day-of-week convention (Sunday=0 vs 1 vs 7) ever applies.
_BDAYS_SQL = """
WITH d AS (
  SELECT {days_order} AS d1, {days_ship} AS d2
  FROM {lineitem} l JOIN {orders} o ON l.l_orderkey = o.o_orderkey),
b AS (
  SELECT (5 * ((d2 + 3) {div} 7) + LEAST((d2 + 3) % 7 + 1, 5) - 3)
       - (5 * ((d1 + 3) {div} 7) + LEAST((d1 + 3) % 7 + 1, 5) - 3)
         AS lead_bdays
  FROM d)
SELECT CAST(lead_bdays AS BIGINT) AS lead_bdays,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM b GROUP BY lead_bdays
"""


@register(
    "scalar_business_days_lead_time",
    oracle=_BDAYS_SQL.format(
        lineitem="lineitem",
        orders="orders",
        days_order="date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))",
        days_ship="date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE))",
        div="//",
    ),
)
def scalar_business_days_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead times in BUSINESS days, histogrammed — the
    SLA metric calendar-day differences overstate by ~40% over
    weekends. The weekday math never touches an engine day-of-week
    function (Sunday is 0, 1 or 7 depending on the engine — the
    `scalar_date_functions2` lesson): business-day counts come from a
    closed-form integer prefix function over epoch days anchored at
    1970-01-01 (a Thursday), so the only dialect splits are the
    datediff argument order and DIV. Map-side arithmetic on a plain
    FK join, one combinable histogram aggregate."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("rb_bd_lineitem")
    t(spark, sf_dir, "orders").createOrReplaceTempView("rb_bd_orders")
    return spark.sql(
        _BDAYS_SQL.format(
            lineitem="rb_bd_lineitem",
            orders="rb_bd_orders",
            days_order="datediff(CAST(o.o_orderdate AS DATE), DATE '1970-01-01')",
            days_ship="datediff(CAST(l.l_shipdate AS DATE), DATE '1970-01-01')",
            div="DIV",
        )
    )


# ---------------------------------------------------------------------------
# Largest-remainder proportional allocation (exact integer apportionment).
# ---------------------------------------------------------------------------

_ALLOC_SQL = """
WITH rev AS (
  SELECT n.n_name AS nation,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM {orders} o
  JOIN {customer} c ON o.o_custkey = c.c_custkey
  JOIN {nation} n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev),
q AS (
  SELECT nation, cents,
         (10000 * cents) {div} t AS base,
         (10000 * cents) % t AS remainder
  FROM rev CROSS JOIN tot),
d AS (SELECT CAST(10000 - SUM(base) AS BIGINT) AS deficit FROM q),
r AS (
  SELECT nation, cents, base, remainder,
         ROW_NUMBER() OVER (ORDER BY remainder DESC, nation) AS rnk
  FROM q)
SELECT r.nation, r.cents AS revenue_cents,
       CAST(r.base + (CASE WHEN r.rnk <= d.deficit THEN 1 ELSE 0 END)
            AS BIGINT) AS allocated
FROM r CROSS JOIN d
"""


@register(
    "report_budget_allocation_largest_remainder",
    oracle=_ALLOC_SQL.format(
        orders="orders", customer="customer", nation="nation", div="//"
    ),
)
def report_budget_allocation_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Allocate a 10,000-unit budget across nations proportional to
    revenue with LARGEST-REMAINDER rounding (Hamilton apportionment):
    integer floor shares first, then the leftover units go to the
    largest fractional remainders (ties by nation name) — the only
    rounding scheme where the allocations are integers AND sum to the
    budget EXACTLY (independent per-group rounding drifts by the group
    count). Everything is exact integer arithmetic — quotients and
    remainders of 10000*cents against the grand total — so the
    allocation is bit-identical in both engines; the ROW_NUMBER runs
    over ~25 nation-grain rows. The quota/budget/sampling-allocation
    primitive (also exactly how `mix_to_target`'s integer feasible
    totals avoid drift)."""
    for name in ("orders", "customer", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"rb_al_{name}")
    return spark.sql(
        _ALLOC_SQL.format(
            orders="rb_al_orders",
            customer="rb_al_customer",
            nation="rb_al_nation",
            div="DIV",
        )
    )
