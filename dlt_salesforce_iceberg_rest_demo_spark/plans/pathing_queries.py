"""Pathing / interval-algebra tranche: interval coalescing, top event
trigram paths, categorical diversity (Gini impurity), and CUSUM
changepoint scores.

The reference has no analytics executor (SURVEY.md §2.7); these extend
the behavioral-analytics layer (`events_transition_matrix`,
`interval_max_concurrency`, `sessionize_events`) with the remaining
classics: flattening overlapping intervals into maximal islands
(billing/coverage math), 3-step path mining (where 2-step transition
matrices miss structure), a diversity index with no logarithm (engine
libm differs — Gini impurity is exact rational where entropy is not),
and the CUSUM drift statistic over the daily series.

House determinism rules: exact integer microseconds and counts
everywhere a value is summed or ranked; doubles only as single picked
values or one identical final IEEE expression; window running sums
only over bounded domains (per-user intervals, ~30 days) — never over
the raw global event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._helpers import t
from .registry import register

# ---------------------------------------------------------------------------
# Interval coalescing (gaps-and-islands union of overlapping intervals).
# ---------------------------------------------------------------------------

_COALESCE_SQL = """
WITH iv AS (
  SELECT user_id, {us}(ts) AS s, {us}(ts) + 1800000000 AS e FROM {events}),
m AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_e
  FROM iv),
isl AS (
  SELECT user_id, s, e,
         CAST(SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM m),
agg AS (
  SELECT user_id, island,
         MIN(s) AS island_s, MAX(e) AS island_e
  FROM isl GROUP BY user_id, island)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(island_e - island_s) AS BIGINT) AS covered_us,
       CAST(MAX(island_e - island_s) AS BIGINT) AS longest_island_us
FROM agg GROUP BY user_id
"""


@register(
    "interval_coalesce_user_coverage",
    oracle=_COALESCE_SQL.format(events="events", us="epoch_us"),
)
def interval_coalesce_user_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce each user's overlapping activity intervals (every event
    opens [ts, ts+30min)) into maximal islands and report coverage —
    the interval-UNION measure (total engaged time, billing coverage,
    SLA uptime) that naive per-event sums double-count. Classic
    gaps-and-islands: a running MAX of interval ends per user marks
    island starts (s > max end so far), a running island counter
    groups them; both windows are per-user (bounded state — the same
    scale argument as `interval_max_concurrency`'s bucketed sweep).
    All arithmetic is exact integer microseconds; dialect split is the
    epoch accessor only."""
    t(spark, sf_dir, "events").createOrReplaceTempView("pa_coal_events")
    return spark.sql(_COALESCE_SQL.format(events="pa_coal_events", us="unix_micros"))


# ---------------------------------------------------------------------------
# Top 3-step event paths (trigram path mining).
# ---------------------------------------------------------------------------

_PATHS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS p1,
         LAG(event_type, 2) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS p2
  FROM {events}),
tri AS (
  SELECT p2 AS step1, p1 AS step2, event_type AS step3,
         CAST(COUNT(*) AS BIGINT) AS n_paths
  FROM s WHERE p2 IS NOT NULL
  GROUP BY 1, 2, 3)
SELECT step1, step2, step3, n_paths
FROM tri ORDER BY n_paths DESC, step1, step2, step3 LIMIT 20
"""


@register("events_top_trigram_paths", oracle=_PATHS_SQL.format(events="events"))
def events_top_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step event paths per user stream — path mining one
    order above `events_transition_matrix` (A->B->C structure that
    pairwise transitions provably cannot see). Two LAGs in ONE window
    pass per user (single shuffle, no self-joins — the naive 3-way
    sequence join is quadratic in per-user activity), then a
    combinable trigram count and a deterministic top-k ((n DESC, path)
    tie-break). The path-type domain is |types|^3-bounded, so the
    final aggregate is tiny at any corpus scale."""
    t(spark, sf_dir, "events").createOrReplaceTempView("pa_tri_events")
    return spark.sql(_PATHS_SQL.format(events="pa_tri_events"))


# ---------------------------------------------------------------------------
# Categorical diversity via Gini impurity (no-logarithm entropy stand-in).
# ---------------------------------------------------------------------------

_IMPURITY_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS ct
  FROM {events} GROUP BY user_id, event_type),
m AS (
  SELECT user_id,
         CAST(SUM(ct) AS BIGINT) AS n,
         CAST(SUM(ct * ct) AS BIGINT) AS sq,
         CAST(COUNT(*) AS BIGINT) AS n_types
  FROM c GROUP BY user_id)
SELECT user_id, n AS n_events, n_types,
       CAST(n * n - sq AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini_impurity
FROM m
"""


@register("events_type_diversity_gini", oracle=_IMPURITY_SQL.format(events="events"))
def events_type_diversity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity as Gini impurity 1 - sum(p_i^2) =
    (n^2 - sum c_i^2) / n^2 — the diversity index chosen PRECISELY
    because it needs no logarithm: Shannon entropy's ln differs in the
    last ulp across engine libms (the BM25/idf lesson), while impurity
    is one IEEE division of exact BIGINTs. Bot detection (impurity ~0:
    one repeated action) and power-user scoring in two combinable
    aggregations, the second over the (user x type) table only."""
    t(spark, sf_dir, "events").createOrReplaceTempView("pa_gini_events")
    return spark.sql(_IMPURITY_SQL.format(events="pa_gini_events"))


# ---------------------------------------------------------------------------
# CUSUM changepoint score over the daily value series.
# ---------------------------------------------------------------------------

_CUSUM_SQL = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM {events} GROUP BY 1),
tot AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS s, CAST(SUM(n) AS BIGINT) AS m
  FROM d),
dev AS (
  SELECT day, cents, n,
         CAST(cents AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / m)
           AS deviation
  FROM d CROSS JOIN tot),
cu AS (
  SELECT day, deviation,
         SUM(deviation) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cusum
  FROM dev)
SELECT day, deviation, cusum FROM cu
"""


@register("timeseries_cusum_daily", oracle=_CUSUM_SQL.format(events="events"))
def timeseries_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily CUSUM drift statistic over event values: per-day deviation
    from the global per-event mean, accumulated in day order — the
    changepoint detector whose peak marks WHEN a metric's level
    shifted (a mean-based monitor only says THAT it shifted). Daily
    cents and counts are exact BIGINTs from one combinable groupBy;
    the mean is one shared IEEE division; deviations and their running
    sum accumulate in the SAME deterministic day order in both engines
    (the cumulative window is day-grain — ~30 rows here, bounded by
    calendar span, never by event volume)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("pa_cusum_events")
    return spark.sql(_CUSUM_SQL.format(events="pa_cusum_events"))


# ---------------------------------------------------------------------------
# Join-cardinality pre-flight estimate (exact, without running the join).
# ---------------------------------------------------------------------------

_JOINCARD_SQL = """
WITH a AS (
  SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS ca
  FROM {lineitem} GROUP BY l_orderkey),
b AS (
  SELECT o_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS cb
  FROM {orders} GROUP BY o_orderkey),
j AS (SELECT a.key, ca, cb FROM a JOIN b ON a.key = b.key)
SELECT CAST(COUNT(*) AS BIGINT) AS n_matching_keys,
       CAST(SUM(ca * cb) AS BIGINT) AS predicted_rows,
       CAST(MAX(ca * cb) AS BIGINT) AS max_key_product,
       CAST(MAX(ca) AS BIGINT) AS max_left_count,
       CAST(MAX(cb) AS BIGINT) AS max_right_count
FROM j
"""


@register(
    "profile_join_cardinality",
    oracle=_JOINCARD_SQL.format(lineitem="lineitem", orders="orders"),
)
def profile_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT join-output cardinality WITHOUT running the join:
    |A ⋈ B| = sum over matching keys of ca*cb, from two combinable
    per-key counts joined on the key domain (key-cardinality-sized,
    not row-sized — the shuffle moves one row per distinct key). The
    pre-flight that, with `profile_key_skew_lineitem`, decides whether
    a planned join is safe to run at all: max_key_product is the
    single hottest output cell (the row-explosion an AQE skew split
    would have to absorb), and predicted_rows prices the shuffle
    before a 100-TB join is launched. All counts and products exact
    BIGINTs."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("pa_jc_lineitem")
    t(spark, sf_dir, "orders").createOrReplaceTempView("pa_jc_orders")
    return spark.sql(
        _JOINCARD_SQL.format(lineitem="pa_jc_lineitem", orders="pa_jc_orders")
    )


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps'-law corpus diagnostic).
# ---------------------------------------------------------------------------

_VOCAB_GROWTH_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS tk
  FROM {documents}),
first_seen AS (
  SELECT tk, MIN(doc_id) AS first_doc FROM tok GROUP BY tk),
new_per_doc AS (
  SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM first_seen GROUP BY first_doc),
docs AS (SELECT DISTINCT doc_id FROM tok)
SELECT d.doc_id,
       CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new_tokens,
       CAST(SUM(COALESCE(n.n_new, 0))
            OVER (ORDER BY d.doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS vocab_size
FROM docs d LEFT JOIN new_per_doc n ON n.doc_id = d.doc_id
"""


@register("text_vocab_growth", oracle=_VOCAB_GROWTH_SQL.format(documents="documents"))
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve in doc-id order (the Heaps'-law
    diagnostic): distinct vocabulary size after each document, from
    each token's FIRST-occurrence document — a corpus whose curve goes
    flat is repetitive/templated; one that keeps climbing is diverse
    (and tells you what a tokenizer's vocab should expect). No
    sequential scan over documents: first-seen is a combinable MIN per
    token, new-token counts roll up per doc, and the cumulative sum
    runs over the DOC-ID domain only (corpus-count-sized, the same
    bounded-window argument as `timeseries_cusum_daily`). The Spark
    side shares the SQL template verbatim."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("pa_vg_documents")
    # Spark's split/explode twin of DuckDB's string_split/unnest.
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW pa_vg_tok AS
        SELECT DISTINCT doc_id, tk
        FROM pa_vg_documents
        LATERAL VIEW explode(split(lower(text), ' ')) AS tk
        """
    )
    body = _VOCAB_GROWTH_SQL.format(documents="pa_vg_documents").replace(
        """WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS tk
  FROM pa_vg_documents),""",
        "WITH tok AS (SELECT doc_id, tk FROM pa_vg_tok),",
    )
    return spark.sql(body)


# ---------------------------------------------------------------------------
# Dedup impact report (what dedup would save, before running it).
# ---------------------------------------------------------------------------

_DEDUP_IMPACT_SQL = """
WITH g AS (
  SELECT text, CAST(COUNT(*) AS BIGINT) AS n_copies,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM {documents} GROUP BY text)
SELECT n_copies,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(n_copies - 1) AS BIGINT) AS rows_removed,
       CAST(SUM((n_copies - 1) * n_chars) AS BIGINT) AS chars_saved
FROM g GROUP BY n_copies
"""


@register("dedup_impact_report", oracle=_DEDUP_IMPACT_SQL.format(documents="documents"))
def dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What exact dedup WOULD save, before rewriting anything: the
    duplicate-cluster size distribution with rows and bytes reclaimed
    per cluster size — the sizing report that decides whether a 100-TB
    dedup pass pays for itself (and the monitoring surface for
    duplication creeping into an ingest feed). Two combinable
    aggregations: content groups (the only row-sized shuffle — and it
    moves (hash, length) not payloads at scale), then the
    cluster-size histogram."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("pa_di_documents")
    return spark.sql(_DEDUP_IMPACT_SQL.format(documents="pa_di_documents"))


# ---------------------------------------------------------------------------
# Rolling 7-day active users (sliding-window distinct).
# ---------------------------------------------------------------------------

_WAU_SQL = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM {events}),
days AS (SELECT DISTINCT d FROM du),
win AS (
  SELECT w.d AS window_day, du.user_id
  FROM du JOIN days w
    ON du.d <= w.d AND du.d > w.d - INTERVAL 7 DAY)
SELECT window_day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users_7d
FROM win GROUP BY window_day
"""


@register("events_rolling_7day_active_users", oracle=_WAU_SQL.format(events="events"))
def events_rolling_7day_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the WAU curve. Sliding
    DISTINCT cannot partial-aggregate as a window function, so the
    shape is: dedup to (day, user) once (the only row-sized shuffle),
    then replicate each day-user fact to the <= 7 window days it
    supports via a calendar-bounded range join (days table is
    span-sized, so the join fans out 7x on day-grain data, never on
    raw events), then a distinct count per window day. The streaming
    twin would be a sliding `F.window` with
    `approx_count_distinct`/HLL state; this is the exact batch
    report."""
    t(spark, sf_dir, "events").createOrReplaceTempView("pa_wau_events")
    return spark.sql(_WAU_SQL.format(events="pa_wau_events"))


# ---------------------------------------------------------------------------
# Deterministic pseudonymization (FK-preserving PII tokenization).
# ---------------------------------------------------------------------------

_PSEUDO_ORACLE = """
WITH c AS (
  SELECT sha256('fixture-salt|' || CAST(c_custkey AS VARCHAR)) AS ckey_token,
         sha256('fixture-salt|' || c_name) AS name_token,
         c_mktsegment
  FROM customer),
o AS (
  SELECT sha256('fixture-salt|' || CAST(o_custkey AS VARCHAR)) AS ckey_token
  FROM orders)
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(DISTINCT c.ckey_token) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT c.name_token) AS BIGINT) AS n_name_tokens,
       CAST(COUNT(o.ckey_token) AS BIGINT) AS n_orders_via_token
FROM c LEFT JOIN o ON o.ckey_token = c.ckey_token
GROUP BY c.c_mktsegment
"""


@register("privacy_pseudonymize_join", oracle=_PSEUDO_ORACLE)
def privacy_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-preserving pseudonymization (`normalize.pseudonymize`):
    customer keys and names replaced by salted md5 tokens, then orders
    JOINED TO CUSTOMERS ENTIRELY ON TOKENS — the governance property
    that makes a de-identified lake export still analyzable (equal raw
    values tokenize identically across tables, so FK joins, group-bys
    and dedup survive; random UUIDs would break all three). Per
    segment: distinct customer tokens (== distinct customers —
    tokenization is injective in practice), distinct name tokens, and
    the order count recovered through the token join (== the raw-key
    join count). Tokenization is one map-side md5 projection per
    table."""
    from pyspark.sql import functions as F

    from ..normalize import pseudonymize

    c = pseudonymize(
        t(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("ckey_token"),
            F.col("c_name").alias("name_token"),
            "c_mktsegment",
        ),
        ["ckey_token", "name_token"],
        salt="fixture-salt",
    )
    o = pseudonymize(
        t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("ckey_token")),
        ["ckey_token"],
        salt="fixture-salt",
    )
    return (
        c.join(o, "ckey_token", "left")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.countDistinct(c["ckey_token"]).cast("bigint").alias("n_customers"),
            F.countDistinct("name_token").cast("bigint").alias("n_name_tokens"),
            F.count(o["ckey_token"]).cast("bigint").alias("n_orders_via_token"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity risk report (quasi-identifier group sizes).
# ---------------------------------------------------------------------------

_KANON_SQL = """
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS group_size
  FROM {customer}
  GROUP BY 1, 2, 3)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(group_size) AS BIGINT) AS min_group_size,
       CAST(SUM(CASE WHEN group_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_risky_groups,
       CAST(SUM(CASE WHEN group_size < 5 THEN group_size ELSE 0 END) AS BIGINT)
         AS n_risky_rows
FROM qi
"""


@register("privacy_k_anonymity_check", oracle=_KANON_SQL.format(customer="customer"))
def privacy_k_anonymity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier triple (nation,
    market segment, account-balance band): rows whose QI group has
    fewer than k=5 members are re-identifiable by linkage even after
    `normalize.pseudonymize` strips direct identifiers — this report
    counts the groups and rows below the threshold, the go/no-go
    check before any de-identified export. One combinable groupBy on
    the QI tuple + a tiny rollup; generalizing a QI (coarser bands)
    to fix a failing report just widens the first groupBy's keys."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("pa_ka_customer")
    return spark.sql(_KANON_SQL.format(customer="pa_ka_customer"))


# ---------------------------------------------------------------------------
# Built-in session_window in BATCH mode (streaming/batch unification).
# ---------------------------------------------------------------------------

_SESSWIN_ORACLE = """
WITH o AS (
  SELECT user_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
marked AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
           AS is_start
  FROM o),
sess AS (
  SELECT user_id, ts, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, sid
"""


@register("window_session_builtin", oracle=_SESSWIN_ORACLE)
def window_session_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native `session_window` aggregation in BATCH mode — the
    same operator Structured Streaming uses for session state, proving
    the batch/stream unification: one code path, two execution modes
    (the custom gaps-and-islands `sessionize_events` is its
    window-function twin; the ORACLE uses that formulation, pinning
    Spark's session semantics — window end = last event + gap —
    against an independent derivation). groupBy(user, session_window)
    partial-aggregates map-side; decimal-stabilized value sums."""
    from pyspark.sql import functions as F

    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Growth accounting (new / retained / resurrected / churned per day).
# ---------------------------------------------------------------------------

_GROWTH_SQL = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM {events}),
flags AS (
  SELECT d, user_id,
         MIN(d) OVER (PARTITION BY user_id) AS first_day,
         LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_active
  FROM du),
today AS (
  SELECT d,
         CAST(SUM(CASE WHEN d = first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
         CAST(SUM(CASE WHEN d > first_day
                        AND prev_active = d - INTERVAL 1 DAY
                       THEN 1 ELSE 0 END) AS BIGINT) AS retained_users,
         CAST(SUM(CASE WHEN d > first_day
                        AND (prev_active IS NULL
                             OR prev_active < d - INTERVAL 1 DAY)
                       THEN 1 ELSE 0 END) AS BIGINT) AS resurrected_users
  FROM flags GROUP BY d),
churn AS (
  SELECT f.d + INTERVAL 1 DAY AS d, CAST(COUNT(*) AS BIGINT) AS churned_users
  FROM flags f
  LEFT JOIN du nxt
    ON nxt.user_id = f.user_id AND nxt.d = f.d + INTERVAL 1 DAY
  WHERE nxt.user_id IS NULL
  GROUP BY f.d)
SELECT t.d AS day, t.new_users, t.retained_users, t.resurrected_users,
       CAST(COALESCE(c.churned_users, 0) AS BIGINT) AS churned_users
FROM today t LEFT JOIN churn c ON c.d = t.d
"""


@register("events_growth_accounting", oracle=_GROWTH_SQL.format(events="events"))
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting — the product-analytics ledger that
    decomposes every day's active users into NEW (first day ever),
    RETAINED (also active yesterday), RESURRECTED (active before, but
    not yesterday), plus the users CHURNED out of each day (active
    the previous day, absent today): new + retained + resurrected =
    DAU, and DAU_t - DAU_{t-1} = new + resurrected - churned — the
    identity behind every growth dashboard. One distinct (day, user)
    pass feeds two per-user windows (first day, previous active day —
    user-partitioned, bounded state) and a day-grain anti-join for
    churn; everything else is calendar-sized. All counts exact."""
    t(spark, sf_dir, "events").createOrReplaceTempView("pa_ga_events")
    return spark.sql(_GROWTH_SQL.format(events="pa_ga_events"))


# ---------------------------------------------------------------------------
# Functional-dependency checker (A -> B violation profiling).
# ---------------------------------------------------------------------------

_FD_SQL = """
WITH rhs AS (
  SELECT l_partkey AS lhs,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_rhs,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM {lineitem} GROUP BY l_partkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lhs_values,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_lhs,
       CAST(MAX(n_rhs) AS BIGINT) AS max_distinct_rhs,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS n_rows_in_violation
FROM rhs
"""


@register("dq_functional_dependency", oracle=_FD_SQL.format(lineitem="lineitem"))
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profile for the candidate FD
    l_partkey -> l_suppkey: how many left-hand values map to more than
    one right-hand value, the worst fan-out, and the row mass inside
    violations — the schema-discovery / data-quality probe that tells
    you whether a column pair is really a lookup (violations == 0 ->
    safe to normalize into a dimension; here parts ship from MANY
    suppliers, so the FD fails loudly and measurably). Extends
    `dq_check_orders`' declared expectations with DISCOVERED
    structure. Two combinable aggregations, LHS-domain-sized."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("pa_fd_lineitem")
    return spark.sql(_FD_SQL.format(lineitem="pa_fd_lineitem"))


# ---------------------------------------------------------------------------
# Weekly activity heatmap (weekday x hour grid, no DOW dialects).
# ---------------------------------------------------------------------------

_HEATMAP_SQL = """
WITH x AS (
  SELECT ({days} + 3) % 7 AS weekday,
         CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hod,
         value
  FROM {events})
SELECT CAST(weekday AS BIGINT) AS weekday, hod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM x GROUP BY weekday, hod
"""


@register(
    "events_weekly_heatmap",
    oracle=_HEATMAP_SQL.format(
        events="events",
        days="date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))",
    ),
)
def events_weekly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday x hour activity heatmap (0 = Monday) — the load-shape
    grid behind capacity planning and the input for weekday-aware
    seasonal baselines (`events_seasonal_baseline` is hour-only). The
    weekday comes from the same engine-neutral integer arithmetic as
    `scalar_business_days_lead_time` ((epoch_days + 3) % 7 — no
    engine DOW convention), hours from a shared EXTRACT; one
    combinable aggregate onto the fixed 7 x 24 grid — tiny state at
    any event volume."""
    t(spark, sf_dir, "events").createOrReplaceTempView("pa_hm_events")
    return spark.sql(
        _HEATMAP_SQL.format(
            events="pa_hm_events",
            days="datediff(CAST(ts AS DATE), DATE '1970-01-01')",
        )
    )


# ---------------------------------------------------------------------------
# Regex funnel: MATCH_RECOGNIZE-shaped sequence pattern matching.
# ---------------------------------------------------------------------------

_REGEX_FUNNEL_ORACLE = """
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts) AS seq
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(length(seq) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(seq, 'v[^p]*c[^p]*p')) AS BIGINT)
         AS n_funnels
FROM seqs
WHERE len(regexp_extract_all(seq, 'v[^p]*c[^p]*p')) > 0
"""


@register("events_regex_funnel", oracle=_REGEX_FUNNEL_ORACLE)
def events_regex_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-shaped funnel via regex over event-type
    sequences: each user's time-ordered events collapse to a string of
    single-letter symbols (event types have distinct initials in the
    fixture vocabulary), and the funnel 'view, then click, then
    purchase, with no intervening purchase' is the regex
    ``v[^p]*c[^p]*p`` counted non-overlapping left-to-right — exactly
    a MATCH_RECOGNIZE PATTERN (V X* C Y* P) with DEFINE X/Y AS type <>
    'purchase', expressed with primitives both engines share (Flink/
    Trino expose the SQL:2016 syntax; the plan is identical: per-key
    sort + NFA scan). Spark shape: one shuffle to
    (user, sorted symbol string) via array_sort(collect_list(struct)),
    then a map-side regexp_count; at 100 TB the sequence build is the
    same shuffle every sessionization already pays, and per-user
    sequences are entity-bounded."""
    from pyspark.sql import functions as F

    ev = t(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(F.col("ts"), F.substring("event_type", 1, 1).alias("sym")).alias(
                "e"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("e")), lambda x: x["sym"]),
                "",
            ).alias("seq")
        )
    )
    return seq.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.regexp_count("seq", F.lit(r"v[^p]*c[^p]*p")).cast("bigint").alias(
            "n_funnels"
        ),
    ).filter(F.col("n_funnels") > 0)
