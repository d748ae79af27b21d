"""Analytics tranche: triangle counting, prefix-filtered set-similarity
join, random-projection reduction, higher-moment statistics, exact
interpolated percentiles, per-group mode, inverted index.

These extend the engine surface beyond the reference (which has no
analytics executor at all — SURVEY.md §2.7) along the driver's
north-star axes: corpus dedup at scale (prefix filtering), embedding
pipelines (random projection), graph structure over FK-derived edges
(triangles), and the descriptive-statistics layer every profiling /
data-quality pass needs (skewness/kurtosis, percentiles, mode).

Determinism follows the house rules (see registry module docstring):
exact integer moments for anything summed, fixed-point folds for
floats, md5 buckets for sampling, rational thresholds for filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, graph, similarity, text
from ._helpers import t
from .registry import register

# ---------------------------------------------------------------------------
# Triangle counting on the supplier co-occurrence graph.
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
  FROM lineitem x JOIN lineitem y
    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey),
e AS (
  SELECT a, b FROM pairs
  WHERE CAST(('0x' || substring(md5(CAST(a AS VARCHAR) || '#'
                                    || CAST(b AS VARCHAR)), 1, 8))
             AS UBIGINT) % 10 = 0),
tri AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT u AS node FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri) m
GROUP BY node
"""


@register("graph_triangle_count_suppliers", oracle=_TRIANGLE_ORACLE)
def graph_triangle_count_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the supplier co-occurrence graph
    (suppliers sharing an order, md5-sparsified to 10% of pairs so
    graph density is controlled at every SF). The operator orients
    edges by (degree, id) so wedge enumeration is O(m^1.5) worst case
    instead of sum(deg^2) — the skew-proof triangle algorithm (Suri &
    Vassilvitskii WWW'11). The oracle's naive 3-way self-join matches
    exactly because orientation changes execution, not the result.
    The reference loads FK columns flat and has no graph surface
    (SURVEY.md §2.7; /root/reference/data/*.recipe.yml FK fields)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(y, "l_orderkey")
        .filter(F.col("x.l_suppkey") < F.col("y.l_suppkey"))
        .select(
            F.col("x.l_suppkey").alias("a"), F.col("y.l_suppkey").alias("b")
        )
        .distinct()
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#", F.col("a").cast("string"), F.col("b").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    return graph.triangle_count(pairs.filter(bucket == 0), "a", "b")


# ---------------------------------------------------------------------------
# Prefix-filtered set-similarity join (PPJoin-family).
# ---------------------------------------------------------------------------

_PREFIX_JACCARD_ORACLE = """
WITH tk AS (
  SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS s
  FROM documents),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS m FROM tk GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM tk a JOIN tk b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / (sa.m + sb.m - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 2 * n_inter >= (sa.m + sb.m - n_inter)
"""


@register("dedup_prefix_jaccard", oracle=_PREFIX_JACCARD_ORACLE)
def dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-Jaccard >= 0.5 pairs via PREFIX FILTERING: candidates
    come only from each document's rarest (lowest document-frequency)
    prefix tokens, never from hot tokens — the lossless AllPairs/PPJoin
    strategy that keeps exact set-similarity join feasible at corpus
    scale where the naive all-token self-join (the oracle here) dies on
    stopword fan-out. Result set provably identical to brute force."""
    return dedup.prefix_jaccard_pairs(
        t(spark, sf_dir, "documents"), n=1, threshold=0.5
    )


# ---------------------------------------------------------------------------
# Random-projection dimensionality reduction.
# ---------------------------------------------------------------------------

_RP_DIM, _RP_K = 64, 8
_SIGNS = similarity.projection_signs(_RP_DIM, _RP_K)


def _rp_oracle() -> str:
    terms = []
    for j in range(_RP_K):
        lst = ", ".join(str(s) for s in _SIGNS[j])
        terms.append(
            "CAST(list_sum(list_transform(generate_series(1, 64), i -> "
            "CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
            f" * ([{lst}][i]))) AS BIGINT) AS r{j}"
        )
    return "SELECT vec_id, " + ", ".join(terms) + " FROM embeddings"


@register("embedding_random_projection", oracle=_rp_oracle())
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign (Rademacher) random projection 64 -> 8 dims, the JL-lemma
    cheap first stage before clustering/ANN at 100 TB: map-only (zero
    shuffle at any corpus size), fixed-point folds so every component
    is an exact integer both engines reproduce bit-for-bit. The +-1
    matrix derives from md5 and is inlined into the oracle as list
    literals — same matrix, same numbers."""
    return similarity.random_projection(
        t(spark, sf_dir, "embeddings"), dim=_RP_DIM, k=_RP_K
    )


# ---------------------------------------------------------------------------
# Higher-moment statistics: skewness / kurtosis from exact integer moments.
# ---------------------------------------------------------------------------

_MOMENTS_SQL = """
WITH ints AS (
  SELECT event_type, CAST(FLOOR(value + 0.5) AS BIGINT) AS c
  FROM {events}),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS {bigsum})) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c * c AS {bigsum})) AS DOUBLE) AS s2,
         CAST(SUM(CAST(c * c * c AS {bigsum})) AS DOUBLE) AS s3,
         CAST(SUM(CAST(c * c * c * c AS {bigsum})) AS DOUBLE) AS s4
  FROM ints GROUP BY event_type)
SELECT event_type, n,
       s1 / n AS mean_value,
       CASE WHEN (s2 / n - (s1 / n) * (s1 / n)) > 0
            THEN (s3 / n - 3 * (s1 / n) * (s2 / n)
                  + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * sqrt(s2 / n - (s1 / n) * (s1 / n)))
       END AS skewness,
       CASE WHEN (s2 / n - (s1 / n) * (s1 / n)) > 0
            THEN (s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))) - 3
       END AS kurtosis_excess
FROM m
"""


@register(
    "stats_skew_kurtosis",
    oracle=_MOMENTS_SQL.format(events="events", bigsum="HUGEINT"),
)
def stats_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis of event values per type, from
    EXACT whole-unit integer moments (sum c..c^4 in
    DECIMAL(38,0)/HUGEINT — engine float kernels are order-dependent,
    exact sums are not), then one identical IEEE expression on both
    engines; quantization units cancel in the standardized ratios.

    Quantization scale is bounded by TWO budgets, not one: (a) c^4
    must fit BIGINT per row (|value| <= ~55108 at unit scale), and
    (b) each SUM must stay under 2^53 so the exact decimal/HUGEINT
    total converts to the SAME double in both engines — cent-scale
    moments (~1e22) violated (b) and mismatched in the last ulp at
    sf0.01. Unit scale gives (500^4)*n < 2^53 headroom to n ~ 1.4e7
    rows per table. Extends ``stats_corr_regression`` to 3rd/4th
    moments (one shuffle, partial-aggregated)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("ana_moment_events")
    return spark.sql(
        _MOMENTS_SQL.format(events="ana_moment_events", bigsum="DECIMAL(38,0)")
    )


# ---------------------------------------------------------------------------
# Exact interpolated percentiles (PERCENTILE_CONT semantics).
# ---------------------------------------------------------------------------

_PCTL_SQL = """
WITH r AS (
  SELECT o_orderstatus AS status, o_totalprice AS v,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                 ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n
  FROM {orders})
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(CASE WHEN rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1 THEN v END)
       + (0.5 * (MIN(n) - 1) - FLOOR(0.5 * (MIN(n) - 1)))
         * (MIN(CASE WHEN rn = CAST(CEIL(0.5 * (n - 1)) AS BIGINT) + 1 THEN v END)
            - MIN(CASE WHEN rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1 THEN v END))
         AS p50,
       MIN(CASE WHEN rn = CAST(FLOOR(0.9 * (n - 1)) AS BIGINT) + 1 THEN v END)
       + (0.9 * (MIN(n) - 1) - FLOOR(0.9 * (MIN(n) - 1)))
         * (MIN(CASE WHEN rn = CAST(CEIL(0.9 * (n - 1)) AS BIGINT) + 1 THEN v END)
            - MIN(CASE WHEN rn = CAST(FLOOR(0.9 * (n - 1)) AS BIGINT) + 1 THEN v END))
         AS p90
FROM r GROUP BY status
"""


@register(
    "percentile_cont_order_prices",
    oracle=_PCTL_SQL.format(orders="orders"),
)
def percentile_cont_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PERCENTILE_CONT(0.5/0.9) per order status via rank
    selection + linear interpolation — engine-native percentile kernels
    differ in interpolation arithmetic, so both sides run the same
    template: pick the floor/ceil rank values (exact, no float sums)
    and interpolate with one identical IEEE expression. One shuffle on
    the group key; the rank window prunes to two rows per group before
    the final aggregate."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("ana_pctl_orders")
    return spark.sql(_PCTL_SQL.format(orders="ana_pctl_orders"))


# ---------------------------------------------------------------------------
# Per-group mode (most frequent value).
# ---------------------------------------------------------------------------


@register(
    "mode_event_type_per_user",
    oracle="""
    SELECT user_id, event_type AS mode_event_type, cnt AS n_events
    FROM (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type DESC) AS rn
      FROM events GROUP BY user_id, event_type) x
    WHERE rn = 1
    """,
)
def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per key as a partial-aggregatable ARGMAX
    (max-of-struct over (count, value)), not a sort: two map-side
    combinable aggregations, no window over raw events. Ties break to
    the lexicographically larger value on both engines (struct ordering
    == the oracle's DESC,DESC rank)."""
    counts = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    best = counts.groupBy("user_id").agg(
        F.max(F.struct(F.col("cnt"), F.col("event_type"))).alias("m")
    )
    return best.select(
        "user_id",
        F.col("m.event_type").alias("mode_event_type"),
        F.col("m.cnt").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Inverted index (posting lists).
# ---------------------------------------------------------------------------


@register(
    "text_inverted_index",
    oracle="""
    WITH tk AS (
      SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n_docs,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM tk GROUP BY token
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus inverted index: token -> document frequency + sorted
    posting list (canonical comma-joined form, mergeable across corpus
    shards by sorted-merge). One explode + one token-keyed aggregation.
    The retrieval-side complement of the TF-IDF scorer
    (`text_tfidf_top_terms`); at 100 TB this is the shape a BM25 /
    keyword index build takes."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        F.explode(F.array_distinct(text.tokens("text"))).alias("token"),
    )
    return tk.groupBy("token").agg(
        F.count("*").alias("n_docs"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("postings"),
    )
