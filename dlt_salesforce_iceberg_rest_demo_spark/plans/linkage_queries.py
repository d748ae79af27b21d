"""Linkage / retrieval tranche: sparse TF-IDF cosine similarity join,
weighted common-neighbor link prediction, and payload byte histograms.

The reference ships no analytics executor (SURVEY.md §2.7); these
extend the driver-mandated corpus surface (SURVEY.md §2.8) along the
retrieval/linkage axis: posting-list similarity search without an
embedding model, graph link prediction over the FK graph the reference
only stores as plain columns, and the pre-decode byte diagnostic for
multimodal lakes.

House determinism rules throughout: rarity weights are exact integers
(``1_000_000 DIV df`` — the rational idf surrogate from
`text.bm25_topk`; engine ``ln`` differs in the last ulp), dot products
and norms are exact BIGINTs, and each double output is one identical
IEEE expression evaluated from those integers in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._helpers import t
from .registry import register

# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine similarity join (posting-list retrieval dedup).
# ---------------------------------------------------------------------------

_SPARSE_COS_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(tk)-1),
                               i -> tk[i] || ' ' || tk[i+1])) AS s
  FROM toks WHERE len(tk) >= 2),
dfreq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY s),
w AS (
  SELECT sh.doc_id, sh.s, 1000000 // df AS wt
  FROM sh JOIN dfreq USING (s) WHERE df <= 25),
norms AS (
  SELECT doc_id, CAST(SUM(wt * wt) AS BIGINT) AS nrm2 FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.wt * b.wt) AS BIGINT) AS dot
  FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, dot,
       CAST(dot AS DOUBLE)
         / (sqrt(CAST(na.nrm2 AS DOUBLE)) * sqrt(CAST(nb.nrm2 AS DOUBLE)))
         AS cosine
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE CAST(dot AS DOUBLE)
        / (sqrt(CAST(na.nrm2 AS DOUBLE)) * sqrt(CAST(nb.nrm2 AS DOUBLE)))
      >= 0.6
"""


@register("text_sparse_cosine_pairs", oracle=_SPARSE_COS_ORACLE)
def text_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse rarity-weighted cosine pairs (threshold 0.6) over bigram
    shingles via posting-list self-join (`text.sparse_cosine_pairs`) —
    TF-IDF retrieval dedup with NO embedding model. Integer weights
    1e6 DIV df (rational idf — no cross-engine ln), exact BIGINT dots
    and norms, one IEEE sqrt/divide chain; the df <= 25 stopword cap is
    the scale knob that kills the hot-token df^2 join blowup (lossy by
    design — ubiquitous shingles carry ~zero cosine weight)."""
    from ..operators import text

    return text.sparse_cosine_pairs(
        t(spark, sf_dir, "documents"), n=2, max_df=25, threshold=0.6
    )


_SPARSE_COS_AUTOCAP_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(tk)-1),
                               i -> tk[i] || ' ' || tk[i+1])) AS s
  FROM toks WHERE len(tk) >= 2),
dfreq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY s),
w AS (
  SELECT sh.doc_id, sh.s, 1000000 // df AS wt
  FROM sh JOIN dfreq USING (s)
  WHERE df * 1000 <= 50 * (SELECT COUNT(*) FROM documents)),
norms AS (
  SELECT doc_id, CAST(SUM(wt * wt) AS BIGINT) AS nrm2 FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.wt * b.wt) AS BIGINT) AS dot
  FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, dot,
       CAST(dot AS DOUBLE)
         / (sqrt(CAST(na.nrm2 AS DOUBLE)) * sqrt(CAST(nb.nrm2 AS DOUBLE)))
         AS cosine
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE CAST(dot AS DOUBLE)
        / (sqrt(CAST(na.nrm2 AS DOUBLE)) * sqrt(CAST(nb.nrm2 AS DOUBLE)))
      >= 0.6
"""


@register("text_sparse_cosine_autocap", oracle=_SPARSE_COS_AUTOCAP_ORACLE)
def text_sparse_cosine_autocap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse cosine pairs with the CORPUS-RELATIVE stopword cap
    (`text.sparse_cosine_pairs(max_df_permil=50)`): shingles survive
    while df * 1000 <= 50 * n_docs — 5% of the corpus, the cap that
    holds at ANY scale ("stopword" is a saturation property; a fixed
    absolute cap over 100M docs drops every shingle and the query goes
    vacuous — exactly what the round-4 growdf smoke measured for the
    absolute-cap twin `text_sparse_cosine_pairs`). Same exact-integer
    weights/dots/norms; the cap threshold is one exact integer
    comparison (df*1000 <= permil*n_docs, no division) so both engines
    keep the identical shingle set."""
    from ..operators import text

    return text.sparse_cosine_pairs(
        t(spark, sf_dir, "documents"), n=2, threshold=0.6, max_df_permil=50
    )


# ---------------------------------------------------------------------------
# Weighted common-neighbor link prediction over the customer-part graph.
# ---------------------------------------------------------------------------

_LINKPRED_ORACLE = """
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY p),
w AS (
  SELECT e.c, e.p, 1000000 // d AS wt
  FROM e JOIN deg USING (p) WHERE d <= 20),
pairs AS (
  SELECT a.c AS u, b.c AS v,
         CAST(SUM(a.wt) AS BIGINT) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM w a JOIN w b ON a.p = b.p AND a.c < b.c
  GROUP BY 1, 2)
SELECT u, v, score, n_common
FROM pairs ORDER BY score DESC, u, v LIMIT 50
"""


@register("graph_link_prediction_customers", oracle=_LINKPRED_ORACLE)
def graph_link_prediction_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 predicted customer links by weighted common purchased
    parts (`graph.common_neighbor_scores`): the Adamic-Adar family with
    the exact-integer rarity weight 1e6 DIV degree(part) instead of
    1/log (cross-engine ln), over the FK graph the reference stores
    only as plain columns (SURVEY.md §2.7 — `Contact.AccountId`-style
    relationships joined downstream). The degree cap <= 20 drops hub
    parts BEFORE the pair self-join — the C(deg,2) blowup is the whole
    cost of common-neighbor methods at scale and hubs carry ~zero
    weight. Deterministic top-k: (score DESC, u, v)."""
    from ..operators.graph import common_neighbor_scores

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(o["o_custkey"].alias("node"), li["l_partkey"].alias("neigh"))
        .distinct()
    )
    return common_neighbor_scores(edges, max_degree=20, topk=50)


# ---------------------------------------------------------------------------
# Multimodal payload byte histogram (pre-decode content diagnostic).
# ---------------------------------------------------------------------------

_BYTEHIST_ORACLE = """
-- Fixture corpus is pure ASCII (same equivalence as
-- multimodal_audio_windows): ascii(char) == the payload byte Spark
-- extracts natively from the BLOB via hex/conv.
WITH ch AS (
  SELECT doc_id,
         ascii(unnest(list_transform(generate_series(1, length(text)),
                                     i -> text[i]))) AS byte_value
  FROM documents WHERE length(text) > 0)
SELECT CAST(byte_value AS BIGINT) AS byte_value,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM ch GROUP BY 1
"""


@register("multimodal_byte_histogram", oracle=_BYTEHIST_ORACLE)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-value histogram over binary payloads
    (`multimodal.byte_histogram`) — the cheapest pre-decode content
    diagnostic (text vs compressed vs encrypted byte shapes, truncation
    and padding detection, entropy-filter input). Spark extracts REAL
    payload bytes (hex of 1-byte substr -> conv base 16 — arbitrary
    binary, JVM-side, map-only explode into a combinable aggregate);
    the oracle recomputes via ascii() on the ASCII-equivalent text."""
    from ..operators import multimodal

    mm = multimodal.attach_binary_payload(t(spark, sf_dir, "documents"))
    return multimodal.byte_histogram(mm)


# ---------------------------------------------------------------------------
# Distributed Gram matrix (X^T X) over the embedding table.
# ---------------------------------------------------------------------------

_GRAM_ORACLE = """
WITH idx AS (SELECT unnest(generate_series(0, 63)) AS k),
p AS (
  SELECT i.k AS i, j.k AS j,
         CAST(FLOOR(CAST(e.embedding[i.k + 1] AS DOUBLE)
                    * CAST(e.embedding[j.k + 1] AS DOUBLE) * 1e12)
              AS BIGINT) AS prod
  FROM embeddings e CROSS JOIN idx i CROSS JOIN idx j
  WHERE j.k >= i.k AND e.embedding IS NOT NULL)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(SUM(prod) AS BIGINT) AS gram_fixed,
       CAST(CAST(SUM(prod) AS BIGINT) AS DOUBLE) / 1e12 AS gram
FROM p GROUP BY i, j
"""


@register("embedding_gram_matrix", oracle=_GRAM_ORACLE)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix X^T X over the embedding column — THE
    scale primitive behind PCA/whitening, linear/ridge regression
    normal equations, and covariance shrinkage: a D x D (here 64x64 =
    2,080 upper-triangle cells) reduction of an arbitrarily large row
    set. Each partition folds its rows into ONE local 64x64 integer
    matrix inside an Arrow-batched mapInPandas (numpy outer products —
    the matrix kernel is exactly where the vectorized-Python tier
    beats interpreted higher-order expressions: the posexplode +
    nested-transform formulation ran ~7x slower because HOF lambdas
    never enter codegen), so the shuffle moves only #partitions x
    2,080 partial cells at any corpus size. Determinism is unchanged:
    per-element products are fixed-point BIGINTs (floor(xi*xj*1e12) of
    the identical IEEE double product — numpy and the JVM round alike;
    |x| <= 0.6 and N <= ~10^6 rows keep cell sums far under 2^63, the
    scale constant drops to 1e9 beyond that), summed exactly in any
    order."""
    from pyspark.sql import functions as F

    emb = (
        t(spark, sf_dir, "embeddings")
        .select("embedding")
        # NULL vectors have no geometry: dropped here and in the oracle
        # (the numpy fold would otherwise crash on np.asarray(None)).
        .filter(F.col("embedding").isNotNull())
    )

    def gram_partials(batches):
        import numpy as np
        import pandas as pd

        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].map(np.asarray).values).astype("float64")
            for lo in range(0, len(X), 256):  # bound the n x D x D temp
                chunk = X[lo : lo + 256]
                prods = np.einsum("ni,nj->nij", chunk, chunk)
                part = np.floor(prods * 1e12).astype("int64").sum(axis=0)
                acc = part if acc is None else acc + part
        if acc is None:
            return
        iu = np.triu_indices(acc.shape[0])
        yield pd.DataFrame(
            {"i": iu[0].astype("int64"), "j": iu[1].astype("int64"), "part": acc[iu]}
        )

    partials = emb.mapInPandas(gram_partials, "i long, j long, part long")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("part").cast("bigint").alias("gram_fixed"))
        .select(
            "i",
            "j",
            "gram_fixed",
            (F.col("gram_fixed").cast("double") / F.lit(1e12)).alias("gram"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram LM surprisal (conditional-probability quality filter).
# ---------------------------------------------------------------------------

_BIGRAM_LM_ORACLE = """
WITH tk AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t)-1), i -> t[i])) AS w1,
         unnest(list_transform(generate_series(1, len(t)-1), i -> t[i+1])) AS w2
  FROM tk WHERE len(t) >= 2),
big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM pairs GROUP BY 1, 2),
uni AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu FROM big GROUP BY 1)
SELECT p.doc_id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM((cu * 1000000) // cb) AS BIGINT) AS surprisal_sum,
       CAST(CAST(SUM((cu * 1000000) // cb) AS BIGINT) AS DOUBLE) / COUNT(*)
         AS avg_surprisal
FROM pairs p
JOIN big USING (w1, w2)
JOIN uni USING (w1)
GROUP BY p.doc_id
"""


@register("text_bigram_lm_score", oracle=_BIGRAM_LM_ORACLE)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM surprisal per document (`text.bigram_lm_score`): the
    KenLM-style perplexity filter one step up from
    `text_unigram_surprisal` — rare TRANSITIONS, not rare tokens,
    flag the word salad a unigram model misses. Conditional rarity
    weights (c(w1)*1e6) DIV c(w1,w2) are exact integers (the model's
    own bigram-start rollup is the conditioning denominator), summed
    exactly; one IEEE division per doc. Bigram explode over the raw
    multiset, vocabulary^2-bounded count tables, one join back."""
    from ..operators import text

    return text.bigram_lm_score(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# MMR diversified retrieval (greedy re-rank; rows-only).
# ---------------------------------------------------------------------------


def _mmr_oracle(k: int = 5, shortlist: int = 50, lam: float = 0.7) -> str:
    """Unrolled SQL replay of the greedy MMR trajectory: k selection
    stages, each an argmax window over the shortlist with the
    penalty recomputed as MAX fixed-point sim to the selected-so-far
    set. Every float op mirrors the kernel (same lam and 1-lam
    doubles, same clamp), so the result hash-matches bit-for-bit."""
    D = (
        "CAST(list_sum(list_transform(generate_series(1, len({a})), "
        "i -> CAST(FLOOR(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1e15) "
        "AS BIGINT))) AS DOUBLE)"
    )

    def sim(a: str, b: str) -> str:
        return (
            f"{D.format(a=a, b=b)} / (sqrt({D.format(a=a, b=a)})"
            f" * sqrt({D.format(a=b, b=b)}))"
        )

    lam_r, oneml_r = repr(lam), repr(1.0 - lam)
    parts = [
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, corpus_id, cv, {sim('qv', 'cv')} AS rel
  FROM q JOIN c ON corpus_id <> query_id),
sl AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rel DESC, corpus_id) AS rnk
  FROM scored),
short AS (SELECT * FROM sl WHERE rnk <= {shortlist}),
m1 AS (SELECT query_id, corpus_id, cv, rel, rnk, {lam_r} * rel AS mmr FROM short),
s1 AS (
  SELECT query_id, corpus_id, cv, rel, mmr, 1 AS mmr_rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY mmr DESC, rnk) AS pickr
    FROM m1) WHERE pickr = 1),
selu1 AS (SELECT query_id, corpus_id, cv FROM s1)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f""",
pen{i} AS (
  SELECT t.query_id, t.corpus_id, MAX({sim('t.cv', 's.cv')}) AS p
  FROM short t JOIN selu{i - 1} s ON s.query_id = t.query_id
  GROUP BY t.query_id, t.corpus_id),
m{i} AS (
  SELECT t.query_id, t.corpus_id, t.cv, t.rel, t.rnk,
         {lam_r} * t.rel - {oneml_r} * greatest(p.p, 0) AS mmr
  FROM short t
  JOIN pen{i} p ON p.query_id = t.query_id AND p.corpus_id = t.corpus_id
  LEFT JOIN selu{i - 1} sd
    ON sd.query_id = t.query_id AND sd.corpus_id = t.corpus_id
  WHERE sd.corpus_id IS NULL),
s{i} AS (
  SELECT query_id, corpus_id, cv, rel, mmr, {i} AS mmr_rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY mmr DESC, rnk) AS pickr
    FROM m{i}) WHERE pickr = 1),
selu{i} AS (SELECT query_id, corpus_id, cv FROM selu{i - 1}
            UNION ALL SELECT query_id, corpus_id, cv FROM s{i})"""
        )
    union = " UNION ALL ".join(
        f"SELECT query_id, corpus_id, mmr_rank, rel, mmr FROM s{i}"
        for i in range(1, k + 1)
    )
    parts.append(
        f"""
SELECT query_id, corpus_id, CAST(mmr_rank AS BIGINT) AS mmr_rank,
       rel AS relevance, mmr AS mmr_score
FROM ({union})"""
    )
    return "".join(parts)


@register("similarity_mmr_topk", oracle=_mmr_oracle())
def similarity_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-5 per query (`similarity.mmr_topk`,
    lambda=0.7 over an exact cosine shortlist of 50): the re-rank that
    trades relevance against redundancy before a context window fills
    with near-copies. The greedy loop is sequential, but its ARITHMETIC
    is the house fixed-point cosine throughout, so the oracle unrolls
    the five selection stages in SQL (argmax window per stage, penalty
    = MAX sim to the selected set) and hash-matches the whole
    trajectory bit-for-bit; pytest additionally pins the selection
    against a pure-Python reference and a planted diversity scenario."""
    from ..operators import similarity

    emb = t(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F

    return similarity.mmr_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, shortlist=50, lam=0.7
    )


# ---------------------------------------------------------------------------
# Perceptual-hash (aHash) duplicate groups over binary payloads.
# ---------------------------------------------------------------------------

_AHASH_ORACLE = """
-- ASCII equivalence (multimodal_audio_windows): ascii(text[i]) == the
-- payload byte Spark samples from the BLOB. 1-based series with
-- (i-1) shifts == Spark's 0-based transform index.
WITH d AS (
  SELECT doc_id, text, length(text) AS n
  FROM documents WHERE length(text) > 0),
s AS (
  SELECT doc_id,
         list_transform(
           list_slice(generate_series(1, n, greatest(n // 32, 1)), 1, 32),
           i -> CAST(ascii(text[i]) AS BIGINT)) AS bytes
  FROM d),
h AS (
  SELECT doc_id,
         CAST(len(bytes) AS BIGINT) AS m,
         CAST(list_sum(bytes) AS BIGINT) AS tot,
         bytes
  FROM s),
hh AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(1, CAST(len(bytes) AS INT)),
              i -> CASE WHEN bytes[i] * m > tot
                        THEN (CAST(1 AS BIGINT) << (i - 1))
                        ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS ahash
  FROM h)
SELECT ahash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keep_id
FROM hh GROUP BY ahash HAVING COUNT(*) >= 2
"""


@register("multimodal_ahash_dedup", oracle=_AHASH_ORACLE)
def multimodal_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash duplicate groups over binary payloads
    (`multimodal.ahash`, 32-bit average hash): stride-sampled payload
    bytes thresholded against their own mean, packed by shifts — the
    content fingerprint that survives byte-identical AND
    mean-preserving re-encodes, computed entirely in exact integer
    map-side expressions (no division, no Python). Groups with >= 2
    members are duplicate candidates, keep-min representative — the
    multimodal twin of `dedup_exact_documents`; the Hamming-banded
    variant at scale reuses the `dedup.simhash_pairs` pigeonhole
    machinery on the same fingerprints."""
    from pyspark.sql import functions as F

    from ..operators import multimodal

    mm = multimodal.attach_binary_payload(t(spark, sf_dir, "documents"))
    h = multimodal.ahash(mm, bits=32)
    return (
        h.groupBy("ahash")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Embedding outliers by distance-to-centroid (label-conditioned).
# ---------------------------------------------------------------------------

_EMB_OUTLIER_ORACLE = """
WITH ex AS (
  SELECT vec_id, label,
         unnest(generate_series(1, len(embedding))) AS i,
         unnest(embedding) AS v
  FROM embeddings),
cent AS (
  SELECT label, i,
         CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
           / (1e6 * COUNT(v)) AS mu
  FROM ex GROUP BY label, i),
d AS (
  SELECT ex.vec_id, ex.label,
         CAST(SUM(CAST(FLOOR((CAST(ex.v AS DOUBLE) - cent.mu)
                             * (CAST(ex.v AS DOUBLE) - cent.mu) * 1e12)
                       AS BIGINT)) AS BIGINT) AS dist2_fixed
  FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
  GROUP BY ex.vec_id, ex.label)
SELECT vec_id, label, dist2_fixed,
       CAST(dist2_fixed AS DOUBLE) / 1e12 AS dist2
FROM d ORDER BY dist2_fixed DESC, vec_id LIMIT 20
"""


@register("embedding_outliers_by_label", oracle=_EMB_OUTLIER_ORACLE)
def embedding_outliers_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 embedding outliers by squared distance to their OWN
    label's centroid — the curation pass that surfaces mislabeled or
    junk vectors before they poison retrieval or training. Centroids
    are the exact fixed-point means of `embedding_centroids_by_label`
    (label x dim rows — broadcast back to the explode, no big-side
    shuffle for the join); per-element squared deviations are
    fixed-point BIGINTs (the `_DDOT` discipline: identical IEEE
    subtract/multiply, then floor), so the per-vector sum is exact in
    any order, and the top-k is a deterministic (dist DESC, vec_id)
    TakeOrdered."""
    from pyspark.sql import functions as F

    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "label", (F.col("pos") + 1).alias("i"), "v")
    fixed = F.floor(F.col("v").cast("double") * F.lit(1e6)).cast("bigint")
    cent = ex.groupBy("label", "i").agg(
        (F.sum(fixed).cast("double") / (F.lit(1e6) * F.count("v"))).alias("mu")
    )
    dev = F.col("v").cast("double") - F.col("mu")
    d = (
        ex.join(F.broadcast(cent), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.floor(dev * dev * F.lit(1e12)).cast("bigint"))
            .cast("bigint")
            .alias("dist2_fixed")
        )
    )
    return (
        d.select(
            "vec_id",
            "label",
            "dist2_fixed",
            (F.col("dist2_fixed").cast("double") / F.lit(1e12)).alias("dist2"),
        )
        .orderBy(F.col("dist2_fixed").desc(), "vec_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# k-core decomposition (rows-only; iterative peel).
# ---------------------------------------------------------------------------


_KCORE_ORACLE = """
WITH RECURSIVE raw AS (
  SELECT CAST(o.o_custkey + 10000000 AS BIGINT) AS u,
         CAST(l.l_partkey AS BIGINT) AS v
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
base AS (
  SELECT u, v FROM raw WHERE u <> v
  UNION
  SELECT v, u FROM raw WHERE u <> v),
peel(iter, u, v) AS (
  SELECT 0, u, v FROM base
  UNION ALL
  SELECT iter + 1, u, v FROM (
    SELECT iter, u, v,
           COUNT(*) OVER (PARTITION BY iter, u) AS du,
           COUNT(*) OVER (PARTITION BY iter, v) AS dv
    FROM peel)
  WHERE iter < 30 AND du >= 20 AND dv >= 20)
SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
FROM peel WHERE iter = 30 GROUP BY u
"""


@register("graph_k_core_customers_parts", oracle=_KCORE_ORACLE)
def graph_k_core_customers_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-core of the customer-part purchase graph (`graph.k_core`):
    iterative peel of nodes with degree < 20 until the unique fixed
    point — the dense-substructure filter for community cores and
    ring detection. The fixed point is ORDER-INDEPENDENT (the k-core
    is unique), so a DuckDB recursive CTE that peels with
    window-function degrees for a fixed 30 iterations (>= Spark's
    max_iter; iterations past convergence are no-ops) reproduces the
    exact (node, degree) set — the oracle for an iterative graph
    algorithm. pytest additionally pins the peel against a reference
    implementation on crafted graphs (clique + tail)."""
    from pyspark.sql import functions as F

    from ..operators.graph import k_core

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (o["o_custkey"] + 10000000).alias("src"),  # disjoint id spaces
            li["l_partkey"].alias("dst"),
        )
        .distinct()
    )
    return k_core(edges, k=20)


# ---------------------------------------------------------------------------
# DBSCAN density clustering over embeddings (rows-only).
# ---------------------------------------------------------------------------


_DBSCAN_DDOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST(FLOOR(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1e15) "
    "AS BIGINT))) AS DOUBLE)"
)

_DBSCAN_COSINE = (
    f"""{_DBSCAN_DDOT.format(a="a.embedding", b="b.embedding")}
        / ( sqrt({_DBSCAN_DDOT.format(a="a.embedding", b="a.embedding")})
          * sqrt({_DBSCAN_DDOT.format(a="b.embedding", b="b.embedding")}) )"""
)

# All-pairs epsilon-neighborhood CTE (the exact twin).
_DBSCAN_EXACT_PAIRS = f"""p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {_DBSCAN_COSINE} >= 0.4)"""


def _dbscan_lsh_pairs_sql(
    n_planes: int = 4, n_tables: int = 8, dim: int = 64, seed: int = 42
) -> str:
    """LSH-candidate epsilon-pairs CTEs: replay of
    `similarity.lsh_neighbor_pairs` — seeded hyperplanes as literals,
    fixed-point sign projections -> per-table buckets, bucket
    self-join candidates, exact fixed-point cosine filter."""
    from ..operators.similarity import _hyperplanes

    rows = []
    for t_ in range(n_tables):
        for p_, plane in enumerate(_hyperplanes(dim, n_planes, seed + 1000 * t_)):
            arr = ", ".join(f"CAST({w!r} AS DOUBLE)" for w in plane)
            rows.append(f"({t_}, {p_}, [{arr}])")
    values = ",\n".join(rows)
    return f"""planes(t, p, warr) AS (VALUES {values}),
proj AS (
  SELECT e.vec_id, pl.t, pl.p,
         list_sum(list_transform(generate_series(1, {dim}),
           i -> CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * pl.warr[i] * 1e15)
                     AS BIGINT))) AS dp
  FROM embeddings e CROSS JOIN planes pl),
bk AS (
  SELECT vec_id, t,
         CAST(SUM(CASE WHEN dp > 0 THEN (CAST(1 AS BIGINT) << p)
                       ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM bk x JOIN bk y
    ON y.t = x.t AND y.bucket = x.bucket AND x.vec_id < y.vec_id),
p AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.id_a
  JOIN embeddings b ON b.vec_id = c.id_b
  WHERE {_DBSCAN_COSINE} >= 0.4)"""


def _dbscan_oracle(pair_sql: str) -> str:
    """DBSCAN closure over a pairs CTE ``p(id_a, id_b)``: symmetric
    neighbor lists, degree core marking, recursive min-label
    propagation over core-core edges, min-id border attachment, noise
    fill, per-cluster rollup — shared by the exact and LSH-candidate
    oracle twins."""
    return f"""
WITH RECURSIVE
{pair_sql},
nb AS (SELECT id_a, id_b FROM p UNION ALL SELECT id_b, id_a FROM p),
deg AS (SELECT id_a, COUNT(*) AS n FROM nb GROUP BY 1),
core AS (SELECT id_a AS cid FROM deg WHERE n >= 3),
core_edges AS (
  SELECT n.id_a AS u, n.id_b AS v FROM nb n
  JOIN core c1 ON c1.cid = n.id_a
  JOIN core c2 ON c2.cid = n.id_b),
reach(node, label) AS (
  SELECT cid, cid FROM core
  UNION
  SELECT e.v, r.label FROM reach r JOIN core_edges e ON e.u = r.node),
core_lbl AS (
  SELECT node AS id, CAST(MIN(label) AS BIGINT) AS cluster_id
  FROM reach GROUP BY node),
border AS (
  SELECT n.id_a AS id, MIN(cl.cluster_id) AS cluster_id
  FROM nb n
  JOIN core c ON c.cid = n.id_b
  JOIN core_lbl cl ON cl.id = n.id_b
  WHERE n.id_a NOT IN (SELECT cid FROM core)
  GROUP BY 1),
labeled AS (
  SELECT id, cluster_id, 'core' AS role FROM core_lbl
  UNION ALL SELECT id, cluster_id, 'border' FROM border),
allrows AS (
  SELECT e.vec_id AS id, l.cluster_id, COALESCE(l.role, 'noise') AS role
  FROM embeddings e LEFT JOIN labeled l ON l.id = e.vec_id)
SELECT cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN role = 'core' THEN 1 ELSE 0 END) AS BIGINT) AS n_core,
       CAST(SUM(CASE WHEN role = 'border' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_border
FROM allrows GROUP BY cluster_id
"""


@register("embedding_dbscan_clusters", oracle=_dbscan_oracle(_DBSCAN_EXACT_PAIRS))
def embedding_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the embedding corpus (`similarity.dbscan`, eps =
    cosine 0.4, minPts 3): density clusters with explicit noise — the
    non-parametric complement of k-means/IVF (arbitrary shapes, no
    preset k; noise = the long tail a curation pass should KEEP).
    Composed from the engine's own primitives: exact fixed-point
    epsilon pairs (LSH candidates at scale), core marking by degree,
    `connected_components` over core-core edges, min-id border
    attachment. Output: per-cluster core/border counts, plus the
    noise row (cluster NULL). Every step is deterministic (fixed-point
    cosines, min-id labels/attachment), so a recursive-CTE DuckDB
    oracle replays the whole pipeline hash-exactly; pytest pins roles
    and labels on planted geometry."""
    from pyspark.sql import functions as F

    from ..operators import similarity

    emb = t(spark, sf_dir, "embeddings")
    out = similarity.dbscan(emb, eps_cosine=0.4, min_pts=3)
    return (
        out.groupBy("cluster_id")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum(F.when(F.col("role") == "core", 1).otherwise(0))
            .cast("bigint")
            .alias("n_core"),
            F.sum(F.when(F.col("role") == "border", 1).otherwise(0))
            .cast("bigint")
            .alias("n_border"),
        )
    )


@register(
    "embedding_dbscan_lsh_clusters",
    oracle=_dbscan_oracle(_dbscan_lsh_pairs_sql(n_planes=6, n_tables=8)),
)
def embedding_dbscan_lsh_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN composed with the LSH candidate generator — the 100 TB
    plan (`similarity.lsh_neighbor_pairs` -> `similarity.dbscan`):
    epsilon pairs come from a bucket self-join over 8 seeded 6-bit
    hash tables plus an exact fixed-point cosine filter, so NO
    all-pairs join happens at any corpus size (shuffle keys on
    (table, bucket); raise n_planes further to keep buckets bounded
    as the corpus grows). Approximate by design — non-colliding
    neighbor pairs are missed — but fully deterministic, so the
    oracle replays bucket assignment, the candidate join, the filter,
    and the whole DBSCAN closure hash-exactly. The exact all-pairs
    twin stays registered as `embedding_dbscan_clusters`; pytest
    asserts the two paths agree on planted tight-cluster geometry."""
    from pyspark.sql import functions as F

    from ..operators import similarity

    emb = t(spark, sf_dir, "embeddings")
    pairs = similarity.lsh_neighbor_pairs(
        emb, eps_cosine=0.4, dim=64, n_planes=6, n_tables=8
    )
    out = similarity.dbscan(emb, eps_cosine=0.4, min_pts=3, pairs=pairs)
    return (
        out.groupBy("cluster_id")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum(F.when(F.col("role") == "core", 1).otherwise(0))
            .cast("bigint")
            .alias("n_core"),
            F.sum(F.when(F.col("role") == "border", 1).otherwise(0))
            .cast("bigint")
            .alias("n_border"),
        )
    )


# ---------------------------------------------------------------------------
# k-truss over the supplier co-occurrence graph (rows-only).
# ---------------------------------------------------------------------------


def _ktruss_oracle(rounds: int = 6) -> str:
    """Unrolled 3-truss peel: each stage keeps edges with >= 1 common
    neighbor inside the previous stage's edge set. The truss fixed
    point is unique and the fixture peel converges in 2 rounds
    (probed; 6 unrolled stages give 3x margin — extra stages are
    no-ops at the fixed point, exactly like Spark's early-exit loop)."""
    parts = [
        """WITH pairs AS (
  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_suppkey < y.l_suppkey),
e0 AS MATERIALIZED (
  SELECT a, b FROM pairs
  WHERE CAST(('0x' || substring(md5(CAST(a AS VARCHAR) || '#' ||
        CAST(b AS VARCHAR)), 1, 8)) AS UBIGINT) % 10 = 0)"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
nb{r} AS MATERIALIZED (SELECT a AS u, b AS v FROM e{r}
                       UNION ALL SELECT b, a FROM e{r}),
e{r + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{r} e
  JOIN nb{r} n1 ON n1.u = e.a
  JOIN nb{r} n2 ON n2.u = e.b AND n2.v = n1.v
  GROUP BY e.a, e.b)"""
        )
    parts.append(
        f""",
nbf AS (SELECT a AS u, b AS v FROM e{rounds}
        UNION ALL SELECT b, a FROM e{rounds}),
sup AS (
  SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS support
  FROM e{rounds} e
  JOIN nbf n1 ON n1.u = e.a
  JOIN nbf n2 ON n2.u = e.b AND n2.v = n1.v
  GROUP BY e.a, e.b)
SELECT support, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM sup GROUP BY support"""
    )
    return "".join(parts)


@register("graph_k_truss_suppliers", oracle=_ktruss_oracle())
def graph_k_truss_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of the supplier co-occurrence graph (`graph.k_truss`):
    the maximal subgraph where every surviving edge closes at least
    one triangle WITH OTHER SURVIVORS — edge-level cohesion one rung
    above `graph_k_core_customers_parts` (trusses nest inside cores;
    a hub-and-spoke star has high core numbers but no truss at all).
    Same md5-sparsified edge list as `graph_triangle_count_suppliers`
    so density is controlled at every SF; per-round support uses the
    degree-oriented O(m^1.5) wedge join. The truss fixed point is
    unique and order-independent, so an UNROLLED common-neighbor peel
    in DuckDB (6 stages >= the fixture's 2-round convergence)
    reproduces the exact support histogram; pytest pins clique
    survival, pendant-triangle peel, and the cascading support recount
    on crafted graphs. Output: per-support edge counts (support
    histogram of the truss)."""
    from pyspark.sql import functions as F

    from ..operators.graph import co_occurrence_pairs, k_truss

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = co_occurrence_pairs(li, "l_orderkey", "l_suppkey")
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("#", F.col("a").cast("string"), F.col("b").cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    edges = pairs.filter(bucket % 10 == 0).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    truss = k_truss(edges, k=3)
    return truss.groupBy("support").agg(
        F.count("*").cast("bigint").alias("n_edges")
    )


# ---------------------------------------------------------------------------
# Class-based TF-IDF keywords per source (BERTopic-style c-TF-IDF).
# ---------------------------------------------------------------------------

_CTFIDF_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS term
  FROM documents),
tf AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf_class
  FROM tok GROUP BY source, term),
cf AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_classes_with
  FROM tf GROUP BY term),
scored AS (
  SELECT tf.source, tf.term, tf_class, n_classes_with,
         tf_class * (1000000 // n_classes_with) AS score
  FROM tf JOIN cf USING (term)),
ranked AS (
  SELECT source, term, tf_class, n_classes_with,
         CAST(score AS BIGINT) AS score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score DESC, term) AS rank
  FROM scored)
SELECT source, CAST(rank AS BIGINT) AS rank, term, tf_class,
       n_classes_with, score
FROM ranked WHERE rank <= 5
"""


@register("text_ctfidf_source_keywords", oracle=_CTFIDF_SQL)
def text_ctfidf_source_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based TF-IDF keywords: the top-5 terms that CHARACTERIZE
    each source, scored tf_in_class * (1e6 DIV classes_containing) —
    the c-TF-IDF idea (class as pseudo-document; BERTopic's keyword
    step) with the house integer rarity weight instead of ln. This is
    the corpus-comparison view `text_tfidf_top_terms` (per document)
    cannot give: a term every source uses scores ~0 no matter how
    frequent. Class-grain count tables, a vocab-sized join, and a
    per-class top-k with (score DESC, term) determinism. Shared SQL
    template; dialect split is // vs DIV only."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("lk_ct_documents")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW lk_ct_tok AS
        SELECT source, term
        FROM lk_ct_documents
        LATERAL VIEW explode(split(lower(text), ' ')) AS term
        """
    )
    body = _CTFIDF_SQL.replace(
        """WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS term
  FROM documents),""",
        "WITH tok AS (SELECT source, term FROM lk_ct_tok),",
    ).replace("1000000 // n_classes_with", "1000000 DIV n_classes_with")
    return spark.sql(body)


# ---------------------------------------------------------------------------
# Retrieval evaluation: recall@5 / first-relevant rank per query.
# ---------------------------------------------------------------------------

_DDOT_LK = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST(FLOOR(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1e15) "
    "AS BIGINT))) AS DOUBLE)"
)

_RETR_EVAL_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS corpus_id, embedding AS cv, label AS clabel
      FROM embeddings),
scored AS (
  SELECT query_id, qlabel, corpus_id, clabel,
    {_DDOT_LK.format(a="qv", b="cv")}
    / ( sqrt({_DDOT_LK.format(a="qv", b="qv")})
      * sqrt({_DDOT_LK.format(a="cv", b="cv")}) ) AS cosine
  FROM q JOIN c ON corpus_id <> query_id),
ranked AS (
  SELECT query_id, qlabel, corpus_id, clabel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, corpus_id) AS rank
  FROM scored)
SELECT query_id,
       CAST(SUM(CASE WHEN rank <= 5 AND clabel = qlabel
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant_at_5,
       MIN(CASE WHEN clabel = qlabel THEN rank END) AS first_relevant_rank
FROM ranked WHERE rank <= 100
GROUP BY query_id
"""


@register("eval_retrieval_recall_at_5", oracle=_RETR_EVAL_ORACLE)
def eval_retrieval_recall_at_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation per query: same-label hits in the exact
    cosine top-5 and the first relevant rank (within a 100-deep list)
    — recall@k and the MRR numerator, the scorecard every
    ANN/embedding change must not regress (the pytest recall bounds
    for LSH/IVF/PQ are THIS metric against brute force; here it is a
    first-class oracle-checked query using labels as the relevance
    judgment). Fixed-point cosine ranking with (cosine DESC,
    corpus_id) determinism; counts are exact integers."""
    from pyspark.sql import functions as F

    from ..operators.similarity import cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    top = cosine_topk(emb, queries, k=100, exact_decimal=True)
    labels = emb.select(F.col("vec_id"), F.col("label"))
    joined = (
        top.join(
            labels.select(
                F.col("vec_id").alias("corpus_id"), F.col("label").alias("clabel")
            ),
            "corpus_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
            ),
            "query_id",
        )
    )
    return joined.groupBy("query_id").agg(
        F.sum(
            F.when((F.col("rank") <= 5) & (F.col("clabel") == F.col("qlabel")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_relevant_at_5"),
        F.min(
            F.when(F.col("clabel") == F.col("qlabel"), F.col("rank"))
        ).alias("first_relevant_rank"),
    )
