"""Vector similarity search over an embedding column (array<float>).

Two tiers, per the standard ANN playbook:

- **Brute-force cosine top-k** - the exactness baseline. Query set is
  broadcast (it's small by construction); the corpus is scanned once,
  dot products run entirely in codegen'd JVM expressions
  (zip_with + aggregate, no Python, no explode), and per-query top-k
  is a TakeOrdered-style window. O(|corpus| * |queries| * dim) flops
  but a single pass over the data - at 100 TB this is the verifier
  and the re-ranker, not the ANN.

- **Random-hyperplane LSH ANN** - the scale path. Each vector maps to
  a ``n_planes``-bit bucket (sign of projection onto fixed
  pseudo-random hyperplanes); queries probe only their bucket
  (+ optional multi-probe neighbors at Hamming distance 1). Bucket
  assignment is O(corpus) map-only work; the candidate join keys on
  the bucket id, so shuffle volume is corpus-size, not corpus x
  queries. Recall tuned by n_planes / n_tables / multiprobe.

An IVF variant (k-means coarse quantizer + inverted lists) slots into
the same two-phase shape: assign-to-centroid (map) -> per-list search
(join on list id); noted for round 2+ since it needs an iterative
clustering job.

Determinism: hyperplanes derive from a seeded NumPy generator and are
embedded as plan literals - the same plan every run, broadcast with
the closure (a few KB for 16 planes x 1k dims).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float arrays, JVM-side.
    Left-fold in index order -> deterministic per row."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


# Fixed-point variants for cross-engine bit-reproducibility: each
# per-element double product (identical IEEE result in any engine) is
# scaled by 1e15 and floored to int64 - floor/scale are bit-identical
# everywhere, integer sums are exact and order-free. (A DECIMAL cast
# is NOT enough: double->decimal rounding at the cut digit differs
# between Java HALF_UP and DuckDB round-half-even, drifting the last
# ulp.) The 1e15 scale cancels in the cosine ratio.
FIXED_SCALE = 1e15


def _dot_fixed(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(x.cast("double") * y.cast("double") * FIXED_SCALE),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    exact_decimal: bool = False,
) -> DataFrame:
    """Exact cosine top-k: for every query vector, the k most similar
    corpus vectors (excluding itself when ids collide). Ties broken by
    corpus id - fully deterministic output. ``exact_decimal`` switches
    to fixed-point accumulation (bit-reproducible across engines)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cvec"))
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("corpus_id") != F.col("query_id")
    )
    if exact_decimal:
        # scale cancels: (dot*S) / (sqrt(na*S) * sqrt(nb*S)) = cosine
        cos = _dot_fixed(F.col("qvec"), F.col("cvec")).cast("double") / (
            F.sqrt(_dot_fixed(F.col("qvec"), F.col("qvec")).cast("double"))
            * F.sqrt(_dot_fixed(F.col("cvec"), F.col("cvec")).cast("double"))
        )
    else:
        cos = _dot(F.col("qvec"), F.col("cvec")) / (
            _norm(F.col("qvec")) * _norm(F.col("cvec"))
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id")
    )
    return (
        scored.select("query_id", "corpus_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: bit j = sign(<v, h_j>)."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing the
    query's LSH bucket in ANY of ``n_tables`` independent hash tables
    (plus, with ``multiprobe``, buckets at Hamming distance 1), then
    exact cosine re-rank of candidates only.

    Recall is governed by (n_planes, n_tables, multiprobe): fewer
    planes -> bigger buckets -> higher recall & cost; more tables ->
    union of independent chances. Corpus-side work stays O(corpus x
    n_tables) map-only; the join keys on (table, bucket).
    """
    c_cols = [
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("cvec"),
    ]
    q_cols = [
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
    ]
    c_buckets, q_probes = [], []
    for t_idx in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t_idx)
        b = lsh_bucket(F.col(vec_col), planes)
        c_buckets.append(
            F.struct(F.lit(t_idx).alias("tbl"), b.alias("bucket"))
        )
        probe = [b]
        if multiprobe:
            probe += [b.bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)]
        q_probes.extend(
            F.struct(F.lit(t_idx).alias("tbl"), p.alias("bucket")) for p in probe
        )
    c = corpus.select(*c_cols, F.explode(F.array(*c_buckets)).alias("cb")).select(
        "corpus_id", "cvec", "cb.tbl", "cb.bucket"
    )
    q = queries.select(*q_cols, F.explode(F.array(*q_probes)).alias("qb")).select(
        "query_id", "qvec", "qb.tbl", "qb.bucket"
    )
    cos = _dot(F.col("qvec"), F.col("cvec")) / (
        _norm(F.col("qvec")) * _norm(F.col("cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id")
    )
    return (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", cos.alias("cosine"))
        .distinct()
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
