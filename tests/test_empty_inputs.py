"""Empty-input robustness: every registry query must EXECUTE against
0-row tables (schema-preserved empty twins of the sf0.001 lake) —
returning an empty (or constant-row aggregate) result, never raising.

Why this matters at 100 TB: empty inputs are not an edge case there —
incremental loads produce empty partitions and date slices routinely,
and a pipeline that crashes on them (a bare ``first()[0]``, a
``collect()[0]``, a max() unwrap) takes the whole job down. The sweep
found two real crashes when introduced (the PQ queries' codebook
training dereferenced ``first()`` on the empty corpus); the fix
(`similarity.EmptyCorpusError` + pq_topk's empty-result path) is
pinned here and in the dedicated schema test below.
"""

from __future__ import annotations

import pytest

from dlt_salesforce_iceberg_rest_demo_spark.plans.registry import (
    REGISTRY,
    query_fns,
)
from dlt_salesforce_iceberg_rest_demo_spark.sources.parquet import load_table

# Importing registry.py alone leaves REGISTRY unpopulated (queries
# register when the plans modules load); query_fns() forces the load.
# Without this every sweep below would pass VACUOUSLY over zero
# queries — each sweep also asserts the count as a belt-and-braces.
query_fns()

from .conftest import SF_DIR, sweep_queries

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Schema-identical 0-row twins of every fixture table."""
    dst = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(0).write.mode("overwrite").parquet(
            str(dst / f"{t}.parquet")
        )
    return str(dst)


def test_every_registry_query_survives_empty_tables(spark, empty_sf_dir):
    assert len(REGISTRY) >= 250  # vacuous-sweep guard
    failures = []
    for name in sweep_queries(REGISTRY):
        try:
            REGISTRY[name].spark(spark, empty_sf_dir).count()
        except Exception as e:  # noqa: BLE001 - collecting all offenders
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
    assert not failures, "queries crashed on empty inputs:\n" + "\n".join(failures)


def test_pq_topk_empty_corpus_schema_matches_nonempty(spark):
    """pq_topk on an empty corpus returns an EMPTY DataFrame whose
    schema equals the non-empty result's — both rerank modes (the
    empty path is hand-built, so drift would break downstream
    consumers silently)."""
    from pyspark.sql import Row

    from dlt_salesforce_iceberg_rest_demo_spark.operators import similarity

    vecs = [Row(vec_id=i, embedding=[float(i + 1), 0.5, 0.25, 1.0]) for i in range(20)]
    corpus = spark.createDataFrame(vecs)
    queries = spark.createDataFrame(vecs[:2])
    empty = corpus.limit(0)
    for rerank in (True, False):
        full = similarity.pq_topk(
            corpus, queries, k=2, m=2, n_codes=4, rerank=rerank
        )
        none = similarity.pq_topk(
            empty, queries, k=2, m=2, n_codes=4, rerank=rerank
        )
        # names + types are the contract (nullability of a 0-row frame
        # is inconsequential and differs: lit(None) vs computed cols)
        assert [(f.name, f.dataType) for f in none.schema.fields] == [
            (f.name, f.dataType) for f in full.schema.fields
        ]
        assert none.count() == 0 and full.count() > 0


def test_pq_fit_raises_clear_error_on_empty_and_zero_norm(spark):
    """pq_fit (and the BUILD path that reuses it) must fail loudly and
    legibly on untrainable corpora — empty, or only zero-norm rows."""
    from pyspark.sql import Row

    from dlt_salesforce_iceberg_rest_demo_spark.operators import similarity

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(similarity.EmptyCorpusError, match="empty"):
        similarity.pq_fit(empty, m=2, n_codes=4)
    zeros = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.0, 0.0, 0.0, 0.0])]
    )
    with pytest.raises(similarity.EmptyCorpusError, match="zero-norm"):
        similarity.pq_fit(zeros, m=2, n_codes=4)


@pytest.fixture(scope="module")
def null_payload_sf_dir(spark, tmp_path_factory):
    """The sf0.001 lake with NULLs injected into the payload columns
    (every 7th document's text, every 7th embedding) — keys stay
    non-null. The degenerate shape a production corpus carries
    routinely (failed embedding jobs, late columns, bad blobs)."""
    from pyspark.sql import functions as F

    dst = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        df = load_table(spark, SF_DIR, t)
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
                    F.col("text")
                ),
            )
        elif t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(
                    F.col("embedding")
                ),
            )
        df.write.mode("overwrite").parquet(str(dst / f"{t}.parquet"))
    return str(dst)


def test_every_registry_query_survives_null_payloads(
    spark, null_payload_sf_dir
):
    """No query may crash on NULL text/embedding payloads. The sweep
    found ten real crashes when introduced (len(None)/None.encode in
    vector fits, decode kernels, fixture writers); the fixes — the
    similarity._non_null_vectors entry filter, null-safe md5_score,
    null-feature decode rows, null-skipping fixture writer — are
    pinned here."""
    assert len(REGISTRY) >= 250  # vacuous-sweep guard
    failures = []
    for name in sweep_queries(REGISTRY):
        try:
            REGISTRY[name].spark(spark, null_payload_sf_dir).count()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
    assert not failures, "queries crashed on null payloads:\n" + "\n".join(failures)


@pytest.fixture(scope="module")
def nonfinite_sf_dir(spark, tmp_path_factory):
    """Embeddings poisoned with all-NaN (every 11th) and all-Inf
    (every 13th) vectors — the failed-embedding-job shape."""
    from pyspark.sql import functions as F

    dst = tmp_path_factory.mktemp("nan_sf")
    for t in TABLES:
        df = load_table(spark, SF_DIR, t)
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 11 == 0,
                    F.transform(
                        "embedding",
                        lambda x: F.lit(float("nan")).cast("float"),
                    ),
                )
                .when(
                    F.col("vec_id") % 13 == 0,
                    F.transform(
                        "embedding",
                        lambda x: F.lit(float("inf")).cast("float"),
                    ),
                )
                .otherwise(F.col("embedding")),
            )
        df.write.mode("overwrite").parquet(str(dst / f"{t}.parquet"))
    return str(dst)


def test_vector_queries_survive_nonfinite_embeddings(spark, nonfinite_sf_dir):
    """NaN/Inf vectors must never CRASH a query (kmeans_fit's integer
    init did, poisoning sklearn-style; now both are dropped from fits
    — no geometry). Scoring paths are garbage-tolerant by SQL/IEEE
    semantics, identically in Spark and the oracle engine."""
    vector_queries = [
        n
        for n in sweep_queries(REGISTRY)
        if any(
            p in n
            for p in (
                "similarity",
                "embedding",
                "gram",
                "dbscan",
                "maxsim",
                "random_projection",
                "quantize",
            )
        )
    ]
    from .conftest import FULL_TESTS

    assert len(vector_queries) >= (20 if FULL_TESTS else 6)
    failures = []
    for name in vector_queries:
        try:
            REGISTRY[name].spark(spark, nonfinite_sf_dir).count()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
    assert not failures, (
        "queries crashed on non-finite embeddings:\n" + "\n".join(failures)
    )


@pytest.fixture(scope="module")
def single_row_sf_dir(spark, tmp_path_factory):
    """Every table truncated to ONE row — the k > n regime for every
    fit (codebooks, centroids, top-k, variance-style stats)."""
    dst = tmp_path_factory.mktemp("one_sf")
    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(1).write.mode("overwrite").parquet(
            str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.exhaustive
def test_every_registry_query_survives_single_row_tables(
    spark, single_row_sf_dir
):
    """No query may crash when every table has one row (fits must cap
    k at the corpus size — PQ indexed past its seed matrix when
    introduced; kmeans already self-caps via limit())."""
    assert len(REGISTRY) >= 250  # vacuous-sweep guard
    failures = []
    for name in sweep_queries(REGISTRY):
        try:
            REGISTRY[name].spark(spark, single_row_sf_dir).count()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
    assert not failures, (
        "queries crashed on single-row tables:\n" + "\n".join(failures)
    )
