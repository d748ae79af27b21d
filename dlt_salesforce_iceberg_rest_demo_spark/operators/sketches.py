"""Mergeable summary sketches beyond the built-ins.

Spark ships HLL++ (approx_count_distinct) and t-digest
(percentile_approx) - both registered with oracle/bound tests in
`approx_distinct_and_quantiles`. This module adds the heavy-hitters
summary the built-in surface lacks: Misra-Gries, the deterministic
frequent-items sketch.

Why it matters at 100 TB: exact top-k over a high-cardinality key is
a full shuffle of (key, count) partials - fine for 25 nations,
hostile for billions of user ids. A Misra-Gries summary caps per-
partition state at ``capacity`` counters, ships only
partitions x capacity rows to one reducer, and still guarantees
every key with true count > n/capacity survives with estimate error
<= n/capacity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_summarize(counts: dict, capacity: int) -> None:
    """Decrement-phase of Misra-Gries: shrink to < capacity counters."""
    while len(counts) >= capacity:
        dec = min(counts.values())
        for k in list(counts):
            counts[k] -= dec
            if counts[k] <= 0:
                del counts[k]


def heavy_hitters(
    df: DataFrame, col: str, capacity: int = 64, k: int = 10
) -> DataFrame:
    """Approximate top-``k`` heavy hitters of ``col`` via per-partition
    Misra-Gries summaries merged on the driver side of one reduce.

    Guarantees (classic MG + mergeability, Agarwal et al., "Mergeable
    Summaries"): for true count c(x) over n rows, the returned
    estimate e(x) satisfies c(x) - n/capacity <= e(x) <= c(x), and
    every x with c(x) > n/capacity is present. Ties in the final
    top-k are broken by key for determinism.

    Plan shape: mapInPandas keeps O(capacity) state per partition (one
    pass, no shuffle), then the union of summaries - partitions x
    capacity rows, independent of n - takes one tiny groupBy. The
    summary rows also carry each partition's row count so the error
    bound n/capacity is computable from the output alone.
    """
    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[col].dataType),
            T.StructField("est", T.LongType()),
            T.StructField("part_rows", T.LongType()),
        ]
    )

    def summarize(batches):
        import pandas as pd

        counts: dict = {}
        n_rows = 0
        for pdf in batches:
            for v in pdf[col]:
                n_rows += 1
                if v in counts:
                    counts[v] += 1
                elif len(counts) < capacity - 1:
                    counts[v] = 1
                else:
                    _mg_summarize(counts, capacity)
                    counts[v] = 1
        keys = list(counts.keys()) or [None]
        ests = list(counts.values()) or [0]
        # row count rides on the FIRST summary row only, so a plain
        # SUM over all summary rows recovers the exact total n
        yield pd.DataFrame(
            {
                "key": keys,
                "est": ests,
                "part_rows": [n_rows] + [0] * (len(keys) - 1),
            }
        )

    summaries = df.select(col).mapInPandas(summarize, out_schema)
    merged = (
        summaries.filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("est").alias("est"))
    )
    n = summaries.groupBy().agg(F.sum("part_rows").alias("n"))
    return (
        merged.crossJoin(F.broadcast(n))
        .orderBy(F.col("est").desc(), "key")
        .limit(k)
        .select("key", "est", (F.col("n") / capacity).alias("max_underestimate"))
    )


def count_min_table(df: DataFrame, col: str, depth: int = 4, width: int = 64) -> DataFrame:
    """Build a count-min sketch as a plain ``(i, bucket, cnt)`` DataFrame:
    ``depth`` md5-derived hash rows x ``width`` buckets.

    Unlike Spark's builtin ``count_min_sketch`` aggregate (an opaque
    binary blob with no SQL point-query), the sketch HERE is a
    first-class table: mergeable by unioning and re-summing (the 100 TB
    story - per-day sketches roll up into monthly ones without
    re-reading the raw data), queryable with a join, and reproducible
    in any engine that has md5 (the DuckDB oracle rebuilds it
    bit-for-bit, so estimates hash-match exactly).

    Plan shape: a ``depth``-way map-side expand, then partial aggregation
    into at most ``depth * width`` cells - reduce fan-in is sketch-sized,
    independent of row count.
    """
    keyed = df.select(F.col(col).cast("string").alias("k"))
    expanded = keyed.select(
        "k", F.explode(F.array([F.lit(i) for i in range(depth)])).alias("i")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws("#", "k", F.col("i").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )
    return expanded.groupBy("i", bucket.alias("bucket")).agg(
        F.count("*").alias("cnt")
    )


def count_min_lookup(
    sketch: DataFrame, keys: DataFrame, col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point-estimate ``cnt`` for every key in ``keys[col]`` against a
    :func:`count_min_table` sketch: min over the ``depth`` cells the key
    hashes into. Classic CM guarantee: estimate >= true count always
    (collisions only ever inflate), excess ~ n/width per hash row.

    The sketch is at most ``depth * width`` rows, so it is broadcast and
    the lookup is a map-side join - no shuffle of the key set.
    """
    k = keys.select(F.col(col)).distinct().withColumn("k", F.col(col).cast("string"))
    probes = k.select(
        col, "k", F.explode(F.array([F.lit(i) for i in range(depth)])).alias("i")
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(F.md5(F.concat_ws("#", "k", F.col("i").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % width,
    )
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("est"))
    )
