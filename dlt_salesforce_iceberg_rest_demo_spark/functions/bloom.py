"""DataFrame-built Bloom filter: the runtime-filter (semi-join
pruning) pattern, hand-buildable because Spark's own
``bloom_filter_agg`` is Catalyst-internal (InjectRuntimeFilter), not a
SQL-registered function.

At 100 TB this is how a selective dimension predicate reaches the fact
scan without shuffling the fact table: build a ~KB bit array from the
dim keys (one partial-aggregated pass over the SMALL side), ship it as
a plan literal, and drop non-matching fact rows map-side before any
join shuffle. False positives are removed by the exact join that
follows, so the composition is semantically transparent — which also
makes it oracle-checkable.

All hashing is xxhash64 with fixed per-probe seeds: deterministic
run-to-run and across clusters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 1 << 16, k: int = 4
) -> list[int]:
    """Build the filter's 64-bit words from the key column.

    One pass over the (small) build side: each key explodes to its
    ``k`` probe positions, positions partial-aggregate per word with
    ``bit_or`` — shuffle volume is at most ``n_bits/64`` rows
    regardless of build-side size. Returns the dense word list
    (length ``n_bits/64``) for embedding as a plan literal.
    """
    n_words = n_bits // 64
    probes = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(n_bits))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    words = (
        probes.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            # variable shift amounts need expr(): F.shiftleft takes a
            # Python-int count only
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[int(r["w"])] = int(r["word"])
    return dense


def bloom_might_contain(
    key: Column, words: list[int], n_bits: int = 1 << 16, k: int = 4
) -> Column:
    """Membership test against the literal word array — pure codegen'd
    bit arithmetic, no UDF, evaluated at the fact scan.

    The word array is ONE Literal (``F.lit(list)``), not
    ``F.array(*1024 lits)``: a per-element construction costs ~4k
    analyzer nodes across the probes and dominated wall-clock as
    PLAN-time (2s/query observed) before a single row was read."""
    arr = F.lit(words).cast("array<long>")
    one = F.lit(1).cast("long")
    cond = None
    for i in range(k):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.call_function("shiftleft", one, (pos % 64).cast("int"))
        test = word.bitwiseAND(bit) != 0
        cond = test if cond is None else cond & test
    return cond
