"""Slowly-changing-dimension (SCD type 2) history builder.

The reference's merge disposition keeps only the LATEST row per PK
(`/root/reference/salesforce_pipeline.py:83-130` - delete-then-insert
upsert); warehouses usually also want the type-2 view: every value a
key has held, with validity intervals. This operator derives that
history from a stream/stack of timestamped snapshots in one window
pass - the natural Spark-first shape (gaps-and-islands), no iterative
merge logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_snapshots(
    snapshots: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str = "ts",
    id_col: str | None = None,
) -> DataFrame:
    """Collapse per-key timestamped attribute observations into SCD2
    validity intervals.

    Consecutive equal attribute values merge into one interval;
    ``valid_from`` is the first observation of the run, ``valid_to``
    the next run's start (NULL while current), ``is_current`` marks the
    key's last run. Gaps-and-islands: lag -> change flag -> running sum
    = run id, then one aggregate per (key, run). Everything rides a
    single hash partitioning on the key: one shuffle for the windows,
    reused by the groupBy; at 100 TB the state per key is its
    observation list, never the corpus.

    ``id_col`` breaks timestamp ties deterministically (same instant,
    two observations).
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    runs = (
        snapshots.withColumn(
            "__chg",
            F.when(
                F.lag(F.col(attr_col)).over(w).eqNullSafe(F.col(attr_col)), 0
            ).otherwise(1),
        )
        .withColumn(
            "__run",
            F.sum("__chg").over(
                Window.partitionBy(key_col)
                .orderBy(*order)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    hist = runs.groupBy(key_col, "__run").agg(
        F.first(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_observations"),
    )
    w_next = Window.partitionBy(key_col).orderBy("__run")
    return (
        hist.withColumn("valid_to", F.lead("valid_from").over(w_next))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )
