"""Data-quality expectations: the schema/data contract layer.

dlt pipelines (the reference's framework) support schema contracts on
ingested data; this module is the Spark-native generalization - a
declarative check set evaluated in as few passes as the checks allow,
returning a violations report instead of raising mid-load. The
pipeline can gate a disposition write on the report (fail / warn /
quarantine), which at 100 TB matters because a re-run after a partial
bad load costs a full merge.

Design: column-local checks (not-null, range, set membership,
uniqueness) fold into ONE aggregate pass; referential checks add one
anti-join per referenced dimension (broadcast when the dim key set is
small). Everything returns counts, so the report is exact and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_report(
    df: DataFrame,
    not_null: list[str] = (),
    unique: list[str] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
    allowed: dict[str, list[str]] | None = None,
    references: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """One-row violations report.

    - ``not_null``   : columns that must not contain NULL
    - ``unique``     : columns whose values must be unique
    - ``ranges``     : col -> (lo, hi) inclusive numeric bounds
    - ``allowed``    : col -> permitted value set
    - ``references`` : col -> (dim_df, dim_key): FK must exist in dim

    Column-local checks run in one aggregate; each uniqueness check is
    count - count_distinct (no self-join); each reference check is one
    LEFT ANTI join against the (broadcast) dimension key set.
    """
    aggs: list[Column] = [F.count("*").alias("n_rows")]
    for c in not_null:
        aggs.append(
            F.count_if(F.col(c).isNull()).cast("long").alias(f"null_{c}")
        )
    for c in unique:
        aggs.append(
            (F.count(c) - F.count_distinct(F.col(c)))
            .cast("long")
            .alias(f"dup_{c}")
        )
    for c, (lo, hi) in (ranges or {}).items():
        aggs.append(
            F.count_if(~F.col(c).between(lo, hi)).cast("long").alias(f"range_{c}")
        )
    for c, values in (allowed or {}).items():
        aggs.append(
            F.count_if(~F.col(c).isin(list(values)))
            .cast("long")
            .alias(f"invalid_{c}")
        )
    report = df.agg(*aggs)
    for c, (dim, dim_key) in (references or {}).items():
        orphans = (
            df.select(F.col(c))
            .join(
                F.broadcast(dim.select(F.col(dim_key).alias(c)).distinct()),
                c,
                "left_anti",
            )
            .agg(F.count("*").cast("long").alias(f"orphan_{c}"))
        )
        report = report.crossJoin(orphans)
    return report
