"""Incremental aggregate maintenance: mergeable rollup state.

The reference reloads incrementally (cursor > last) but any DOWNSTREAM
aggregate over its tables still recomputes from scratch. This operator
keeps a rollup table maintainable from new batches alone: per-key
(count, decimal-sum) state merges associatively, so

    state_{t+1} = merge(state_t, partial_agg(batch_{t+1}))

touches only the batch — at 100 TB the daily rollup costs O(day), not
O(history). Decimal sums make the merge EXACT in any order, so
incremental maintenance equals full recompute bit-for-bit (asserted by
the oracle-checked registry query and the lake round-trip test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def partial_rollup(
    batch: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """One batch's aggregate state: per-key row count + exact decimal
    sums (map-side combined; shuffle carries only state rows)."""
    aggs = [F.count("*").alias("n_rows")] + [
        F.sum(F.col(c).cast(DEC)).alias(f"sum_{c}") for c in sum_cols
    ]
    return batch.groupBy(*keys).agg(*aggs)


def merge_rollup(
    state: DataFrame | None, partial: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold a new partial state into the existing state. Associative +
    commutative (counts and decimal sums), so batches can merge in any
    order or grouping - replay, backfill, and out-of-order arrival all
    converge to the same table."""
    if state is None:
        return partial
    measures = [c for c in partial.columns if c not in keys]
    return (
        state.unionByName(partial)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in measures])
    )


def rollup_as_result(rolled: DataFrame, sum_cols: list[str]) -> DataFrame:
    """Present state with DOUBLE sums (stable output schema for
    consumers; the decimals stay exact inside the state table)."""
    out = rolled
    for c in sum_cols:
        out = out.withColumn(f"sum_{c}", F.col(f"sum_{c}").cast("double"))
    return out


def incremental_join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Incremental view maintenance for an INNER JOIN under appends:
    the delta rows to add to a materialized join when both inputs grow,

        dJ = dA >< B_old  UNION ALL  A_old >< dB  UNION ALL  dA >< dB

    (the bilinearity of join over union). Maintaining the join costs
    O(|dA| + |dB|) join work against the base tables instead of
    re-joining the full inputs — at 100 TB the daily maintenance of a
    materialized fact join touches only the day's appends. Exact by
    algebra, not approximation: the maintained result equals the
    full-recompute join as a multiset (the registry query's oracle IS
    the direct join).

    Append-only deltas: updates/deletes need the delete feed from
    ``ParquetLake.diff`` applied as anti-join retractions first.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return (
        a_delta.join(b_old, keys)
        .unionByName(a_old.join(b_delta, keys))
        .unionByName(a_delta.join(b_delta, keys))
    )


_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")
_TIMESTAMP_TYPES = ("timestamp", "timestamp_ntz")


def version_to_long(c: "F.Column", dtype: str) -> "F.Column":
    """Canonical long for a CDC version/order column. Integral types
    cast; TIMESTAMP becomes epoch MICROSECONDS (`unix_micros` — exact,
    total, timezone-independent: micros-since-epoch in and out), the
    most common real CDC ordering key (the reference's own cursor is
    a SystemModstamp datetime, `/root/reference/salesforce/__init__.py:
    41-47`); TIMESTAMP_NTZ is first reinterpreted in the session
    timezone (the engine pins UTC, `session.py`). Everything else is
    a plain long cast whose losslessness callers must enforce — see
    :func:`version_unrepresentable`."""
    if dtype in _TIMESTAMP_TYPES:
        if dtype == "timestamp_ntz":
            c = c.cast("timestamp")
        return F.unix_micros(c)
    return c.cast("long")


def version_unrepresentable(c: "F.Column", dtype: str) -> "F.Column":
    """Predicate: non-NULL version values that do NOT convert
    losslessly to long — non-numeric strings, fractional numerics
    (truncation creates false version ties a strict-``>`` guard then
    drops as stale), and for float/double the silent non-ANSI escape
    hatches the round-trip check alone misses: cast(NaN as long) = 0
    and cast(±Inf as long) = ±Long.MAX are NON-NULL while the decimal
    cast NULLs, so the inequality is NULL and the row slips through —
    a guard stuck at version 0 or blocking all future updates at
    Long.MAX. Integral and timestamp conversions are total -> false
    (NULL inputs are a separate policy: the guard path rejects them,
    unguarded apply lets them lose every comparison)."""
    if dtype in _INTEGRAL_TYPES or dtype in _TIMESTAMP_TYPES:
        return F.lit(False)
    as_long = c.cast("long")
    if dtype in ("float", "double"):
        # double->long->double round-trip: exact whole values survive,
        # fractional values and ±Inf (saturating to ±Long.MAX) do not;
        # NaN needs the explicit clause (cast gives 0, and NaN
        # comparisons would otherwise never flag it)
        return c.isNotNull() & (
            F.isnan(c) | (c.cast("double") != as_long.cast("double"))
        )
    # decimal(38,9) spans every long exactly; values outside it (or
    # non-numeric strings) cast to NULL and fail the first clause,
    # fractional values fail the round-trip equality
    return c.isNotNull() & (
        as_long.isNull()
        | (c.cast("decimal(38,9)") != as_long.cast("decimal(38,9)"))
    )


def apply_changelog(
    log: DataFrame,
    key_col: str,
    version_col: str,
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Last-writer-wins changelog compaction (the CDC APPLY step; see
    `cdc_apply_changelog` in the registry): per key, the highest
    version wins via a partial-aggregatable ARGMAX over
    (version, op, payload...) structs — no window sort — and keys whose
    final op is a delete drop out. Requires (key, version) unique
    (a totally ordered changelog); ties would otherwise resolve by
    struct order over the remaining fields. The version column is
    canonicalized to long BEFORE the argmax (:func:`version_to_long`;
    timestamps become epoch micros) — comparing the raw type would
    order numeric-string versions lexicographically ("9" > "10" —
    the older event wins) and compare decimals at full precision
    while the emitted ``last_version`` truncates; casting first makes
    the comparison and the stored guard value the same number. A
    non-NULL version the cast cannot represent losslessly (ISO-8601
    strings, fractional or NaN/Inf numerics) RAISES at execution time
    via an inline `raise_error` — zero extra scan — instead of
    silently becoming NULL and handing the argmax to op/payload
    struct order (ADVICE r9 medium). NULL version inputs remain the
    documented lose-every-comparison case; callers that must reject
    them up front validate first, as
    ``ParquetLake._check_version_castable`` does."""
    dtype = dict(log.dtypes)[version_col]
    c = F.col(version_col)
    canon = version_to_long(c, dtype)
    if dtype not in _INTEGRAL_TYPES and dtype not in _TIMESTAMP_TYPES:
        canon = F.when(
            version_unrepresentable(c, dtype),
            F.raise_error(
                F.concat(
                    F.lit(
                        "apply_changelog: version value "
                    ),
                    c.cast("string"),
                    F.lit(
                        f" (column {version_col!r}, type {dtype}) is not"
                        " losslessly convertible to long; a silent NULL"
                        " or truncating cast would mis-order the"
                        " changelog. Provide whole-valued numerics, a"
                        " timestamp column, or pre-convert (e.g."
                        " unix_micros) yourself."
                    ),
                )
            ).cast("long"),
        ).otherwise(canon)
    log = log.withColumn(version_col, canon)
    m = log.groupBy(key_col).agg(
        F.max(F.struct(version_col, op_col, *payload_cols)).alias("m")
    )
    kept = m.filter(F.col(f"m.{op_col}") != "D")
    return kept.select(
        key_col,
        *[F.col(f"m.{c}").alias(c) for c in payload_cols],
        F.col(f"m.{version_col}").alias("last_version"),
    )
