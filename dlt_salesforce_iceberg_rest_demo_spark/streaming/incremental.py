"""Structured Streaming extension (SURVEY.md §2.5).

The reference's "streaming" is batch cursor-polling on a 6-hour Airflow
tick (salesforce/__init__.py:39-47 + airflow DAG schedule). This module
is the true-streaming upgrade the survey marks as extension, built on
the engine's existing batch pieces:

- ``stream_source``     : file-stream over a landing directory (the shape
  a Salesforce CDC/PushTopic feed or Kafka topic lands in) with the same
  schema discipline as the batch source;
- ``windowed_counts``   : watermarked tumbling-window aggregation - late
  rows beyond the watermark are dropped exactly once;
- ``streaming_sessionize``: session windows (native ``session_window``,
  gap-based) - the streaming twin of ``operators.temporal.sessionize``;
- ``incremental_merge_stream``: ``foreachBatch`` -> the SAME
  ``ParquetLake.merge`` disposition the batch pipeline uses, giving
  exactly-once-per-batch upsert semantics (dlt merge parity with
  micro-batch latency instead of 6-hour polls).

Scale notes: state store size is bounded by the watermark horizon;
``session_window`` and windowed aggs shuffle on (key, window) - at
100 TB/day the partition count follows shuffle partitions, and the
merge sink batches are small relative to the table, which is exactly
the broadcast-anti-join merge fast path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based stream over a landing directory (parquet drops)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts + value sums per event type."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based session aggregation with native session windows -
    state closes (and emits) once the watermark passes the gap."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
        )
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def incremental_merge_stream(
    events: DataFrame,
    lake,
    table: str,
    primary_key: tuple[str, ...] = ("event_id",),
    checkpoint_dir: str | None = None,
):
    """Continuous upsert: each micro-batch runs the SAME merge
    disposition as the batch pipeline (delete-then-insert on PK via
    broadcast anti-join). With checkpointing this is exactly-once into
    the snapshot lake; on Iceberg the body becomes one MERGE INTO.

    Returns the started StreamingQuery (caller stops it).
    """

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lake.merge(batch_df, table, primary_key)

    writer = events.writeStream.foreachBatch(_merge_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stateful_user_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator: per-user lifetime totals
    maintained across micro-batches with ``applyInPandasWithState``.

    This is the escape hatch for state machines the built-in windowed
    aggregations can't express (the reference has no analog - its state
    is one cursor per table). Per group key, Spark hands the operator
    its Arrow-batched rows plus a persistent ``GroupState``; we fold the
    batch into (n_events, total_value) and emit the updated running
    totals, so the sink sees one row per user per micro-batch touched.

    Scale notes: state is partitioned by the group key across the state
    store (RocksDB/HDFS-backed per executor), so state size scales out
    with the cluster; only keys present in a micro-batch are loaded.
    Totals use a compensated float sum per batch; for exact long-horizon
    accounting swap the state payload to fixed-point integers.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(user_col, T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {user_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's fingerprint only
    until the watermark passes it, so state size tracks the event rate
    x watermark horizon instead of growing forever - the streaming
    twin of the batch `dedup_exact` operator, and the I4 idempotence
    guard (reference salesforce/helpers/records.py:90 strict-cursor +
    merge-on-PK) expressed natively.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join on key + event-time interval: a right
    event matches a left event at-or-after it within ``horizon``
    (click-attribution shape, streaming twin of
    `temporal.band_join`). Watermarks on both sides + the interval
    condition let Spark expire join state once the watermark clears
    the horizon - without them stream-stream state grows forever.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"""
            l.{user_col} = r.{user_col} AND
            r.{ts_col} >= l.{ts_col} AND
            r.{ts_col} <= l.{ts_col} + interval {horizon}
            """
        ),
    ).select(
        F.col(f"l.{user_col}").alias(user_col),
        F.col(f"l.{ts_col}").alias("left_ts"),
        F.col(f"l.event_id").alias("left_event_id"),
        F.col(f"r.{ts_col}").alias("right_ts"),
        F.col(f"r.event_id").alias("right_event_id"),
    )


def stateful_user_totals_tws(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """`stateful_user_totals` on the transformWithStateInPandas API
    (Spark 4's successor to applyInPandasWithState): an explicit
    ``StatefulProcessor`` with typed ``ValueState`` instead of a bare
    tuple, lifecycle hooks (init/close), and per-state TTL support.

    Kept alongside the applyInPandasWithState twin deliberately - TWS
    is where new stateful features land (state TTL, multiple state
    variables, timers, state data source for inspection), while the
    older API stays the compatibility surface. The processor is
    feature-equivalent here so tests can assert both produce the same
    totals stream.

    ENVIRONMENT GATE: TWS's state protocol needs ``google.protobuf``
    in the Python workers; containers without it can build this plan
    but the stream fails at initialization
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The test suite
    skips accordingly; `stateful_user_totals` is the dependency-free
    twin.

    Scale: same key-partitioned state-store layout as the old API;
    ValueState reads/writes hit only keys present in the micro-batch.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = T.StructType(
        [
            T.StructField(user_col, T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {user_col: [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy(user_col).transformWithStateInPandas(
        TotalsProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def streaming_heavy_hitters(
    events: DataFrame,
    col: str = "event_type",
    shards: int = 8,
    capacity: int = 64,
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters: the unbounded-stream twin
    of ``operators.sketches.heavy_hitters``. Values hash into
    ``shards`` state groups; each group folds its micro-batch slice
    into a bounded (<= capacity-1 entries) MG summary persisted in
    ``applyInPandasWithState`` and emits its current table each batch.

    MG summaries are mergeable (Agarwal et al., "Mergeable
    Summaries"), so the reader unions shard outputs and sums per key:
    estimates obey ``c(x) - n/capacity <= e(x) <= c(x)`` over the
    whole stream history. State per shard is O(capacity) forever -
    memory never tracks stream length, the property that makes this
    viable on an unbounded 100 TB/day firehose.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField("est", T.LongType()),
            T.StructField("shard_rows", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("keys", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("n", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            keys, counts, n = state.get
            mg = dict(zip(keys, counts))
        else:
            mg, n = {}, 0
        for pdf in pdfs:
            for v in pdf[col]:
                n += 1
                if v in mg:
                    mg[v] += 1
                elif len(mg) < capacity - 1:
                    mg[v] = 1
                else:
                    # decrement-all step: drop zeros
                    mg = {k: c - 1 for k, c in mg.items() if c > 1}
                    mg[v] = 1
        state.update((list(mg.keys()), list(mg.values()), n))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(mg),
                "key": list(mg.keys()),
                "est": list(mg.values()),
                "shard_rows": [n] + [0] * (len(mg) - 1),
            }
        )

    sharded = events.withColumn(
        "__shard", F.pmod(F.xxhash64(F.col(col)), F.lit(shards))
    )
    return sharded.groupBy("__shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_static_enrich(
    stream_df: DataFrame, static_df: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against
    the static dimension (re-read per batch, so slowly-changing dims
    pick up updates between batches — Structured Streaming semantics).
    The static side is explicitly broadcast: the unbounded stream side
    never shuffles, which is the only stream-static plan that holds at
    production rates. The streaming counterpart of the batch
    broadcast-dim joins (`join_broadcast_revenue_by_brand`)."""
    return stream_df.join(F.broadcast(static_df), on, how)


def streaming_ohlc(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of the batch `timeseries_ohlc_hourly` rollup:
    watermarked tumbling-window OHLC bars per user. The open/close
    ARGMIN/ARGMAX (min/max over (ts, event_id, value) structs) are
    ordinary ordering-based aggregates, so streaming state per
    (user, window) group is one struct + two doubles + a count —
    bounded, mergeable across micro-batches, and identical in value to
    the batch plan; the watermark bounds how long a bar stays open for
    late events before the final row emits (append mode)."""
    g = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "user_id")
        .agg(
            F.min(F.struct(ts_col, "event_id", "value")).alias("o"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max(F.struct(ts_col, "event_id", "value")).alias("c"),
            F.count("*").alias("n_events"),
        )
    )
    return g.select(
        F.col("window.start").alias("bar_hour"),
        "user_id",
        F.col("o.value").alias("open_value"),
        "high_value",
        "low_value",
        F.col("c.value").alias("close_value"),
        "n_events",
    )


def stream_stream_left_outer_join(
    left: DataFrame,
    right: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER stream-stream join on key + event-time interval: like
    :func:`stream_stream_interval_join`, but a left event with NO match
    inside the horizon is still emitted (right side NULL) — the
    un-attributed-click / abandoned-cart feed, which an inner join
    silently drops.

    The outer semantics are only correct BECAUSE of the watermark +
    interval bound: Spark can declare a left row match-less (and emit
    the NULL row) only once the watermark has passed its entire match
    window — unmatched rows therefore surface with watermark delay,
    not immediately. Same bounded state expiry as the inner variant.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"""
            l.{user_col} = r.{user_col} AND
            r.{ts_col} >= l.{ts_col} AND
            r.{ts_col} <= l.{ts_col} + interval {horizon}
            """
        ),
        "leftOuter",
    ).select(
        F.col(f"l.{user_col}").alias(user_col),
        F.col(f"l.{ts_col}").alias("left_ts"),
        F.col("l.event_id").alias("left_event_id"),
        F.col(f"r.{ts_col}").alias("right_ts"),
        F.col("r.event_id").alias("right_event_id"),
    )


def stream_cdc_apply(
    changelog: DataFrame,
    lake,
    table: str,
    key_col: str,
    version_col: str = "version",
    op_col: str = "op",
    checkpoint_dir: str | None = None,
    guard_stale: bool = False,
):
    """Continuous CDC apply: each micro-batch of the I/U/D changelog
    stream runs ``ParquetLake.merge_cdc`` — last-writer-wins compaction
    within the batch, deletes drop out, upserts replace, one atomic
    snapshot per batch. With checkpointing the sink is exactly-once
    (replayed batches re-apply idempotently: merge_cdc of the same
    changelog is a fixed point). The streaming half of the CDC story
    whose batch half is `cdc_apply_changelog`; on Iceberg the body
    becomes MERGE INTO ... WHEN MATCHED AND op='D' THEN DELETE.

    Micro-batch boundaries are an arbitrary split of the changelog, so
    the default inherits merge_cdc's delivery contract: per-key version
    order must hold ACROSS batches (Kafka/Debezium per-key topic
    ordering). ``guard_stale=True`` lifts that entirely — the lake
    keeps each key's last_version, persists winning deletes as
    retention-windowed tombstones, and ignores stale cross-batch
    updates/deletes, making the final table independent of how the
    stream was micro-batched for ARBITRARY changelogs, deletes
    included (unique (key, version) pairs required); see
    :meth:`ParquetLake.merge_cdc` and
    :meth:`ParquetLake.compact_tombstones`.

    Returns the started StreamingQuery (caller stops it).
    """

    def _apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lake.merge_cdc(
            batch_df, table, key_col, version_col, op_col,
            guard_stale=guard_stale,
        )

    writer = changelog.writeStream.foreachBatch(_apply_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
