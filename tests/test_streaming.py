"""Structured Streaming tests: memory-sink micro-batch runs driven to
completion with processAllAvailable (pyspark guide pattern)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dlt_salesforce_iceberg_rest_demo_spark.sinks.dispositions import ParquetLake
from dlt_salesforce_iceberg_rest_demo_spark.sources.parquet import load_table
from dlt_salesforce_iceberg_rest_demo_spark.streaming import (
    incremental_merge_stream,
    stream_source,
    streaming_sessionize,
    windowed_counts,
)

from .conftest import SF_DIR


@pytest.fixture()
def landing(tmp_path):
    """Landing dir seeded with the events fixture as the first drop."""
    d = tmp_path / "landing"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "drop1.parquet")
    return d


def _run_to_memory(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_windowed_counts_match_batch(spark, landing):
    # normalize the fixture's timestamp encoding (ns-long or naive-us)
    # through load_table, then stream a rewritten session-tz drop
    df = load_table(spark, SF_DIR, "events")
    df.coalesce(1).write.parquet(str(landing / "clean"))
    df = spark.read.parquet(str(landing / "clean"))

    stream = stream_source(spark, str(landing / "clean"))
    name = _run_to_memory(windowed_counts(stream, "1 hour", "2 hours"), "wc")
    got = spark.sql(f"SELECT * FROM {name}")
    batch = (
        df.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select("event_type", F.col("window.start").alias("window_start"), "n_events")
    )
    got_set = {
        (r.event_type, r.window_start, r.n_events)
        for r in got.select("event_type", "window_start", "n_events").collect()
    }
    batch_set = {(r.event_type, r.window_start, r.n_events) for r in batch.collect()}
    assert got_set == batch_set  # stream == batch over the same data


def test_streaming_sessionize_runs(spark, landing):
    df = load_table(spark, SF_DIR, "events")
    df.limit(500).coalesce(1).write.parquet(str(landing / "clean2"))
    stream = stream_source(spark, str(landing / "clean2"))
    name = _run_to_memory(streaming_sessionize(stream), "sess")
    out = spark.sql(f"SELECT * FROM {name}")
    assert out.count() > 0
    row = out.first()
    assert row.session_end >= row.session_start
    assert row.n_events >= 1


def test_incremental_merge_stream_upserts(spark, tmp_path):
    lake = ParquetLake(spark, tmp_path / "lake")
    landing = tmp_path / "stream_in"
    landing.mkdir()
    base = [Row(event_id=1, v="old"), Row(event_id=2, v="keep")]
    spark.createDataFrame(base).coalesce(1).write.parquet(str(landing / "b1"))

    schema = "event_id long, v string"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(landing / "*")
    )
    q = incremental_merge_stream(
        stream, lake, "events_merged", ("event_id",),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    assert lake.count("events_merged") == 2

    # second drop: update PK 1, insert PK 3 - the streaming upsert
    upd = [Row(event_id=1, v="new"), Row(event_id=3, v="ins")]
    spark.createDataFrame(upd).coalesce(1).write.parquet(str(landing / "b2"))
    q.processAllAvailable()
    q.stop()
    rows = {r.event_id: r.v for r in lake.read("events_merged").collect()}
    assert rows == {1: "new", 2: "keep", 3: "ins"}


@pytest.mark.exhaustive
def test_stateful_user_totals_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    totals after drop2 include drop1's rows for returning users."""
    from dlt_salesforce_iceberg_rest_demo_spark.streaming import stateful_user_totals

    landing = tmp_path / "stateful_in"
    landing.mkdir()
    b1 = [Row(user_id=1, value=10.0), Row(user_id=1, value=5.0), Row(user_id=2, value=1.0)]
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(landing / "b1"))

    stream = spark.readStream.schema("user_id long, value double").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(landing / "*"))
    q = (
        stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("sut")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sut_ckpt"))
        .start()
    )
    q.processAllAvailable()
    first = {r.user_id: (r.n_events, r.total_value) for r in spark.sql("SELECT * FROM sut").collect()}
    assert first == {1: (2, 15.0), 2: (1, 1.0)}

    b2 = [Row(user_id=1, value=2.5), Row(user_id=3, value=7.0)]
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(landing / "b2"))
    q.processAllAvailable()
    q.stop()
    # memory sink in update mode appends updated rows in unspecified
    # order; running totals are monotone in n_events, so max() per user
    # is the latest state
    rows = spark.sql("SELECT * FROM sut").collect()
    latest = {}
    for r in rows:
        if r.user_id not in latest or r.n_events > latest[r.user_id][0]:
            latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[1] == (3, 17.5)  # state carried: 2 events + 1 new
    assert latest[2] == (1, 1.0)   # untouched in batch 2
    assert latest[3] == (1, 7.0)   # new key


@pytest.mark.exhaustive
def test_dedup_within_watermark_drops_repeats(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a repeated event_id arriving in a
    later micro-batch (inside the horizon) is emitted only once."""
    from dlt_salesforce_iceberg_rest_demo_spark.streaming import dedup_within_watermark

    landing = tmp_path / "in"
    landing.mkdir()
    t0 = "2024-01-01 00:00:00"
    t1 = "2024-01-01 00:02:00"
    rows1 = [Row(event_id=1, ts=t0, v="a"), Row(event_id=2, ts=t1, v="b")]
    spark.createDataFrame(rows1).withColumn("ts", F.col("ts").cast("timestamp")) \
        .coalesce(1).write.parquet(str(landing / "b1"))

    schema = "event_id long, ts timestamp, v string"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1) \
        .parquet(str(landing / "*"))
    dedup = dedup_within_watermark(stream, ["event_id"], watermark="10 minutes")
    q = (
        dedup.writeStream.format("memory").queryName("wmdedup")
        .outputMode("append").start()
    )
    q.processAllAvailable()

    # duplicate id 1 (same horizon) + fresh id 3
    rows2 = [Row(event_id=1, ts=t1, v="dup"), Row(event_id=3, ts=t1, v="c")]
    spark.createDataFrame(rows2).withColumn("ts", F.col("ts").cast("timestamp")) \
        .coalesce(1).write.parquet(str(landing / "b2"))
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT event_id, v FROM wmdedup ORDER BY event_id").collect()
    assert [r.event_id for r in out] == [1, 2, 3]
    assert dict((r.event_id, r.v) for r in out)[1] == "a"  # first wins


@pytest.mark.exhaustive
def test_stream_stream_interval_join_attributes_within_horizon(spark, tmp_path):
    """Stream-stream interval join: right events match left events
    at-or-after them within the horizon; outside-horizon pairs drop."""
    from dlt_salesforce_iceberg_rest_demo_spark.streaming import (
        stream_stream_interval_join,
    )

    left_dir = tmp_path / "l"
    right_dir = tmp_path / "r"
    left_dir.mkdir(); right_dir.mkdir()
    mk = lambda eid, ts, u: Row(event_id=eid, ts=ts, user_id=u)
    lrows = [mk(10, "2024-01-01 00:00:00", 1), mk(11, "2024-01-01 02:00:00", 2)]
    rrows = [
        mk(20, "2024-01-01 00:10:00", 1),   # in horizon of 10
        mk(21, "2024-01-01 01:00:00", 1),   # outside 30-min horizon
        mk(22, "2024-01-01 01:00:00", 2),   # BEFORE left 11 - no match
    ]
    schema = "event_id long, ts timestamp, user_id long"
    for d, rows in ((left_dir, lrows), (right_dir, rrows)):
        spark.createDataFrame(rows).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).select("event_id", "ts", "user_id").coalesce(1).write.parquet(str(d / "b1"))
    l = spark.readStream.schema(schema).parquet(str(left_dir / "*"))
    r = spark.readStream.schema(schema).parquet(str(right_dir / "*"))
    joined = stream_stream_interval_join(l, r, horizon="30 minutes")
    q = (
        joined.writeStream.format("memory").queryName("ssj")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r.left_event_id, r.right_event_id)
           for r in spark.sql("SELECT * FROM ssj").collect()}
    assert got == {(10, 20)}


def test_stateful_user_totals_tws_matches_old_api(spark, tmp_path):
    """transformWithStateInPandas (StatefulProcessor + ValueState) must
    produce the same totals stream as the applyInPandasWithState twin,
    including state carried across micro-batches. Skips where
    google.protobuf (TWS's state-protocol dependency) is unavailable."""
    pytest.importorskip("google.protobuf")
    from dlt_salesforce_iceberg_rest_demo_spark.streaming import (
        stateful_user_totals_tws,
    )

    landing = tmp_path / "tws_in"
    landing.mkdir()
    b1 = [Row(user_id=1, value=10.0), Row(user_id=1, value=5.0), Row(user_id=2, value=1.0)]
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(landing / "b1"))

    stream = spark.readStream.schema("user_id long, value double").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(landing / "*"))
    q = (
        stateful_user_totals_tws(stream)
        .writeStream.format("memory")
        .queryName("tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
        .start()
    )
    q.processAllAvailable()
    first = {r.user_id: (r.n_events, r.total_value)
             for r in spark.sql("SELECT * FROM tws").collect()}
    assert first == {1: (2, 15.0), 2: (1, 1.0)}

    b2 = [Row(user_id=1, value=2.5), Row(user_id=3, value=7.0)]
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(landing / "b2"))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM tws").collect()
    latest = {}
    for r in rows:
        if r.user_id not in latest or r.n_events > latest[r.user_id][0]:
            latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[1] == (3, 17.5)
    assert latest[2] == (1, 1.0)
    assert latest[3] == (1, 7.0)


def test_streaming_heavy_hitters_bounds_across_batches(spark, tmp_path):
    """Sharded streaming Misra-Gries: after two micro-batches the
    merged estimates cover both batches' rows within the MG bound
    (c(x) - n/capacity <= est <= c(x)), with bounded state."""
    from collections import Counter

    from dlt_salesforce_iceberg_rest_demo_spark.streaming import (
        streaming_heavy_hitters,
    )

    landing = tmp_path / "hh_in"
    landing.mkdir()
    b1 = ["a"] * 50 + ["b"] * 30 + ["c"] * 5
    b2 = ["a"] * 20 + ["d"] * 40 + ["c"] * 5
    spark.createDataFrame([(v,) for v in b1], "event_type string").coalesce(1) \
        .write.parquet(str(landing / "b1"))

    stream = spark.readStream.schema("event_type string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(landing / "*"))
    q = (
        streaming_heavy_hitters(stream, capacity=8)
        .writeStream.format("memory")
        .queryName("hh")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame([(v,) for v in b2], "event_type string").coalesce(1) \
        .write.parquet(str(landing / "b2"))
    q.processAllAvailable()
    q.stop()

    # latest emission per (shard, key): max est wins (update sink appends)
    rows = spark.sql("SELECT * FROM hh").collect()
    latest = {}
    for r in rows:
        latest[(r.shard, r.key)] = max(latest.get((r.shard, r.key), 0), r.est)
    merged = Counter()
    for (_, k), est in latest.items():
        merged[k] += est
    true = Counter(b1 + b2)
    n = len(b1) + len(b2)
    for k, c in true.items():
        assert merged[k] <= c, (k, merged[k], c)
        assert merged[k] >= c - n / 8, (k, merged[k], c)
    # the two dominant keys must be present
    assert merged["a"] > 0 and merged["d"] > 0


def test_stream_static_enrich_matches_batch(spark, landing):
    from dlt_salesforce_iceberg_rest_demo_spark.streaming import stream_static_enrich

    df = load_table(spark, SF_DIR, "events")
    df.coalesce(1).write.parquet(str(landing / "clean2"))
    df = spark.read.parquet(str(landing / "clean2"))
    dim = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    stream = stream_source(spark, str(landing / "clean2"))
    enriched = stream_static_enrich(stream, dim, "user_id").select(
        "event_id", "user_id", "c_mktsegment"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["event_id"], r["c_mktsegment"])
        for r in spark.sql("SELECT * FROM enrich").collect()
    }
    want = {
        (r["event_id"], r["c_mktsegment"])
        for r in df.join(dim, "user_id", "left")
        .select("event_id", "c_mktsegment")
        .collect()
    }
    assert got == want and len(got) == df.count()


def test_streaming_ohlc_matches_batch(spark, landing):
    from dlt_salesforce_iceberg_rest_demo_spark.streaming import streaming_ohlc
    from dlt_salesforce_iceberg_rest_demo_spark.plans import query_fns

    df = load_table(spark, SF_DIR, "events")
    df.coalesce(1).write.parquet(str(landing / "ohlc_src"))

    stream = stream_source(spark, str(landing / "ohlc_src"))
    q = (
        streaming_ohlc(stream)
        .writeStream.format("memory")
        .queryName("sohlc")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["bar_hour"]): (
            r["open_value"], r["high_value"], r["low_value"],
            r["close_value"], r["n_events"],
        )
        for r in spark.sql("SELECT * FROM sohlc").collect()
    }
    want = {
        (r["user_id"], r["bar_hour"]): (
            r["open_value"], r["high_value"], r["low_value"],
            r["close_value"], r["n_events"],
        )
        for r in query_fns()["timeseries_ohlc_hourly"](spark, SF_DIR).collect()
    }
    # Append-mode emits only watermark-closed bars; every emitted bar
    # must equal its batch twin exactly, and most bars must have closed.
    assert got, "no bars emitted"
    for k, v in got.items():
        assert want[k] == v, k
    assert len(got) >= len(want) * 0.5


@pytest.mark.exhaustive
def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """LEFT OUTER interval join: an unmatched left event surfaces with a
    NULL right side once the watermark clears its match window (the
    inner variant silently drops it)."""
    from dlt_salesforce_iceberg_rest_demo_spark.streaming import (
        stream_stream_left_outer_join,
    )

    left_dir = tmp_path / "lo_l"
    right_dir = tmp_path / "lo_r"
    left_dir.mkdir(); right_dir.mkdir()
    mk = lambda eid, ts, u: Row(event_id=eid, ts=ts, user_id=u)
    schema = "event_id long, ts timestamp, user_id long"

    def put(d, name, rows):
        spark.createDataFrame(rows).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).select("event_id", "ts", "user_id").coalesce(1).write.parquet(
            str(d / name)
        )

    # batch 1: left 10 (matched), left 11 (never matched); right 20
    put(left_dir, "b1", [mk(10, "2024-01-01 00:00:00", 1),
                         mk(11, "2024-01-01 00:00:00", 2)])
    put(right_dir, "b1", [mk(20, "2024-01-01 00:10:00", 1)])

    l = spark.readStream.schema(schema).parquet(str(left_dir / "*"))
    r = spark.readStream.schema(schema).parquet(str(right_dir / "*"))
    joined = stream_stream_left_outer_join(
        l, r, horizon="30 minutes", watermark="10 minutes"
    )
    q = (
        joined.writeStream.format("memory").queryName("ssloj")
        .outputMode("append").start()
    )
    q.processAllAvailable()

    # batch 2: far-future rows on BOTH streams push the watermark past
    # left 11's entire match window -> its NULL row can now emit.
    put(left_dir, "b2", [mk(12, "2024-01-01 06:00:00", 9)])
    put(right_dir, "b2", [mk(29, "2024-01-01 06:00:00", 9)])
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()

    rows = spark.sql(
        "SELECT left_event_id, right_event_id FROM ssloj"
    ).collect()
    got = {(r.left_event_id, r.right_event_id) for r in rows}
    assert (10, 20) in got          # matched pair
    assert (11, None) in got        # unmatched left surfaced with NULLs


def test_stream_cdc_apply_upserts_and_deletes(spark, tmp_path):
    """foreachBatch CDC apply: micro-batches of I/U/D changelog rows
    land in the lake with merge_cdc semantics, one snapshot per batch."""
    from dlt_salesforce_iceberg_rest_demo_spark.sinks.dispositions import ParquetLake
    from dlt_salesforce_iceberg_rest_demo_spark.streaming import stream_cdc_apply

    lake = ParquetLake(spark, tmp_path / "cdc_lake")
    base = spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b"), Row(id=3, v="c")]
    )
    lake.replace(base, "t")

    landing = tmp_path / "cdc_in"
    landing.mkdir()
    schema = "id long, version long, op string, v string"
    spark.createDataFrame(
        [Row(id=2, version=1, op="U", v="b2"), Row(id=4, version=1, op="I", v="d")]
    ).coalesce(1).write.parquet(str(landing / "b1"))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(landing / "*"))
    q = stream_cdc_apply(
        stream, lake, "t", "id",
        checkpoint_dir=str(tmp_path / "cdc_ckpt"),
    )
    q.processAllAvailable()

    spark.createDataFrame(
        [Row(id=3, version=2, op="D", v=None), Row(id=2, version=2, op="U", v="b3")]
    ).coalesce(1).write.parquet(str(landing / "b2"))
    q.processAllAvailable()
    q.stop()

    rows = {r.id: r.v for r in lake.read("t").collect()}
    assert rows == {1: "a", 2: "b3", 4: "d"}  # 3 deleted, 2 updated twice


@pytest.mark.exhaustive
def test_stream_cdc_apply_guarded_survives_out_of_order_batches(spark, tmp_path):
    """guard_stale=True makes the streamed table independent of
    micro-batch delivery order for updates: versions v3/v4 for the same
    keys arrive in a LATER file than v5/v6, yet the final table equals
    the one-shot batch apply of the whole changelog (the default
    contract would end on the stale payloads instead)."""
    from dlt_salesforce_iceberg_rest_demo_spark.sinks.dispositions import ParquetLake
    from dlt_salesforce_iceberg_rest_demo_spark.streaming import stream_cdc_apply

    landing = tmp_path / "cdcg_in"
    landing.mkdir()
    schema = "id long, version long, op string, v string"
    # newer versions delivered FIRST
    spark.createDataFrame(
        [Row(id=1, version=6, op="U", v="fresh1"),
         Row(id=2, version=5, op="U", v="fresh2")]
    ).coalesce(1).write.parquet(str(landing / "b1"))

    lake = ParquetLake(spark, tmp_path / "cdcg_lake")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(landing / "*"))
    q = stream_cdc_apply(
        stream, lake, "t", "id",
        checkpoint_dir=str(tmp_path / "cdcg_ckpt"),
        guard_stale=True,
    )
    q.processAllAvailable()

    # stale versions straggle in afterwards, plus one genuinely new key
    spark.createDataFrame(
        [Row(id=1, version=3, op="U", v="stale1"),
         Row(id=2, version=4, op="D", v=None),
         Row(id=3, version=1, op="I", v="new3")]
    ).coalesce(1).write.parquet(str(landing / "b2"))
    q.processAllAvailable()
    q.stop()

    rows = {r.id: r.v for r in lake.read("t").collect()}
    # == one-shot apply of all five rows: argmax per key
    assert rows == {1: "fresh1", 2: "fresh2", 3: "new3"}


def test_streaming_sessionize_matches_python_replay(spark, landing):
    """Round-7 equivalence (the sessionize twin only had a runs-check):
    native session_window aggregation over the real events fixture ==
    a python gap-split replay — session bounds (end = last ts + gap,
    END-exclusive merge: an event exactly gap after its predecessor
    starts a NEW session), event counts, and the dsum-playbook
    decimal-stabilized value sums."""
    import datetime as dt
    from decimal import ROUND_HALF_UP, Decimal

    df = load_table(spark, SF_DIR, "events")
    df.limit(800).coalesce(1).write.parquet(str(landing / "clean3"))
    src = spark.read.parquet(str(landing / "clean3"))
    stream = stream_source(spark, str(landing / "clean3"))
    name = _run_to_memory(streaming_sessionize(stream), "sess_eq")
    got = {
        (r.user_id, r.session_start, r.session_end): (
            r.n_events,
            r.session_value,
        )
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    gap = dt.timedelta(minutes=30)
    q = Decimal("0.000001")
    rows = sorted(
        ((r.user_id, r.ts, r.value) for r in src.collect()),
        key=lambda t: (t[0], t[1]),
    )
    want = {}
    cur = None  # (user, start, last_ts, n, decimal_sum)
    def close(c):
        u, start, last, n, s = c
        want[(u, start, last + gap)] = (n, float(s))
    for u, ts, v in rows:
        dv = Decimal(repr(v)).quantize(q, ROUND_HALF_UP) if v is not None else Decimal(0)
        if cur is not None and cur[0] == u and ts < cur[2] + gap:
            cur = (u, cur[1], ts, cur[3] + 1, cur[4] + dv)
        else:
            if cur is not None:
                close(cur)
            cur = (u, ts, ts, 1, dv)
    if cur is not None:
        close(cur)
    assert got == want


@pytest.mark.exhaustive
def test_stream_stream_interval_join_matches_band_join(spark, tmp_path):
    """Round-7 equivalence: the stream-stream interval join is the
    streaming twin of temporal.band_join([0, horizon], on=key) — over
    the same rows fed as TWO micro-batches per side, the matched pair
    sets must be identical (watermark widened past the data span so
    state eviction — covered by the horizon test above — can't drop
    legitimately-late rows)."""
    import random

    from dlt_salesforce_iceberg_rest_demo_spark.operators import temporal
    from dlt_salesforce_iceberg_rest_demo_spark.streaming import (
        stream_stream_interval_join,
    )

    rng = random.Random(42)
    mk = lambda eid, sec, u: Row(
        event_id=eid, t=(1_700_000_000 + sec) * 1_000_000, user_id=u
    )
    lrows = [mk(i, rng.randrange(0, 7200), rng.randrange(1, 4)) for i in range(25)]
    rrows = [
        mk(100 + j, rng.randrange(0, 7200), rng.randrange(1, 4))
        for j in range(25)
    ]
    schema = "event_id long, t long, user_id long"
    dirs = {"l": lrows, "r": rrows}
    for side, rows in dirs.items():
        d = tmp_path / side
        d.mkdir()
        for bi, chunk in enumerate((rows[:12], rows[12:])):
            spark.createDataFrame(chunk, schema).select(
                "event_id", F.timestamp_micros("t").alias("ts"), "user_id"
            ).coalesce(1).write.parquet(str(d / f"b{bi}"))
    ts_schema = "event_id long, ts timestamp, user_id long"
    l = (
        spark.readStream.schema(ts_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "l" / "*"))
    )
    r = (
        spark.readStream.schema(ts_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "r" / "*"))
    )
    joined = stream_stream_interval_join(
        l, r, horizon="30 minutes", watermark="10 hours"
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_eq")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (x.left_event_id, x.right_event_id)
        for x in spark.sql("SELECT * FROM ssj_eq").collect()
    }
    lb = spark.createDataFrame(lrows, schema).select(
        "event_id", F.timestamp_micros("t").alias("ts"), "user_id"
    )
    rb = spark.createDataFrame(rrows, schema).select(
        "event_id", F.timestamp_micros("t").alias("ts"), "user_id"
    )
    pairs = temporal.band_join(
        lb, rb, lower_seconds=0.0, upper_seconds=1800.0, on=["user_id"]
    )
    want = {
        (x.event_id, x.event_id_r) for x in pairs.collect()
    }
    assert got == want and len(want) > 0
