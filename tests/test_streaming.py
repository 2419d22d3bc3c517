"""Structured Streaming: batch/stream equivalence + watermark semantics."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.operators import events as BE
from cloud_native_mapreduce_spark.sources.tables import load_table
from cloud_native_mapreduce_spark.streaming import core as S


def _as_sets(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_stream_tumbling_equals_batch(spark, sf_dir):
    batch = BE.tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = S.stream_tumbling(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _as_sets(stream, cols) == _as_sets(batch, cols)


def test_stream_sessionize_equals_batch(spark, sf_dir):
    batch = BE.sessionize(load_table(spark, sf_dir, "events"))
    stream = S.stream_sessionize(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events", "sum_value"]
    assert _as_sets(stream, cols) == _as_sets(batch, cols)


def test_watermark_drops_late_data(spark, tmp_path):
    """Three-batch replay (maxFilesPerTrigger=1): an event arriving after
    the watermark passed its window must be excluded in append mode."""
    d = str(tmp_path / "stream_in")
    os.makedirs(d)

    def write_batch(name, rows, mtime):
        pdf = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double")
        path = os.path.join(str(tmp_path), name)
        pdf.coalesce(1).write.mode("overwrite").parquet(path)
        part = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
        dst = os.path.join(d, name + ".parquet")
        os.rename(os.path.join(path, part), dst)
        os.utime(dst, (mtime, mtime))

    import datetime as dt
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    now = time.time()
    # batch 1: on-time events in windows 08:00 and 10:00 → watermark 09:50
    write_batch("b1", [(1, t(8, 10), 1.0), (1, t(10, 0), 1.0)], now - 500)
    # batch 2: advance the watermark to 11:50 (the late-data filter applies
    # the watermark with a one-batch lag, so the drop below needs the
    # advance to happen at least one batch earlier)
    write_batch("b2", [(2, t(12, 0), 1.0)], now - 400)
    # batch 3: late event in window 08:00 (end 09:00 << watermark) → dropped
    write_batch("b3", [(3, t(8, 20), 100.0)], now - 300)
    # batch 4: push the watermark far past every window so append finalizes
    write_batch("b4", [(4, t(20, 0), 1.0)], now - 200)

    sdf = (spark.readStream
           .schema("user_id long, ts timestamp, value double")
           .option("maxFilesPerTrigger", 1)
           .parquet(d)
           .withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count("*").alias("n"), F.sum("value").alias("sv")))
    out = S.run_to_memory(
        sdf.select(F.col("w.start").alias("ws"), "n", "sv"),
        output_mode="append")
    got = {r["ws"].hour: (r["n"], r["sv"]) for r in out.collect()}
    # the 08:00 window was finalized with ONLY the on-time event;
    # the late 100.0-value event was dropped by the watermark
    assert got[8] == (1, 1.0)
    assert got[10] == (1, 1.0)
    assert got[12] == (1, 1.0)
    # the 20:00 window is never finalized (watermark stops at 19:50)
    assert 20 not in got


def test_rows_survive_ns_timestamp_conversion(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_batch = ev.count()
    stream = S.run_to_memory(
        S.stream_events(spark, sf_dir).groupBy().count(),
        output_mode="complete")
    assert stream.collect()[0][0] == n_batch


def test_foreach_batch_sink_is_idempotent_and_resumes(spark, sf_dir,
                                                      tmp_path):
    """foreachBatch with partition-overwrite-by-batch_id: (1) the drained
    sink holds exactly the source rows; (2) replaying a batch id
    overwrites instead of duplicating; (3) a restart on the same
    checkpoint finds no new data and writes nothing."""
    from cloud_native_mapreduce_spark.streaming import core, sinks

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = core.stream_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type")
    sinks.run_foreach_batch(src, out, ckpt)

    sunk = spark.read.option("basePath", out).parquet(out)
    n_src = core.stream_events(spark, sf_dir).sparkSession.read.parquet(
        core._events_stream_dir(sf_dir)).count()
    assert sunk.count() == n_src
    assert sunk.select("event_id").distinct().count() == n_src

    # replay batch 0 by hand (what the engine does after a crash):
    # same batch_id → same partition → overwrite, not append.
    # Materialize first — a real replay re-reads the SOURCE, not the sink.
    writer = sinks.idempotent_batch_writer(out)
    batch0_rows = spark.read.parquet(out + "/batch_id=0").collect()
    batch0 = spark.createDataFrame(
        batch0_rows, "event_id long, user_id long, event_type string")
    writer(batch0, 0)
    assert spark.read.option("basePath", out).parquet(out).count() == n_src

    # restart on the same checkpoint: offsets are durable, nothing reruns
    sinks.run_foreach_batch(
        core.stream_events(spark, sf_dir).select(
            "event_id", "user_id", "event_type"), out, ckpt)
    assert spark.read.option("basePath", out).parquet(out).count() == n_src


def test_tws_user_totals_matches_batch_or_env_gated(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 state API): totals equal the
    batch aggregate. Skipped where the protobuf dependency its state
    server needs is absent — the applyInPandasWithState twin covers the
    semantics there (test_streaming state tests)."""
    import pytest
    from cloud_native_mapreduce_spark.streaming import core
    if not core.tws_available():
        with pytest.raises(NotImplementedError):
            core.stream_tws_user_totals(spark, sf_dir)
        pytest.skip("protobuf unavailable on workers")
    got = {r["user_id"]: (r["n_events"], r["sum_value"])
           for r in core.stream_tws_user_totals(spark, sf_dir).collect()}
    import pyspark.sql.functions as F
    from cloud_native_mapreduce_spark.sources.tables import load_table
    want = {r["user_id"]: (r["n"], r["s"])
            for r in load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"),
                 (F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  / 100.0).alias("s")).collect()}
    assert got == want


def test_dedup_within_watermark_bounds(spark, sf_dir):
    """dropDuplicatesWithinWatermark survivors per event_type must sit
    between the distinct-key count (>= one survivor per key; more only
    when a key recurs beyond the watermark) and the raw event count."""
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.sources.tables import load_table
    from cloud_native_mapreduce_spark.streaming import core as S

    got = {r["event_type"]: r["n_unique"]
           for r in S.stream_dedup_within_watermark(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    lo = {r["event_type"]: r["n"]
          for r in (ev.groupBy("event_type")
                    .agg(F.countDistinct("user_id").alias("n")).collect())}
    hi = {r["event_type"]: r["n"]
          for r in (ev.groupBy("event_type")
                    .agg(F.count("*").alias("n")).collect())}
    assert set(got) == set(lo)
    for et in got:
        assert lo[et] <= got[et] <= hi[et], (et, lo[et], got[et], hi[et])


def test_stateful_totals_identical_under_rocksdb_state_store(spark, sf_dir):
    """The default HDFSBackedStateStoreProvider keeps every key's state
    on the JVM heap — the first thing to fall over when streaming state
    scales. RocksDBStateStoreProvider spills state to executor-local
    disk with incremental checkpointing; results must be identical
    under either provider (it's a storage swap, not a semantics
    change). This pins the 100 TB streaming-state configuration as
    actually working, not just documented."""
    from cloud_native_mapreduce_spark.streaming import core as S

    key = "spark.sql.streaming.stateStore.providerClass"
    default = {tuple(r) for r in
               S.stream_stateful_user_totals(spark, sf_dir).collect()}
    old = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    try:
        rocks = {tuple(r) for r in
                 S.stream_stateful_user_totals(spark, sf_dir).collect()}
    finally:
        if old:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)
    assert rocks == default
    assert len(rocks) > 0


def test_stream_starts_on_empty_landing_dir(spark, tmp_path):
    """Live-deployment posture: the events stream must be startable
    BEFORE the first file lands (the schema probe can't see any footer
    yet, so the documented static schema takes over)."""
    sdf = S.stream_events(spark, str(tmp_path))
    assert sdf.isStreaming
    assert [f.name for f in sdf.schema.fields] == \
        [f.name for f in S.EVENTS_FALLBACK_SCHEMA.fields]
    assert sdf.schema["ts"].dataType.simpleString() == "timestamp"


def test_events_loader_rejects_unknown_ts_encoding(spark, tmp_path):
    """A generator surprise (ts neither nanos-long, NTZ, nor TIMESTAMP)
    must fail fast in the loader, not misbehave in downstream windows."""
    bad_dir = tmp_path / "badsf"
    bad_dir.mkdir()
    spark.createDataFrame(
        [(1, "2024-01-01", 1, "click", 1.0, "{}")],
        "event_id bigint, ts string, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(str(bad_dir / "events.parquet"))
    with pytest.raises(TypeError, match="events.ts normalized"):
        load_table(spark, str(bad_dir), "events")


def test_stream_ewma_matches_batch_smoother(spark, sf_dir):
    """The streaming EWMA's final per-user row must equal the batch
    applyInPandas smoother's LAST smoothed value bit-for-bit (single-
    batch AvailableNow replay -> batch boundaries trivially respect
    event-time order)."""
    import pyspark.sql.functions as F
    from cloud_native_mapreduce_spark.operators.events import ewma_by_user
    from cloud_native_mapreduce_spark.sources.tables import load_table
    from cloud_native_mapreduce_spark.streaming.core import (
        stream_ewma_by_user)

    got_tbl = stream_ewma_by_user(spark, sf_dir)
    # update-mode memory sink: keep each user's LAST emitted row
    got = {r.user_id: (r.n_events, r.ewma)
           for r in got_tbl.collect()}

    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    smoothed = ewma_by_user(ev)
    order = ev.select("user_id", "event_id", "ts")
    last = (smoothed.join(order, ["user_id", "event_id"])
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("user_id")
                .orderBy(F.desc("ts"), F.desc("event_id"))))
            .where(F.col("rn") == 1))
    n_per_user = {r.user_id: r.n for r in
                  ev.groupBy("user_id").agg(F.count("*").alias("n"))
                  .collect()}
    want = {r.user_id: (n_per_user[r.user_id], r.ewma)
            for r in last.collect()}
    assert got == want


def test_stream_session_dedup_equals_batch(spark, sf_dir):
    """The streaming session-window distinct-type counts must equal a
    batch reconstruction of the same gap rule — collect_set size is
    arrival-order independent, so exact equality holds."""
    from cloud_native_mapreduce_spark.streaming.core import (
        stream_session_dedup)

    got = {(r.user_id, r.session_start):
           (r.n_distinct_types, r.n_events)
           for r in stream_session_dedup(spark, sf_dir).collect()}

    ev = load_table(spark, sf_dir, "events")
    batch = (ev.groupBy("user_id",
                        F.session_window("ts", "30 minutes").alias("w"))
             .agg(F.count_distinct("event_type")
                  .cast("int").alias("d"),
                  F.count(F.lit(1)).alias("n")))
    want = {(r.user_id, r["w"].start): (r.d, r.n)
            for r in batch.collect()}
    assert got == want


def test_stream_interval_join_outer_invariants(spark, sf_dir):
    """Containment pins for the outer interval join (rows-only for
    the driver): its matched rows equal the INNER join's rows
    exactly; every NULL-purchase row is in the batch unmatched set
    (interval_join_unmatched); and no NULL row sits within 3h of the
    corpus tail (those clicks are still live in join state when the
    replay ends, so they must NOT have been emitted)."""
    import datetime

    from cloud_native_mapreduce_spark.operators.events import (
        interval_join_unmatched)
    from cloud_native_mapreduce_spark.streaming.core import (
        stream_interval_join_outer, stream_stream_interval_join)

    rows = stream_interval_join_outer(spark, sf_dir).collect()
    matched = {(r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
               for r in rows if r.purchase_ts is not None}
    nulls = {(r.user_id, r.click_ts)
             for r in rows if r.purchase_ts is None}

    inner = {(r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
             for r in stream_stream_interval_join(spark, sf_dir)
             .collect()}
    assert matched == inner

    ev = load_table(spark, sf_dir, "events")
    unmatched = {(r.user_id, r.click_ts)
                 for r in interval_join_unmatched(ev).collect()}
    assert nulls <= unmatched

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=3)
    assert all(ts <= horizon for _, ts in nulls), (
        "an outer row emitted for a click the watermark cannot have "
        "expired")
