"""Streaming smoke tests (SURVEY.md §7.3 step 8): batch-equivalence of the
tumbling window; session/sliding/dedup streams run to completion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.streaming import streamx
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-materialize events as µs-timestamp parquet (the streaming file
    source can't read TIMESTAMP(NANOS) either)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    from multiagent_document_etl_system_spark.io import load_table

    load_table(spark, SF_DIR, "events").repartition(4).write \
        .mode("overwrite").parquet(out)
    return out


def test_tumbling_matches_batch(spark, events_dir):
    stream = streamx.read_event_stream(spark, events_dir,
                                       max_files_per_trigger=2)
    agg = streamx.tumbling_counts(stream, width="1 hour")
    streamx.run_to_memory(agg, "tumbling_out", output_mode="append")
    got = spark.sql(
        "SELECT window_start, event_type, n, total FROM tumbling_out")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    # append mode emits only watermark-closed windows — subset relation +
    # substantial coverage
    assert g <= b
    assert len(g) >= len(b) * 0.8


def test_session_window_runs(spark, events_dir):
    stream = streamx.read_event_stream(spark, events_dir)
    agg = streamx.session_counts(stream, gap="30 minutes")
    streamx.run_to_memory(agg, "session_out", output_mode="append")
    rows = spark.sql("SELECT * FROM session_out").collect()
    assert rows, "session windows should close under the watermark"
    assert all(r["n_events"] >= 1 for r in rows)
    assert all(r["session_end"] > r["session_start"] for r in rows)


def test_dedup_within_watermark(spark, events_dir):
    stream = streamx.read_event_stream(spark, events_dir)
    dd = streamx.dedup_within_watermark(stream)
    streamx.run_to_memory(dd.select("event_id"), "dedup_out")
    n = spark.sql("SELECT count(DISTINCT event_id) c FROM dedup_out") \
        .first()["c"]
    total = spark.sql("SELECT count(*) c FROM dedup_out").first()["c"]
    assert n == total, "no duplicate ids may survive"


def test_foreach_batch_sink(spark, events_dir, tmp_path):
    stream = streamx.read_event_stream(spark, events_dir)
    seen: list[int] = []

    def batch_fn(df, epoch_id):
        seen.append(df.count())

    q = streamx.write_foreach_batch(
        stream, str(tmp_path / "ckpt"), batch_fn)
    q.awaitTermination()
    assert sum(seen) == spark.read.parquet(events_dir).count()


def test_pipeline_runs_on_stream(spark, tmp_path):
    """The document pipeline is a narrow plan + stream-static broadcast
    join, so it runs UNCHANGED as a Structured Streaming query — the
    claim in streaming/streamx.py's module docstring, exercised."""
    from multiagent_document_etl_system_spark.io import load_table
    from multiagent_document_etl_system_spark.plans.pipeline import run_pipeline
    from multiagent_document_etl_system_spark.streaming.streamx import (
        run_to_memory,
    )

    src = str(tmp_path / "docs_landing")
    batch_docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch_docs.write.parquet(src)

    stream = (
        spark.readStream.schema(batch_docs.schema)
        .option("maxFilesPerTrigger", "2").parquet(src)
    )
    resp = run_pipeline(spark, stream)
    assert resp.isStreaming
    run_to_memory(resp, "pipeline_stream", output_mode="append")
    got = spark.sql("SELECT count(*) AS n FROM pipeline_stream").first()["n"]
    assert got == batch_docs.count()
    # streaming rows match the batch pipeline row-for-row
    batch = run_pipeline(spark, batch_docs)
    sdf = spark.table("pipeline_stream")
    assert sdf.exceptAll(batch).count() == 0
    assert batch.exceptAll(sdf).count() == 0


def test_stateful_running_totals(spark, events_dir):
    """applyInPandasWithState: cumulative per-user state across
    micro-batches — the final update per user must equal the batch
    groupBy totals."""
    from multiagent_document_etl_system_spark.streaming.streamx import (
        EVENTS_SCHEMA,
        run_to_memory,
        running_user_totals,
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")  # force several micro-batches
        .parquet(events_dir)
    )
    run_to_memory(running_user_totals(stream), "user_totals",
                  output_mode="update")

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    # the state total rides the scaled-integer grid — exact and
    # order-insensitive, so the comparison is equality, not approx
    expected = {
        r["user_id"]: (r["n"], r["total"])
        for r in batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.coalesce("value", F.lit(0.0)) * 1e6 + 0.5)
                  .cast("long")).alias("total")).collect()
    }
    # memory sink in update mode appends every state emission; the row with
    # the max n_events per user is the final state
    got = {
        r["user_id"]: (r["n_events"], r["total_q1e6"])
        for r in spark.sql("""
            SELECT user_id, n_events, total_q1e6 FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC) AS rn
              FROM user_totals) WHERE rn = 1""").collect()
    }
    assert got == expected


def test_interval_join_buffers_across_batches(spark, tmp_path):
    """Stream-stream interval join: a view and its matching purchase land
    in DIFFERENT micro-batches (maxFilesPerTrigger=1, two files), so the
    join must buffer one side in the state store until the other arrives.
    An out-of-horizon purchase must NOT match."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    d = str(tmp_path / "ev")
    f1 = [(1, base, 7, "view", 1.0, None),
          (3, base, 9, "view", 1.0, None)]
    f2 = [(2, base + dt.timedelta(minutes=10), 7, "purchase", 5.0, None),
          (4, base + dt.timedelta(hours=3), 9, "purchase", 5.0, None)]
    for rows in (f1, f2):
        spark.createDataFrame(rows, streamx.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(d)

    views = streamx.read_event_stream(spark, d, max_files_per_trigger=1) \
        .filter(F.col("event_type") == "view")
    purchases = streamx.read_event_stream(spark, d, max_files_per_trigger=1) \
        .filter(F.col("event_type") == "purchase")
    joined = streamx.interval_join(views, purchases, horizon="1 hour",
                                   watermark="4 hours")
    streamx.run_to_memory(joined, "ijoin_out", output_mode="append")
    got = {(r["l_id"], r["r_id"])
           for r in spark.sql("SELECT l_id, r_id FROM ijoin_out").collect()}
    assert got == {(1, 2)}  # user 9's purchase is 3h out — beyond horizon


def test_stream_static_enrich_matches_batch(spark, events_dir):
    """Stream-static broadcast enrichment across several micro-batches
    (maxFilesPerTrigger=1 over 4 files): the joined append-mode output
    must equal the batch join row-for-row — stream-static joins hold no
    state, so nothing can be buffered, dropped, or double-emitted."""
    dim = (
        spark.read.parquet(events_dir)
        .select("user_id").distinct()
        .withColumn("cohort", (F.col("user_id") % 2).cast("long"))
    )
    stream = streamx.read_event_stream(spark, events_dir,
                                       max_files_per_trigger=1)
    joined = streamx.enrich_with_dim(
        stream.select("event_id", F.col("user_id").alias("uid")),
        dim, "uid", "user_id",
    ).select("event_id", "cohort")
    streamx.run_to_memory(joined, "enrich_out", output_mode="append")
    got = {tuple(r) for r in spark.table("enrich_out").collect()}
    batch = {
        (r.event_id, r.user_id % 2)
        for r in spark.read.parquet(events_dir)
        .select("event_id", "user_id").collect()
    }
    assert got == batch


def test_stream_restart_recovers_from_checkpoint(spark, tmp_path):
    """Exactly-once across restart: a checkpointed file-source stream that
    is stopped and restarted after new files land must process each input
    file exactly once (no batch-1 reprocessing, no gaps) — the recovery
    contract a 100 TB continuous-ingest pipeline leans on."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    spark.range(0, 100).select("id", F.lit(1.0).alias("v")) \
        .write.mode("append").parquet(str(src))

    def run_until_drained():
        q = (
            spark.readStream.schema("id long, v double").parquet(str(src))
            .withColumn("doubled", F.col("v") * 2)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run_until_drained()
    assert spark.read.parquet(out).count() == 100

    spark.range(100, 150).select("id", F.lit(2.0).alias("v")) \
        .write.mode("append").parquet(str(src))
    run_until_drained()

    got = spark.read.parquet(out)
    assert got.count() == 150          # batch 1 NOT reprocessed
    assert got.select("id").distinct().count() == 150  # ...and no gaps
    assert got.filter(F.col("doubled") != F.col("v") * 2).count() == 0


def test_foreach_batch_upsert_parquet_is_exactly_once(spark, tmp_path):
    """Streaming MERGE sink: foreachBatch + the idempotent keyed upsert is
    the exactly-once recipe on plain parquet (checkpointed offsets give
    at-least-once batch delivery; the key-overwrite upsert makes a replay
    harmless). Replay the events in multiple micro-batches with DUPLICATE
    keys injected across batches — the sink must hold one row per key,
    last write wins."""
    from multiagent_document_etl_system_spark.io import upsert_parquet

    src = tmp_path / "src"
    src.mkdir()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    # file 1: first 40 events; file 2: events 20-60 (20-40 repeated with
    # a marker value); one file per micro-batch via maxFilesPerTrigger=1
    a = ev.filter(F.col("event_id") < 40)
    b = (ev.filter((F.col("event_id") >= 20) & (F.col("event_id") < 60))
         .withColumn("value", F.lit(-1.0)))
    a.coalesce(1).write.parquet(str(src / "f1"))
    b.coalesce(1).write.parquet(str(src / "f2"))

    sink = str(tmp_path / "sink")
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))

    def batch_fn(df, epoch_id):
        upsert_parquet(spark, df, sink, ["event_id"])

    q = streamx.write_foreach_batch(stream, str(tmp_path / "ck"), batch_fn)
    q.awaitTermination()

    out = spark.read.parquet(sink)
    assert out.count() == out.select("event_id").distinct().count() == 60
    # keys 20-39 exist in both batches; whichever batch ran second wins
    # wholesale (batches are whole files) — assert per-key single row and
    # that keys unique to each file carry their own values
    vals = {r.event_id: r.value for r in out.collect()}
    assert all(vals[i] != -1.0 for i in range(0, 20))
    assert all(vals[i] == -1.0 for i in range(40, 60))


def _protobuf_present() -> bool:
    """transformWithStateInPandas's Python<->JVM state protocol rides
    protobuf; absent here — the declared environment boundary."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_present(),
    reason="protobuf absent — transformWithStateInPandas's state "
           "protocol cannot initialize in this container (declared "
           "boundary; install protobuf to activate)")
def test_tws_user_profile_matches_batch(spark, events_dir):
    """transformWithStateInPandas (Spark 4 arbitrary-state API): the
    typed ValueState counters and the MapState distinct-type set must
    land on the batch groupBy profile exactly — same construction as
    test_stateful_running_totals, richer state."""
    from multiagent_document_etl_system_spark.streaming.streamx import (
        EVENTS_SCHEMA,
        run_to_memory,
        user_profile_tws,
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    # transformWithStateInPandas keeps each typed state variable in its
    # own column family — only the RocksDB provider (bundled in Spark's
    # own jars) supports that; the default HDFS-backed provider raises
    # UNSUPPORTED_FEATURE.STATE_STORE_MULTIPLE_COLUMN_FAMILIES
    _KEY = "spark.sql.streaming.stateStore.providerClass"
    _ROCKS = ("org.apache.spark.sql.execution.streaming.state."
              "RocksDBStateStoreProvider")
    prior = spark.conf.get(_KEY, None)
    spark.conf.set(_KEY, _ROCKS)
    try:
        run_to_memory(user_profile_tws(stream), "tws_profile",
                      output_mode="update")
    finally:
        if prior is None:
            spark.conf.unset(_KEY)
        else:
            spark.conf.set(_KEY, prior)
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    grid = F.floor(F.coalesce("value", F.lit(0.0)) * 1e6 + 0.5).cast("long")
    expected = {
        r["user_id"]: (r["n"], r["total"], r["vmax"], r["nt"])
        for r in batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum(grid).alias("total"),
            F.max(grid).alias("vmax"),
            F.countDistinct("event_type").alias("nt")).collect()
    }
    got = {
        r["user_id"]: (r["n_events"], r["total_q1e6"], r["max_q1e6"],
                       r["n_types"])
        for r in spark.sql("""
            SELECT * FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC) AS rn
              FROM tws_profile) WHERE rn = 1""").collect()
    }
    assert got == expected


@pytest.mark.skipif(
    not _protobuf_present(),
    reason="protobuf absent — st_user_profile_tws does not register "
           "(env-gated; see registry.ENV_GATED_REASONS)")
def test_st_user_profile_tws_registry_oracle(spark, duck):
    """r11 (verdict #4): the env-gated REGISTRY entry for the
    transformWithStateInPandas profile must hash-match its DuckDB
    oracle exactly the way the driver compares (all-integer outputs,
    order-insensitive). Also pins the gate bookkeeping: registered here
    (the conftest shim is active) ⇒ not in ENV_GATED_REASONS, queued
    for the R12 window."""
    from multiagent_document_etl_system_spark.plans.registry import (
        ENV_GATED_REASONS,
        _QUEUED_FOR_R12,
        QUERIES,
    )

    from tests.conftest import driver_compare

    assert "st_user_profile_tws" in QUERIES
    assert "st_user_profile_tws" not in ENV_GATED_REASONS
    assert "st_user_profile_tws" in _QUEUED_FOR_R12
    driver_compare(spark, duck, "st_user_profile_tws")


def test_kmv_stream_sketch_replay_is_idempotent(spark, events_dir):
    """Streaming KMV (st_kmv_stream's operator): (1) the multi-batch
    streamed sketch equals the batch sketch EXACTLY (min-k merge is
    order/boundary-insensitive); (2) replaying the whole stream into the
    SAME state with a FRESH checkpoint (the lost-checkpoint recovery
    scenario) leaves the state unchanged — exactly-once via idempotent
    merge, not via offset bookkeeping."""
    import tempfile

    from multiagent_document_etl_system_spark.operators.dedup import hash64

    k = 256
    state = tempfile.mkdtemp(prefix="kmv_state_")

    def run_once():
        stream = streamx.read_event_stream(spark, events_dir,
                                           max_files_per_trigger=1)
        ckpt = tempfile.mkdtemp(prefix="kmv_ckpt_")
        streamx.kmv_stream_sketch(stream, state, ckpt, k=k,
                                  key_col="event_id")
        return sorted(r["h"] for r in spark.read.parquet(state).collect())

    first = run_once()
    batch = sorted(r["h"] for r in (
        spark.read.parquet(events_dir)
        .select(hash64(F.col("event_id").cast("string")).alias("h"))
        .distinct().orderBy("h").limit(k).collect()))
    assert first == batch          # stream == batch, element for element
    second = run_once()            # full replay, fresh checkpoint
    assert second == first         # idempotent merge: state unchanged
