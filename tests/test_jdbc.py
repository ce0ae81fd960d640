"""K1 — JDBC sink round-trip (SURVEY.md §2.2).

The reference's primary persistence path is a Postgres insert
(/root/reference/src/supabase_client.py:45-76). No Postgres server exists in
this harness, but Spark ships the embedded Derby JDBC driver, which runs a
real JDBC database in-process — so the sink's write path (type mapping,
batching, append/overwrite modes) is exercised against an actual JDBC
endpoint, not mocked. Swapping the url/driver options retargets Postgres
unchanged.
"""

from __future__ import annotations

import os

from multiagent_document_etl_system_spark.io import write_jdbc

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{os.path.join(str(tmp_path), name)};create=true"


def _read(spark, url: str, table: str):
    return (
        spark.read.format("jdbc").option("url", url)
        .option("dbtable", table).option("driver", DERBY).load()
    )


def test_jdbc_append_roundtrip(spark, tmp_path):
    url = _url(tmp_path, "docsdb")
    df = spark.createDataFrame(
        [(1, "invoice", "raw a", '{"amount":"9.99"}'),
         (2, "receipt", "raw b", '{"amount":"1.50"}')],
        "id long, doc_type string, raw_text string, structured_data string",
    )
    write_jdbc(df, url, "documents", mode="append", driver=DERBY)
    back = _read(spark, url, "documents")
    assert sorted(tuple(r) for r in back.collect()) == \
        sorted(tuple(r) for r in df.collect())

    # K1 is an append sink: a second batch accumulates
    more = spark.createDataFrame(
        [(3, "form", "raw c", "{}")],
        "id long, doc_type string, raw_text string, structured_data string")
    write_jdbc(more, url, "documents", mode="append", driver=DERBY)
    assert _read(spark, url, "documents").count() == 3


def test_streaming_foreach_batch_to_jdbc(spark, tmp_path):
    """K1's streaming form end-to-end: file-source stream → foreachBatch →
    JDBC append into embedded Derby, with a checkpoint directory — the
    exactly-once wiring (checkpointed offsets + idempotent-able batch fn)
    against a real JDBC endpoint."""
    from pyspark.sql import functions as F

    from multiagent_document_etl_system_spark.io import load_table, write_jdbc
    from multiagent_document_etl_system_spark.streaming import streamx

    stage = str(tmp_path / "events_stage")
    src = load_table(spark, "/root/testdata/sf0.001", "events")
    src.limit(200).coalesce(1).write.parquet(stage)

    url = _url(tmp_path, "streamdb")
    stream = streamx.read_event_stream(spark, stage, max_files_per_trigger=10)
    out = stream.select("event_id", "user_id", "event_type",
                        F.round("value", 2).alias("value"))

    def sink(batch_df, batch_id):
        write_jdbc(batch_df, url, "events_sink", mode="append", driver=DERBY)

    q = streamx.write_foreach_batch(
        out, checkpoint=str(tmp_path / "ckpt"), batch_fn=sink)
    q.awaitTermination()

    landed = _read(spark, url, "events_sink")
    assert landed.count() == 200
    src_sum = src.limit(200).agg(
        F.sum("event_id").alias("s")).collect()[0]["s"]
    assert landed.agg(F.sum("event_id").alias("s")).collect()[0]["s"] == src_sum


def test_jdbc_overwrite_mode(spark, tmp_path):
    url = _url(tmp_path, "owdb")
    one = spark.createDataFrame([(1, "a")], "id long, v string")
    two = spark.createDataFrame([(2, "b"), (3, "c")], "id long, v string")
    write_jdbc(one, url, "t", mode="overwrite", driver=DERBY)
    write_jdbc(two, url, "t", mode="overwrite", driver=DERBY)
    rows = sorted(tuple(r) for r in _read(spark, url, "t").collect())
    assert rows == [(2, "b"), (3, "c")]


def test_partitioned_jdbc_read_roundtrip(spark, tmp_path):
    """read_jdbc_partitioned must split the scan into range strides (one
    JDBC partition per stride — N input partitions, each its own
    connection) and return exactly the written rows; bounds default to
    the min/max probe. Empty table ⇒ empty frame, no crash."""
    from multiagent_document_etl_system_spark.io import (
        read_jdbc_partitioned,
        write_jdbc,
    )

    url = _url(tmp_path, "part_rt")
    df = spark.range(0, 1000).selectExpr(
        "id", "CAST(id % 7 AS LONG) AS grp", "repeat('x', 10) AS pad")
    write_jdbc(df, url, "wide", mode="append", driver=DERBY)

    back = read_jdbc_partitioned(spark, url, "wide", "id",
                                 num_partitions=8, driver=DERBY)
    assert back.rdd.getNumPartitions() == 8
    assert back.count() == 1000
    assert back.agg({"id": "sum"}).first()[0] == 499500
    # strides cover the space with no dup/loss at the boundaries
    assert back.select("id").distinct().count() == 1000

    # explicit bounds narrow server-side: only the window's strides read
    lo = read_jdbc_partitioned(spark, url, "wide", "id", num_partitions=4,
                               lower_bound=0, upper_bound=99, driver=DERBY)
    # Spark's range partitioning CLAMPS strides, not rows: rows outside
    # the bounds still land in the edge partitions by contract, so the
    # narrowing is about stride math, not filtering — assert the contract
    assert lo.count() == 1000 and lo.rdd.getNumPartitions() == 4

    write_jdbc(df.limit(0), url, "empty_t", mode="append", driver=DERBY)
    empty = read_jdbc_partitioned(spark, url, "empty_t", "id",
                                  num_partitions=8, driver=DERBY)
    assert empty.count() == 0


def test_scratch_run_dir_purges_only_dead_owners(tmp_path):
    """r10 ADVICE: the old purge keyed on the run dir's mtime, but a
    directory's mtime only moves when DIRECT children change — Derby's
    ongoing writes land deeper, so a live >1h-old concurrent session
    could have its database deleted. The pidfile-keyed purge must keep
    a live-owner dir no matter how old it looks, purge a dead-owner dir
    immediately, and apply the 1h recursive-quiet rule only to dirs
    with no pidfile at all."""
    import os
    import time

    from multiagent_document_etl_system_spark.io import scratch_run_dir

    root = str(tmp_path / "scratch")
    os.makedirs(root)
    old = time.time() - 7200

    # (a) live owner (this very process), dir + contents backdated 2h —
    # the exact scenario the mtime purge got wrong
    live = os.path.join(root, "run_live")
    os.makedirs(os.path.join(live, "db", "seg0"))
    with open(os.path.join(live, "_OWNER_PID"), "w") as fh:
        fh.write(str(os.getpid()))
    deep = os.path.join(live, "db", "seg0", "c180.dat")
    open(deep, "w").close()
    for p in (live, os.path.join(live, "db"), deep,
              os.path.join(live, "_OWNER_PID")):
        os.utime(p, (old, old))

    # (b) dead owner — purged immediately, age-independent
    dead = os.path.join(root, "run_dead")
    os.makedirs(dead)
    with open(os.path.join(dead, "_OWNER_PID"), "w") as fh:
        fh.write("999999999")  # beyond pid_max: never a live process

    # (c) no pidfile, recursively quiet for 2h — purged by the age rule
    legacy_old = os.path.join(root, "run_legacy_old")
    os.makedirs(legacy_old)
    open(os.path.join(legacy_old, "db.lck"), "w").close()
    os.utime(legacy_old, (old, old))
    os.utime(os.path.join(legacy_old, "db.lck"), (old, old))

    # (d) no pidfile, dir mtime old but a DEEP file is fresh — kept
    # (recursive newest-mtime, not the dir's own)
    legacy_fresh = os.path.join(root, "run_legacy_fresh")
    os.makedirs(os.path.join(legacy_fresh, "db"))
    open(os.path.join(legacy_fresh, "db", "log.dat"), "w").close()
    os.utime(legacy_fresh, (old, old))
    os.utime(os.path.join(legacy_fresh, "db"), (old, old))

    # (e) EMPTY pidfile with fresh contents — a concurrent creator that
    # opened but hasn't flushed the pid yet; must be treated as
    # unknown-owner (age rule), NOT dead (purge) — r11 review race
    mid_create = os.path.join(root, "run_mid_create")
    os.makedirs(mid_create)
    open(os.path.join(mid_create, "_OWNER_PID"), "w").close()  # empty

    fresh = scratch_run_dir(root)
    assert os.path.isdir(live), "live-owner dir must survive any age"
    assert not os.path.exists(dead), "dead-owner dir purged immediately"
    assert not os.path.exists(legacy_old), "quiet pidfile-less dir purged"
    assert os.path.isdir(legacy_fresh), "deep-fresh pidfile-less dir kept"
    assert os.path.isdir(mid_create), "empty-pidfile fresh dir kept"
    # the new dir is pidfile-owned, so a CONCURRENT session won't purge it
    with open(os.path.join(fresh, "_OWNER_PID")) as fh:
        assert int(fh.read()) == os.getpid()
