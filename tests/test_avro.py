"""sources/avro_io — the pure-stdlib Avro OCF writer + the ``avro_py``
Python DataSource reader (r11: this Spark ships without the external
spark-avro connector jar, so the engine speaks the container format
itself). Three layers of proof: pure round-trip (hypothesis-fuzzed),
CROSS-IMPLEMENTATION equality against the official Java Avro library on
Spark's own classpath (both directions, both codecs), and the
Spark-level DataFrame round trip + partition-planning contract. The
value-lossless proof at table scale is the hash-oracled registry query
``s10_avro_roundtrip`` (min/max md5(text) through encode→decode)."""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from multiagent_document_etl_system_spark.sources.avro_io import (
    AvroSchemaError,
    parse_schema,
    read_container,
    write_container,
)

SCHEMA = json.dumps({"type": "record", "name": "row", "fields": [
    {"name": "doc_id", "type": ["long", "null"]},
    {"name": "text", "type": ["string", "null"]},
    {"name": "score", "type": ["double", "null"]},
    {"name": "ok", "type": ["boolean", "null"]},
    {"name": "raw", "type": ["bytes", "null"]},
]})


@settings(max_examples=40, deadline=None)
@given(
    rows=hst.lists(hst.fixed_dictionaries({
        "doc_id": hst.one_of(hst.none(),
                             hst.integers(-(2 ** 63), 2 ** 63 - 1)),
        "text": hst.one_of(hst.none(), hst.text(max_size=200)),
        "score": hst.one_of(hst.none(),
                            hst.floats(allow_nan=False)),
        "ok": hst.one_of(hst.none(), hst.booleans()),
        "raw": hst.one_of(hst.none(), hst.binary(max_size=64)),
    }), max_size=25),
    codec=hst.sampled_from(["null", "deflate"]),
    block=hst.integers(1, 7),
)
def test_container_roundtrip_property(tmp_path_factory, rows, codec, block):
    """Any mix of values/nulls across any block boundary round-trips
    exactly, both codecs (NaN excluded: NaN != NaN breaks equality, and
    the double bit pattern is covered by the cross-impl test)."""
    p = str(tmp_path_factory.mktemp("avro") / "t.avro")
    n = write_container(p, SCHEMA, rows, codec=codec, rows_per_block=block)
    assert n == len(rows)
    assert list(read_container(p)) == rows


def test_cross_implementation_with_java_avro(spark, tmp_path):
    """The files are SPEC-compliant, not merely self-consistent: the
    official Java Avro library (on Spark's classpath) reads our files,
    and our decoder reads Java-written files — both codecs. int64-range
    ids because py4j boxes small Python ints as Integer, which the Java
    GenericDatumWriter's [long, null] union rejects (bridge artifact,
    not a format one)."""
    jvm = spark.sparkContext._jvm
    schema = json.dumps({"type": "record", "name": "row", "fields": [
        {"name": "doc_id", "type": ["long", "null"]},
        {"name": "text", "type": ["string", "null"]},
        {"name": "ok", "type": ["boolean", "null"]}]})
    rows = [{"doc_id": (1 << 40) + 7, "text": "unicode ✓ κόσμε", "ok": True},
            {"doc_id": None, "text": None, "ok": None},
            {"doc_id": -(1 << 41) - 3, "text": "tail", "ok": False}]
    exp = [(r["doc_id"], r["text"], r["ok"]) for r in rows]
    for codec in ("null", "deflate"):
        ours = str(tmp_path / f"ours_{codec}.avro")
        write_container(ours, schema, rows, codec=codec, rows_per_block=2)
        rdr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(ours),
            jvm.org.apache.avro.generic.GenericDatumReader())
        got = []
        while rdr.hasNext():
            rec = rdr.next()
            txt = rec.get("text")
            got.append((rec.get("doc_id"),
                        None if txt is None else str(txt), rec.get("ok")))
        rdr.close()
        assert got == exp, codec

        sch = jvm.org.apache.avro.Schema.Parser().parse(schema)
        dfw = jvm.org.apache.avro.file.DataFileWriter(
            jvm.org.apache.avro.generic.GenericDatumWriter(sch))
        if codec == "deflate":
            dfw.setCodec(
                jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
        theirs = str(tmp_path / f"theirs_{codec}.avro")
        dfw.create(sch, jvm.java.io.File(theirs))
        for r in rows:
            rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
            rec.put("doc_id", r["doc_id"])
            rec.put("text", r["text"])
            rec.put("ok", r["ok"])
            dfw.append(rec)
        dfw.close()
        back = [(r["doc_id"], r["text"], r["ok"])
                for r in read_container(theirs)]
        assert back == exp, codec


def test_spark_dataframe_roundtrip(spark, tmp_path):
    """write_avro (mapInPandas, one file per partition) → avro_py
    DataSource read-back == the original rows; partition planning
    follows filesPerPartition; schema is inferred from the embedded
    writer schema."""
    from multiagent_document_etl_system_spark.sources.avro_io import (
        AvroPyDataSource,
        write_avro,
    )

    df = spark.createDataFrame(
        [(1, "alpha", None), (2, None, 2.5), (None, "γάμμα ✓", -0.0),
         (4, "d", 1e300)],
        "doc_id bigint, text string, score double").repartition(3)
    out = str(tmp_path / "avro_out")
    n = write_avro(df, out, codec="deflate")
    assert n == 4
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert 1 <= len(files) <= 3  # one file per NON-EMPTY partition

    spark.dataSource.register(AvroPyDataSource)
    back = (spark.read.format("avro_py")
            .option("filesPerPartition", "1").load(out))
    assert back.rdd.getNumPartitions() == len(files)
    assert dict(back.dtypes) == dict(df.dtypes)
    key = lambda t: tuple(map(repr, t))  # noqa: E731 — None-safe sort
    assert (sorted(map(tuple, back.collect()), key=key)
            == sorted(map(tuple, df.collect()), key=key))


def test_schema_subset_is_enforced_loudly(tmp_path):
    with pytest.raises(AvroSchemaError, match="unsupported type"):
        parse_schema(json.dumps({"type": "record", "name": "r", "fields": [
            {"name": "m", "type": {"type": "map", "values": "long"}}]}))
    with pytest.raises(AvroSchemaError, match="unions"):
        parse_schema(json.dumps({"type": "record", "name": "r", "fields": [
            {"name": "u", "type": ["long", "string", "null"]}]}))
    with pytest.raises(AvroSchemaError, match="record"):
        parse_schema(json.dumps("string"))


def test_corrupt_container_raises(tmp_path):
    p = str(tmp_path / "c.avro")
    write_container(p, SCHEMA, [{"doc_id": 1, "text": "x", "score": 1.0,
                                 "ok": True, "raw": b"b"}])
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF  # flip a sync byte
    open(p, "wb").write(bytes(blob))
    with pytest.raises(AvroSchemaError, match="sync marker"):
        list(read_container(p))
    with pytest.raises(AvroSchemaError, match="not an Avro"):
        open(p, "wb").write(b"PAR1junk")
        list(read_container(p))


@pytest.mark.parametrize("name", ["s10_avro_roundtrip",
                                  "s12_avro_typed_roundtrip",
                                  "s13_avro_evolution"])
def test_registry_avro_roundtrip_oracle(spark, duck, name):
    """The avro registry queries (batch round-trip, r12 typed
    round-trip, r12 schema-evolution read) hash-match their DuckDB
    oracles exactly the way the driver compares (all string/int
    outputs)."""
    from tests.conftest import driver_compare

    driver_compare(spark, duck, name)


def test_null_first_union_roundtrip(tmp_path):
    """["null", T] — the dominant convention in real Kafka/CDC Avro
    files — encodes null as branch 0 and the value as branch 1 (r12,
    ADVICE: branch indices come from the schema, never assumed)."""
    schema = json.dumps({"type": "record", "name": "row", "fields": [
        {"name": "doc_id", "type": ["null", "long"]},
        {"name": "text", "type": ["null", "string"]}]})
    rows = [{"doc_id": 7, "text": "alpha"},
            {"doc_id": None, "text": None},
            {"doc_id": -3, "text": ""}]
    p = str(tmp_path / "nf.avro")
    assert write_container(p, schema, rows, rows_per_block=2) == 3
    assert list(read_container(p)) == rows


def test_cross_implementation_null_first_union(spark, tmp_path):
    """The null-first case the r11 Java cross test missed: a
    spec-compliant reader must see our ["null", T] branch indices the
    way the official library does, both directions."""
    jvm = spark.sparkContext._jvm
    schema = json.dumps({"type": "record", "name": "row", "fields": [
        {"name": "doc_id", "type": ["null", "long"]},
        {"name": "text", "type": ["null", "string"]}]})
    rows = [{"doc_id": (1 << 40) + 1, "text": "value-then-null"},
            {"doc_id": None, "text": None}]
    exp = [(r["doc_id"], r["text"]) for r in rows]

    ours = str(tmp_path / "ours_nf.avro")
    write_container(ours, schema, rows, codec="deflate")
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(ours),
        jvm.org.apache.avro.generic.GenericDatumReader())
    got = []
    while rdr.hasNext():
        rec = rdr.next()
        txt = rec.get("text")
        got.append((rec.get("doc_id"),
                    None if txt is None else str(txt)))
    rdr.close()
    assert got == exp

    sch = jvm.org.apache.avro.Schema.Parser().parse(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    theirs = str(tmp_path / "theirs_nf.avro")
    dfw.create(sch, jvm.java.io.File(theirs))
    for r in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("doc_id", r["doc_id"])
        rec.put("text", r["text"])
        dfw.append(rec)
    dfw.close()
    assert [(r["doc_id"], r["text"])
            for r in read_container(theirs)] == exp


def test_cross_implementation_temporal_and_numeric_types(spark, tmp_path):
    """r12 type widening: int / float / date / timestamp-micros against
    the official Java library, both directions. Java's generic reader
    surfaces logical types as their raw base values (Integer days, Long
    micros) — expectations compare at that level; our decoder yields
    date/datetime objects."""
    from datetime import date, datetime, timedelta, timezone

    jvm = spark.sparkContext._jvm
    schema = json.dumps({"type": "record", "name": "row", "fields": [
        {"name": "d", "type": [{"type": "int", "logicalType": "date"},
                               "null"]},
        {"name": "ts", "type": [{"type": "long",
                                 "logicalType": "timestamp-micros"},
                                "null"]},
        {"name": "n", "type": ["int", "null"]},
        {"name": "f", "type": ["float", "null"]}]})
    d0 = date(2024, 2, 29)
    ts0 = datetime(2024, 3, 1, 12, 30, 45, 123456, tzinfo=timezone.utc)
    days0 = (d0 - date(1970, 1, 1)).days
    us0 = ((ts0 - datetime(1970, 1, 1, tzinfo=timezone.utc))
           // timedelta(microseconds=1))
    rows = [{"d": d0, "ts": ts0, "n": -42, "f": 2.5},
            {"d": None, "ts": None, "n": None, "f": None}]

    ours = str(tmp_path / "ours_t.avro")
    write_container(ours, schema, rows, codec="deflate")
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(ours),
        jvm.org.apache.avro.generic.GenericDatumReader())
    got = []
    while rdr.hasNext():
        rec = rdr.next()
        got.append((rec.get("d"), rec.get("ts"), rec.get("n"),
                    rec.get("f")))
    rdr.close()
    assert got == [(days0, us0, -42, 2.5), (None, None, None, None)]

    sch = jvm.org.apache.avro.Schema.Parser().parse(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    theirs = str(tmp_path / "theirs_t.avro")
    dfw.create(sch, jvm.java.io.File(theirs))
    # build the Java records via Avro's own JSON decoder — py4j unboxes
    # java.lang.Float/Integer back to Python floats/ints, so put()-style
    # construction can never type a float union branch correctly
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    for rec_json in (
        json.dumps({"d": {"int": days0}, "ts": {"long": us0},
                    "n": {"int": -42}, "f": {"float": 2.5}}),
        json.dumps({"d": None, "ts": None, "n": None, "f": None}),
    ):
        dec = jvm.org.apache.avro.io.DecoderFactory.get() \
            .jsonDecoder(sch, rec_json)
        dfw.append(reader.read(None, dec))
    dfw.close()
    back = [(r["d"], r["ts"], r["n"], r["f"])
            for r in read_container(theirs)]
    assert back == [(d0, ts0, -42, 2.5), (None, None, None, None)]


def test_spark_nan_and_big_int64_fidelity(spark, tmp_path):
    """r12 (ADVICE): the mapInArrow write path must keep (1) int64
    above 2^53 exact even in a batch that also carries a NULL in that
    column (the pandas bridge would promote to float64 and round), and
    (2) SQL NULL distinct from a genuine NaN double (the pandas bridge
    maps both to NaN)."""
    import math

    from multiagent_document_etl_system_spark.sources.avro_io import (
        AvroPyDataSource,
        write_avro,
    )

    big = (1 << 60) + 7  # not representable in float64
    df = spark.createDataFrame(
        [(big, float("nan")), (None, 1.5), (3, None)],
        "big bigint, x double").coalesce(1)
    out = str(tmp_path / "nan_out")
    assert write_avro(df, out, codec="null") == 3
    spark.dataSource.register(AvroPyDataSource)
    back = spark.read.format("avro_py").load(out).collect()
    by_big = {r["big"]: r["x"] for r in back}
    assert big in by_big, "int64 above 2^53 must survive exactly"
    assert math.isnan(by_big[big]), "NaN must round-trip as NaN"
    assert by_big[None] == 1.5 and by_big[3] is None, \
        "SQL NULL must stay NULL, not become NaN"


def test_streaming_decode_memory_is_block_bounded(tmp_path):
    """r12 verdict #2: read_container reads incrementally — decoding a
    container many times larger than one block must allocate one block
    at a time, never the whole file (the multi-GB Kafka-dump case)."""
    import tracemalloc

    schema = json.dumps({"type": "record", "name": "row", "fields": [
        {"name": "doc_id", "type": ["long", "null"]},
        {"name": "text", "type": ["string", "null"]}]})
    text = "x" * 10_000
    n_rows = 6_000  # ~60 MB of payload, ~1 MB blocks (100 rows each)
    p = str(tmp_path / "big.avro")
    write_container(p, schema,
                    ({"doc_id": i, "text": text} for i in range(n_rows)),
                    codec="null", rows_per_block=100)
    size = os.path.getsize(p)
    assert size > 40 * 1024 * 1024

    tracemalloc.start()
    count = 0
    for row in read_container(p):
        count += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert count == n_rows
    # whole-file buffering would peak at >= size; block-at-a-time peaks
    # at ~2 blocks (compressed + decompressed) plus row overhead
    assert peak < size / 4, f"peak {peak} vs file {size}"


def test_header_errors_are_loud(tmp_path):
    """r12 (ADVICE): missing avro.schema metadata and truncated headers
    raise AvroSchemaError with a message — never bare KeyError /
    IndexError."""
    from multiagent_document_etl_system_spark.sources.avro_io import (
        MAGIC,
        _enc_bytes,
        _enc_long,
        _enc_str,
        read_header,
    )

    # header whose metadata map has no avro.schema key
    blob = bytearray(MAGIC)
    blob += _enc_long(1) + _enc_str("avro.codec") + _enc_bytes(b"null")
    blob += _enc_long(0) + b"S" * 16
    with pytest.raises(AvroSchemaError, match="avro.schema"):
        read_header(bytes(blob))
    # truncated header (cut mid-metadata)
    p = str(tmp_path / "t.avro")
    write_container(p, SCHEMA, [{"doc_id": 1, "text": "x", "score": 1.0,
                                 "ok": True, "raw": b"b"}])
    whole = open(p, "rb").read()
    with pytest.raises(AvroSchemaError, match="truncated"):
        read_header(whole[:20])
    # truncated block payload
    open(p, "wb").write(whole[:-10])
    with pytest.raises(AvroSchemaError, match="truncated"):
        list(read_container(p))


def test_schema_inference_streams_large_metadata_headers(tmp_path):
    """r12 (ADVICE): an OCF whose metadata block exceeds the old 64 KiB
    sniff window (big schema / extra meta keys) must still infer — the
    header is now read incrementally, not from a fixed prefix."""
    from multiagent_document_etl_system_spark.sources.avro_io import (
        MAGIC,
        AvroPyDataSource,
        _enc_bytes,
        _enc_long,
        _enc_str,
        read_header,
    )

    base = str(tmp_path / "pad" / "base.avro")
    os.makedirs(os.path.dirname(base))
    schema = json.dumps({"type": "record", "name": "row", "fields": [
        {"name": "doc_id", "type": ["long", "null"]}]})
    write_container(base, schema, [{"doc_id": 5}], codec="null")
    whole = open(base, "rb").read()
    _, _, sync, data_off = read_header(whole)
    padded = bytearray(MAGIC)
    padded += _enc_long(3)
    padded += _enc_str("avro.schema") + _enc_bytes(schema.encode())
    padded += _enc_str("avro.codec") + _enc_bytes(b"null")
    padded += _enc_str("user.pad") + _enc_bytes(b"P" * (100 * 1024))
    padded += _enc_long(0) + sync + whole[data_off:]
    open(base, "wb").write(bytes(padded))

    ds = AvroPyDataSource(options={"path": str(tmp_path / "pad")})
    assert ds.schema() == "doc_id bigint"
    assert [r["doc_id"] for r in read_container(base)] == [5]


def test_schema_evolution_merged_read(spark, tmp_path):
    """r12 verdict #8: a drop dir with two writer-schema generations
    (gen2 adds nullable fields) reads as the UNION of fields under
    mergeSchemas — older files surface the added fields as NULL — and a
    same-name/different-type conflict refuses loudly."""
    from multiagent_document_etl_system_spark.sources.avro_io import (
        AvroPyDataSource,
        _check_file_schema,
        write_avro,
    )

    drop = str(tmp_path / "drop")
    gen1 = spark.createDataFrame(
        [(1, "one"), (2, "two")], "doc_id bigint, text string").coalesce(1)
    gen2 = spark.createDataFrame(
        [(3, "three", "en", 5)],
        "doc_id bigint, text string, lang string, n_chars bigint"
    ).coalesce(1)
    write_avro(gen1, drop, codec="deflate")
    write_avro(gen2, drop, codec="deflate")

    spark.dataSource.register(AvroPyDataSource)
    back = (spark.read.format("avro_py")
            .option("mergeSchemas", "true").load(drop))
    assert set(back.columns) == {"doc_id", "text", "lang", "n_chars"}
    rows = {r["doc_id"]: r for r in back.collect()}
    assert rows[1]["lang"] is None and rows[1]["n_chars"] is None
    assert rows[3]["lang"] == "en" and rows[3]["n_chars"] == 5

    # without mergeSchemas the first (sorted) file's schema wins and the
    # reader still decodes every file by its own embedded schema
    first_only = spark.read.format("avro_py").load(drop)
    assert first_only.count() == 3

    # conflict: a third generation re-types an existing field
    bad = spark.createDataFrame([(4, 9)], "doc_id bigint, text bigint") \
        .coalesce(1)
    write_avro(bad, drop, codec="null")
    with pytest.raises(AvroSchemaError, match="conflict"):
        AvroPyDataSource(
            options={"path": drop, "mergeschemas": "true"}).schema()
    with pytest.raises(AvroSchemaError, match="expects"):
        for f in sorted(os.listdir(drop)):
            _check_file_schema(os.path.join(drop, f), {"text": "string"})


def test_spark_temporal_roundtrip(spark, tmp_path):
    """timestamp/date/int/float columns round-trip exactly through
    write_avro → avro_py (timestamp at microsecond precision as
    timestamp-micros, date as epoch days)."""
    from datetime import date, datetime

    from multiagent_document_etl_system_spark.sources.avro_io import (
        AvroPyDataSource,
        write_avro,
    )

    df = spark.createDataFrame(
        [(datetime(2024, 3, 1, 12, 30, 45, 123456), date(2020, 2, 29),
          42, 2.5),
         (datetime(1969, 12, 31, 23, 59, 59, 999999), date(1969, 7, 20),
          -(1 << 31), -0.0),
         (None, None, None, None)],
        "ts timestamp, d date, n int, f float").coalesce(1)
    out = str(tmp_path / "temporal")
    assert write_avro(df, out, codec="deflate") == 3
    spark.dataSource.register(AvroPyDataSource)
    back = spark.read.format("avro_py").load(out)
    assert dict(back.dtypes) == dict(df.dtypes)
    key = lambda t: tuple(map(repr, t))  # noqa: E731
    assert (sorted(map(tuple, back.collect()), key=key)
            == sorted(map(tuple, df.collect()), key=key))


def test_avro_stream_reads_new_files_exactly_once(spark, tmp_path):
    """Streaming flavor (shared seen-set reader): each micro-batch
    decodes exactly the container files that appeared since the last
    committed offset, and a restart against the same checkpoint never
    re-emits a seen file."""
    from multiagent_document_etl_system_spark.sources.avro_io import (
        AvroPyDataSource,
        write_container,
    )

    spark.dataSource.register(AvroPyDataSource)
    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = json.dumps({"type": "record", "name": "row", "fields": [
        {"name": "doc_id", "type": ["long", "null"]},
        {"name": "text", "type": ["string", "null"]}]})
    write_container(str(drop / "one.avro"), schema,
                    [{"doc_id": 1, "text": "first"},
                     {"doc_id": 2, "text": "second"}], codec="deflate")

    def run_round():
        q = (spark.readStream.format("avro_py")
             .schema("doc_id bigint, text string").load(str(drop))
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        rows = spark.read.parquet(out).collect()
        return sorted((r["doc_id"], r["text"]) for r in rows)

    assert run_round() == [(1, "first"), (2, "second")]
    # a new container lands (name sorts BEFORE the seen one); the
    # restarted query must emit ONLY its rows
    write_container(str(drop / "aaa_two.avro"), schema,
                    [{"doc_id": 3, "text": "third"}], codec="null")
    assert run_round() == [(1, "first"), (2, "second"), (3, "third")]
