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


def test_registry_avro_roundtrip_oracle(spark, duck):
    """The queued-for-R12 registry query hash-matches its DuckDB oracle
    exactly the way the driver compares (all string/int outputs)."""
    from multiagent_document_etl_system_spark.plans.registry import QUERIES
    from tests.conftest import SF_DIR

    fn, oracle = QUERIES["s10_avro_roundtrip"]
    assert oracle is not None
    got = fn(spark, SF_DIR)
    cols = sorted(got.columns)
    spark_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    res = duck.sql(oracle)
    idx = [res.columns.index(c) for c in sorted(res.columns)]
    duck_rows = sorted(tuple(row[i] for i in idx) for row in res.fetchall())
    assert sorted(res.columns) == cols
    assert spark_rows == duck_rows


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
