"""Avro Object Container File support — pure-stdlib writer + a Spark 4
Python DataSource reader (``spark.read.format("avro_py")``).

Why it exists: Avro is the standard row-oriented landing format for
Kafka dumps and CDC feeds, but this environment's Spark ships WITHOUT
the external ``spark-avro`` connector jar (it is "built-in but external"
since Spark 2.4), and no package installation exists to fetch it. The
gap is closed the same way the landing ingest was (sources/landing_ds.py):
the container format itself is simple enough to speak from Python —
the reader decodes inside DataSource reader TASKS (one file group per
task, bytes never enter a DataFrame column), the writer encodes inside
``mapInArrow`` (one .avro file per input partition, no driver collect;
Arrow→plain-Python keeps int64 validity exact and SQL NULL distinct
from NaN, which the pandas bridge loses).

Format scope (the OCF spec, https://avro.apache.org/docs/1.11.1/specification/):

- header: magic ``Obj\\x01`` + file-metadata map (``avro.schema`` JSON,
  ``avro.codec``) + 16-byte sync marker;
- blocks: row-count (zigzag varint long), byte-size, payload, sync;
- codecs: ``null`` and ``deflate`` (raw zlib stream, RFC 1951);
- types: records of ``long``, ``int``, ``string``, ``double``,
  ``float``, ``boolean``, ``bytes``, the logical types ``date`` (int),
  ``timestamp-millis``/``timestamp-micros`` (long) — the row-shaped
  subset a landing/CDC feed carries (timestamps ride in virtually every
  CDC record) — and 2-branch null unions in EITHER order (``[T, null]``
  and the null-first ``["null", T]`` convention real Kafka feeds use;
  the spec encodes the branch INDEX, so union order is honored, not
  assumed). Maps/arrays/enums are out of scope and rejected loudly at
  schema parse, never silently mis-decoded.

Schema evolution (the multi-day CDC drop shape): files in one directory
may carry different writer schemas. Each file is decoded by its OWN
embedded schema; with ``.option("mergeSchemas", "true")`` the read
schema is the union of all files' fields (first-seen order over the
sorted file list, ~100-byte header read per file at planning), missing
fields surface as NULL, and a same-name/different-type conflict refuses
loudly — both at merge and again per file at read time.

Scale posture: one InputPartition per ``filesPerPartition`` group, so a
10k-file feed fans out like any file source; the block decoder reads
incrementally (header, then exactly one block at a time), so task
memory is ONE compressed block + its decompressed payload regardless of
container size (pinned by a traced-allocation test) — multi-GB Kafka
dump containers stream; the writer emits one file per upstream
partition so write parallelism IS the DataFrame's partitioning. Local /
mounted paths only (the landing_ds contract); reject URI schemes fast.

Correctness: the ``s10_avro_roundtrip`` registry query writes the
documents table to Avro (deflate), reads it back through
``format("avro_py")``, and hash-matches per-(lang, source) aggregates —
including min/max md5(text) — against the parquet-derived oracle, so
the encode→decode loop is proven value-lossless byte-for-byte;
``s12_avro_typed_roundtrip`` extends the same gate over timestamp /
date / int / float columns, and ``s13_avro_evolution`` over a two-
generation merged read. Property and corrupt-file tests live in
tests/test_avro.py, alongside cross-implementation equality with the
official Java Avro library on Spark's classpath (both directions, both
codecs, both union orders).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from datetime import date, datetime, timedelta, timezone

MAGIC = b"Obj\x01"

_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_DT = datetime(1970, 1, 1, tzinfo=timezone.utc)
_US = timedelta(microseconds=1)

# ---------------------------------------------------------------- encoding


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _enc_long(n: int) -> bytes:
    return _zigzag_encode(int(n))


def _enc_bytes(b: bytes) -> bytes:
    return _enc_long(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


class AvroSchemaError(ValueError):
    pass


_PRIMITIVES = {"long", "int", "string", "double", "float", "boolean",
               "bytes", "null"}

#: (base primitive, logicalType) → canonical internal type name
_LOGICAL = {("int", "date"): "date",
            ("long", "timestamp-millis"): "timestamp-millis",
            ("long", "timestamp-micros"): "timestamp-micros"}


def _norm_type(t, field_name: str) -> str:
    """Canonicalize one non-union field type to an internal name, or
    refuse loudly."""
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt is not None:
            out = _LOGICAL.get((t.get("type"), lt))
            if out is None:
                raise AvroSchemaError(
                    f"field {field_name}: unsupported type "
                    f"(logicalType {lt!r} over {t.get('type')!r}; "
                    f"supported: date over int, timestamp-millis/"
                    f"timestamp-micros over long)")
            return out
        t = t.get("type")  # the {"type": "long"} wrapper form
    if isinstance(t, str) and t in _PRIMITIVES - {"null"}:
        return t
    raise AvroSchemaError(
        f"field {field_name}: unsupported type {t!r} (supported: "
        f"long/int/string/double/float/boolean/bytes, date/"
        f"timestamp-millis/timestamp-micros logical types, and "
        f"2-branch null unions)")


def parse_schema(schema_json: str) -> list[tuple[str, str, int | None]]:
    """Validate + flatten a record schema into (name, type, null_branch)
    triples, where null_branch is the INDEX of "null" in the union (0
    for the null-first convention, 1 for value-first) or None for a
    non-nullable field — the writer and reader both encode/decode the
    branch index from the schema, never assume an order. Anything
    outside the supported row-shaped subset raises — loud refusal beats
    silent mis-decoding."""
    try:
        s = json.loads(schema_json)
    except json.JSONDecodeError as e:
        raise AvroSchemaError(f"unparseable schema JSON: {e}") from e
    if not (isinstance(s, dict) and s.get("type") == "record"):
        raise AvroSchemaError("only record schemas are supported")
    fields = []
    for f in s.get("fields", []):
        name, typ = f["name"], f["type"]
        null_branch = None
        if isinstance(typ, list):  # union
            if len(typ) != 2 or "null" not in typ:
                raise AvroSchemaError(
                    f"field {name}: only 2-branch [null, T] / [T, null] "
                    f"unions are supported")
            null_branch = typ.index("null")
            typ = typ[1 - null_branch]
        fields.append((name, _norm_type(typ, name), null_branch))
    if not fields:
        raise AvroSchemaError("record has no fields")
    return fields


def _dt_to_micros(dt: datetime) -> int:
    """Microseconds since epoch; a NAIVE datetime is treated as UTC
    (documented — the writer's Spark path always passes tz-aware)."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return (dt - _EPOCH_DT) // _US


def _enc_value(typ: str, v) -> bytes:
    if typ == "long":
        return _enc_long(v)
    if typ == "int":
        v = int(v)
        if not -(1 << 31) <= v < (1 << 31):
            raise AvroSchemaError(f"int value out of 32-bit range: {v}")
        return _enc_long(v)
    if typ == "string":
        return _enc_str(v)
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ == "bytes":
        return _enc_bytes(bytes(v))
    if typ == "date":
        if isinstance(v, datetime):
            raise AvroSchemaError(
                "date field got a datetime — truncation would be silent")
        days = (v - _EPOCH_DATE).days if isinstance(v, date) else int(v)
        return _enc_long(days)
    if typ == "timestamp-millis":
        # datetime → floor-divide micros (pre-epoch floors toward -inf)
        ms = _dt_to_micros(v) // 1000 if isinstance(v, datetime) else int(v)
        return _enc_long(ms)
    if typ == "timestamp-micros":
        us = _dt_to_micros(v) if isinstance(v, datetime) else int(v)
        return _enc_long(us)
    raise AvroSchemaError(typ)


def write_container(path: str, schema_json: str, rows,
                    codec: str = "deflate",
                    rows_per_block: int = 4096,
                    sync: bytes | None = None) -> int:
    """Write one .avro Object Container File. Returns rows written.
    ``rows`` is an iterable of dicts (missing keys = null). Union branch
    indices come from the schema, so null-first unions encode
    spec-compliantly."""
    fields = parse_schema(schema_json)
    if codec not in ("null", "deflate"):
        raise AvroSchemaError(f"unsupported codec {codec!r}")
    sync = sync or os.urandom(16)
    header = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": codec.encode()}
    header += _enc_long(len(meta))
    for k, v in meta.items():
        header += _enc_str(k) + _enc_bytes(v)
    header += _enc_long(0)  # end of metadata map
    header += sync

    n_total = 0
    with open(path, "wb") as out:
        out.write(header)
        block = bytearray()
        n_in_block = 0

        def flush():
            nonlocal block, n_in_block, n_total
            if not n_in_block:
                return
            payload = bytes(block)
            if codec == "deflate":
                # raw DEFLATE stream per the spec (no zlib wrapper)
                c = zlib.compressobj(9, zlib.DEFLATED, -15)
                payload = c.compress(payload) + c.flush()
            out.write(_enc_long(n_in_block) + _enc_long(len(payload))
                      + payload + sync)
            n_total += n_in_block
            block, n_in_block = bytearray(), 0

        for row in rows:
            for name, typ, null_branch in fields:
                v = row.get(name)
                if null_branch is not None:
                    if v is None:
                        block += _enc_long(null_branch)
                        continue
                    block += _enc_long(1 - null_branch)
                elif v is None:
                    raise AvroSchemaError(
                        f"null in non-nullable field {name}")
                block += _enc_value(typ, v)
            n_in_block += 1
            if n_in_block >= rows_per_block:
                flush()
        flush()
    return n_total


# ---------------------------------------------------------------- decoding


def _read_exact(fh, n: int, what: str) -> bytes:
    b = fh.read(n)
    if len(b) != n:
        raise AvroSchemaError(
            f"truncated container: wanted {n} bytes of {what}, "
            f"got {len(b)}")
    return b


def _read_varint(fh, what: str = "varint", first: int | None = None) -> int:
    shift = 0
    acc = 0
    while True:
        if first is not None:
            b, first = first, None
        else:
            c = fh.read(1)
            if not c:
                raise AvroSchemaError(
                    f"truncated container reading {what}")
            b = c[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def read_header(src) -> tuple[str, str, bytes, int]:
    """Parse an OCF header → (schema_json, codec, sync, data_offset).
    ``src`` is a binary file object (read incrementally — arbitrarily
    large metadata blocks stream) or bytes. Every malformed/truncated
    shape raises AvroSchemaError with a message, never a bare
    KeyError/IndexError."""
    fh = (io.BytesIO(src)
          if isinstance(src, (bytes, bytearray, memoryview)) else src)
    if _read_exact(fh, 4, "magic") != MAGIC:
        raise AvroSchemaError("not an Avro object container file")
    meta = {}
    while True:
        n = _read_varint(fh, "metadata map count")
        if n == 0:
            break
        if n < 0:  # map blocks may carry a negative count + byte size
            _read_varint(fh, "metadata map block size")
            n = -n
        for _ in range(n):
            klen = _read_varint(fh, "metadata key length")
            key = _read_exact(fh, klen, "metadata key").decode()
            vlen = _read_varint(fh, "metadata value length")
            meta[key] = _read_exact(fh, vlen, "metadata value")
    sync = _read_exact(fh, 16, "sync marker")
    if "avro.schema" not in meta:
        raise AvroSchemaError(
            "container metadata has no avro.schema key")
    return (meta["avro.schema"].decode(),
            meta.get("avro.codec", b"null").decode(), sync, fh.tell())


def _dec_value(typ: str, buf, pos: int):
    if typ == "long" or typ == "int":
        return _zigzag_decode(buf, pos)
    if typ == "string":
        n, pos = _zigzag_decode(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ == "bytes":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos:pos + n]), pos + n
    if typ == "date":
        n, pos = _zigzag_decode(buf, pos)
        return _EPOCH_DATE + timedelta(days=n), pos
    if typ == "timestamp-millis":
        n, pos = _zigzag_decode(buf, pos)
        return _EPOCH_DT + timedelta(milliseconds=n), pos
    if typ == "timestamp-micros":
        n, pos = _zigzag_decode(buf, pos)
        return _EPOCH_DT + timedelta(microseconds=n), pos
    raise AvroSchemaError(typ)


def read_container(path: str):
    """Yield row dicts from one .avro file. Truly streaming: the header
    and each block are read incrementally from the file handle, so peak
    memory is one compressed block + its decompressed payload — NOT the
    container size (a multi-GB Kafka dump decodes in block-sized
    memory; pinned by a traced-allocation test). Temporal logical types
    decode to tz-aware-UTC datetime / date objects."""
    with open(path, "rb") as fh:
        schema_json, codec, sync, _ = read_header(fh)
        fields = parse_schema(schema_json)
        while True:
            lead = fh.read(1)
            if not lead:
                return  # clean EOF at a block boundary
            n_rows = _read_varint(fh, "block row count", first=lead[0])
            n_bytes = _read_varint(fh, "block byte size")
            payload = _read_exact(fh, n_bytes, "block payload")
            if _read_exact(fh, 16, "block sync") != sync:
                raise AvroSchemaError(
                    f"sync marker mismatch after block at {fh.tell()}")
            data = (zlib.decompress(payload, -15) if codec == "deflate"
                    else payload)
            p = 0
            for _ in range(n_rows):
                row = {}
                for name, typ, null_branch in fields:
                    if null_branch is not None:
                        branch, p = _zigzag_decode(data, p)
                        if branch == null_branch:
                            row[name] = None
                            continue
                    row[name], p = _dec_value(typ, data, p)
                yield row


def container_fields(path: str) -> list[tuple[str, str, int | None]]:
    """One ~100-byte header read → the file's parsed field triples."""
    with open(path, "rb") as fh:
        schema_json, _, _, _ = read_header(fh)
    return parse_schema(schema_json)


# ------------------------------------------------------- Spark integration

#: Avro type per Spark SQL type string (the writer's mapping)
_SPARK_TO_AVRO = {
    "bigint": "long", "int": "int", "string": "string",
    "double": "double", "float": "float", "boolean": "boolean",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
}

#: Spark SQL type per canonical internal Avro type (the reader's mapping)
_AVRO_TO_SPARK = {
    "long": "bigint", "int": "int", "string": "string",
    "double": "double", "float": "float", "boolean": "boolean",
    "bytes": "binary", "date": "date",
    "timestamp-millis": "timestamp", "timestamp-micros": "timestamp",
}


def avro_schema_for(df) -> str:
    """Build the [T, null]-union record schema for a DataFrame whose
    columns are all in the supported subset."""
    fields = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        avro_t = _SPARK_TO_AVRO.get(t)
        if avro_t is None:
            raise AvroSchemaError(
                f"column {f.name}: Spark type {t} has no avro_py mapping")
        fields.append({"name": f.name, "type": [avro_t, "null"]})
    return json.dumps({"type": "record", "name": "row", "fields": fields})


def write_avro(df, out_dir: str, codec: str = "deflate") -> int:
    """Write df as one .avro container file PER PARTITION under out_dir
    (executor-side encode via mapInArrow — no driver collect; write
    parallelism is the DataFrame's partitioning). Returns total rows.

    mapInArrow, not mapInPandas: the Arrow→pandas bridge promotes a
    nullable int64 column to float64 (int64 above 2^53 silently rounds)
    and cannot distinguish SQL NULL from a genuine NaN double.
    ``RecordBatch.to_pylist`` keeps int64 validity exact and yields None
    only for true NULLs, so NaN round-trips as NaN and big ids as
    themselves (both pinned in tests/test_avro.py)."""
    from pyspark.sql import functions as F  # noqa: N812

    schema_json = avro_schema_for(df)
    os.makedirs(out_dir, exist_ok=True)

    def encode(batches):
        import uuid

        import pyarrow as pa
        part_file = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.avro")

        def rows():
            # STREAM batches into the container writer (one block per
            # 4096 rows) — partition memory stays one Arrow batch, not
            # the whole partition.
            for batch in batches:
                yield from batch.to_pylist()

        rows_out = write_container(part_file, schema_json, rows(),
                                   codec=codec)
        if rows_out == 0:
            os.unlink(part_file)  # empty partition: no empty container
        yield pa.RecordBatch.from_arrays(
            [pa.array([part_file if rows_out else None], pa.string()),
             pa.array([rows_out], pa.int64())],
            names=["path", "n_rows"])

    report = df.mapInArrow(encode, "path string, n_rows bigint")
    total = report.agg(F.sum("n_rows")).first()[0]
    return int(total or 0)


from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from multiagent_document_etl_system_spark.sources.filestream import (  # noqa: E402
    SeenSetFileStreamReader,
)


def _list_avro_files(path: str) -> list[str]:
    """All .avro files under path, ONE deterministic global sort —
    os.walk's subdirectory visit order is filesystem-dependent, so
    per-directory sorting alone would make "the first file" (schema
    inference) vary across hosts for nested drop dirs."""
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _, files in os.walk(path):
        out += [os.path.join(root, f) for f in files
                if f.endswith(".avro")]
    return sorted(out)


def _check_file_schema(path: str, expected: dict[str, str]) -> None:
    """Refuse loudly (one header read) before decoding a file whose
    writer schema type-conflicts with the read schema — a mixed-type
    drop dir must never mis-bind values into the wrong column type."""
    for name, typ, _ in container_fields(path):
        exp = expected.get(name)
        if exp is not None and _AVRO_TO_SPARK.get(typ) != exp:
            raise AvroSchemaError(
                f"{path}: field {name} is avro {typ} but the read "
                f"schema expects {exp}")


class _AvroFileGroup(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class AvroPyReader(DataSourceReader):
    def __init__(self, options: dict, schema_fields: list[tuple[str, str]]):
        path = options.get("path")
        if not path:
            raise ValueError("avro_py requires a load path")
        if "://" in path and not path.startswith("file://"):
            raise ValueError(
                f"avro_py reads local/mounted paths only, got {path!r}")
        self.path = path.removeprefix("file://")
        self.files_per_partition = max(
            1, int(options.get("filesperpartition", "8")))
        self.schema_fields = [n for n, _ in schema_fields]
        self.schema_types = dict(schema_fields)

    def partitions(self) -> list[InputPartition]:
        fs = _list_avro_files(self.path)
        n = self.files_per_partition
        groups = [fs[i:i + n] for i in range(0, len(fs), n)]
        return [_AvroFileGroup(g) for g in groups] or [_AvroFileGroup([])]

    def read(self, partition: _AvroFileGroup):
        cols = self.schema_fields
        for path in partition.paths:
            _check_file_schema(path, self.schema_types)
            # files decode by their OWN embedded writer schema; fields
            # absent from an older generation surface as None (schema
            # evolution — see module docstring)
            for row in read_container(path):
                yield tuple(row.get(c) for c in cols)


class AvroPyStreamReader(SeenSetFileStreamReader):
    """Streaming flavor: ``spark.readStream.format("avro_py")`` tails a
    directory of container files — the Kafka-dump/CDC-drop cadence.
    Offset model, restart/replay semantics, availableNow single-batch
    caveat, and scope notes live in the shared base
    (sources/filestream — the same reader behind the doc_landing
    stream, whose checkpoint-restart and hypothesis interleaving tests
    pin the contract); this subclass decodes containers in executor
    tasks. A file is one atomic unit: Avro OCF writers land whole files
    (the sync-marker framing means a partial file fails loudly at
    decode rather than yielding half-rows)."""

    def __init__(self, options: dict, schema_fields: list[tuple[str, str]]):
        super().__init__(options)
        self.schema_fields = [n for n, _ in schema_fields]
        self.schema_types = dict(schema_fields)

    def _accept(self, name: str) -> bool:
        return name.endswith(".avro")

    def read(self, partition):
        cols = self.schema_fields
        for path in partition.paths:
            _check_file_schema(path, self.schema_types)
            for row in read_container(path):
                yield tuple(row.get(c) for c in cols)


class AvroPyDataSource(DataSource):
    """``spark.read.format("avro_py")`` — see module docstring. The
    schema comes from the FIRST file's embedded writer schema (one
    driver-side header read at planning; ~100 bytes), the UNION of all
    files' schemas with ``.option("mergeSchemas", "true")`` (one header
    read per file — evolution across CDC drop generations), or an
    explicit ``.schema(...)``."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        path = self.options.get("path", "").removeprefix("file://")
        files = _list_avro_files(path)
        if not files:
            raise ValueError(f"no .avro files under {path!r} and no "
                             "explicit schema given")
        merge = self.options.get(
            "mergeschemas", "false").lower() == "true"
        merged: dict[str, str] = {}  # field → avro type, first-seen order
        for f in (files if merge else files[:1]):
            for name, typ, _ in container_fields(f):
                prev = merged.get(name)
                if prev is None:
                    merged[name] = typ
                elif _AVRO_TO_SPARK[prev] != _AVRO_TO_SPARK[typ]:
                    raise AvroSchemaError(
                        f"schema evolution conflict on field {name}: "
                        f"{prev} (earlier file) vs {typ} ({f})")
        return ", ".join(f"{n} {_AVRO_TO_SPARK[t]}"
                         for n, t in merged.items())

    def reader(self, schema) -> DataSourceReader:
        return AvroPyReader(
            self.options,
            [(f.name, f.dataType.simpleString()) for f in schema.fields])

    def streamReader(self, schema) -> DataSourceStreamReader:
        return AvroPyStreamReader(
            self.options,
            [(f.name, f.dataType.simpleString()) for f in schema.fields])
