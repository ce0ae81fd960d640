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
``mapInPandas`` (one .avro file per input partition, no driver collect).

Format scope (the OCF spec, https://avro.apache.org/docs/1.11.1/specification/):

- header: magic ``Obj\\x01`` + file-metadata map (``avro.schema`` JSON,
  ``avro.codec``) + 16-byte sync marker;
- blocks: row-count (zigzag varint long), byte-size, payload, sync;
- codecs: ``null`` and ``deflate`` (raw zlib stream, RFC 1951);
- types: records of ``long``, ``string``, ``double``, ``boolean``,
  ``bytes``, and the nullable union ``["null", T]`` — the row-shaped
  subset a landing/CDC feed carries (maps/arrays/enums are out of scope
  and rejected loudly at schema parse, never silently mis-decoded).

Scale posture: one InputPartition per ``filesPerPartition`` group, so a
10k-file feed fans out like any file source; per-block streaming decode
keeps memory at one block; the writer emits one file per upstream
partition so write parallelism IS the DataFrame's partitioning. Local /
mounted paths only (the landing_ds contract); reject URI schemes fast.

Correctness: the ``s10_avro_roundtrip`` registry query (queued R12)
writes the documents table to Avro (deflate), reads it back through
``format("avro_py")``, and hash-matches per-(lang, source) aggregates —
including min/max md5(text) — against the parquet-derived oracle, so
the encode→decode loop is proven value-lossless byte-for-byte; property
and corrupt-file tests live in tests/test_avro.py.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

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


_PRIMITIVES = {"long", "string", "double", "boolean", "bytes", "null"}


def parse_schema(schema_json: str) -> list[tuple[str, str, bool]]:
    """Validate + flatten a record schema into (name, type, nullable)
    triples. Anything outside the supported row-shaped subset raises —
    loud refusal beats silent mis-decoding."""
    s = json.loads(schema_json)
    if not (isinstance(s, dict) and s.get("type") == "record"):
        raise AvroSchemaError("only record schemas are supported")
    fields = []
    for f in s.get("fields", []):
        name, typ = f["name"], f["type"]
        nullable = False
        if isinstance(typ, list):  # union
            if len(typ) != 2 or "null" not in typ:
                raise AvroSchemaError(
                    f"field {name}: only [null, T] unions are supported")
            typ = typ[0] if typ[1] == "null" else typ[1]
            nullable = True
        if not isinstance(typ, str) or typ not in _PRIMITIVES - {"null"}:
            raise AvroSchemaError(
                f"field {name}: unsupported type {typ!r} (supported: "
                f"long/string/double/boolean/bytes and [null, T])")
        fields.append((name, typ, nullable))
    if not fields:
        raise AvroSchemaError("record has no fields")
    return fields


def _enc_value(typ: str, v) -> bytes:
    if typ == "long":
        return _enc_long(v)
    if typ == "string":
        return _enc_str(v)
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ == "bytes":
        return _enc_bytes(bytes(v))
    raise AvroSchemaError(typ)


def write_container(path: str, schema_json: str, rows,
                    codec: str = "deflate",
                    rows_per_block: int = 4096,
                    sync: bytes | None = None) -> int:
    """Write one .avro Object Container File. Returns rows written.
    ``rows`` is an iterable of dicts (missing keys = null)."""
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
            for name, typ, nullable in fields:
                v = row.get(name)
                if nullable:
                    if v is None:
                        block += _enc_long(1)  # union branch 1 = null
                        continue
                    block += _enc_long(0)      # union branch 0 = value
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


def read_header(buf: bytes) -> tuple[str, str, bytes, int]:
    """Parse an OCF header → (schema_json, codec, sync, data_offset)."""
    if buf[:4] != MAGIC:
        raise AvroSchemaError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # blocks may carry a negative count + byte size
            _, pos = _zigzag_decode(buf, pos)
            n = -n
        for _ in range(n):
            klen, pos = _zigzag_decode(buf, pos)
            key = buf[pos:pos + klen].decode(); pos += klen
            vlen, pos = _zigzag_decode(buf, pos)
            meta[key] = buf[pos:pos + vlen]; pos += vlen
    sync = bytes(buf[pos:pos + 16]); pos += 16
    return (meta["avro.schema"].decode(),
            meta.get("avro.codec", b"null").decode(), sync, pos)


def _dec_value(typ: str, buf, pos: int):
    if typ == "long":
        return _zigzag_decode(buf, pos)
    if typ == "string":
        n, pos = _zigzag_decode(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ == "bytes":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos:pos + n]), pos + n
    raise AvroSchemaError(typ)


def read_container(path: str):
    """Yield row dicts from one .avro file (streaming, block at a time)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    schema_json, codec, sync, pos = read_header(buf)
    fields = parse_schema(schema_json)
    mv = memoryview(buf)
    while pos < len(buf):
        n_rows, pos = _zigzag_decode(buf, pos)
        n_bytes, pos = _zigzag_decode(buf, pos)
        payload = mv[pos:pos + n_bytes]
        pos += n_bytes
        if buf[pos:pos + 16] != sync:
            raise AvroSchemaError(f"sync marker mismatch at {pos}")
        pos += 16
        data = (zlib.decompress(payload, -15) if codec == "deflate"
                else bytes(payload))
        p = 0
        for _ in range(n_rows):
            row = {}
            for name, typ, nullable in fields:
                if nullable:
                    branch, p = _zigzag_decode(data, p)
                    if branch == 1:
                        row[name] = None
                        continue
                row[name], p = _dec_value(typ, data, p)
            yield row


# ------------------------------------------------------- Spark integration

#: Avro type per Spark SQL type string (the writer's mapping)
_SPARK_TO_AVRO = {"bigint": "long", "string": "string", "double": "double",
                  "boolean": "boolean", "binary": "bytes"}


def avro_schema_for(df) -> str:
    """Build the [null, T]-union record schema for a DataFrame whose
    columns are all in the supported subset."""
    fields = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t not in _SPARK_TO_AVRO:
            raise AvroSchemaError(
                f"column {f.name}: Spark type {t} has no avro_py mapping")
        fields.append({"name": f.name,
                       "type": [_SPARK_TO_AVRO[t], "null"]})
    return json.dumps({"type": "record", "name": "row", "fields": fields})


def write_avro(df, out_dir: str, codec: str = "deflate") -> int:
    """Write df as one .avro container file PER PARTITION under out_dir
    (executor-side encode via mapInPandas — no driver collect; write
    parallelism is the DataFrame's partitioning). Returns total rows."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: N812

    schema_json = avro_schema_for(df)
    os.makedirs(out_dir, exist_ok=True)

    def encode(batches):
        import uuid
        part_file = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.avro")

        def rows():
            # STREAM batches into the container writer (one block per
            # 4096 rows) — partition memory stays one Arrow batch, not
            # the whole partition. pandas surfaces SQL NULLs as NaN —
            # normalize to None so the union branch encodes correctly.
            for pdf in batches:
                for r in pdf.to_dict("records"):
                    for k, v in r.items():
                        if isinstance(v, float) and v != v:
                            r[k] = None
                    yield r

        rows_out = write_container(part_file, schema_json, rows(),
                                   codec=codec)
        if rows_out == 0:
            os.unlink(part_file)  # empty partition: no empty container
        yield pd.DataFrame({"path": [part_file if rows_out else None],
                            "n_rows": [rows_out]})

    report = df.mapInPandas(encode, "path string, n_rows bigint")
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


class _AvroFileGroup(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class AvroPyReader(DataSourceReader):
    def __init__(self, options: dict, schema_fields: list[str]):
        path = options.get("path")
        if not path:
            raise ValueError("avro_py requires a load path")
        if "://" in path and not path.startswith("file://"):
            raise ValueError(
                f"avro_py reads local/mounted paths only, got {path!r}")
        self.path = path.removeprefix("file://")
        self.files_per_partition = max(
            1, int(options.get("filesperpartition", "8")))
        self.schema_fields = schema_fields

    def _files(self) -> list[str]:
        if os.path.isfile(self.path):
            return [self.path]
        out = []
        for root, _, files in os.walk(self.path):
            out += [os.path.join(root, f) for f in files
                    if f.endswith(".avro")]
        return sorted(out)

    def partitions(self) -> list[InputPartition]:
        fs = self._files()
        n = self.files_per_partition
        groups = [fs[i:i + n] for i in range(0, len(fs), n)]
        return [_AvroFileGroup(g) for g in groups] or [_AvroFileGroup([])]

    def read(self, partition: _AvroFileGroup):
        cols = self.schema_fields
        for path in partition.paths:
            for row in read_container(path):
                yield tuple(row.get(c) for c in cols)


class AvroPyStreamReader(SeenSetFileStreamReader):
    """Streaming flavor: ``spark.readStream.format("avro_py")`` tails a
    directory of container files — the Kafka-dump/CDC-drop cadence.
    Offset model, restart/replay semantics, and scope notes live in the
    shared base (sources/filestream — the same reader behind the
    doc_landing stream, whose checkpoint-restart and hypothesis
    interleaving tests pin the contract); this subclass decodes
    containers in executor tasks. A file is one atomic unit: Avro OCF
    writers land whole files (the sync-marker framing means a partial
    file fails loudly at decode rather than yielding half-rows)."""

    def __init__(self, options: dict, schema_fields: list[str]):
        super().__init__(options)
        self.schema_fields = schema_fields

    def _accept(self, name: str) -> bool:
        return name.endswith(".avro")

    def read(self, partition):
        cols = self.schema_fields
        for path in partition.paths:
            for row in read_container(path):
                yield tuple(row.get(c) for c in cols)


class AvroPyDataSource(DataSource):
    """``spark.read.format("avro_py")`` — see module docstring. The
    schema comes from the FIRST file's embedded writer schema (one
    driver-side header read at planning; ~100 bytes), or from an
    explicit ``.schema(...)``."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        path = self.options.get("path", "").removeprefix("file://")
        first = None
        if os.path.isfile(path):
            first = path
        else:
            for root, _, files in os.walk(path):
                av = sorted(f for f in files if f.endswith(".avro"))
                if av:
                    first = os.path.join(root, av[0])
                    break
        if first is None:
            raise ValueError(f"no .avro files under {path!r} and no "
                             "explicit schema given")
        with open(first, "rb") as fh:
            head = fh.read(1 << 16)
        schema_json, _, _, _ = read_header(head)
        _AVRO_TO_SPARK = {"long": "bigint", "string": "string",
                          "double": "double", "boolean": "boolean",
                          "bytes": "binary"}
        parts = [f"{name} {_AVRO_TO_SPARK[typ]}"
                 for name, typ, _ in parse_schema(schema_json)]
        return ", ".join(parts)

    def reader(self, schema) -> DataSourceReader:
        return AvroPyReader(self.options, [f.name for f in schema.fields])

    def streamReader(self, schema) -> DataSourceStreamReader:
        return AvroPyStreamReader(self.options,
                                  [f.name for f in schema.fields])
