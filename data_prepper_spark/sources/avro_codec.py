"""Avro Object Container Files — pure-python reader + writer.

The reference ships avro input/output codecs (avro-codecs/.../
AvroInputCodec.java:38, AvroOutputCodec.java:34 with the event-map →
schema builder at AvroOutputCodec.java:86).  The spark-avro jar is not
on this container's classpath, but the Avro CONTAINER FORMAT and binary
encoding are public and small (avro.apache.org/docs/ spec: zigzag
varints, length-prefixed bytes/strings, blocked arrays/maps, container
header magic ``Obj\\x01`` + metadata map + 16-byte sync marker), so this
module implements them directly:

  - :func:`read_avro_bytes` — decode one container file → (schema,
    records); codecs ``null`` and ``deflate`` (raw zlib);
  - :func:`write_avro_bytes` / :func:`write_avro_file` — encoder with a
    deterministic sync marker (md5 of the schema JSON);
  - :func:`avro_to_spark_schema` / :func:`spark_to_avro_schema` — type
    mapping (records, nullable unions, arrays, maps, enum→string,
    fixed→binary);
  - :func:`read_avro_py` — the DISTRIBUTED read path:
    ``spark.read.format("binaryFile")`` (one task per file; avro files
    are also sync-splittable, but whole-file grain matches the
    reference's per-S3-object stream) → ``mapInPandas`` decode;
  - :func:`write_avro` — distributed write: one container file per
    partition written inside the task (shared-filesystem contract, the
    local/DFS analog of the reference's per-buffer S3 object).

Scale shape: decode is per-file-parallel with no shuffle; schema is
read once on the driver from a single file header, never by collecting
data.  Pure-python decode is fine for codec parity (ingest sources are
scan-bound, not decode-bound); the hot text path stays parquet.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ------------------------------------------------------------ primitives

def _zigzag_encode(n: int) -> bytes:
    zz = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = zz & 0x7F
        zz >>= 7
        if zz:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read_long(self) -> int:
        zz = 0
        shift = 0
        b = self.buf
        i = self.pos
        while True:
            c = b[i]
            i += 1
            zz |= (c & 0x7F) << shift
            if not c & 0x80:
                break
            shift += 7
        self.pos = i
        return (zz >> 1) ^ -(zz & 1)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        v = self.buf[self.pos:self.pos + n]
        self.pos += n
        return v

    def read_fixed(self, n: int) -> bytes:
        v = self.buf[self.pos:self.pos + n]
        self.pos += n
        return v


def _decode_value(r: _Reader, schema):
    """Decode one datum per the (resolved) schema node."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: branch index then datum
        idx = r.read_long()
        return _decode_value(r, schema[idx])
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        v = r.buf[r.pos]
        r.pos += 1
        return bool(v)
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        (v,) = struct.unpack_from("<f", r.buf, r.pos)
        r.pos += 4
        return v
    if t == "double":
        (v,) = struct.unpack_from("<d", r.buf, r.pos)
        r.pos += 8
        return v
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "record":
        return {f["name"]: _decode_value(r, f["type"]) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read_fixed(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode_value(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode_value(r, schema["values"])
    raise ValueError(f"unsupported avro type: {t!r}")


def _encode_value(out: bytearray, schema, v) -> None:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        # union — pick the null branch for None, else the first
        # non-null branch (nullable-union writer, matching
        # AvroOutputCodec's null-or-value event fields)
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if (v is None) == (bt == "null"):
                out += _zigzag_encode(i)
                _encode_value(out, branch, v)
                return
        raise ValueError(f"no union branch for {v!r} in {schema!r}")
    else:
        t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "bytes":
        out += _zigzag_encode(len(v))
        out += bytes(v)
    elif t == "string":
        b = v.encode("utf-8")
        out += _zigzag_encode(len(b))
        out += b
    elif t == "record":
        for f in schema["fields"]:
            _encode_value(out, f["type"], v.get(f["name"]))
    elif t == "enum":
        out += _zigzag_encode(schema["symbols"].index(v))
    elif t == "fixed":
        out += bytes(v)
    elif t == "array":
        if v:
            out += _zigzag_encode(len(v))
            for item in v:
                _encode_value(out, schema["items"], item)
        out += _zigzag_encode(0)
    elif t == "map":
        if v:
            out += _zigzag_encode(len(v))
            for k, item in v.items():
                kb = k.encode("utf-8")
                out += _zigzag_encode(len(kb))
                out += kb
                _encode_value(out, schema["values"], item)
        out += _zigzag_encode(0)
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


# -------------------------------------------------------- container file

def read_avro_bytes(buf: bytes):
    """Decode one Avro Object Container File → (schema, records)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an avro container file (bad magic)")
    r = _Reader(buf, 4)
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = r.read_fixed(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records = []
    while r.pos < len(buf):
        count = r.read_long()
        size = r.read_long()
        block = r.read_fixed(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r} (null/deflate supported)")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode_value(br, schema))
        if r.read_fixed(16) != sync:
            raise ValueError("avro sync marker mismatch (corrupt block)")
    return schema, records


def write_avro_bytes(records, schema, codec: str = "null",
                     block_records: int = 4096) -> bytes:
    """Encode records into one container file; deterministic sync marker
    (md5 of the schema JSON) so fixture builds are byte-stable."""
    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    sync = hashlib.md5(schema_json.encode()).digest()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    out.write(_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out.write(_zigzag_encode(len(kb)))
        out.write(kb)
        out.write(_zigzag_encode(len(v)))
        out.write(v)
    out.write(_zigzag_encode(0))
    out.write(sync)
    for i in range(0, len(records) or 1, block_records):
        chunk = records[i:i + block_records]
        if not chunk:
            break
        body = bytearray()
        for rec in chunk:
            _encode_value(body, schema, rec)
        data = bytes(body)
        if codec == "deflate":
            data = zlib.compress(data, 6)[2:-4]  # raw deflate: strip zlib wrapper
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r} (null/deflate supported)")
        out.write(_zigzag_encode(len(chunk)))
        out.write(_zigzag_encode(len(data)))
        out.write(data)
        out.write(sync)
    return out.getvalue()


def write_avro_file(records, schema, path: str, codec: str = "null") -> None:
    with open(path, "wb") as f:
        f.write(write_avro_bytes(records, schema, codec=codec))


# ------------------------------------------------------------ spark glue

def avro_to_spark_schema(schema):
    """Avro record schema → Spark StructType (nullable unions honored)."""
    from pyspark.sql import types as T

    def conv(node):
        if isinstance(node, list):
            non_null = [b for b in node if b != "null"]
            if len(non_null) != 1:
                raise ValueError(f"only nullable unions supported: {node!r}")
            dt, _ = conv(non_null[0])
            return dt, True
        t = node if isinstance(node, str) else node["type"]
        prim = {
            "boolean": T.BooleanType(), "int": T.IntegerType(),
            "long": T.LongType(), "float": T.FloatType(),
            "double": T.DoubleType(), "bytes": T.BinaryType(),
            "string": T.StringType(), "enum": T.StringType(),
            "fixed": T.BinaryType(),
        }
        if t in prim:
            return prim[t], False
        if t == "record":
            fields = []
            for f in node["fields"]:
                dt, nullable = conv(f["type"])
                fields.append(T.StructField(f["name"], dt, nullable))
            return T.StructType(fields), False
        if t == "array":
            dt, nullable = conv(node["items"])
            return T.ArrayType(dt, nullable), False
        if t == "map":
            dt, nullable = conv(node["values"])
            return T.MapType(T.StringType(), dt, nullable), False
        raise ValueError(f"unsupported avro type: {t!r}")

    if isinstance(schema, dict) and schema.get("type") == "record":
        dt, _ = conv(schema)
        return dt
    raise ValueError("top-level avro schema must be a record")


def spark_to_avro_schema(spark_schema, name: str = "event"):
    """Spark StructType → Avro record schema (the analog of
    AvroOutputCodec.java:86 buildSchemaStringFromEventMap: every field
    becomes a nullable union)."""
    from pyspark.sql import types as T

    def conv(dt, field_name):
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.ArrayType):
            # Spark ArrayType defaults containsNull=True — mirror that with
            # a nullable-union item type so a null element encodes instead
            # of crashing _encode_value at task time.
            items = conv(dt.elementType, field_name)
            return {"type": "array",
                    "items": ["null", items] if dt.containsNull else items}
        if isinstance(dt, T.MapType):
            vals = conv(dt.valueType, field_name)
            return {"type": "map",
                    "values": ["null", vals] if dt.valueContainsNull else vals}
        if isinstance(dt, T.StructType):
            return {
                "type": "record", "name": f"{field_name}_rec",
                "fields": [
                    {"name": f.name, "type": ["null", conv(f.dataType, f.name)]}
                    for f in dt.fields
                ],
            }
        raise ValueError(f"unsupported spark type for avro: {dt}")

    return {
        "type": "record", "name": name,
        "fields": [
            {"name": f.name, "type": ["null", conv(f.dataType, f.name)]}
            for f in spark_schema.fields
        ],
    }


def _schema_from_first_file(spark, path: str):
    """Read ONE file's header for the schema — local glob when possible,
    else a single binaryFile head() (bounded by one file's size)."""
    import glob as _glob

    p = path[7:] if path.startswith("file://") else path
    if os.path.isdir(p):
        cands = sorted(
            f for f in _glob.glob(os.path.join(p, "**", "*"), recursive=True)
            if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
        )
    else:
        cands = sorted(f for f in _glob.glob(p) if os.path.isfile(f))
    if cands:
        with open(cands[0], "rb") as f:
            buf = f.read()
    else:
        row = spark.read.format("binaryFile").load(path).select("content").head()
        if row is None:
            raise FileNotFoundError(f"no avro files at {path}")
        buf = bytes(row[0])
    schema, _ = read_avro_bytes(buf)
    return schema


def read_avro_py(spark, path: str, avro_schema=None):
    """Distributed avro read: binaryFile scan → mapInPandas pure-python
    decode (AvroInputCodec.java:38 parity).  One task per file."""
    import pandas as pd

    if avro_schema is None:
        avro_schema = _schema_from_first_file(spark, path)
    out_schema = avro_to_spark_schema(avro_schema)
    cols = [f.name for f in out_schema.fields]
    expected = json.dumps(avro_schema, sort_keys=True)

    def decode(batches):
        for pdf in batches:
            for buf in pdf["content"]:
                schema, records = read_avro_bytes(bytes(buf))
                if json.dumps(schema, sort_keys=True) != expected:
                    raise ValueError("avro schema mismatch across files")
                yield pd.DataFrame(
                    {c: [r.get(c) for r in records] for c in cols}
                )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, schema=out_schema)


def write_avro(df, path: str, codec: str = "null", name: str = "event") -> None:
    """Distributed avro write (AvroOutputCodec.java:34 analog): schema
    derived from the frame (nullable-union fields), one container file
    per partition written inside the task — shared-filesystem contract,
    like every local/DFS sink here."""
    import pandas as pd  # noqa: F401
    from pyspark import TaskContext

    avro_schema = spark_to_avro_schema(df.schema, name=name)
    cols = [f.name for f in df.schema.fields]
    # mode='overwrite' contract, same as write_parquet/write_ndjson/write_csv:
    # clear stale part files so a re-run that produces fewer partitions never
    # leaves old part-*.avro behind for read_avro_py to silently include.
    if os.path.isdir(path):
        for fn in os.listdir(path):
            if fn.endswith(".avro"):
                os.remove(os.path.join(path, fn))
    os.makedirs(path, exist_ok=True)

    def _clean(v):
        import numpy as np
        if v is None:
            return None
        if isinstance(v, float) and v != v:
            return None
        if isinstance(v, np.ndarray):
            return [_clean(x) for x in v.tolist()]
        if isinstance(v, (list, tuple)):
            return [_clean(x) for x in v]
        if isinstance(v, dict):
            return {k: _clean(x) for k, x in v.items()}
        if isinstance(v, np.generic):
            return v.item()
        return v

    def encode(batches):
        rows = []
        for pdf in batches:
            for rec in pdf[cols].to_dict("records"):
                rows.append({k: _clean(v) for k, v in rec.items()})
        pid = TaskContext.get().partitionId()
        fp = os.path.join(path, f"part-{pid:05d}.avro")
        if rows:
            write_avro_file(rows, avro_schema, fp, codec=codec)
        import pandas as pd
        yield pd.DataFrame({"file": [fp], "rows": [len(rows)]})

    from pyspark.sql import types as T
    summary = df.mapInPandas(
        encode,
        schema=T.StructType([
            T.StructField("file", T.StringType()),
            T.StructField("rows", T.LongType()),
        ]),
    )
    summary.collect()  # bounded: one row per partition
