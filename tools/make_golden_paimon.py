#!/usr/bin/env python3
"""Author a Paimon table the way REAL Paimon lays it out on disk — an
independent implementation (python stdlib Avro encoder + pyarrow parquet)
sharing zero code with the Scala engine.

What is real-Paimon-exact here (from the public layout the docs and
paimon's FileStoreTable describe, the same tree the reference's
PaimonConversionSource reads):
  - `schema/schema-0` JSON: id, fields (Flink-SQL type strings),
    highestFieldId, partitionKeys, primaryKeys, options, timeMillis
  - `snapshot/snapshot-1` JSON: version 3, id, schemaId,
    baseManifestList/deltaManifestList as BARE FILE NAMES (resolved under
    <table>/manifest/), commitUser, commitIdentifier, commitKind,
    timeMillis, logOffsets, totalRecordCount/deltaRecordCount extras
  - `snapshot/LATEST` + `snapshot/EARLIEST` hint files
  - data files under `bucket-0/`

What is graft's documented dialect (PaimonFormat.scala scaladoc): the
avro manifest/manifest-list record shapes. Real Paimon serializes
manifest entries with its binary InternalRow codec for partitions and
key/value stats — no independent decoder for that exists in this
offline environment, so the avro plane is the engine's documented
simplification, INDEPENDENTLY REIMPLEMENTED here from its prose
description (a cross-implementation check of the dialect itself).

Usage: python3 tools/make_golden_paimon.py <table-dir>
"""
import json
import os
import shutil
import struct
import sys


def zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def enc_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return zigzag(len(b)) + b


def enc_map(d: dict, enc_val) -> bytes:
    if not d:
        return zigzag(0)
    out = bytearray(zigzag(len(d)))
    for k, v in d.items():
        out += enc_str(k)
        out += enc_val(v)
    out += zigzag(0)
    return bytes(out)


def write_ocf(path: str, schema: dict, encoded_records, sync: bytes):
    assert len(sync) == 16
    body = b"".join(encoded_records)
    with open(path, "wb") as f:
        f.write(b"Obj\x01")
        meta = {
            "avro.schema": json.dumps(schema, separators=(",", ":")),
            "avro.codec": "null",
        }
        f.write(zigzag(len(meta)))
        for k, v in meta.items():
            f.write(enc_str(k))
            f.write(zigzag(len(v.encode()))), f.write(v.encode())
        f.write(zigzag(0))
        f.write(sync)
        f.write(zigzag(len(encoded_records)))
        f.write(zigzag(len(body)))
        f.write(body)
        f.write(sync)


ENTRY_SCHEMA = {
    "type": "record", "name": "paimon_manifest_entry", "fields": [
        {"name": "kind", "type": "int"},
        {"name": "partition", "type": {"type": "map", "values": "string"}},
        {"name": "bucket", "type": "int"},
        {"name": "fileName", "type": "string"},
        {"name": "fileSize", "type": "long"},
        {"name": "rowCount", "type": "long"},
        {"name": "minValues", "type": {"type": "map", "values": "string"}},
        {"name": "maxValues", "type": {"type": "map", "values": "string"}},
        {"name": "nullCounts", "type": {"type": "map", "values": "long"}},
        {"name": "lastModifiedMs", "type": "long"},
    ],
}

LIST_SCHEMA = {
    "type": "record", "name": "paimon_manifest_file", "fields": [
        {"name": "fileName", "type": "string"},
        {"name": "fileSize", "type": "long"},
    ],
}

TS_MS = 1700000000000


def main(table_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir = os.path.abspath(table_dir)
    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    for d in ("schema", "snapshot", "manifest", "bucket-0"):
        os.makedirs(os.path.join(table_dir, d))

    n = 90
    order_id = list(range(1, n + 1))
    region = [["EU", "US", "APAC"][i % 3] for i in range(n)]
    amount = [round((i * 13 % 97) + 0.25, 2) for i in range(n)]
    tbl = pa.table({
        "order_id": pa.array(order_id, pa.int64()),
        "region": pa.array(region, pa.string()),
        "amount": pa.array(amount, pa.float64()),
    })
    data_name = "bucket-0/data-77777777-8888-9999-aaaa-bbbbbbbbbbbb-0.parquet"
    data_path = os.path.join(table_dir, data_name)
    pq.write_table(tbl, data_path, compression="snappy")
    fsize = os.path.getsize(data_path)

    # schema-0: real Paimon JSON shape (Flink SQL type strings)
    schema0 = {
        "version": 3,
        "id": 0,
        "fields": [
            {"id": 0, "name": "order_id", "type": "BIGINT NOT NULL"},
            {"id": 1, "name": "region", "type": "STRING"},
            {"id": 2, "name": "amount", "type": "DOUBLE"},
        ],
        "highestFieldId": 2,
        "partitionKeys": [],
        "primaryKeys": [],
        "options": {"file.format": "parquet", "bucket": "1"},
        "timeMillis": TS_MS,
    }
    with open(os.path.join(table_dir, "schema", "schema-0"), "w") as f:
        json.dump(schema0, f, indent=2)

    # manifest (graft's documented avro dialect, reimplemented)
    def enc_entry(kind):
        out = bytearray()
        out += zigzag(kind)                                    # kind
        out += enc_map({}, enc_str)                            # partition
        out += zigzag(0)                                       # bucket
        out += enc_str(data_name)                              # fileName
        out += zigzag(fsize)                                   # fileSize
        out += zigzag(n)                                       # rowCount
        out += enc_map({"order_id": "1", "region": "APAC",
                        "amount": "0.25"}, enc_str)            # minValues
        out += enc_map({"order_id": str(n), "region": "US",
                        "amount": "96.25"}, enc_str)           # maxValues
        out += enc_map({"order_id": 0, "region": 0, "amount": 0},
                       lambda v: zigzag(v))                    # nullCounts
        out += zigzag(TS_MS)                                   # lastModified
        return bytes(out)

    manifest_name = "manifest-77777777-8888-9999-aaaa-bbbbbbbbbbbb-0"
    manifest_path = os.path.join(table_dir, "manifest", manifest_name)
    write_ocf(manifest_path, ENTRY_SCHEMA, [enc_entry(0)],
              b"PAIMONGOLDEN0001")
    mlen = os.path.getsize(manifest_path)

    def enc_list_entry(name, size):
        return enc_str(name) + zigzag(size)

    base_list = "manifest-list-77777777-8888-9999-aaaa-bbbbbbbbbbbb-0"
    delta_list = "manifest-list-77777777-8888-9999-aaaa-bbbbbbbbbbbb-1"
    write_ocf(os.path.join(table_dir, "manifest", base_list), LIST_SCHEMA,
              [], b"PAIMONGOLDEN0002")
    write_ocf(os.path.join(table_dir, "manifest", delta_list), LIST_SCHEMA,
              [enc_list_entry(manifest_name, mlen)], b"PAIMONGOLDEN0003")

    # snapshot-1: real Paimon JSON shape, manifest lists as BARE NAMES
    snapshot = {
        "version": 3,
        "id": 1,
        "schemaId": 0,
        "baseManifestList": base_list,
        "deltaManifestList": delta_list,
        "changelogManifestList": None,
        "commitUser": "77777777-8888-9999-aaaa-bbbbbbbbbbbb",
        "commitIdentifier": 1,
        "commitKind": "APPEND",
        "timeMillis": TS_MS,
        "logOffsets": {},
        "totalRecordCount": n,
        "deltaRecordCount": n,
        "changelogRecordCount": 0,
        "watermark": -9223372036854775808,
    }
    with open(os.path.join(table_dir, "snapshot", "snapshot-1"), "w") as f:
        json.dump(snapshot, f, indent=2)
    for hint in ("LATEST", "EARLIEST"):
        with open(os.path.join(table_dir, "snapshot", hint), "w") as f:
            f.write("1")
    print(f"golden paimon table written: {table_dir}")
    print(f"  rows={n} sum_order_id={sum(order_id)} "
          f"sum_amount={round(sum(amount), 2)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "src/test/resources/golden/paimon_orders")
