#!/usr/bin/env python3
"""Author an Iceberg v2 table EXACTLY as the spec describes it — an
independent implementation (python stdlib Avro encoder + pyarrow for the
parquet data file) with zero code shared with the Scala engine, so the
fixture can anchor golden conformance tests in an environment where no
real Iceberg writer (java runtime, pyiceberg, duckdb-iceberg) is
installable offline.

Everything here is transcribed from the PUBLIC Iceberg table spec
(https://iceberg.apache.org/spec/): v2 metadata JSON fields, the
manifest-list `manifest_file` schema (reserved field-ids 500-519, with
the avro-compat names `added_data_files_count` etc. for 504-506), the
`manifest_entry`/`data_file` schema (ids 0-4, 100-142), k_v-array
encoding for the int-keyed stat maps, little-endian single-value binary
bounds, and the HadoopTables `metadata/v<N>.metadata.json` +
`version-hint.text` layout java Iceberg writes for filesystem tables.

Usage: python3 tools/make_golden_iceberg.py <table-dir>
Deterministic: fixed uuid/timestamps/snapshot-id/sync-markers; re-running
produces byte-identical metadata (the parquet file is pyarrow-versioned).
"""
import json
import os
import shutil
import struct
import sys


# ---------------------------------------------------------------- avro ---
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


def enc_bytes(b: bytes) -> bytes:
    return zigzag(len(b)) + b


def enc_value(schema, v) -> bytes:
    """Encode v per the (JSON-parsed) avro schema node."""
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if v is None and bt == "null":
                return zigzag(i)
            if v is not None and bt != "null":
                return zigzag(i) + enc_value(branch, v)
        raise ValueError(f"no union branch for {v!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return zigzag(int(v))
    if t == "float":
        return struct.pack("<f", v)
    if t == "double":
        return struct.pack("<d", v)
    if t == "string":
        return enc_str(v)
    if t == "bytes":
        return enc_bytes(v)
    if t == "record":
        out = bytearray()
        for f in schema["fields"]:
            out += enc_value(f["type"], v[f["name"]])
        return bytes(out)
    if t == "array":
        if not v:
            return zigzag(0)
        out = bytearray(zigzag(len(v)))
        for item in v:
            out += enc_value(schema["items"], item)
        out += zigzag(0)
        return bytes(out)
    if t == "map":
        if not v:
            return zigzag(0)
        out = bytearray(zigzag(len(v)))
        for k, item in v.items():
            out += enc_str(k)
            out += enc_value(schema["values"], item)
        out += zigzag(0)
        return bytes(out)
    raise ValueError(f"unsupported avro type {t}")


def write_ocf(path: str, schema: dict, records, sync: bytes) -> None:
    """Avro Object Container File: magic, metadata map, sync, one block."""
    assert len(sync) == 16
    body = bytearray()
    for r in records:
        body += enc_value(schema, r)
    with open(path, "wb") as f:
        f.write(b"Obj\x01")
        meta = {
            "avro.schema": json.dumps(schema, separators=(",", ":")),
            "avro.codec": "null",
        }
        f.write(zigzag(len(meta)))
        for k, v in meta.items():
            f.write(enc_str(k))
            f.write(enc_bytes(v.encode("utf-8")))
        f.write(zigzag(0))
        f.write(sync)
        f.write(zigzag(len(records)))
        f.write(zigzag(len(body)))
        f.write(bytes(body))
        f.write(sync)


# ------------------------------------------------------- iceberg schemas ---
def kv_array_schema(mapid: int, kid: int, vid: int, vtype):
    """Iceberg's avro encoding of an int-keyed map: array of key_value."""
    return [
        "null",
        {
            "type": "array",
            "items": {
                "type": "record",
                "name": f"k{kid}_v{vid}",
                "fields": [
                    {"name": "key", "type": "int", "field-id": kid},
                    {"name": "value", "type": vtype, "field-id": vid},
                ],
            },
            "logicalType": "map",
        },
    ]


DATA_FILE = {
    "type": "record",
    "name": "r2",
    "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {
            "name": "partition",
            "type": {"type": "record", "name": "r102", "fields": []},
            "field-id": 102,
        },
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {"name": "column_sizes", "type": kv_array_schema(108, 117, 118, "long"),
         "default": None, "field-id": 108},
        {"name": "value_counts", "type": kv_array_schema(109, 119, 120, "long"),
         "default": None, "field-id": 109},
        {"name": "null_value_counts",
         "type": kv_array_schema(110, 121, 122, "long"),
         "default": None, "field-id": 110},
        {"name": "nan_value_counts",
         "type": kv_array_schema(137, 138, 139, "long"),
         "default": None, "field-id": 137},
        {"name": "lower_bounds", "type": kv_array_schema(125, 126, 127, "bytes"),
         "default": None, "field-id": 125},
        {"name": "upper_bounds", "type": kv_array_schema(128, 129, 130, "bytes"),
         "default": None, "field-id": 128},
        {"name": "key_metadata", "type": ["null", "bytes"], "default": None,
         "field-id": 131},
        {"name": "split_offsets",
         "type": ["null", {"type": "array", "items": "long"}],
         "default": None, "field-id": 132},
        {"name": "equality_ids",
         "type": ["null", {"type": "array", "items": "int"}],
         "default": None, "field-id": 135},
        {"name": "sort_order_id", "type": ["null", "int"], "default": None,
         "field-id": 140},
    ],
}

MANIFEST_ENTRY = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None,
         "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "default": None,
         "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "type": DATA_FILE, "field-id": 2},
    ],
}

FIELD_SUMMARY = {
    "type": "record",
    "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {"name": "contains_nan", "type": ["null", "boolean"], "default": None,
         "field-id": 518},
        {"name": "lower_bound", "type": ["null", "bytes"], "default": None,
         "field-id": 510},
        {"name": "upper_bound", "type": ["null", "bytes"], "default": None,
         "field-id": 511},
    ],
}

MANIFEST_FILE = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int", "field-id": 504},
        {"name": "existing_data_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions",
         "type": ["null", {"type": "array", "items": FIELD_SUMMARY}],
         "default": None, "field-id": 507},
        {"name": "key_metadata", "type": ["null", "bytes"], "default": None,
         "field-id": 519},
    ],
}


# ----------------------------------------------------------------- table ---
SNAPSHOT_ID = 4910258362197584316
TS_MS = 1700000000000
UUID = "11111111-2222-3333-4444-555555555555"


def main(table_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir = os.path.abspath(table_dir)
    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    data_dir = os.path.join(table_dir, "data")
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)

    # deterministic rows: 120 trades
    n = 120
    trade_id = list(range(1, n + 1))
    symbols = ["AAA", "BBB", "CCC", "DDD"]
    symbol = [symbols[i % 4] for i in range(n)]
    qty = [(i * 7) % 500 + 1 for i in range(n)]
    price = [round(10.0 + (i % 37) * 0.25, 2) for i in range(n)]
    tbl = pa.table({
        "trade_id": pa.array(trade_id, pa.int64()),
        "symbol": pa.array(symbol, pa.string()),
        "qty": pa.array(qty, pa.int32()),
        "price": pa.array(price, pa.float64()),
    })
    data_file = os.path.join(
        data_dir, "00000-0-11111111-2222-3333-4444-555555555555-00001.parquet")
    pq.write_table(tbl, data_file, compression="snappy")
    fsize = os.path.getsize(data_file)

    # spec single-value binary bounds: little-endian fixed-width, UTF-8
    def b_long(v):
        return struct.pack("<q", v)

    def b_int(v):
        return struct.pack("<i", v)

    def b_double(v):
        return struct.pack("<d", v)

    kv = lambda pairs: [{"key": k, "value": v} for k, v in pairs]
    entry = {
        "status": 1,  # ADDED
        "snapshot_id": SNAPSHOT_ID,
        "sequence_number": None,      # inherited from the manifest
        "file_sequence_number": None,
        "data_file": {
            "content": 0,
            "file_path": "file:" + data_file,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": n,
            "file_size_in_bytes": fsize,
            "column_sizes": kv([(1, 500), (2, 260), (3, 320), (4, 420)]),
            "value_counts": kv([(1, n), (2, n), (3, n), (4, n)]),
            "null_value_counts": kv([(1, 0), (2, 0), (3, 0), (4, 0)]),
            "nan_value_counts": kv([(4, 0)]),
            "lower_bounds": kv([
                (1, b_long(min(trade_id))),
                (2, min(symbol).encode("utf-8")),
                (3, b_int(min(qty))),
                (4, b_double(min(price))),
            ]),
            "upper_bounds": kv([
                (1, b_long(max(trade_id))),
                (2, max(symbol).encode("utf-8")),
                (3, b_int(max(qty))),
                (4, b_double(max(price))),
            ]),
            "key_metadata": None,
            "split_offsets": [4],
            "equality_ids": None,
            "sort_order_id": 0,
        },
    }
    manifest_path = os.path.join(
        meta_dir, "11111111-2222-3333-4444-555555555555-m0.avro")
    write_ocf(manifest_path, MANIFEST_ENTRY, [entry], b"ICEBERGSYNC00001")
    mlen = os.path.getsize(manifest_path)

    mf = {
        "manifest_path": "file:" + manifest_path,
        "manifest_length": mlen,
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": 1,
        "min_sequence_number": 1,
        "added_snapshot_id": SNAPSHOT_ID,
        "added_data_files_count": 1,
        "existing_data_files_count": 0,
        "deleted_data_files_count": 0,
        "added_rows_count": n,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": [],
        "key_metadata": None,
    }
    mlist_path = os.path.join(
        meta_dir, f"snap-{SNAPSHOT_ID}-1-11111111-2222-3333-4444-"
        "555555555555.avro")
    write_ocf(mlist_path, MANIFEST_FILE, [mf], b"ICEBERGSYNC00002")

    fields = [
        {"id": 1, "name": "trade_id", "required": True, "type": "long"},
        {"id": 2, "name": "symbol", "required": False, "type": "string"},
        {"id": 3, "name": "qty", "required": False, "type": "int"},
        {"id": 4, "name": "price", "required": False, "type": "double"},
    ]
    name_mapping = [
        {"field-id": f["id"], "names": [f["name"]]} for f in fields
    ]
    metadata = {
        "format-version": 2,
        "table-uuid": UUID,
        "location": "file:" + table_dir,
        "last-sequence-number": 1,
        "last-updated-ms": TS_MS,
        "last-column-id": 4,
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "write.format.default": "parquet",
            "schema.name-mapping.default":
                json.dumps(name_mapping, separators=(",", ":")),
        },
        "current-snapshot-id": SNAPSHOT_ID,
        "refs": {
            "main": {"snapshot-id": SNAPSHOT_ID, "type": "branch"},
        },
        "snapshots": [{
            "snapshot-id": SNAPSHOT_ID,
            "sequence-number": 1,
            "timestamp-ms": TS_MS,
            "summary": {
                "operation": "append",
                "added-data-files": "1",
                "added-records": str(n),
                "total-records": str(n),
                "total-data-files": "1",
            },
            "manifest-list": "file:" + mlist_path,
            "schema-id": 0,
        }],
        "statistics": [],
        "snapshot-log": [
            {"timestamp-ms": TS_MS, "snapshot-id": SNAPSHOT_ID}],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")
    print(f"golden iceberg table written: {table_dir}")
    print(f"  rows={n} sum_trade_id={sum(trade_id)} sum_qty={sum(qty)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "src/test/resources/golden/iceberg_trades")
