#!/usr/bin/env python3
"""Author an Iceberg FORMAT-VERSION 3 table with a puffin deletion
vector, exactly as the public spec describes it — an independent
implementation (python stdlib for avro/puffin/roaring/JSON, pyarrow for
the parquet data file) sharing zero code with the Scala engine, so the
fixture anchors v3 conformance where no real v3 writer is installable
offline.

Everything is transcribed from PUBLIC specs:
- Iceberg table spec v3 (https://iceberg.apache.org/spec/): metadata
  next-row-id, deletion vectors as puffin `deletion-vector-v1` blobs,
  data_file fields referenced_data_file (143) / content_offset (144) /
  content_size_in_bytes (145), content=1 DV entries in delete manifests.
- Puffin spec (puffin-spec.md): Magic "PFA1", blobs, footer =
  Magic + FileMetadata JSON + payload-size (int32 LE) + flags + Magic.
- The DV blob frame (spec: Delta-compatible): int32 BE length of
  magic+vector, magic bytes D1 D3 39 64, the 64-bit roaring bitmap in
  the RoaringFormatSpec "portable" layout (count int64 LE, then per
  bitmap: key int32 LE + standard 32-bit serialization), int32 BE CRC-32
  of magic+vector.
- RoaringFormatSpec 32-bit: cookie 12346 (no run containers) int32 LE,
  container count int32 LE, descriptive header (key uint16 LE,
  cardinality-1 uint16 LE per container), offset header (int32 LE per
  container), then array containers as sorted uint16 LE values.

Usage: python3 tools/make_golden_iceberg_v3.py <table-dir>
Deterministic: fixed uuid/timestamps/snapshot-ids/sync markers.
"""
import json
import os
import shutil
import struct
import sys
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from make_golden_iceberg import (  # noqa: E402
    write_ocf, kv_array_schema, MANIFEST_FILE)


# ------------------------------------------------------------- roaring ---
def roaring32_serialize(values):
    """Standard 32-bit roaring portable serialization, array containers
    only (fine for < 4097 values per 16-bit key block)."""
    by_key = {}
    for v in sorted(set(values)):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    out = bytearray()
    out += struct.pack("<i", 12346)       # SERIAL_COOKIE_NO_RUNCONTAINER
    out += struct.pack("<i", n)
    for k in keys:                        # descriptive header
        card = len(by_key[k])
        assert card <= 4096, "array container only"
        out += struct.pack("<HH", k, card - 1)
    start = 4 + 4 + 4 * n + 4 * n
    for k in keys:                        # offset header (cookie 12346)
        out += struct.pack("<i", start)
        start += 2 * len(by_key[k])
    for k in keys:                        # container data
        for lo in by_key[k]:
            out += struct.pack("<H", lo)
    return bytes(out)


def roaring64_portable(positions):
    """64-bit portable: bitmap count int64 LE, then per non-empty bitmap
    ascending: key int32 LE + 32-bit serialization."""
    by_high = {}
    for p in sorted(set(positions)):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<q", len(by_high)))
    for h in sorted(by_high):
        out += struct.pack("<i", h)
        out += roaring32_serialize(by_high[h])
    return bytes(out)


def dv_blob(positions):
    """The deletion-vector-v1 blob frame (Delta-compatible)."""
    payload = bytes([0xD1, 0xD3, 0x39, 0x64]) + roaring64_portable(positions)
    return (struct.pack(">i", len(payload)) + payload +
            struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF))


# -------------------------------------------------------------- puffin ---
PUFFIN_MAGIC = b"PFA1"


def write_puffin(path, snapshot_id, sequence_number, dvs):
    """dvs: list of (referenced_data_file, positions). Returns
    [(offset, length, cardinality)] per blob, footer-exact."""
    blobs = []
    with open(path, "wb") as f:
        f.write(PUFFIN_MAGIC)
        offset = 4
        metas = []
        for ref, positions in dvs:
            frame = dv_blob(positions)
            f.write(frame)
            metas.append({
                "type": "deletion-vector-v1",
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": offset,
                "length": len(frame),
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(len(set(positions))),
                },
            })
            blobs.append((offset, len(frame), len(set(positions))))
            offset += len(frame)
        payload = json.dumps(
            {"blobs": metas, "properties": {"created-by": "golden-gen"}},
            separators=(",", ":")).encode("utf-8")
        f.write(PUFFIN_MAGIC)
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))
        f.write(struct.pack("<i", 0))     # flags: uncompressed footer
        f.write(PUFFIN_MAGIC)
    return blobs


# -------------------------------------------------- v3 manifest schemas ---
# full v3 data_file shape: the v2 optional fields PLUS 143-145 — richer
# than the engine's own DV writer schema, so the fixture also proves
# by-name field resolution against a real writer's wider schema
DATA_FILE_V3 = {
    "type": "record",
    "name": "r2",
    "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition",
         "type": {"type": "record", "name": "r102", "fields": []},
         "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {"name": "column_sizes", "type": kv_array_schema(108, 117, 118, "long"),
         "default": None, "field-id": 108},
        {"name": "value_counts", "type": kv_array_schema(109, 119, 120, "long"),
         "default": None, "field-id": 109},
        {"name": "null_value_counts",
         "type": kv_array_schema(110, 121, 122, "long"),
         "default": None, "field-id": 110},
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
        {"name": "first_row_id", "type": ["null", "long"], "default": None,
         "field-id": 142},
        {"name": "referenced_data_file", "type": ["null", "string"],
         "default": None, "field-id": 143},
        {"name": "content_offset", "type": ["null", "long"],
         "default": None, "field-id": 144},
        {"name": "content_size_in_bytes", "type": ["null", "long"],
         "default": None, "field-id": 145},
    ],
}

MANIFEST_ENTRY_V3 = {
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
        {"name": "data_file", "type": DATA_FILE_V3, "field-id": 2},
    ],
}


# ----------------------------------------------------------------- table ---
SNAP1 = 6100000000000000001
SNAP2 = 6100000000000000002
TS_MS = 1710000000000
UUID = "33333333-4444-5555-6666-777777777777"


def empty_df(**over):
    base = {
        "column_sizes": None, "value_counts": None,
        "null_value_counts": None, "lower_bounds": None,
        "upper_bounds": None, "key_metadata": None, "split_offsets": None,
        "equality_ids": None, "sort_order_id": None, "first_row_id": None,
        "referenced_data_file": None, "content_offset": None,
        "content_size_in_bytes": None,
    }
    base.update(over)
    return base


def main(table_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir = os.path.abspath(table_dir)
    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    data_dir = os.path.join(table_dir, "data")
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)

    # 90 deterministic orders, one sorted data file
    n = 90
    order_id = list(range(1, n + 1))
    amount = [((i * 13) % 700) + 1 for i in range(n)]
    tbl = pa.table({
        "order_id": pa.array(order_id, pa.int64()),
        "amount": pa.array(amount, pa.int32()),
    })
    data_file = os.path.join(
        data_dir, "00000-0-33333333-4444-5555-6666-777777777777-00001.parquet")
    pq.write_table(tbl, data_file, compression="snappy")
    fsize = os.path.getsize(data_file)
    data_uri = "file:" + data_file

    # DV: delete positions ≡ 2 (mod 5) plus the last row
    deleted = sorted({p for p in range(n) if p % 5 == 2} | {n - 1})
    puffin_path = os.path.join(data_dir, "dv-golden-00001.puffin")
    blobs = write_puffin(puffin_path, SNAP2, 2, [(data_uri, deleted)])
    (dv_off, dv_len, dv_card) = blobs[0]
    psize = os.path.getsize(puffin_path)

    kv = lambda pairs: [{"key": k, "value": v} for k, v in pairs]
    data_entry = {
        "status": 1, "snapshot_id": SNAP1,
        "sequence_number": None, "file_sequence_number": None,
        "data_file": empty_df(
            content=0, file_path=data_uri, file_format="PARQUET",
            partition={}, record_count=n, file_size_in_bytes=fsize,
            value_counts=kv([(1, n), (2, n)]),
            null_value_counts=kv([(1, 0), (2, 0)]),
            lower_bounds=kv([(1, struct.pack("<q", 1)),
                             (2, struct.pack("<i", min(amount)))]),
            upper_bounds=kv([(1, struct.pack("<q", n)),
                             (2, struct.pack("<i", max(amount)))]),
            sort_order_id=0, first_row_id=0),
    }
    m1_path = os.path.join(meta_dir, UUID + "-m0.avro")
    write_ocf(m1_path, MANIFEST_ENTRY_V3, [data_entry], b"ICEBERGV3SYNC001")
    m1_len = os.path.getsize(m1_path)

    dv_entry = {
        "status": 1, "snapshot_id": SNAP2,
        "sequence_number": None, "file_sequence_number": None,
        "data_file": empty_df(
            content=1, file_path="file:" + puffin_path,
            file_format="PUFFIN", partition={},
            record_count=dv_card, file_size_in_bytes=psize,
            referenced_data_file=data_uri,
            content_offset=dv_off, content_size_in_bytes=dv_len),
    }
    m2_path = os.path.join(meta_dir, UUID + "-m1-deletes.avro")
    write_ocf(m2_path, MANIFEST_ENTRY_V3, [dv_entry], b"ICEBERGV3SYNC002")
    m2_len = os.path.getsize(m2_path)

    def mf(path, length, content, seq, snap, files, rows):
        return {
            "manifest_path": "file:" + path, "manifest_length": length,
            "partition_spec_id": 0, "content": content,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": snap,
            "added_data_files_count": files,
            "existing_data_files_count": 0, "deleted_data_files_count": 0,
            "added_rows_count": rows, "existing_rows_count": 0,
            "deleted_rows_count": 0, "partitions": [], "key_metadata": None,
        }

    mlist1 = os.path.join(meta_dir, f"snap-{SNAP1}-1-{UUID}.avro")
    write_ocf(mlist1, MANIFEST_FILE,
              [mf(m1_path, m1_len, 0, 1, SNAP1, 1, n)], b"ICEBERGV3SYNC003")
    mlist2 = os.path.join(meta_dir, f"snap-{SNAP2}-1-{UUID}.avro")
    write_ocf(mlist2, MANIFEST_FILE,
              [mf(m1_path, m1_len, 0, 1, SNAP1, 1, n),
               mf(m2_path, m2_len, 1, 2, SNAP2, 1, dv_card)],
              b"ICEBERGV3SYNC004")

    fields = [
        {"id": 1, "name": "order_id", "required": True, "type": "long"},
        {"id": 2, "name": "amount", "required": False, "type": "int"},
        # a field ADDED after the data file was written, with the v3
        # default-value fields (spec: initial-default serves for files
        # that predate the field; write-default governs new writes) —
        # no data file carries it, so every served row must read "emea"
        {"id": 3, "name": "region", "required": False, "type": "string",
         "initial-default": "emea", "write-default": "emea"},
        # a STRUCT-typed added field: spec single-value JSON keys struct
        # defaults by FIELD ID, not name — a reader resolving by name
        # would misread or drop them
        {"id": 4, "name": "audit", "required": False,
         "type": {"type": "struct", "fields": [
             {"id": 5, "name": "source", "required": False,
              "type": "string"},
             {"id": 6, "name": "score", "required": False,
              "type": "int"}]},
         "initial-default": {"5": "import", "6": 7},
         "write-default": {"5": "import", "6": 7}},
        # decimal default: spec serializes as a JSON STRING with the
        # exact scale
        {"id": 7, "name": "fee", "required": False,
         "type": "decimal(9, 2)",
         "initial-default": "14.20", "write-default": "14.20"},
    ]
    metadata = {
        "format-version": 3,
        "table-uuid": UUID,
        "location": "file:" + table_dir,
        "last-sequence-number": 2,
        "last-updated-ms": TS_MS + 1000,
        "last-column-id": 7,
        "next-row-id": n,
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": SNAP2,
        "refs": {"main": {"snapshot-id": SNAP2, "type": "branch"}},
        "snapshots": [
            {"snapshot-id": SNAP1, "sequence-number": 1,
             "timestamp-ms": TS_MS, "first-row-id": 0,
             "summary": {"operation": "append", "added-records": str(n)},
             "manifest-list": "file:" + mlist1, "schema-id": 0},
            {"snapshot-id": SNAP2, "sequence-number": 2,
             "parent-snapshot-id": SNAP1,
             "timestamp-ms": TS_MS + 1000, "first-row-id": n,
             "summary": {"operation": "delete",
                         "deleted-records": str(dv_card)},
             "manifest-list": "file:" + mlist2, "schema-id": 0},
        ],
        "statistics": [],
        "snapshot-log": [
            {"timestamp-ms": TS_MS, "snapshot-id": SNAP1},
            {"timestamp-ms": TS_MS + 1000, "snapshot-id": SNAP2}],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")

    survivors = [order_id[p] for p in range(n) if p not in set(deleted)]
    surv_amount = [amount[p] for p in range(n) if p not in set(deleted)]
    print(f"golden iceberg v3 table written: {table_dir}")
    print(f"  rows={n} deleted={len(deleted)} served={len(survivors)}")
    print(f"  sum_order_id={sum(survivors)} sum_amount={sum(surv_amount)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "src/test/resources/golden/iceberg_v3_dv")
