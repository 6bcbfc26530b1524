#!/usr/bin/env python3
"""Author an EVOLVED Iceberg v2 table exactly as real Iceberg leaves one
after schema + partition-spec evolution — the layout the engine's
current-id selection and per-manifest spec handling must read:

  schema 0 (trade_id, symbol, qty, price)        -> schema 1 (+ venue)
  spec   0 (identity symbol, field-id 1000)      -> spec 1 (identity venue, 1001)
  snapshot 1: file A under spec 0 / schema 0
  snapshot 2: carries manifest A (partition_spec_id 0) + manifest B with
              file B under spec 1 / schema 1

Real-writer conventions preserved deliberately: the HISTORICAL schema and
spec come FIRST in the metadata arrays with the current ones appended
LAST (a reader that takes element [0] serves the wrong schema), partition
field ids are unique across specs (1000 then 1001), last-partition-id is
the max across ALL specs, and each manifest's r102 partition struct is
typed by ITS OWN spec. All avro/JSON shapes are transcribed from the
PUBLIC Iceberg spec via the sibling tool's helpers (zero code shared with
the Scala engine).

Usage: python3 tools/make_golden_iceberg_evolved.py <table-dir>
"""
import copy
import json
import os
import shutil
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import make_golden_iceberg as base


SNAP1 = 5100258362197584001
SNAP2 = 5100258362197584002
TS1 = 1700000100000
TS2 = 1700000200000
UUID = "22222222-3333-4444-5555-666666666666"


def entry_schema_with_partition(pname: str, pid: int) -> dict:
    s = copy.deepcopy(base.MANIFEST_ENTRY)
    df = next(f for f in s["fields"] if f["name"] == "data_file")
    part = next(f for f in df["type"]["fields"] if f["name"] == "partition")
    part["type"]["fields"] = [
        {"name": pname, "type": ["null", "string"], "default": None,
         "field-id": pid},
    ]
    return s


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

    def b_long(v):
        return struct.pack("<q", v)

    kv = lambda pairs: [{"key": k, "value": v} for k, v in pairs]

    # ---- file A: 40 rows, all symbol AAA, schema 0, spec 0 -------------
    na = 40
    a_ids = list(range(1, na + 1))
    tbl_a = pa.table({
        "trade_id": pa.array(a_ids, pa.int64()),
        "symbol": pa.array(["AAA"] * na, pa.string()),
        "qty": pa.array([(i * 3) % 50 + 1 for i in range(na)], pa.int32()),
        "price": pa.array([10.0 + i * 0.5 for i in range(na)], pa.float64()),
    })
    file_a = os.path.join(data_dir, "00000-0-" + UUID + "-00001.parquet")
    pq.write_table(tbl_a, file_a, compression="snappy")

    # ---- file B: 40 rows, schema 1 (venue), spec 1 ---------------------
    nb = 40
    b_ids = list(range(na + 1, na + nb + 1))
    symbols = ["AAA", "BBB", "CCC", "DDD"]
    tbl_b = pa.table({
        "trade_id": pa.array(b_ids, pa.int64()),
        "symbol": pa.array([symbols[i % 4] for i in range(nb)], pa.string()),
        "qty": pa.array([(i * 5) % 60 + 1 for i in range(nb)], pa.int32()),
        "price": pa.array([20.0 + i * 0.25 for i in range(nb)], pa.float64()),
        "venue": pa.array(["X"] * nb, pa.string()),
    })
    file_b = os.path.join(data_dir, "00000-0-" + UUID + "-00002.parquet")
    pq.write_table(tbl_b, file_b, compression="snappy")

    def data_file(path, n, ids, part_name, part_value):
        return {
            "content": 0,
            "file_path": "file:" + path,
            "file_format": "PARQUET",
            "partition": {part_name: part_value},
            "record_count": n,
            "file_size_in_bytes": os.path.getsize(path),
            "column_sizes": None,
            "value_counts": kv([(1, n)]),
            "null_value_counts": kv([(1, 0)]),
            "nan_value_counts": None,
            "lower_bounds": kv([(1, b_long(min(ids)))]),
            "upper_bounds": kv([(1, b_long(max(ids)))]),
            "key_metadata": None,
            "split_offsets": [4],
            "equality_ids": None,
            "sort_order_id": 0,
        }

    # manifest A (spec 0: identity symbol)
    schema_a = entry_schema_with_partition("symbol", 1000)
    man_a = os.path.join(meta_dir, UUID + "-m0.avro")
    base.write_ocf(man_a, schema_a, [{
        "status": 1, "snapshot_id": SNAP1,
        "sequence_number": None, "file_sequence_number": None,
        "data_file": data_file(file_a, na, a_ids, "symbol", "AAA"),
    }], b"ICEBERGEVOLVE001")

    # manifest B (spec 1: identity venue)
    schema_b = entry_schema_with_partition("venue", 1001)
    man_b = os.path.join(meta_dir, UUID + "-m1.avro")
    base.write_ocf(man_b, schema_b, [{
        "status": 1, "snapshot_id": SNAP2,
        "sequence_number": None, "file_sequence_number": None,
        "data_file": data_file(file_b, nb, b_ids, "venue", "X"),
    }], b"ICEBERGEVOLVE002")

    def mf(path, spec_id, seq, snap, added, rows, existing=0, erows=0):
        return {
            "manifest_path": "file:" + path,
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": spec_id,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snap,
            "added_data_files_count": added,
            "existing_data_files_count": existing,
            "deleted_data_files_count": 0,
            "added_rows_count": rows,
            "existing_rows_count": erows,
            "deleted_rows_count": 0,
            "partitions": None,
            "key_metadata": None,
        }

    mlist1 = os.path.join(meta_dir, f"snap-{SNAP1}-1-{UUID}.avro")
    base.write_ocf(mlist1, base.MANIFEST_FILE,
                   [mf(man_a, 0, 1, SNAP1, 1, na)], b"ICEBERGEVOLVE003")
    mlist2 = os.path.join(meta_dir, f"snap-{SNAP2}-1-{UUID}.avro")
    base.write_ocf(mlist2, base.MANIFEST_FILE, [
        mf(man_a, 0, 1, SNAP1, 1, na),
        mf(man_b, 1, 2, SNAP2, 1, nb),
    ], b"ICEBERGEVOLVE004")

    fields0 = [
        {"id": 1, "name": "trade_id", "required": True, "type": "long"},
        {"id": 2, "name": "symbol", "required": False, "type": "string"},
        {"id": 3, "name": "qty", "required": False, "type": "int"},
        {"id": 4, "name": "price", "required": False, "type": "double"},
    ]
    fields1 = fields0 + [
        {"id": 5, "name": "venue", "required": False, "type": "string"},
    ]
    name_mapping = [
        {"field-id": f["id"], "names": [f["name"]]} for f in fields1
    ]
    metadata = {
        "format-version": 2,
        "table-uuid": UUID,
        "location": "file:" + table_dir,
        "last-sequence-number": 2,
        "last-updated-ms": TS2,
        "last-column-id": 5,
        # historical FIRST, current LAST — real writers append
        "current-schema-id": 1,
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": fields0},
            {"type": "struct", "schema-id": 1, "fields": fields1},
        ],
        "default-spec-id": 1,
        "partition-specs": [
            {"spec-id": 0, "fields": [
                {"name": "symbol", "transform": "identity",
                 "source-id": 2, "field-id": 1000}]},
            {"spec-id": 1, "fields": [
                {"name": "venue", "transform": "identity",
                 "source-id": 5, "field-id": 1001}]},
        ],
        "last-partition-id": 1001,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "write.format.default": "parquet",
            "schema.name-mapping.default":
                json.dumps(name_mapping, separators=(",", ":")),
        },
        "current-snapshot-id": SNAP2,
        "refs": {"main": {"snapshot-id": SNAP2, "type": "branch"}},
        "snapshots": [
            {"snapshot-id": SNAP1, "sequence-number": 1,
             "timestamp-ms": TS1,
             "summary": {"operation": "append"},
             "manifest-list": "file:" + mlist1, "schema-id": 0},
            {"snapshot-id": SNAP2, "sequence-number": 2,
             "timestamp-ms": TS2, "parent-snapshot-id": SNAP1,
             "summary": {"operation": "append"},
             "manifest-list": "file:" + mlist2, "schema-id": 1},
        ],
        "statistics": [],
        "snapshot-log": [
            {"timestamp-ms": TS1, "snapshot-id": SNAP1},
            {"timestamp-ms": TS2, "snapshot-id": SNAP2},
        ],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("2")
    print(f"golden EVOLVED iceberg table written: {table_dir}")
    print(f"  rows={na + nb} sum_trade_id={sum(a_ids) + sum(b_ids)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "src/test/resources/golden/iceberg_trades_evolved")
