#!/usr/bin/env python3
"""Author an EVOLVED Paimon table — a schema-0 → schema-1 chain with data
files written under BOTH schemas — mirroring what real Paimon leaves on
disk after `ALTER TABLE ... ADD COLUMN`. Independent implementation
(python stdlib Avro encoder + pyarrow), zero code shared with the Scala
engine; the real-JSON planes (schema-N, snapshot-N) follow the public
Paimon layout, the avro manifest plane follows the engine's documented
dialect (see make_golden_paimon.py's provenance note).

History:
  schema-0: (order_id BIGINT NOT NULL, region STRING, amount DOUBLE)
  snapshot-1 (schemaId 0): file1, 50 rows — NO `channel` column on disk
  schema-1: adds `channel STRING` (field id 3, highestFieldId 3)
  snapshot-2 (schemaId 1): file2, 30 rows — carries `channel`

A correct reader serves snapshot-2 under schema-1 with file1's missing
`channel` as NULL, and snapshot-1 (time travel) under schema-0 WITHOUT
the column — the snapshot's own schemaId decides, never the latest.

Usage: python3 tools/make_golden_paimon_evolved.py [table-dir]
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_golden_paimon import (  # noqa: E402
    zigzag, enc_str, enc_map, write_ocf, ENTRY_SCHEMA, LIST_SCHEMA)

TS_MS = 1700000100000


def main(table_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir = os.path.abspath(table_dir)
    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    for d in ("schema", "snapshot", "manifest", "bucket-0"):
        os.makedirs(os.path.join(table_dir, d))

    # ---- data files --------------------------------------------------
    n1, n2 = 50, 30
    f1_ids = list(range(1, n1 + 1))
    f2_ids = list(range(101, 101 + n2))
    tbl1 = pa.table({
        "order_id": pa.array(f1_ids, pa.int64()),
        "region": pa.array([["EU", "US"][i % 2] for i in range(n1)],
                           pa.string()),
        "amount": pa.array([round(i * 1.5, 2) for i in range(n1)],
                           pa.float64()),
    })
    tbl2 = pa.table({
        "order_id": pa.array(f2_ids, pa.int64()),
        "region": pa.array(["APAC"] * n2, pa.string()),
        "amount": pa.array([round(i * 2.5, 2) for i in range(n2)],
                           pa.float64()),
        "channel": pa.array([["web", "app"][i % 2] for i in range(n2)],
                            pa.string()),
    })
    d1 = "bucket-0/data-evo00001-aaaa-bbbb-cccc-000000000001-0.parquet"
    d2 = "bucket-0/data-evo00002-aaaa-bbbb-cccc-000000000002-0.parquet"
    pq.write_table(tbl1, os.path.join(table_dir, d1), compression="snappy")
    pq.write_table(tbl2, os.path.join(table_dir, d2), compression="snappy")
    s1 = os.path.getsize(os.path.join(table_dir, d1))
    s2 = os.path.getsize(os.path.join(table_dir, d2))

    # ---- schema chain ------------------------------------------------
    fields0 = [
        {"id": 0, "name": "order_id", "type": "BIGINT NOT NULL"},
        {"id": 1, "name": "region", "type": "STRING"},
        {"id": 2, "name": "amount", "type": "DOUBLE"},
    ]
    fields1 = fields0 + [{"id": 3, "name": "channel", "type": "STRING"}]
    for sid, fields, hi, ts in ((0, fields0, 2, TS_MS),
                                (1, fields1, 3, TS_MS + 1000)):
        with open(os.path.join(table_dir, "schema", f"schema-{sid}"),
                  "w") as f:
            json.dump({
                "version": 3, "id": sid, "fields": fields,
                "highestFieldId": hi, "partitionKeys": [],
                "primaryKeys": [],
                "options": {"file.format": "parquet", "bucket": "1"},
                "timeMillis": ts,
            }, f, indent=2)

    # ---- manifests ---------------------------------------------------
    def enc_entry(name, size, rows, mins, maxs, nulls):
        out = bytearray()
        out += zigzag(0)                       # kind ADD
        out += enc_map({}, enc_str)            # partition
        out += zigzag(0)                       # bucket
        out += enc_str(name)
        out += zigzag(size)
        out += zigzag(rows)
        out += enc_map(mins, enc_str)
        out += enc_map(maxs, enc_str)
        out += enc_map(nulls, lambda v: zigzag(v))
        out += zigzag(TS_MS)
        return bytes(out)

    m1 = "manifest-evo00001-aaaa-bbbb-cccc-000000000001-0"
    m2 = "manifest-evo00002-aaaa-bbbb-cccc-000000000002-0"
    write_ocf(os.path.join(table_dir, "manifest", m1), ENTRY_SCHEMA,
              [enc_entry(d1, s1, n1,
                         {"order_id": "1"}, {"order_id": str(n1)},
                         {"order_id": 0})],
              b"PAIMONEVOLVED001")
    write_ocf(os.path.join(table_dir, "manifest", m2), ENTRY_SCHEMA,
              [enc_entry(d2, s2, n2,
                         {"order_id": "101"}, {"order_id": "130"},
                         {"order_id": 0, "channel": 0})],
              b"PAIMONEVOLVED002")
    m1_len = os.path.getsize(os.path.join(table_dir, "manifest", m1))
    m2_len = os.path.getsize(os.path.join(table_dir, "manifest", m2))

    def enc_list_entry(name, size):
        return enc_str(name) + zigzag(size)

    lists = {
        "manifest-list-evo-base-1": [],
        "manifest-list-evo-delta-1": [(m1, m1_len)],
        "manifest-list-evo-base-2": [(m1, m1_len)],
        "manifest-list-evo-delta-2": [(m2, m2_len)],
    }
    for i, (name, entries) in enumerate(lists.items()):
        write_ocf(os.path.join(table_dir, "manifest", name), LIST_SCHEMA,
                  [enc_list_entry(n, s) for n, s in entries],
                  b"PAIMONEVOLVEDL%02d" % i)

    # ---- snapshots ---------------------------------------------------
    def snapshot(sid, schema_id, base, delta, total, delta_rows, ident):
        with open(os.path.join(table_dir, "snapshot", f"snapshot-{sid}"),
                  "w") as f:
            json.dump({
                "version": 3, "id": sid, "schemaId": schema_id,
                "baseManifestList": base, "deltaManifestList": delta,
                "changelogManifestList": None,
                "commitUser": "evo-user", "commitIdentifier": ident,
                "commitKind": "APPEND", "timeMillis": TS_MS + sid * 1000,
                "logOffsets": {}, "totalRecordCount": total,
                "deltaRecordCount": delta_rows, "changelogRecordCount": 0,
                "watermark": -9223372036854775808,
            }, f, indent=2)

    snapshot(1, 0, "manifest-list-evo-base-1", "manifest-list-evo-delta-1",
             n1, n1, 1)
    snapshot(2, 1, "manifest-list-evo-base-2", "manifest-list-evo-delta-2",
             n1 + n2, n2, 2)
    with open(os.path.join(table_dir, "snapshot", "LATEST"), "w") as f:
        f.write("2")
    with open(os.path.join(table_dir, "snapshot", "EARLIEST"), "w") as f:
        f.write("1")
    print(f"golden evolved paimon table written: {table_dir}")
    print(f"  rows={n1 + n2} sum_order_id={sum(f1_ids) + sum(f2_ids)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "src/test/resources/golden/paimon_orders_evolved")
