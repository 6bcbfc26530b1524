#!/usr/bin/env python3
"""Author a COLUMN-MAPPED Delta table with a RENAME in its history,
exactly as delta-spark's `delta.columnMapping.mode=name` writes it — an
independent implementation (json + pyarrow, zero code shared with the
Scala engine), so the column-mapping read path is anchored by golden
conformance against the dialect a REAL writer produces rather than this
engine's own output.

Everything here is transcribed from the PUBLIC Delta protocol
(github.com/delta-io/delta PROTOCOL.md §Column Mapping):
  - protocol (2, 5) — the minimum legacy versions column mapping needs;
  - each schema field's metadata carries `delta.columnMapping.id` and
    `delta.columnMapping.physicalName` (delta-spark's `col-<uuid>` shape);
  - parquet data files store PHYSICAL column names;
  - `delta.columnMapping.maxColumnId` rides the table configuration;
  - a RENAME COLUMN is a new metaData action with the same physical
    names/ids under a new logical name — the data files never change.

History: v0 creates (id, name, city) + one data file; v1 renames
`name` → `full_name` (pure metaData); v2 adds a second data file AFTER
the rename. A correct reader serves logical names (id, full_name, city)
over both files, resolving physical names in stats and partition values.

Usage: python3 tools/make_golden_delta_mapped.py [table-dir]
Deterministic fixed uuids/timestamps.
"""
import json
import os
import shutil
import sys

PHYS_ID = "col-173f4db0-d1a9-46a6-9b7b-0000000000id"
PHYS_NAME = "col-25aa1e52-c2e5-4c11-8c8f-000000000nam"
PHYS_CITY = "col-39bb2f63-d3f6-5d22-9d9f-00000000city"


def field(logical, phys, fid, typ):
    return {
        "name": logical,
        "type": typ,
        "nullable": True,
        "metadata": {
            "delta.columnMapping.id": fid,
            "delta.columnMapping.physicalName": phys,
        },
    }


def schema_string(name_logical):
    return json.dumps({
        "type": "struct",
        "fields": [
            field("id", PHYS_ID, 1, "long"),
            field(name_logical, PHYS_NAME, 2, "string"),
            field("city", PHYS_CITY, 3, "string"),
        ],
    }, separators=(",", ":"))


def meta_data(name_logical):
    return {
        "metaData": {
            "id": "9e7c18f2-4a31-49a8-8c1e-000000000001",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string(name_logical),
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": "3",
            },
            "createdTime": 1714560000000,
        }
    }


def main(table_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    log = os.path.join(table_dir, "_delta_log")
    os.makedirs(log)

    def data_file(name, ids, names, cities):
        path = os.path.join(table_dir, name)
        table = pa.table({
            PHYS_ID: pa.array(ids, pa.int64()),
            PHYS_NAME: pa.array(names, pa.string()),
            PHYS_CITY: pa.array(cities, pa.string()),
        })
        pq.write_table(table, path)
        return os.path.getsize(path)

    f1 = "part-00000-5d122c9b-wwww-xxxx-yyyy-000000000001-c000.snappy.parquet"
    f2 = "part-00000-6e233dac-wwww-xxxx-yyyy-000000000002-c000.snappy.parquet"
    s1 = data_file(f1, [1, 2, 3], ["ada", "bob", "cyd"],
                   ["ams", "ber", "cdg"])
    s2 = data_file(f2, [4, 5], ["dee", "eli"], ["dub", "eze"])

    def stats(n, id_min, id_max):
        # physical-name-keyed stats, as real column-mapped writers produce
        return json.dumps({
            "numRecords": n,
            "minValues": {PHYS_ID: id_min},
            "maxValues": {PHYS_ID: id_max},
            "nullCount": {PHYS_ID: 0},
        }, separators=(",", ":"))

    def commit(version, actions):
        with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a, separators=(",", ":")) + "\n")

    commit(0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta_data("name"),
        {"add": {
            "path": f1, "partitionValues": {}, "size": s1,
            "modificationTime": 1714560001000, "dataChange": True,
            "stats": stats(3, 1, 3)}},
        {"commitInfo": {"timestamp": 1714560001000, "operation": "WRITE",
                        "operationParameters": {}}},
    ])
    commit(1, [
        meta_data("full_name"),
        {"commitInfo": {"timestamp": 1714560002000,
                        "operation": "RENAME COLUMN",
                        "operationParameters": {
                            "oldColumnPath": "name",
                            "newColumnPath": "full_name"}}},
    ])
    commit(2, [
        {"add": {
            "path": f2, "partitionValues": {}, "size": s2,
            "modificationTime": 1714560003000, "dataChange": True,
            "stats": stats(2, 4, 5)}},
        {"commitInfo": {"timestamp": 1714560003000, "operation": "WRITE",
                        "operationParameters": {}}},
    ])
    print(f"wrote column-mapped delta golden fixture at {table_dir}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/golden/delta_mapped_people")
    main(os.path.abspath(out))
