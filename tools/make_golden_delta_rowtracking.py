#!/usr/bin/env python3
"""Author a Delta table with ROW TRACKING exactly as a real writer
shapes it — an independent implementation (json + pyarrow, zero code
shared with the Scala engine), so graft's row-tracking read/write planes
are anchored by golden conformance against the PUBLIC protocol dialect
(github.com/delta-io/delta PROTOCOL.md §Row Tracking, §Domain Metadata)
rather than the engine's own output.

Shapes transcribed from the public protocol:
  - protocol minReaderVersion 1 / minWriterVersion 7 with writerFeatures
    ["domainMetadata", "rowTracking"] — rowTracking is WRITER-ONLY, the
    reader side never lists it;
  - metaData configuration: delta.enableRowTracking=true plus the two
    materialized column-name properties (random-suffixed physical names
    delta-spark generates at enablement);
  - every `add` carries `baseRowId` and `defaultRowCommitVersion`; a
    row's id defaults to baseRowId + position, its commit version to
    defaultRowCommitVersion;
  - the `domainMetadata` action for domain "delta.rowTracking" whose
    configuration is a JSON STRING {"rowIdHighWaterMark": N}, advanced
    in every id-assigning commit;
  - an OPTIMIZE-style rewrite (v1) whose replacement file MATERIALIZES
    the rewritten rows' ids and original commit versions into the two
    physical columns (absent from the logical schema), with a fresh
    baseRowId on the new add — served ids must be unchanged.

History:
  v0: create (k long, v string); files A (k 0..24, baseRowId 0) and
      B (k 25..49, baseRowId 25); hwm 49.
  v1: rewrite A -> A2 (dataChange false): rows reordered DESCENDING by k
      (so position-derived ids would be WRONG — only the materialized
      column serves them), materialized ids 0..24 ride along, fresh
      baseRowId 50; hwm 74.

Expected served lineage: k in 0..24 -> _row_id k (materialized),
_row_commit_version 0 (materialized); k in 25..49 -> _row_id k
(baseRowId 25 + position), version 0.

Usage: python3 tools/make_golden_delta_rowtracking.py [table-dir]
Deterministic fixed names/timestamps.
"""
import json
import os
import shutil
import sys

TS = 1709294400000
RID_COL = "_row-id-col-770cf5a5-8c36-4b37-9a1b-05e0c2a64e1a"
RCV_COL = "_row-commit-version-col-de57bc0b-2f70-4c13-8b24-1e8a0f1d3c55"


def write_commit(log_dir, version, lines):
    path = os.path.join(log_dir, "%020d.json" % version)
    with open(path, "w") as f:
        for line in lines:
            f.write(json.dumps(line, separators=(",", ":")) + "\n")


def stats(n, kmin, kmax):
    return json.dumps({
        "numRecords": n,
        "minValues": {"k": kmin},
        "maxValues": {"k": kmax},
        "nullCount": {"k": 0, "v": 0},
    }, separators=(",", ":"))


def main(table_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir)

    def data_file(name, ks, materialized=None):
        cols = {
            "k": pa.array(ks, pa.int64()),
            "v": pa.array(["row-%d" % k for k in ks], pa.string()),
        }
        if materialized is not None:
            rids, rcvs = materialized
            cols[RID_COL] = pa.array(rids, pa.int64())
            cols[RCV_COL] = pa.array(rcvs, pa.int64())
        path = os.path.join(table_dir, name)
        pq.write_table(pa.table(cols), path)
        return os.path.getsize(path)

    a_size = data_file("part-00000-a.parquet", list(range(0, 25)))
    b_size = data_file("part-00001-b.parquet", list(range(25, 50)))
    # A2: DESCENDING row order — a reader deriving ids from baseRowId +
    # position would swap every id; only the materialized column is right
    a2_ks = list(range(24, -1, -1))
    a2_size = data_file("part-00002-a2.parquet", a2_ks,
                        materialized=(a2_ks, [0] * 25))

    schema_string = json.dumps({
        "type": "struct", "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {}},
        ]}, separators=(",", ":"))

    write_commit(log_dir, 0, [
        {"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["domainMetadata", "rowTracking"]}},
        {"metaData": {
            "id": "9c5c4a5d-2222-4444-8888-0a0b0c0d0e0f",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {
                "delta.enableRowTracking": "true",
                "delta.rowTracking.materializedRowIdColumnName": RID_COL,
                "delta.rowTracking.materializedRowCommitVersionColumnName":
                    RCV_COL,
            },
            "createdTime": TS}},
        {"add": {
            "path": "part-00000-a.parquet", "partitionValues": {},
            "size": a_size, "modificationTime": TS, "dataChange": True,
            "stats": stats(25, 0, 24),
            "baseRowId": 0, "defaultRowCommitVersion": 0}},
        {"add": {
            "path": "part-00001-b.parquet", "partitionValues": {},
            "size": b_size, "modificationTime": TS, "dataChange": True,
            "stats": stats(25, 25, 49),
            "baseRowId": 25, "defaultRowCommitVersion": 0}},
        {"domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps(
                {"rowIdHighWaterMark": 49}, separators=(",", ":")),
            "removed": False}},
        {"commitInfo": {"timestamp": TS, "operation": "WRITE",
                        "operationParameters": {}}},
    ])

    write_commit(log_dir, 1, [
        {"add": {
            "path": "part-00002-a2.parquet", "partitionValues": {},
            "size": a2_size, "modificationTime": TS + 1000,
            "dataChange": False,
            "stats": stats(25, 0, 24),
            "baseRowId": 50, "defaultRowCommitVersion": 1}},
        {"remove": {
            "path": "part-00000-a.parquet",
            "deletionTimestamp": TS + 1000, "dataChange": False}},
        {"domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps(
                {"rowIdHighWaterMark": 74}, separators=(",", ":")),
            "removed": False}},
        {"commitInfo": {"timestamp": TS + 1000, "operation": "OPTIMIZE",
                        "operationParameters": {}}},
    ])

    print("golden delta row-tracking table written:", table_dir)
    print("  50 rows; ids 0..49 invariant; A2 reordered+materialized")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "src/test/resources/golden/delta_rowtracking")
    main(os.path.abspath(out))
