#!/usr/bin/env python3
"""Author a Hudi 1.x (table version 8, timeline layout version 2) MOR
table EXACTLY as the public 1.0 layout describes it — an independent
implementation (python stdlib Avro object-container encoder + pyarrow for
the parquet data files) sharing zero code with the Scala engine, so the
1.x read path can be anchored by golden conformance in an environment
where no real Hudi writer is installable offline.

Everything here is transcribed from PUBLIC Hudi knowledge:
  - the 1.0 release's timeline re-design: active timeline moves to
    `.hoodie/timeline/`, completed instants are named
    `<requestTime>_<completionTime>.<action>` (completion time is now
    first-class), and completed commit metadata is serialized as an AVRO
    OBJECT CONTAINER of org.apache.hudi.avro.model.HoodieCommitMetadata
    (the same self-describing `Obj\\x01` serialization Hudi has always
    used for plan files and the archived timeline);
  - hoodie.properties keys: hoodie.table.version=8,
    hoodie.timeline.layout.version=2, hoodie.timeline.path=timeline;
  - HoodieWriteStat's field list, cross-checked against the write-stat
    JSON a REAL Hudi 0.14 writer produced (the hudi_dimCustomer golden's
    commit carries fileId/path/prevCommit/numWrites/numDeletes/... —
    the avro model mirrors it with nullable unions);
  - base-file naming `<fileId>_<writeToken>_<instant>.parquet` (unchanged
    in 1.x).

The table: `hudi_v1_trips`, non-partitioned MERGE_ON_READ, FOUR instants:
  c1 (commit)        adds fileA (60 rows) + fileB (40 rows)
  c2 (commit)        adds fileC (25 rows)
  c3 (replacecommit) clusters fileA+fileC into fileD (85 rows)
  c4 (deltacommit)   appends a log file to fileB (updates trips 61-63)
so the read-optimized live set at head is fileB + fileD (125 rows), a
correct reader must honor partitionToReplaceFileIds decoded from Avro,
and the real-time view must merge the log records (HoodieLogFormat v1
blocks, unchanged in 1.x).

Usage: python3 tools/make_golden_hudi_v1.py [table-dir]
Deterministic: fixed instants/fileIds/sync-markers.
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
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if v is None and bt == "null":
                return zigzag(i)
            if v is not None and bt != "null":
                return zigzag(i) + enc_value(branch, v)
        raise ValueError(f"no union branch for {v!r}")
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
            out += enc_value(f["type"], v.get(f["name"]))
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


# --------------------------------------- hudi commit metadata schemas ---
def _nullable(t):
    return ["null", t]


WRITE_STAT = {
    "type": "record",
    "name": "HoodieWriteStat",
    "namespace": "org.apache.hudi.avro.model",
    "fields": [
        {"name": "fileId", "type": _nullable("string"), "default": None},
        {"name": "path", "type": _nullable("string"), "default": None},
        {"name": "prevCommit", "type": _nullable("string"), "default": None},
        {"name": "numWrites", "type": _nullable("long"), "default": None},
        {"name": "numDeletes", "type": _nullable("long"), "default": None},
        {"name": "numUpdateWrites", "type": _nullable("long"),
         "default": None},
        {"name": "numInserts", "type": _nullable("long"), "default": None},
        {"name": "totalWriteBytes", "type": _nullable("long"),
         "default": None},
        {"name": "totalWriteErrors", "type": _nullable("long"),
         "default": None},
        {"name": "partitionPath", "type": _nullable("string"),
         "default": None},
        {"name": "totalLogRecords", "type": _nullable("long"),
         "default": None},
        {"name": "totalLogFilesCompacted", "type": _nullable("long"),
         "default": None},
        {"name": "totalLogSizeCompacted", "type": _nullable("long"),
         "default": None},
        {"name": "totalUpdatedRecordsCompacted", "type": _nullable("long"),
         "default": None},
        {"name": "totalLogBlocks", "type": _nullable("long"),
         "default": None},
        {"name": "totalCorruptLogBlock", "type": _nullable("long"),
         "default": None},
        {"name": "totalRollbackBlocks", "type": _nullable("long"),
         "default": None},
        {"name": "fileSizeInBytes", "type": _nullable("long"),
         "default": None},
    ],
}

COMMIT_METADATA = {
    "type": "record",
    "name": "HoodieCommitMetadata",
    "namespace": "org.apache.hudi.avro.model",
    "fields": [
        {"name": "partitionToWriteStats",
         "type": _nullable({"type": "map",
                            "values": {"type": "array",
                                       "items": WRITE_STAT}}),
         "default": None},
        {"name": "extraMetadata",
         "type": _nullable({"type": "map", "values": _nullable("string")}),
         "default": None},
        {"name": "version", "type": _nullable("int"), "default": None},
        {"name": "operationType", "type": _nullable("string"),
         "default": None},
        {"name": "compacted", "type": _nullable("boolean"), "default": None},
    ],
}

REPLACE_COMMIT_METADATA = {
    "type": "record",
    "name": "HoodieReplaceCommitMetadata",
    "namespace": "org.apache.hudi.avro.model",
    "fields": COMMIT_METADATA["fields"] + [
        {"name": "partitionToReplaceFileIds",
         "type": _nullable({"type": "map",
                            "values": {"type": "array",
                                       "items": "string"}}),
         "default": None},
    ],
}

TABLE_AVRO_SCHEMA = {
    "type": "record",
    "name": "hudi_v1_trips_record",
    "namespace": "hoodie.hudi_v1_trips",
    "fields": [
        {"name": "trip_id", "type": "long"},
        {"name": "city", "type": "string"},
        {"name": "fare", "type": "double"},
    ],
}

FILE_A = "aaaa1111-0000-4000-8000-000000000001-0"
FILE_B = "bbbb2222-0000-4000-8000-000000000002-0"
FILE_C = "cccc3333-0000-4000-8000-000000000003-0"
FILE_D = "dddd4444-0000-4000-8000-000000000004-0"
C1, C1_DONE = "20240301120000001", "20240301120000555"
C2, C2_DONE = "20240301130000001", "20240301130000444"
C3, C3_DONE = "20240301140000001", "20240301140000333"
C4, C4_DONE = "20240301150000001", "20240301150000222"
C5 = "20240301160000001"                      # FAILED deltacommit
C6, C6_DONE = "20240301170000001", "20240301170000111"  # its rollback


# ------------------------------------------------- hoodie log format ---
def log_header(entries):
    """HoodieLogBlock header/footer map: int count, then per entry
    (int keyOrdinal, int len, utf8). All ints BIG-endian (Java
    DataOutputStream)."""
    out = bytearray(struct.pack(">i", len(entries)))
    for ord_, v in entries:
        b = v.encode("utf-8")
        out += struct.pack(">i", ord_) + struct.pack(">i", len(b)) + b
    return bytes(out)


def log_block(block_type, headers, content):
    """One HoodieLogFormat v1 block: `#HUDI#` magic, i64 sizeOfBlock
    (everything after it, trailing reverse-pointer INCLUDED), i32 format
    version (1), i32 block-type ordinal, header map, i64 content length,
    content, footer map, i64 total-minus-tail reverse pointer — the
    byte layout Hudi 0.14 writes and 1.x still reads."""
    magic = b"#HUDI#"
    hdr = log_header(headers)
    ftr = log_header([])
    size_of_block = 4 + 4 + len(hdr) + 8 + len(content) + len(ftr) + 8
    total_minus_tail = len(magic) + 8 + size_of_block - 8
    out = bytearray()
    out += magic
    out += struct.pack(">q", size_of_block)
    out += struct.pack(">i", 1)            # format version
    out += struct.pack(">i", block_type)   # 3 = AVRO data block
    out += hdr
    out += struct.pack(">q", len(content))
    out += content
    out += ftr
    out += struct.pack(">q", total_minus_tail)
    return bytes(out)


def avro_data_block_content(schema, records):
    """AVRO data block content: [i32 version=3][i32 count]
    [(i32 size, avro-binary record)*], ints big-endian."""
    out = bytearray(struct.pack(">i", 3) + struct.pack(">i", len(records)))
    for r in records:
        b = enc_value(schema, r)
        out += struct.pack(">i", len(b)) + b
    return bytes(out)


def write_stat(file_id, name, rows, size, prev):
    return {
        "fileId": file_id,
        "path": name,
        "prevCommit": prev,
        "numWrites": rows,
        "numDeletes": 0,
        "numUpdateWrites": 0,
        "numInserts": rows,
        "totalWriteBytes": size,
        "totalWriteErrors": 0,
        "partitionPath": "",
        "totalLogRecords": 0,
        "totalLogFilesCompacted": 0,
        "totalLogSizeCompacted": 0,
        "totalUpdatedRecordsCompacted": 0,
        "totalLogBlocks": 0,
        "totalCorruptLogBlock": 0,
        "totalRollbackBlocks": 0,
        "fileSizeInBytes": size,
    }


ROLLBACK_METADATA = {
    "type": "record", "name": "HoodieRollbackMetadata",
    "namespace": "org.apache.hudi.avro.model",
    "fields": [
        {"name": "startRollbackTime", "type": "string"},
        {"name": "timeTakenInMillis", "type": "long"},
        {"name": "totalFilesDeleted", "type": "int"},
        {"name": "commitsRollback",
         "type": {"type": "array", "items": "string"}},
        {"name": "partitionMetadata", "type": {
            "type": "map", "values": {
                "type": "record",
                "name": "HoodieRollbackPartitionMetadata",
                "fields": [
                    {"name": "partitionPath", "type": "string"},
                    {"name": "successDeleteFiles",
                     "type": {"type": "array", "items": "string"}},
                    {"name": "failedDeleteFiles",
                     "type": {"type": "array", "items": "string"}},
                ]}}},
        {"name": "version", "type": ["int", "null"], "default": 1},
        {"name": "instantsRollback", "type": {
            "type": "array", "items": {
                "type": "record", "name": "HoodieInstantInfo",
                "fields": [
                    {"name": "commitTime", "type": "string"},
                    {"name": "action", "type": "string"},
                ]}}, "default": []},
    ],
}


def main(table_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    tl = os.path.join(table_dir, ".hoodie", "timeline")
    os.makedirs(tl)

    props = "\n".join([
        "#Updated at 2024-03-01T12:00:00Z",
        "hoodie.table.name=hudi_v1_trips",
        "hoodie.table.type=MERGE_ON_READ",
        "hoodie.table.version=8",
        "hoodie.timeline.layout.version=2",
        "hoodie.timeline.path=timeline",
        "hoodie.timeline.history.path=history",
        "hoodie.table.recordkey.fields=trip_id",
        "hoodie.datasource.write.hive_style_partitioning=false",
        "hoodie.table.base.file.format=PARQUET",
        "hoodie.populate.meta.fields=true",
    ]) + "\n"
    with open(os.path.join(table_dir, ".hoodie", "hoodie.properties"),
              "w") as f:
        f.write(props)

    meta_fields = [
        ("_hoodie_commit_time", pa.string()),
        ("_hoodie_commit_seqno", pa.string()),
        ("_hoodie_record_key", pa.string()),
        ("_hoodie_partition_path", pa.string()),
        ("_hoodie_file_name", pa.string()),
    ]

    def data_file(file_id, instant, token, ids):
        name = f"{file_id}_{token}_{instant}.parquet"
        path = os.path.join(table_dir, name)
        n = len(ids)
        cols = {
            "_hoodie_commit_time": [instant] * n,
            "_hoodie_commit_seqno": [f"{instant}_0_{i}" for i in range(n)],
            "_hoodie_record_key": [str(i) for i in ids],
            "_hoodie_partition_path": [""] * n,
            "_hoodie_file_name": [name] * n,
            "trip_id": ids,
            "fare": [round(10.0 + (i % 7) * 1.5, 2) for i in ids],
            "city": [["ams", "ber", "cdg"][i % 3] for i in ids],
        }
        schema = pa.schema(meta_fields + [
            ("trip_id", pa.int64()),
            ("fare", pa.float64()),
            ("city", pa.string()),
        ])
        table = pa.table(
            {k: cols[k] for k in schema.names}, schema=schema)
        pq.write_table(table, path)
        return name, os.path.getsize(path)

    a_name, a_size = data_file(FILE_A, C1, "0-10-100", list(range(1, 61)))
    b_name, b_size = data_file(FILE_B, C1, "0-10-101", list(range(61, 101)))
    c_name, c_size = data_file(FILE_C, C2, "0-20-200", list(range(101, 126)))
    d_name, d_size = data_file(
        FILE_D, C3, "0-30-300", list(range(1, 61)) + list(range(101, 126)))

    schema_str = json.dumps(TABLE_AVRO_SCHEMA, separators=(",", ":"))

    def touch(name):
        open(os.path.join(tl, name), "w").close()

    # c1: plain commit, two files
    touch(f"{C1}.commit.requested")
    touch(f"{C1}.commit.inflight")
    write_ocf(
        os.path.join(tl, f"{C1}_{C1_DONE}.commit"), COMMIT_METADATA,
        [{
            "partitionToWriteStats": {
                "": [write_stat(FILE_A, a_name, 60, a_size, "null"),
                     write_stat(FILE_B, b_name, 40, b_size, "null")],
            },
            "extraMetadata": {"schema": schema_str},
            "version": 1,
            "operationType": "INSERT",
            "compacted": False,
        }],
        b"hudi1timelinesyn")

    # c2: plain commit, one file
    touch(f"{C2}.commit.requested")
    touch(f"{C2}.commit.inflight")
    write_ocf(
        os.path.join(tl, f"{C2}_{C2_DONE}.commit"), COMMIT_METADATA,
        [{
            "partitionToWriteStats": {
                "": [write_stat(FILE_C, c_name, 25, c_size, C1)],
            },
            "extraMetadata": {"schema": schema_str},
            "version": 1,
            "operationType": "INSERT",
            "compacted": False,
        }],
        b"hudi1timelinesyn")

    # c3: replacecommit clustering fileA + fileC into fileD
    touch(f"{C3}.replacecommit.requested")
    touch(f"{C3}.replacecommit.inflight")
    write_ocf(
        os.path.join(tl, f"{C3}_{C3_DONE}.replacecommit"),
        REPLACE_COMMIT_METADATA,
        [{
            "partitionToWriteStats": {
                "": [write_stat(FILE_D, d_name, 85, d_size, C2)],
            },
            "partitionToReplaceFileIds": {"": [FILE_A, FILE_C]},
            "extraMetadata": {"schema": schema_str},
            "version": 1,
            "operationType": "CLUSTER",
            "compacted": False,
        }],
        b"hudi1timelinesyn")

    # c4: MOR deltacommit under the 1.x layout — a log file appended to
    # fileB's group (base instant C1), updating trips 61-63. The log is
    # authored in the HoodieLogFormat v1 block layout (unchanged in 1.x),
    # records avro-binary in the block SCHEMA header's field order.
    log_name = f".{FILE_B}_{C1}.log.1_0-1-1"
    log_records = [
        {"trip_id": t, "city": "muc", "fare": 99.5} for t in (61, 62, 63)]
    log_bytes = log_block(
        3,
        [(0, C4), (2, schema_str)],   # INSTANT_TIME=0, SCHEMA=2
        avro_data_block_content(TABLE_AVRO_SCHEMA, log_records))
    with open(os.path.join(table_dir, log_name), "wb") as f:
        f.write(log_bytes)
    log_size = len(log_bytes)
    touch(f"{C4}.deltacommit.requested")
    touch(f"{C4}.deltacommit.inflight")
    dc_stat = write_stat(FILE_B, log_name, 3, log_size, C1)
    dc_stat["numInserts"] = 0
    dc_stat["numUpdateWrites"] = 3
    dc_stat["totalLogRecords"] = 3
    dc_stat["totalLogBlocks"] = 1
    write_ocf(
        os.path.join(tl, f"{C4}_{C4_DONE}.deltacommit"), COMMIT_METADATA,
        [{
            "partitionToWriteStats": {"": [dc_stat]},
            "extraMetadata": {"schema": schema_str},
            "version": 1,
            "operationType": "UPSERT",
            "compacted": False,
        }],
        b"hudi1timelinesyn")

    # c5: a FAILED deltacommit — requested + inflight only, never
    # completed, but its partial base file LANDED on disk (the crash
    # window rollback exists for). c6: the completed ROLLBACK instant
    # retracting c5, 1.x-named, HoodieRollbackMetadata avro body whose
    # failedDeleteFiles still lists the orphan — a reader driven by
    # completed commit metadata must never serve that file.
    e_name, e_size = data_file(
        "eeee5555-0000-4000-8000-000000000005-0", C5, "0-40-400",
        list(range(900, 910)))
    touch(f"{C5}.deltacommit.requested")
    touch(f"{C5}.deltacommit.inflight")
    write_ocf(
        os.path.join(tl, f"{C6}_{C6_DONE}.rollback"), ROLLBACK_METADATA,
        [{
            "startRollbackTime": C6,
            "timeTakenInMillis": 42,
            "totalFilesDeleted": 0,
            "commitsRollback": [C5],
            "partitionMetadata": {"": {
                "partitionPath": "",
                "successDeleteFiles": [],
                "failedDeleteFiles": [e_name],
            }},
            "version": 1,
            "instantsRollback": [
                {"commitTime": C5, "action": "deltacommit"}],
        }],
        b"hudi1timelinesyn")
    touch(f"{C6}.rollback.requested")
    touch(f"{C6}.rollback.inflight")

    with open(os.path.join(table_dir, ".hoodie_partition_metadata"),
              "w") as f:
        f.write(f"#partition metadata\n#{C1}\ncommitTime={C1}\n"
                "partitionDepth=0\n")

    print(f"wrote hudi 1.x golden fixture at {table_dir}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..",
        "src/test/resources/golden/hudi_v1_trips")
    main(os.path.abspath(out))
