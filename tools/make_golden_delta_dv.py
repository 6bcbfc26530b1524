#!/usr/bin/env python3
"""Author a Delta table with DELETION VECTORS exactly as delta-spark
writes them — an independent implementation (json/struct/zlib + pyarrow,
zero code shared with the Scala engine), so the DV read path is anchored
by golden conformance against the dialect a REAL writer produces rather
than this engine's own output.

Everything here is transcribed from the PUBLIC Delta protocol
(github.com/delta-io/delta PROTOCOL.md §Deletion Vectors):
  - protocol (3, 7) with readerFeatures/writerFeatures
    ["deletionVectors"];
  - the DV descriptor on `add`: storageType "u" (pathOrInlineDv =
    z85-encoded 16-byte uuid naming `deletion_vector_<uuid>.bin`) or
    "i" (pathOrInlineDv = z85 of the payload itself);
  - the DV file layout: format-version byte 1, then at the descriptor's
    offset an int32 BE dataSize, the payload, and an int32 BE CRC-32 of
    the payload;
  - the payload: int32 LE magic 1681511377, then the 64-bit roaring
    bitmap in the RoaringFormatSpec "portable" layout (count int64 LE,
    per non-empty bitmap ascending: key int32 LE + standard 32-bit
    serialization) — delta-spark's RoaringBitmapArray portable format;
  - a DV "rewrite" commit: add(path, deletionVector) + remove(path) in
    one version.

History: v0 creates (id, score) + two data files; v1 masks positions of
f1 via an on-disk "u" DV and positions of f2 via an INLINE "i" DV.

Usage: python3 tools/make_golden_delta_dv.py [table-dir]
Deterministic fixed uuid/timestamps.
"""
import json
import os
import shutil
import struct
import sys
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from make_golden_iceberg_v3 import roaring64_portable  # noqa: E402

Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
       "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")


def z85_encode(b: bytes) -> str:
    assert len(b) % 4 == 0
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def dv_payload(positions):
    return struct.pack("<i", 1681511377) + roaring64_portable(positions)


DV_UUID = bytes(range(16))  # 000102...0e0f — deterministic


def main(table_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir = os.path.abspath(table_dir)
    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir)

    n = 100
    ids = list(range(1, n + 1))
    scores = [((i * 11) % 90) + 1 for i in range(n)]
    half = n // 2

    def write_file(name, lo, hi):
        tbl = pa.table({
            "id": pa.array(ids[lo:hi], pa.int64()),
            "score": pa.array(scores[lo:hi], pa.int32()),
        })
        p = os.path.join(table_dir, name)
        pq.write_table(tbl, p, compression="snappy")
        return os.path.getsize(p)

    s1 = write_file("f1.parquet", 0, half)
    s2 = write_file("f2.parquet", half, n)

    # ---- DV #1: on-disk ("u") for f1 — positions ≡ 0 (mod 3)
    del1 = [p for p in range(half) if p % 3 == 0]
    payload1 = dv_payload(del1)
    uuid_str = "000102030405060708090a0b0c0d0e0f"
    uuid_fmt = (f"{uuid_str[0:8]}-{uuid_str[8:12]}-{uuid_str[12:16]}-"
                f"{uuid_str[16:20]}-{uuid_str[20:32]}")
    dv_file = os.path.join(table_dir, f"deletion_vector_{uuid_fmt}.bin")
    with open(dv_file, "wb") as f:
        f.write(b"\x01")                          # format version
        f.write(struct.pack(">i", len(payload1)))  # dataSize, BE
        f.write(payload1)
        f.write(struct.pack(">I", zlib.crc32(payload1) & 0xFFFFFFFF))
    dv1 = {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(DV_UUID),
        "offset": 1,
        "sizeInBytes": len(payload1),
        "cardinality": len(del1),
    }

    # ---- DV #2: INLINE ("i") for f2 — positions 1 and 47
    del2 = [1, 47]
    payload2 = dv_payload(del2)
    pad = (-len(payload2)) % 4
    dv2 = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(payload2 + b"\x00" * pad),
        "sizeInBytes": len(payload2),
        "cardinality": len(del2),
    }

    schema = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "score", "type": "integer", "nullable": True,
         "metadata": {}},
    ]}, separators=(",", ":"))

    def add(path, size, ts, dv=None):
        a = {"path": path, "partitionValues": {}, "size": size,
             "modificationTime": ts, "dataChange": True}
        if dv:
            a["deletionVector"] = dv
        return {"add": a}

    v0 = [
        {"commitInfo": {"timestamp": 1712000000000,
                        "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "44444444-5555-6666-7777-888888888888",
                      "name": "people", "format": {
                          "provider": "parquet", "options": {}},
                      "schemaString": schema, "partitionColumns": [],
                      "configuration": {
                          "delta.enableDeletionVectors": "true"},
                      "createdTime": 1712000000000}},
        add("f1.parquet", s1, 1712000000000),
        add("f2.parquet", s2, 1712000000000),
    ]
    v1 = [
        {"commitInfo": {"timestamp": 1712000001000,
                        "operation": "DELETE"}},
        add("f1.parquet", s1, 1712000001000, dv1),
        {"remove": {"path": "f1.parquet",
                    "deletionTimestamp": 1712000001000,
                    "dataChange": True, "extendedFileMetadata": True,
                    "partitionValues": {}, "size": s1}},
        add("f2.parquet", s2, 1712000001000, dv2),
        {"remove": {"path": "f2.parquet",
                    "deletionTimestamp": 1712000001000,
                    "dataChange": True, "extendedFileMetadata": True,
                    "partitionValues": {}, "size": s2}},
    ]
    for v, actions in enumerate([v0, v1]):
        with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a, separators=(",", ":")) + "\n")

    live1 = [(ids[p], scores[p]) for p in range(half)
             if p % 3 != 0]
    live2 = [(ids[half + p], scores[half + p]) for p in range(half)
             if p not in set(del2)]
    live = live1 + live2
    print(f"golden delta DV table written: {table_dir}")
    print(f"  rows={n} deleted={len(del1) + len(del2)} served={len(live)}")
    print(f"  sum_id={sum(r[0] for r in live)} "
          f"sum_score={sum(r[1] for r in live)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "src/test/resources/golden/delta_dv_people")
