#!/usr/bin/env python3
"""Compare two bench detail recordings (sidecar JSON with per-query
medians and, since r14, a `calibration` key).

Usage: python3 tools/bench_compare.py BENCH_rA_local.json BENCH_rB_local.json

Prints: shared-gate totals (raw and canary-normalized when both sides
carry calibration), per-family ratios, and the worst movers. The canary
normalization divides each side's totals by its spark_agg_50m probe so
host-speed differences stop masquerading as plan regressions
(r11-r13 carried that attribution by argument; now it is measured).

Developer tooling only — driver-side python.
"""
import json
import sys
from collections import defaultdict


def family(name: str) -> str:
    for p in ("q", "dedup", "ann", "text", "multimodal", "pipeline",
              "sync", "delta", "iceberg", "hudi", "paimon", "streaming",
              "sql", "time_travel", "meta", "catalog", "mv", "bloom",
              "events", "graft", "avro"):
        if name.startswith(p):
            return p
    return "other"


def main(a_path: str, b_path: str) -> None:
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    only_b = sorted(set(qb) - set(qa))
    ta = sum(qa[k] for k in shared)
    tb = sum(qb[k] for k in shared)
    print(f"shared gates: {len(shared)}  new in B: {len(only_b)} "
          f"({', '.join(only_b) if len(only_b) <= 8 else len(only_b)})")
    print(f"raw shared totals: A={ta:.1f}s B={tb:.1f}s  B/A={tb/ta:.3f}x")
    ca = a.get("calibration") or {}
    cb = b.get("calibration") or {}
    if ca.get("spark_agg_50m") and cb.get("spark_agg_50m"):
        host = cb["spark_agg_50m"] / ca["spark_agg_50m"]
        jvm = (cb.get("jvm_xorshift_200m", 0) /
               ca.get("jvm_xorshift_200m", 1)) if ca.get(
                   "jvm_xorshift_200m") else float("nan")
        print(f"canary: spark {ca['spark_agg_50m']:.3f}->"
              f"{cb['spark_agg_50m']:.3f} ({host:.2f}x), "
              f"jvm {ca.get('jvm_xorshift_200m', float('nan')):.3f}->"
              f"{cb.get('jvm_xorshift_200m', float('nan')):.3f} "
              f"({jvm:.2f}x)")
        print(f"canary-normalized B/A: {tb / ta / host:.3f}x "
              "(spark-probe normalization)")
    else:
        print("calibration: absent on one side — raw comparison only")
    fams = defaultdict(lambda: [0.0, 0.0])
    for k in shared:
        f = family(k)
        fams[f][0] += qa[k]
        fams[f][1] += qb[k]
    print("\nper-family (A_s, B_s, B/A):")
    for f in sorted(fams, key=lambda f: -fams[f][1]):
        fa, fb = fams[f]
        print(f"  {f:12s} {fa:7.1f} {fb:7.1f}  {fb / fa:.2f}x")
    movers = sorted(shared, key=lambda k: -(qb[k] / max(qa[k], 1e-9)))
    print("\nworst movers (B/A, B>0.3s):")
    for k in [m for m in movers if qb[m] > 0.3][:10]:
        print(f"  {k:32s} {qa[k]:6.2f} -> {qb[k]:6.2f}  "
              f"{qb[k] / max(qa[k], 1e-9):.2f}x")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
