#!/usr/bin/env python3
"""Summarize a completed scale ladder: one row per rung from
/root/scale/r13_bench_*.json (or any prefix via argv[1]), with the
judge-relevant op columns and growth factors, plus a comparison column
from the r11 ladder files when present.

Usage: python3 tools/ladder_report.py [prefix]   (default r13)
"""
import json, sys, os

prefix = sys.argv[1] if len(sys.argv) > 1 else "r13"
RUNGS = ["1x", "10x", "30x", "100x", "300x"]
COLS = [
    "ann_dedup_pair_stats", "ann_dedup_reps", "semantic_dedup_reps",
    "dedup_containment_pairs", "dedup_minhash_lsh",
    "triangle_doulion_copurchase", "multimodal_phash_pairs",
    "monitor_seasonal_anomaly", "bm25_search", "ivf_search",
    "pq_search", "ivfpq_search", "hybrid_rrf_search",
]

def load(rung, pfx):
    p = f"/root/scale/{pfx}_bench_{rung}.json"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)

rows = {}
for r in RUNGS:
    d = load(r, prefix)
    if d is None:
        print(f"[missing] {r}")
        continue
    rows[r] = d

print(f"\n=== {prefix} ladder ===")
hdr = ["rung", "headline", "fail", "ext_total"] + COLS
print(" | ".join(hdr))
for r in RUNGS:
    if r not in rows:
        continue
    d = rows[r]
    ext = d.get("ext_queries", {})
    vals = [r, f'{d["value"]:.2f}', str(d.get("failures", "?")),
            f'{d.get("ext_total", 0):.1f}']
    for c in COLS:
        v = ext.get(c)
        vals.append("-" if v is None else f"{v:.2f}")
    print(" | ".join(vals))

# seasonality / phash-pile output evidence
print("\n=== planted-structure output rows ===")
for r in RUNGS:
    if r not in rows:
        continue
    er = rows[r].get("ext_rows", {})
    print(f'{r}: monitor_seasonal_anomaly={er.get("monitor_seasonal_anomaly")}'
          f' multimodal_phash_pairs={er.get("multimodal_phash_pairs")}'
          f' dedup_containment_pairs={er.get("dedup_containment_pairs")}'
          f' semantic_dedup_reps={er.get("semantic_dedup_reps")}')

# r11 comparison for shared ops
r11 = {r: load(r, "r11") for r in RUNGS}
if any(r11.values()):
    print("\n=== vs r11 (same op, same rung; r13/r11 ratio) ===")
    shared = ["ann_dedup_pair_stats", "ann_dedup_reps", "bm25_search",
              "ivf_search", "pq_search", "ivfpq_search",
              "hybrid_rrf_search", "dedup_minhash_lsh"]
    for r in RUNGS:
        if r not in rows or not r11.get(r):
            continue
        a, b = rows[r].get("ext_queries", {}), r11[r].get("ext_queries", {})
        parts = []
        for c in shared:
            if c in a and c in b and b[c] > 0:
                parts.append(f"{c}={a[c]:.2f}/{b[c]:.2f}")
        print(f"{r}: " + "  ".join(parts))
