#!/usr/bin/env python3
"""Freeze bench anchors for gates missing from BENCH_BUDGET.json.

Reads a forensics file (docs/BENCH_FORENSICS.json or a copy), adds an
anchor row (median + profile signature, budget = 2x median) for every
query in it that has no anchor yet, and rewrites BENCH_BUDGET.json
sorted by name. Existing anchors are NEVER touched — the whole point of
the freeze is that anchors don't drift with the code they gate.

Usage: python3 tools/freeze_anchors.py <forensics.json> <round-tag>
"""
import json
import sys


def main(forensics_path, tag):
    f = json.load(open(forensics_path))
    qm = f["query_metrics"]
    budget_path = "BENCH_BUDGET.json"
    budget = json.load(open(budget_path))
    added = []
    skipped = []
    for name, m in qm.items():
        if name in budget:
            continue
        # -1.0 is the bench's failed-run sentinel: freezing it would
        # permanently poison anchor/budget for the query. Anchor on the
        # successful runs only; with none, skip (the query stays
        # unanchored until a green freeze round).
        ok_runs = [t for t in m["runs_sec"] if t >= 0]
        if not ok_runs:
            skipped.append(name)
            continue
        med = sorted(ok_runs)[len(ok_runs) // 2]
        budget[name] = {
            "anchor_round": tag,
            "anchor_sec": round(med, 4),
            "budget_sec": round(2 * med, 4),
            "jobs": m["jobs"],
            "stages": m["stages"],
            "shuffle_mb": m["shuffle_mb"],
        }
        added.append(name)
    with open(budget_path, "w") as out:
        json.dump({k: budget[k] for k in sorted(budget)}, out, indent=1, sort_keys=True)
        out.write("\n")
    print(f"added {len(added)} anchors: {added}")
    if skipped:
        print(f"SKIPPED (no successful runs, still unanchored): {skipped}")
    print(f"total anchors: {len(budget)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
