#!/usr/bin/env python3
"""Freeze / refresh bench anchors in BENCH_BUDGET.json.

Default mode adds an anchor row (median + profile signature, budget =
2x median) for every query in the forensics file that has no anchor
yet. Existing anchors are NEVER touched — anchors must not drift with
the code they gate.

--refresh additionally RE-anchors every existing gate whose current
profile signature differs from its anchor's, using BenchBudget's exact
mismatch rule (jobs != , stages != , |shuffle_mb delta| > 1.0). This is
the one legitimate reason to touch an anchor: the gated PLAN changed,
so the old profile no longer describes the query and the profile-change
condition would otherwise be permanently true — degenerating the
over-budget gate into a pure time check against an obsolete plan (the
r12 round's dedup_minhash/dedup_incremental false flags, plus 146
gates still anchored at r10 plans). Gates whose profile still matches
keep their frozen times untouched. Every refresh prints the old->new
profile and anchor delta so the commit can record it.

The forensics input MUST come from a clean SPARK_GRAFT_CPUS=32 run
(the driver's operating point): shuffle-block bytes scale with the
partition count, so an 8-cpu profile falsely trips over_budget on
every 32-cpu run.

CAVEAT (r13): STREAMING gates' job counts are not perfectly
load-invariant — a slow run can schedule extra no-data micro-batches
(watermark release timing), which reads as a "profile change" and
would freeze a degraded anchor (seen once: events_attribution_outer
_stream 11->15 jobs / 2.2->5.8 s on an ambient-slow run). So --refresh
only re-anchors a gate whose new median is SLOWER than its old anchor
when --only names it explicitly (a deliberate plan change); unnamed
slower-and-profile-changed gates are reported for manual review
instead. Faster-or-equal refreshes (the common case after an
optimization or a batch-count reduction) stay automatic.

Usage: python3 tools/freeze_anchors.py <forensics.json> <round-tag>
         [--refresh] [--only name1,name2]
"""
import json
import sys


import os

# The streamed-gate registry (graft.GateRegistry.streamed), mirrored to
# JSON because python cannot read the Scala object; GateRegistrySpec
# fails the build if the two drift. Keying on the registry instead of a
# name substring (r14 ADVICE): a batch gate whose name contains
# "_stream" must NOT silently inherit the weak shuffle-only signature.
_STREAMED_PATH = os.path.join(os.path.dirname(__file__), "..",
                              "docs", "STREAMED_GATES.json")
STREAMED = set(json.load(open(_STREAMED_PATH)))


def profile_changed(name, m, a):
    # streaming job/stage counts vary with load (no-data micro-batches):
    # their signature is shuffle bytes only — mirrors
    # BenchBudget.profileChanged exactly
    if name in STREAMED:
        return abs(m["shuffle_mb"] - a["shuffle_mb"]) > 1.0
    return (m["jobs"] != a["jobs"] or m["stages"] != a["stages"]
            or abs(m["shuffle_mb"] - a["shuffle_mb"]) > 1.0)


def main(forensics_path, tag, refresh=False, only=None):
    f = json.load(open(forensics_path))
    qm = f["query_metrics"]
    budget_path = "BENCH_BUDGET.json"
    budget = json.load(open(budget_path))
    added = []
    refreshed = []
    skipped = []
    held = []
    for name, m in qm.items():
        # -1.0 is the bench's failed-run sentinel: freezing it would
        # permanently poison anchor/budget for the query. Anchor on the
        # successful runs only; with none, skip (the query stays
        # unanchored until a green freeze round).
        ok_runs = [t for t in m["runs_sec"] if t >= 0]
        if name in budget:
            if not refresh or not profile_changed(name, m, budget[name]):
                continue
            if not ok_runs:
                skipped.append(name)
                continue
            a = budget[name]
            med = sorted(ok_runs)[len(ok_runs) // 2]
            # slower + profile-changed could be a degraded run whose load
            # altered the profile (streaming no-data batches) — only a
            # deliberate, named re-anchor may make a budget LOOSER
            if med > a["anchor_sec"] and (only is None or name not in only):
                held.append(name)
                print(f"HELD {name}: profile changed "
                      f"(jobs {a['jobs']}->{m['jobs']}, "
                      f"stages {a['stages']}->{m['stages']}, "
                      f"shuffle_mb {a['shuffle_mb']}->{m['shuffle_mb']}) but "
                      f"median {round(med, 4)} > anchor {a['anchor_sec']} — "
                      f"pass --only {name} if the plan change is deliberate")
                continue
            print(f"refresh {name} (was {a.get('anchor_round', '?')}): "
                  f"jobs {a['jobs']}->{m['jobs']} "
                  f"stages {a['stages']}->{m['stages']} "
                  f"shuffle_mb {a['shuffle_mb']}->{m['shuffle_mb']} "
                  f"anchor_sec {a['anchor_sec']}->{round(med, 4)}")
            refreshed.append(name)
        else:
            if not ok_runs:
                skipped.append(name)
                continue
            med = sorted(ok_runs)[len(ok_runs) // 2]
            added.append(name)
        budget[name] = {
            "anchor_round": tag,
            "anchor_sec": round(med, 4),
            "budget_sec": round(2 * med, 4),
            "jobs": m["jobs"],
            "stages": m["stages"],
            "shuffle_mb": m["shuffle_mb"],
        }
    with open(budget_path, "w") as out:
        json.dump({k: budget[k] for k in sorted(budget)}, out, indent=1, sort_keys=True)
        out.write("\n")
    print(f"added {len(added)} anchors: {added}")
    if refresh:
        print(f"refreshed {len(refreshed)} profile-mismatched anchors")
    if skipped:
        print(f"SKIPPED (no successful runs, still unanchored): {skipped}")
    print(f"total anchors: {len(budget)}")


if __name__ == "__main__":
    rest = sys.argv[3:]
    only = None
    if "--only" in rest:
        only = set(rest[rest.index("--only") + 1].split(","))
    main(sys.argv[1], sys.argv[2], refresh="--refresh" in rest, only=only)
