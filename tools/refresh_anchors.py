#!/usr/bin/env python3
"""Refresh BENCH_ANCHORS*.json from a gate-valid bench capture.

Usage: tools/refresh_anchors.py <capture.json> <anchors.json> \
           [--replace q1 q2 ...] [--anchors-ok]

Policy (BASELINE.md round-12): a query's reference is refreshed only
from a capture whose gate stamped `valid: true`. By default only
queries MISSING from the refs file are added (new queries get their
first reference); `--replace` names queries whose existing reference
should be overwritten (declared code changes that legitimately moved
them). Never refresh wholesale from a contended capture — the gate
flag is checked and refusal is loud.

Round-17 extension: the GATE ANCHORS (the ten cheap anchors and the
three mid-weight anchors in BenchGate.Anchors/MidAnchors) drive the
capture-validity decision itself, so replacing one of their references
re-tunes the gate. That needs the extra `--anchors-ok` flag plus a
declared code change that moved the query — the tool refuses an anchor
replace without it. BenchGateSpec replays the recorded r16 decisions
against a FROZEN snapshot (src/test/resources/captures/refs_r16.json),
so refreshing the live file never rewrites pinned history.
"""
import json
import sys

# Mirror of BenchGate.Anchors + BenchGate.MidAnchors (Bench.scala) —
# keep in sync when the anchor sets change.
GATE_ANCHORS = {
    "events_hourly_counts", "events_props_agg", "multimodal_decode",
    "profile_categories", "q1_agg", "q2_filter_pushdown",
    "q9_distinct_agg", "sample_stratified", "text_lm_score", "text_stats",
    # mid-weight (3x band)
    "store_delete_where", "text_nb_train", "text_substring_index_build",
}


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 2:
        print(__doc__)
        return 2
    cap_path, refs_path = args[0], args[1]
    rest = args[2:]
    anchors_ok = "--anchors-ok" in rest
    rest = [a for a in rest if a != "--anchors-ok"]
    replace = set()
    if rest:
        if rest[0] != "--replace":
            print(f"unknown argument {rest[0]!r}")
            return 2
        replace = set(rest[1:])
    anchor_replaces = replace & GATE_ANCHORS
    if anchor_replaces and not anchors_ok:
        print(f"REFUSING: {sorted(anchor_replaces)} are gate anchors — "
              "replacing their references re-tunes the validity gate "
              "itself. Re-run with --anchors-ok only for a declared code "
              "change that moved the query.")
        return 1
    cap = json.load(open(cap_path))
    if not cap.get("sentinel", {}).get("valid"):
        print(f"REFUSING: {cap_path} is not a gate-valid capture "
              f"(sentinel.valid={cap.get('sentinel', {}).get('valid')!r}) — "
              "references must come from clean measurements only")
        return 1
    doc = json.load(open(refs_path))
    refs = doc["refs"]
    added, replaced, skipped = [], [], []
    for name, sec in sorted(cap["queries"].items()):
        if sec <= 0:
            continue
        if name not in refs:
            refs[name] = round(sec, 6)
            added.append(name)
        elif name in replace:
            refs[name] = round(sec, 6)
            replaced.append(name)
        else:
            skipped.append(name)
    missing_replace = replace - set(cap["queries"])
    json.dump(doc, open(refs_path, "w"), indent=1)
    print(f"{refs_path}: +{len(added)} added {added}, "
          f"{len(replaced)} replaced {replaced}, {len(skipped)} kept")
    if missing_replace:
        print(f"warning: --replace names not in the capture: {sorted(missing_replace)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
