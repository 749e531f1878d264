#!/usr/bin/env python3
"""Refresh BENCH_ANCHORS*.json from a gate-valid bench capture.

Usage: tools/refresh_anchors.py <capture.json> <anchors.json> [--replace q1 q2 ...]

Policy (BASELINE.md round-12): a query's reference is refreshed only
from a capture whose gate stamped `valid: true`. By default only
queries MISSING from the refs file are added (new queries get their
first reference); `--replace` names queries whose existing reference
should be overwritten (declared code changes that legitimately moved
them). Never refresh wholesale from a contended capture — the gate
flag is checked and refusal is loud.
"""
import json
import sys


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 2:
        print(__doc__)
        return 2
    cap_path, refs_path = args[0], args[1]
    replace = set()
    if len(args) > 2:
        if args[2] != "--replace":
            print(f"unknown argument {args[2]!r}")
            return 2
        replace = set(args[3:])
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
