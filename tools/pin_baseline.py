#!/usr/bin/env python3
"""Add or refresh baseline pins from a BenchAdjudicate quiet-run CSV —
the scripted form of the re-pin protocol, so BENCH_BASELINE_QUERIES.json
is never hand-edited (round 17 — r16 next-task 5).

Usage:
  sbt "runMain graft.BenchAdjudicate q1,q2 3" | tee /tmp/adj.csv
  python3 tools/pin_baseline.py /tmp/adj.csv [--refresh]

Reads BenchAdjudicate's CSV (query,run1..runN,min — sbt [info] prefixes
are stripped), takes each query's quiet-run MIN (the same adjudication
rule Bench.adjudicateFinal applies, spec-pinned in BenchLogicSpec), and
merges it into BENCH_BASELINE_QUERIES.json's "queries" map. By default
only NEW queries are pinned (existing pins are the regression
reference and must not drift silently); --refresh also overwrites
existing pins, for the same-round-plan-change protocol the gate's
docstring describes. The artifact's total is recomputed.

--canary <sec> (round 18) pins the box-speed canary as the TOP-LEVEL
"canary" number (outside the "queries" map the gate reads — it is
calibration, not a benched query; see Bench.scala's canary fields).
Pinned once; like query pins it only overwrites under --refresh.
"""
import json
import re
import sys

BASELINE = "BENCH_BASELINE_QUERIES.json"


def parse_adjudicate_csv(text):
    """-> {query: min_seconds} from BenchAdjudicate stdout."""
    pins = {}
    for line in text.splitlines():
        line = re.sub(r"^\[info\]\s*", "", line.strip())
        m = re.match(r"^([a-z][A-Za-z0-9_]*),((?:[0-9.]+,)+)([0-9.]+)$", line)
        if m:
            pins[m.group(1)] = float(m.group(3))
    return pins


def merge(doc, pins, refresh=False):
    """-> (updated doc, added names, refreshed names, skipped names)."""
    queries = doc["queries"]
    added, refreshed, skipped = [], [], []
    for name, val in sorted(pins.items()):
        if name not in queries:
            queries[name] = val
            added.append(name)
        elif refresh:
            queries[name] = val
            refreshed.append(name)
        else:
            skipped.append(name)
    doc["value"] = sum(queries.values())
    return doc, added, refreshed, skipped


def main():
    argv = sys.argv[1:]
    refresh = "--refresh" in argv
    canary = None
    if "--canary" in argv:
        i = argv.index("--canary")
        if i + 1 >= len(argv):
            print("--canary requires a value (seconds)\n")
            print(__doc__)
            return 2
        try:
            canary = float(argv[i + 1])
        except ValueError:
            print(f"--canary value {argv[i + 1]!r} is not a number\n")
            print(__doc__)
            return 2
        if canary <= 0:
            print(f"--canary value must be a positive float, got {canary}\n")
            print(__doc__)
            return 2
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--refresh"]
    if not args and canary is None:
        print(__doc__)
        return 2
    pins = parse_adjudicate_csv(open(args[0]).read()) if args else {}
    if args and not pins:
        print(f"no adjudication rows found in {args[0]}")
        return 1
    doc = json.load(open(BASELINE))
    doc, added, refreshed, skipped = merge(doc, pins, refresh)
    if canary is not None:
        if "canary" not in doc or refresh:
            verb = "REFRESHED" if "canary" in doc else "PINNED"
            doc["canary"] = canary
            print(f"{verb} canary {canary:.3f}s (top-level)")
        else:
            print(f"KEPT canary {doc['canary']:.3f}s "
                  "(existing pin; use --refresh to overwrite)")
    json.dump(doc, open(BASELINE, "w"))
    for n in added:
        print(f"PINNED    {n:30s} {pins[n]:.3f}s")
    for n in refreshed:
        print(f"REFRESHED {n:30s} {pins[n]:.3f}s")
    for n in skipped:
        print(f"KEPT      {n:30s} (existing pin; use --refresh to overwrite)")
    print(f"total now {doc['value']:.1f}s over {len(doc['queries'])} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
