#!/usr/bin/env python3
"""Cross-round bench trend (round-10 verdict task 7): one table of
per-round totals and headroom ratios from the committed BENCH_r*.json
artifacts, so drift is visible across rounds instead of being dug out
of prose each time.

The driver's BENCH_r{N}.json keeps a BOUNDED stdout tail, so most
rounds carry only a suffix of the full per-query JSON. The trend
therefore reports, per round, the queries whose "name":seconds pairs
survive in that tail, each compared against the committed quiet-box
baseline (BENCH_BASELINE_QUERIES.json, same floor rule as
bench_gate.py). Partial coverage is printed alongside so a low-n round
is read as low-confidence, not as fast. The current BENCH_QUERIES.json
(untruncated, written by graft.Bench) joins as the final row.

Usage: python3 tools/bench_trend.py [--markdown]
"""
import glob
import json
import os
import re
import sys

FLOOR_SEC = 0.25
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries whose in-sweep cost measurably depends on what ran before
# them (SURVEY.md §4 "Context-sensitive queries": order-randomized
# sweep score >= 0.5, plus the historical same-tree swing cases).
# The trend table marks a round's max-headroom query with "~" when it
# is in this set: a spike there reads as sweep context, not plan
# regression (the bench's 1.5x retry rule adjudicates it upstream).
# t29/t30 joined in round 14 on adjudicated evidence: their r13
# in-sweep spikes (2.36 s / 1.46 s) read 1.2x/1.4x over pins with NO
# t29/t30-path code change, and quiet-box isolated minima (4 in-JVM
# rounds) came back at 1.85 s / 1.01 s -- at or under their 1.97 /
# 1.02 pins, confirming context, not plan.
CONTEXT_SENSITIVE = {
    "s02_knn_lsh", "q19_union", "t24_quality_quantiles",
    "d09_semantic_decontaminate", "c01_curate", "q42_cube",
    "s10_knn_pq", "t21_domain_affinity", "s15_knn_filtered",
    "t23_freq_spectrum", "q41_stats_moments", "s19_knn_pq_rotated",
    "t27_mix_bpe", "t15_mix_allocation", "q15_join_inner",
    "t26_bpe_encode", "c05_topic_clusters", "c09_quality_score",
    "t29_lm_perplexity", "t30_vocab_coverage",
}


def extract_pairs(text, known):
    """Every complete "name":number pair in the text whose name is a
    baseline query. A pair only counts when the number is followed by
    the JSON delimiter (, or }) — a tail cut mid-number would
    otherwise match with a truncated (wrong) value; the float() guard
    covers the residual 'cut right after an e' shape."""
    out = {}
    for m in re.finditer(
            r'"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.eE+-]*)\s*[,}]', text):
        if m.group(1) in known:
            try:
                out[m.group(1)] = float(m.group(2))
            except ValueError:
                pass
    return out


def row_stats(pairs, base):
    ratios = sorted(t / max(base[q], FLOOR_SEC) for q, t in pairs.items())
    n = len(ratios)
    tot = sum(pairs.values())
    btot = sum(base[q] for q in pairs)
    return {
        "n": n,
        "sum_s": tot,
        "set_ratio": tot / btot if btot else float("nan"),
        "p50": ratios[n // 2],
        "p90": ratios[min(n - 1, int(0.9 * n))],
        "max": ratios[-1],
        "max_q": max(pairs, key=lambda q: pairs[q] / max(base[q], FLOOR_SEC)),
    }


def main():
    base = json.load(
        open(os.path.join(HERE, "BENCH_BASELINE_QUERIES.json")))["queries"]
    rows = []
    for f in sorted(glob.glob(os.path.join(HERE, "BENCH_r[0-9][0-9].json"))):
        d = json.load(open(f))
        pairs = extract_pairs(d.get("tail") or "", base)
        label = os.path.basename(f)[:-5]
        rows.append((label, pairs))
    cur = os.path.join(HERE, "BENCH_QUERIES.json")
    if os.path.exists(cur):
        d = json.load(open(cur))
        qs = {q: t for q, t in d.get("queries", {}).items() if q in base}
        rows.append(("current", qs))

    md = "--markdown" in sys.argv
    if md:
        print("| round | n | set sum (s) | vs baseline | p50 | p90 | "
              "max (query) |")
        print("|---|---|---|---|---|---|---|")
    else:
        print(f"{'round':<10} {'n':>4} {'sum_s':>8} {'ratio':>6} "
              f"{'p50':>5} {'p90':>5} {'max':>5}  max_query")
    for label, pairs in rows:
        if not pairs:
            print(f"| {label} | 0 | — | — | — | — | no parsable tail |"
                  if md else f"{label:<10} {0:>4}  (no parsable tail)")
            continue
        s = row_stats(pairs, base)
        ctx = "~" if s["max_q"] in CONTEXT_SENSITIVE else ""
        if md:
            print(f"| {label} | {s['n']} | {s['sum_s']:.1f} | "
                  f"{s['set_ratio']:.2f}× | {s['p50']:.2f} | {s['p90']:.2f} | "
                  f"{s['max']:.2f} ({ctx}{s['max_q']}) |")
        else:
            print(f"{label:<10} {s['n']:>4} {s['sum_s']:>8.1f} "
                  f"{s['set_ratio']:>6.2f} {s['p50']:>5.2f} {s['p90']:>5.2f} "
                  f"{s['max']:>5.2f}  {ctx}{s['max_q']}")


if __name__ == "__main__":
    main()
