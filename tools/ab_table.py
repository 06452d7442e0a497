"""Aggregate interleaved tools/ab_bench.py output into the PERF_NOTES
markdown table (VERDICT r10 #4: the A/B protocol is the primary bench
signal; this makes the table mechanical rather than hand-assembled).

Input: a JSONL file where each line is one ab_bench.py invocation
({"repo": ..., "queries": {name: [sec, ...]}}), arms interleaved by the
producing shell loop. Exactly two distinct repo labels expected.

Per (arm, query): each process contributes min-of-warm (drop run 0 —
index build / first-call codegen); the arm's statistic is the MEDIAN
across its processes. Prints a markdown table plus a JSON line.

Usage: python tools/ab_table.py AB_JSONL [head_label base_label]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    path = sys.argv[1]
    rows = [json.loads(ln) for ln in open(path) if ln.strip()]
    repos = []
    for r in rows:
        if r["repo"] not in repos:
            repos.append(r["repo"])
    if len(repos) != 2:
        raise SystemExit(f"expected exactly 2 arms, got {repos}")
    head, base = (sys.argv[2], sys.argv[3]) if len(sys.argv) > 4 else repos
    per: dict[str, dict[str, list[float]]] = {}
    for r in rows:
        for q, times in r["queries"].items():
            warm = times[1:] if len(times) > 1 else times
            per.setdefault(q, {}).setdefault(r["repo"], []).append(min(warm))
    print(f"| query | {head} (median of min-warm) | {base} | ratio |")
    print("|---|---|---|---|")
    out = {}
    for q, arms in per.items():
        a = statistics.median(arms[head])
        b = statistics.median(arms[base])
        ratio = round(a / b, 3)
        out[q] = {"head": round(a, 3), "base": round(b, 3), "ratio": ratio,
                  "head_samples": arms[head], "base_samples": arms[base]}
        print(f"| {q} | {a:.3f} s | {b:.3f} s | {ratio} |")
    print(json.dumps({"arms": [head, base], "queries": out}))


if __name__ == "__main__":
    main()
