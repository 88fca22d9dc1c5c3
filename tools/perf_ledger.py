#!/usr/bin/env python3
"""Regenerate PERF.md from the per-round bench artifacts.

Usage: python3 tools/perf_ledger.py [BENCH_r05_local.json ...]

Reads every BENCH_r*.json in the repo root (driver artifacts: the
bench JSON line under the "parsed" key) plus any extra files given on
the command line (raw one-line bench JSON from a local run), and
writes PERF.md — a per-query wall table across rounds so regressions
are graded against data instead of re-derived each round.
"""
import glob
import json
import os
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed", doc)  # driver artifact vs raw bench line
    return parsed


def main():
    rounds = {}  # label -> parsed
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        label = os.path.basename(path)[len("BENCH_"):-len(".json")]
        try:
            p = load(path)
        except (json.JSONDecodeError, KeyError):
            continue
        if p and p.get("queries"):
            rounds[label] = p
    for path in sys.argv[1:]:
        label = os.path.basename(path).replace("BENCH_", "").replace(".json", "")
        rounds[label] = load(path)

    labels = list(rounds)
    queries = []
    for p in rounds.values():
        for q in p["queries"]:
            if q not in queries:
                queries.append(q)
    queries.sort()

    prev, last = (labels[-2], labels[-1]) if len(labels) >= 2 else (None, labels[-1])
    lines = [
        "# PERF ledger — per-query bench walls by round",
        "",
        "Config: `local[32]`, sf0.1, `spark.sql.shuffle.partitions=32`,",
        "object-hash fallback threshold 1M, untimed warmup pass, then",
        "min over N timed passes (N=2 through r04, N=5 from r05 —",
        "at N=2 code-unchanged queries drifted 1.3-1.4x between rounds).",
        "Regenerate with `python3 tools/perf_ledger.py [extra.json ...]`.",
        "",
        "| query | " + " | ".join(labels) +
        (f" | {last}/{prev} |" if prev else " |"),
        "|---|" + "---|" * (len(labels) + (1 if prev else 0)),
    ]
    for q in queries:
        cells = []
        for lb in labels:
            v = rounds[lb]["queries"].get(q)
            cells.append(f"{v:.2f}" if v is not None else "—")
        ratio = ""
        if prev:
            a = rounds[prev]["queries"].get(q)
            b = rounds[last]["queries"].get(q)
            ratio = f" {b / a:.2f}x |" if a and b else " — |"
        lines.append(f"| {q} | " + " | ".join(cells) + " |" + ratio)
    totals = " | ".join(
        f"{sum(rounds[lb]['queries'].values()):.1f}" for lb in labels)
    lines.append(f"| **total** | {totals} |" + (" |" if prev else ""))
    lines.append("")
    with open(os.path.join(root, "PERF.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"PERF.md: {len(queries)} queries x {len(labels)} rounds")


if __name__ == "__main__":
    main()
