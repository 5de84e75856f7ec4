#!/usr/bin/env python3
"""Merge N bench JSON lines (graft.Bench canonical format) into per-query
medians, control-scale them, and diff against BASELINE.md anchors.

Usage: bench_median.py [--anchor 0.90] [--baseline BASELINE.md] run1.json ...

Per run, every query's seconds are scaled by (control_anchor /
control_q19_sec of that run) — the BASELINE.md adjudication rule — and
the per-query MEDIAN over runs is reported next to the current anchor.
Output: TSV (query, raw_median, scaled_median, anchor, ratio) sorted by
ratio desc, plus run-level totals. Exit code 0 always (reporting tool).
"""
import json, re, statistics, sys


def main() -> None:
    args = sys.argv[1:]
    anchor = 0.90
    baseline = "BASELINE.md"
    runs = []
    i = 0
    while i < len(args):
        if args[i] == "--anchor":
            anchor = float(args[i + 1]); i += 2
        elif args[i] == "--baseline":
            baseline = args[i + 1]; i += 2
        else:
            runs.append(args[i]); i += 1
    if not runs:
        sys.exit("need at least one bench json file")

    anchors = {}
    try:
        for line in open(baseline, encoding="utf-8"):
            m = re.match(r"\|\s*([a-z]\w+)\s*\|\s*([0-9.]+)\s*\|", line)
            if m:
                anchors[m.group(1)] = float(m.group(2))
    except FileNotFoundError:
        pass

    per_q, controls, totals = {}, [], []
    for path in runs:
        with open(path, encoding="utf-8") as f:
            obj = json.loads(f.readline())
        ctl = obj.get("control_q19_sec", -1.0)
        controls.append(ctl)
        totals.append(obj.get("value"))
        scale = anchor / ctl if ctl and ctl > 0 else 1.0
        for q, sec in obj.get("queries", {}).items():
            per_q.setdefault(q, {"raw": [], "scaled": []})
            per_q[q]["raw"].append(sec)
            per_q[q]["scaled"].append(sec * scale)

    print(f"# runs={len(runs)} totals={totals} controls={controls} "
          f"anchor={anchor}")
    rows = []
    for q, v in per_q.items():
        raw = statistics.median(v["raw"])
        sc = statistics.median(v["scaled"])
        a = anchors.get(q)
        rows.append((q, raw, sc, a, (sc / a) if a else None))
    rows.sort(key=lambda r: -(r[4] or 0))
    print("query\traw_med\tscaled_med\tanchor\tratio")
    for q, raw, sc, a, ratio in rows:
        print(f"{q}\t{raw:.3f}\t{sc:.3f}\t"
              f"{a if a is not None else '-'}\t"
              f"{f'{ratio:.2f}' if ratio else '-'}")


if __name__ == "__main__":
    main()
