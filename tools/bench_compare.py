"""Compare a bench.py JSON line against BASELINE.md's per-query table.

Usage: python tools/bench_compare.py <bench.json> [--ratio 1.5]

Prints queries whose reading exceeds ratio × their baseline row (and any
queries missing a baseline row), sorted by ratio descending. Exit 0
always — this is a report, not a gate; >2× rows must be re-measured SOLO
(tools/solo_median.py) before concluding anything (BASELINE.md method
note).
"""

from __future__ import annotations

import argparse
import json
import re


def baseline_rows(path: str = "BASELINE.md") -> dict[str, float]:
    """Parse BASELINE.md's `| name | sf | seconds |` rows. Any pipe row
    whose first cell looks like a query name but that fails the strict
    shape is REPORTED (not silently dropped) so a future format drift
    degrades loudly instead of weakening the comparison to 'no baseline
    row'."""
    rows: dict[str, float] = {}
    unparsed: list[str] = []
    for line in open(path):
        m = re.match(r"\| ([\w.-]+) \| [\d.]+ \| ([\d.]+)", line)
        if m:
            rows[m.group(1)] = float(m.group(2))
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        looks_like_data = (
            line.startswith("|")
            and len(cells) >= 3
            and re.fullmatch(r"[\w.-]+", cells[0] or "")
            and not set(cells[1]) <= {"-", ":", " ", ""}  # not a rule row
            and any(re.fullmatch(r"[\d.]+", c) for c in cells[1:])
        )
        if looks_like_data and cells[0] not in ("name", "query"):
            unparsed.append(line.rstrip())
    for line in unparsed:
        print(f"  WARNING: baseline row failed to parse: {line}")
    return rows


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bench_json", help="file holding bench.py's JSON line")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--baseline", default="BASELINE.md")
    args = ap.parse_args()
    bench = json.load(open(args.bench_json))
    base = baseline_rows(args.baseline)
    over, missing = [], []
    for q, t in bench["queries"].items():
        if q not in base:
            missing.append(q)
        elif base[q] > 0 and t / base[q] > args.ratio:
            over.append((t / base[q], q, t, base[q]))
    for r, q, t, b in sorted(over, reverse=True):
        print(f"{r:5.2f}x  {q}: {t:.3f}s vs baseline {b:.3f}s")
    for q in missing:
        print(f"  no baseline row: {q} ({bench['queries'][q]:.3f}s)")
    tot = sum(bench["queries"].values())
    common = [q for q in bench["queries"] if q in base]
    bsum = sum(base[q] for q in common)
    tsum = sum(bench["queries"][q] for q in common)
    agg = f"{tsum / bsum:.2f}x" if bsum > 0 else "n/a (no common rows)"
    print(
        f"\ntotal {tot:.1f}s / {len(bench['queries'])} queries; "
        f"vs-baseline aggregate over {len(common)} common rows: "
        f"{tsum:.1f}s / {bsum:.1f}s = {agg}"
    )
    return 0


if __name__ == "__main__":
    main()
