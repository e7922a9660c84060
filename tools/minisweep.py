#!/usr/bin/env python3
"""Targeted entry sweep: bench a named subset of headline entries at
each scale point with the full median protocol (N serialized samples,
median committed), then patch the medians into the committed
BENCH_sf*.json records (totals recomputed as the sum of the queries
map) and write a markdown report with every sample.

This is the VERDICT-endorsed path for (a) entries that entered the
headline after a full sweep and (b) entries whose code changed
mid-round — re-running the full 200+-entry sweep for a handful of
entries wastes hours of serialized bench time. Caveat recorded in each
report: a subset run pays JIT/codegen warm-up that the in-sweep sample
amortizes, so subset medians are, if anything, PESSIMISTIC vs a full
sweep (measured 2-3x high for sub-second entries, ~1.1x for >10 s
entries in round 6's comparison).

Usage: python3 tools/minisweep.py --queries q_a,q_b
         [--points sf0.1,sf1,sf3,sf10] [--samples 3,sf10:5]
         [--report tools/minisweep_report.md] [--no-patch]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CP = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"

POINTS = {
    "sf0.1": ("/root/testdata/sf0.1", "BENCH_sf01.json"),
    "sf1": ("/tmp/sf1", "BENCH_sf1.json"),
    "sf3": ("/tmp/sf3", "BENCH_sf3.json"),
    "sf10": ("/tmp/sf10", "BENCH_sf10.json"),
}


def run_bench(sf_dir, only):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_ONLY=",".join(only))
    out = subprocess.run(["java", "-cp", CP, "graft.Bench"],
                         env=env, capture_output=True, text=True, cwd=REPO)
    lines = [l for l in out.stdout.splitlines() if l.startswith('{"metric"')]
    if not lines:
        sys.exit(f"bench produced no JSON for {sf_dir}:\n"
                 f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    parsed = [json.loads(l) for l in lines]
    full = [d for d in parsed if d.get("kind") == "full"]
    d = full[0] if full else json.loads(max(lines, key=len))
    if d.get("errors"):
        sys.exit(f"bench errors at {sf_dir}: {d['errors']}")
    return d["queries"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--points", default="sf0.1,sf1,sf3,sf10")
    ap.add_argument("--samples", default="3,sf10:5")
    ap.add_argument("--report", default="tools/minisweep_report.md")
    ap.add_argument("--no-patch", action="store_true")
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]
    sample_default, sample_over = 3, {}
    for part in args.samples.split(","):
        if ":" in part:
            p, n = part.split(":")
            sample_over[p] = int(n)
        elif part:
            sample_default = int(part)

    report = ["# Mini-sweep report (targeted entries, full median protocol)",
              "",
              f"Entries: {', '.join(queries)}",
              "",
              "Subset runs pay JIT/codegen warm-up a full in-sweep sample",
              "amortizes — these medians are pessimistic vs a full sweep.",
              ""]
    for point in args.points.split(","):
        sf_dir, ref_name = POINTS[point]
        n = sample_over.get(point, sample_default)
        samples = [run_bench(sf_dir, queries) for _ in range(n)]
        med = {q: statistics.median([s[q] for s in samples if q in s])
               for q in queries if any(q in s for s in samples)}
        report.append(f"## {point} ({n} samples)")
        report.append("")
        report.append("| entry | samples (s) | median (s) |")
        report.append("|---|---|---|")
        for q in queries:
            ss = [round(s[q], 2) for s in samples if q in s]
            report.append(f"| {q} | {ss} | {med.get(q, float('nan')):.2f} |")
        report.append("")
        if not args.no_patch:
            path = os.path.join(REPO, ref_name)
            doc = json.load(open(path))
            before = {q: doc["queries"].get(q) for q in med}
            doc["queries"].update({q: round(v, 6) for q, v in med.items()})
            doc["value"] = round(sum(doc["queries"].values()), 6)
            doc.setdefault("protocol", {}).setdefault("minisweeps", []).append(
                {"entries": sorted(med), "samples": n})
            json.dump(doc, open(path, "w"), indent=1, sort_keys=False)
            changed = {q: (before[q], round(med[q], 2)) for q in med}
            report.append(f"Patched into {ref_name}: " + ", ".join(
                f"{q} {b if b is None else round(b, 2)} -> {a}"
                for q, (b, a) in sorted(changed.items())))
            report.append(f"New {ref_name} total: {doc['value']:.1f} s "
                          f"({len(doc['queries'])} entries)")
            report.append("")
        print(f"[minisweep] {point}: " +
              ", ".join(f"{q}={med[q]:.2f}s" for q in sorted(med)))
    with open(os.path.join(REPO, args.report), "w") as f:
        f.write("\n".join(report) + "\n")
    print(f"[minisweep] report -> {args.report}")


if __name__ == "__main__":
    main()
