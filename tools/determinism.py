#!/usr/bin/env python3
"""Run-to-run determinism check: compare two graft.Verify output trees.

parity.py proves Spark == DuckDB once; this proves Spark == Spark
across runs — the property the driver's repeated rounds and the
oracle design both rely on (any arbitrary tie-break, partition-order
dependence, or uncached nondeterministic expression shows up here as
a diff even when a single DuckDB compare happens to pass).

Usage: python3 tools/determinism.py <outdirA> <outdirB>
Rows are canonicalized exactly like parity.py (columns sorted by
name, rows sorted by all values) before comparison.
"""
import sys
from pathlib import Path

import duckdb


def canon(con, d):
    rel = con.execute(f"SELECT * FROM '{d}/*.parquet'")
    names = [c[0] for c in rel.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = [tuple(str(r[i]) for i in order) for r in rel.fetchall()]
    rows.sort()
    return [names[i] for i in order], rows


def main():
    if len(sys.argv) != 3:
        sys.exit("usage: determinism.py <outdirA> <outdirB>")
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    con = duckdb.connect()
    names = sorted(p.name for p in a.iterdir() if p.is_dir())
    n_pass = n_fail = 0
    for q in names:
        if not (b / q).is_dir():
            print(f"MISSING-B {q}")
            n_fail += 1
            continue
        try:
            ca, ra = canon(con, a / q)
            cb, rb = canon(con, b / q)
        except Exception as e:
            # an unreadable tree (interrupted run) is ONE failure, not
            # an abort of the whole report
            print(f"UNREADABLE {q}: {e}")
            n_fail += 1
            continue
        if ca != cb:
            print(f"SCHEMA-DIFF {q}: {ca} vs {cb}")
            n_fail += 1
        elif ra != rb:
            diffs = [i for i, (x, y) in enumerate(zip(ra, rb)) if x != y]
            print(f"ROW-DIFF {q}: {len(ra)} vs {len(rb)} rows, "
                  f"first diff at {diffs[0] if diffs else 'len'}")
            n_fail += 1
        else:
            n_pass += 1
    extra = sorted(p.name for p in b.iterdir()
                   if p.is_dir() and not (a / p.name).is_dir())
    for q in extra:
        print(f"MISSING-A {q}")
        n_fail += 1
    print(f"\n== determinism: {n_pass} identical, {n_fail} diff ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
