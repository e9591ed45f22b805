#!/usr/bin/env python3
"""Compare two Bench JSON artifacts per query family.

Usage: python3 scripts/bench_compare.py <old.json> <new.json> [ratio_flag=2.0]

Groups queries by their family prefix (leading letters of the name),
prints per-family total seconds old vs new and the ratio, then lists
individual queries whose ratio exceeds the flag threshold in either
direction — the adjudication input for per-round bench gates.
"""
import json, re, sys


def queries(path):
    d = json.load(open(path))
    q = d.get("queries") or d.get("queries_min")
    if not isinstance(q, dict) or not q:
        sys.exit(f"error: {path} has no 'queries'/'queries_min' map — "
                 "not a Bench artifact?")
    return d, q


def fam(name):
    m = re.match(r"([a-z]+)", name)
    return m.group(1) if m else name


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    do, qo = queries(old_path)
    dn, qn = queries(new_path)
    common = sorted(set(qo) & set(qn))
    print(f"old: {old_path} total={do.get('value', 0):.0f}s "
          f"load={do.get('loadavg_before', '?')}")
    print(f"new: {new_path} total={dn.get('value', 0):.0f}s "
          f"load={dn.get('loadavg_before', '?')}")
    print(f"common queries: {len(common)} "
          f"(old-only: {sorted(set(qo) - set(qn))}, new-only: {sorted(set(qn) - set(qo))})")
    fams = {}
    for q in common:
        f = fam(q)
        o, n = fams.setdefault(f, [0.0, 0.0])
        fams[f] = [o + qo[q], n + qn[q]]
    print(f"\n{'family':<10}{'old_s':>10}{'new_s':>10}{'ratio':>8}")
    for f in sorted(fams):
        o, n = fams[f]
        print(f"{f:<10}{o:>10.1f}{n:>10.1f}{n / o if o else float('inf'):>8.2f}")
    if not common:
        sys.exit("error: no common queries between the two artifacts — "
                 "nothing to compare")
    to = sum(qo[q] for q in common)
    tn = sum(qn[q] for q in common)
    print(f"{'TOTAL':<10}{to:>10.1f}{tn:>10.1f}"
          f"{tn / to if to else float('inf'):>8.2f}")
    print(f"\nqueries with ratio > {flag} or < {1 / flag:.2f} (and >1s on either side):")
    for q in common:
        o, n = qo[q], qn[q]
        if max(o, n) < 1.0 or o == 0:
            continue
        r = n / o
        if r > flag or r < 1 / flag:
            print(f"  {q:<28}{o:>9.2f}s ->{n:>9.2f}s  x{r:.2f}")


if __name__ == "__main__":
    main()
