#!/usr/bin/env python3
"""Cross-round bench diff with the comparability contract enforced.

Usage: bench_diff.py OLD.json NEW.json [--raw] [--top N]

Diffs per-query numbers between two bench records (BENCH_rN.json /
bench_out/latest.json). Default statistic is `queries_calibrated`
(sample seconds normalized by each pass's own CPU+scan calibration) —
the only number comparable across rounds; see README "Bench
comparability across rounds".

The contract is machine-readable via the `comparable_since` field
(first stamped in round 14, value 13): records WITHOUT the field, or
from rounds before it, predate the JIT-bimodality fix and mix two
steady states — raw diffs against them are refused. `--raw` diffs raw
seconds instead, allowed only when BOTH records carry the field.
"""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read().strip()
    # bench files are one JSON line; BENCH_rN.json may hold the compact
    # summary line — both parse the same way
    return json.loads(txt.splitlines()[-1])


def main():
    argv = sys.argv[1:]
    raw = "--raw" in argv
    top = 0
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        del argv[i:i + 2]  # the value is not a positional file arg
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    old, new = load(args[0]), load(args[1])

    for name, rec in (("OLD", old), ("NEW", new)):
        since = rec.get("comparable_since")
        if since is None:
            print(f"REFUSED: {name} record ({args[0 if name=='OLD' else 1]}) "
                  "has no `comparable_since` field — it predates the r13 "
                  "JIT-bimodality fix and mixes two per-JVM steady states. "
                  "Its numbers are not comparable to any other round, "
                  "calibrated or raw (README: 'Bench comparability').")
            sys.exit(1)

    key = "queries" if raw else "queries_calibrated"
    qo, qn = old.get(key) or {}, new.get(key) or {}
    shared = sorted(set(qo) & set(qn))
    if not shared:
        print(f"no shared queries under '{key}'")
        sys.exit(1)
    rows = []
    for q in shared:
        a, b = qo[q], qn[q]
        ratio = b / a if a > 0 else float("inf")
        rows.append((ratio, q, a, b))
    rows.sort(reverse=True)
    if top:
        rows = rows[:top]
    unit = "sec" if raw else "cal-units"
    print(f"{'query':28s} {'old':>10s} {'new':>10s} {'ratio':>7s}   ({unit})")
    for ratio, q, a, b in rows:
        flag = "  <-- regressed >25%" if ratio > 1.25 else ""
        print(f"{q:28s} {a:10.4f} {b:10.4f} {ratio:7.3f}{flag}")
    tot_o, tot_n = sum(qo[q] for q in shared), sum(qn[q] for q in shared)
    print(f"{'TOTAL (shared)':28s} {tot_o:10.3f} {tot_n:10.3f} "
          f"{tot_n / tot_o:7.3f}")


if __name__ == "__main__":
    main()
