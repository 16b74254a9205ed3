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
    # bench_out/latest.json is one JSON line; driver-written
    # BENCH_rN.json is a multi-line wrapper whose `parsed` field holds
    # the compact record
    try:
        rec = json.loads(txt)
    except json.JSONDecodeError:
        rec = json.loads(txt.splitlines()[-1])
    if isinstance(rec, dict) and "parsed" in rec and "queries" not in rec:
        rec = rec["parsed"] or {}
    return rec


def main():
    argv = sys.argv[1:]
    raw = "--raw" in argv
    top = 0
    if "--top" in argv:
        i = argv.index("--top")
        try:
            top = int(argv[i + 1])
        except (IndexError, ValueError):
            print(__doc__)
            sys.exit(2)
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
    # the VALUE is the comparability epoch: two records stamped with
    # different epochs straddle a steady-state-changing fix and must
    # not be diffed either
    if old.get("comparable_since") != new.get("comparable_since"):
        print("REFUSED: the records carry different comparable_since "
              f"epochs ({old.get('comparable_since')} vs "
              f"{new.get('comparable_since')}) — a steady-state-changing "
              "fix separates them.")
        sys.exit(1)

    key = "queries" if raw else "queries_calibrated"
    qo, qn = old.get(key) or {}, new.get(key) or {}
    shared = sorted(set(qo) & set(qn))
    if not shared:
        if not raw and (key not in old or key not in new):
            print("no `queries_calibrated` in one of the records — a "
                  "compact stdout-tail record carries raw seconds only; "
                  "re-run with --raw (and remember raw cross-round "
                  "numbers are ambient-sensitive).")
        else:
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
