#!/usr/bin/env python3
"""Build a consistent 1x/2x/4x scale LADDER from a testdata SF dir
(driver-side tooling, the make_scale2x.py approach extended to three
rungs written by the SAME writer so ratios isolate data volume).

  <dst>/sf1x : each table copied verbatim through DuckDB
  <dst>/sf2x : base UNION ALL one clone, key/id columns offset +250M
  <dst>/sf4x : base UNION ALL three clones, offsets +250M/+500M/+750M

Offset scheme (differs from make_scale2x.py's single +1.5e9 because
three clones must all fit): every clone's *key/*_id columns shift by a
multiple of 250_000_000, so

  - FK relationships stay intact inside each clone (both sides of
    every join move together);
  - all DATA ids stay < 1e9 while every gate construction's PLANTED
    ids live at base+1e9 — clean separation, no plant/data collision
    at any rung (plant ranges [1e9+k*250M, ...] pairwise distinct for
    table sizes < 250M rows);
  - everything stays far below 2^31, so int32 key columns survive the
    CAST that make_scale2x.py's +1.5e9 only barely cleared.

Usage: make_scale4x.py /root/testdata/sf0.1 /tmp/graft_scale4
"""
import glob
import os
import sys

import duckdb

OFF = 250_000_000


def main():
    src, dst = sys.argv[1], sys.argv[2]
    rungs = {"sf1x": [0], "sf2x": [0, 1], "sf4x": [0, 1, 2, 3]}
    for sub in rungs:
        os.makedirs(os.path.join(dst, sub), exist_ok=True)
    for f in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.basename(f)
        rel = duckdb.sql(f"SELECT * FROM '{f}' LIMIT 0")
        cols = rel.columns
        types = [str(t) for t in rel.types]

        def clone_select(k):
            if k == 0:
                return f"SELECT * FROM '{f}'"
            shifted = ", ".join(
                f"CAST({c} + {k * OFF} AS {t}) AS {c}"
                if (c.endswith("key") or c.endswith("_id")) else c
                for c, t in zip(cols, types))
            return f"SELECT {shifted} FROM '{f}'"

        counts = {}
        for sub, ks in rungs.items():
            out = os.path.join(dst, sub, name)
            union = " UNION ALL ".join(clone_select(k) for k in ks)
            duckdb.sql(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
            counts[sub] = duckdb.sql(
                f"SELECT count(*) FROM '{out}'").fetchone()[0]
        assert counts["sf2x"] == 2 * counts["sf1x"], (name, counts)
        assert counts["sf4x"] == 4 * counts["sf1x"], (name, counts)
        print(f"{name}: {counts['sf1x']} -> {counts['sf2x']} "
              f"-> {counts['sf4x']}")


if __name__ == "__main__":
    main()
