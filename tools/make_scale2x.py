#!/usr/bin/env python3
"""Build a consistent 2x-scale copy of a testdata SF dir for scaling
benchmarks (driver-side tooling, like oracle_check.py).

Writes TWO dirs with the SAME writer so the bench ratio isolates data
volume from parquet-writer/layout differences:
  <dst>/sf1x : each table copied verbatim through DuckDB
  <dst>/sf2x : each table UNION ALL a clone whose key/id columns
               (*key, *_id) are offset by +1_500_000_000

The offset keeps every FK relationship intact inside the clone (both
sides of every join move together), fits int32 key columns
(nation/region keys stay < 2^31), and stays clear of the gate
constructions' planted-id ranges (which offset by 1e9: base ids land in
[0, n] and [1.5e9, 1.5e9+n], plants in [1e9, 1e9+n] and [2.5e9, ...]).

Usage: make_scale2x.py /root/testdata/sf0.1 /tmp/graft_scale
"""
import glob
import os
import sys

import duckdb


def main():
    src, dst = sys.argv[1], sys.argv[2]
    off = 1_500_000_000
    for sub in ("sf1x", "sf2x"):
        os.makedirs(os.path.join(dst, sub), exist_ok=True)
    for f in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.basename(f)
        rel = duckdb.sql(f"SELECT * FROM '{f}' LIMIT 0")
        cols = rel.columns
        types = [str(t) for t in rel.types]
        shifted = ", ".join(
            f"CAST({c} + {off} AS {t}) AS {c}"
            if (c.endswith("key") or c.endswith("_id")) else c
            for c, t in zip(cols, types))
        one = os.path.join(dst, "sf1x", name)
        two = os.path.join(dst, "sf2x", name)
        duckdb.sql(f"COPY (SELECT * FROM '{f}') TO '{one}' (FORMAT PARQUET)")
        duckdb.sql(
            f"COPY (SELECT * FROM '{f}' UNION ALL SELECT {shifted} "
            f"FROM '{f}') TO '{two}' (FORMAT PARQUET)")
        n1 = duckdb.sql(f"SELECT count(*) FROM '{one}'").fetchone()[0]
        n2 = duckdb.sql(f"SELECT count(*) FROM '{two}'").fetchone()[0]
        assert n2 == 2 * n1, (name, n1, n2)
        print(f"{name}: {n1} -> {n2}")


if __name__ == "__main__":
    main()
