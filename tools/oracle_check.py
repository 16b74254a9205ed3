#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (columns sorted by name,
values compared in row order) with the Spark outputs dumped by graft.Verify.

Usage: python3 tools/oracle_check.py <sfdir> <verify_out_dir> [--dumped-only]

--dumped-only restricts the check to queries whose dump dir exists (for
focused Verify runs); the default FAILs on any missing dump.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # --dumped-only: check only the queries actually dumped (a focused
    # graft.Verify run with a name filter). OPT-IN — the default full
    # gate must keep FAILing on missing dumps, otherwise a query that
    # crashed inside Verify (caught there, no dump dir) would silently
    # vanish from an all-green "N/N queries match".
    if "--dumped-only" in sys.argv:
        dumped = {n for n in os.listdir(outdir) if n in oracle}
        oracle = {n: s for n, s in oracle.items() if n in dumped}
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            continue
        want = want[sorted(want.columns)]
        got = got[sorted(got.columns)]
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle "
                  f"{list(want.columns)}")
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            continue
        bad = None
        for c in want.columns:
            wv, gv = want[c], got[c]
            if str(wv.dtype) != str(gv.dtype):
                # dtype mismatch is a schema-level concern; still compare values
                pass
            if wv.dtype.kind == "f" or gv.dtype.kind == "f":
                eq = ((wv.isna() & gv.isna()) | (wv == gv)).all()
                if not eq:
                    diff = (wv - gv).abs().max()
                    bad = f"col {c}: max abs diff {diff} " \
                          f"(dtypes {wv.dtype}/{gv.dtype})"
                    break
            else:
                # normalize list-valued cells (numpy arrays from parquet
                # list columns) to tuples so == stays scalar
                def norm(v):
                    if v is None:
                        return None
                    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
                        return tuple(norm(x) for x in (
                            v.tolist() if hasattr(v, "tolist") else v))
                    return v
                wo = wv.map(norm).astype(object)
                go = gv.map(norm).astype(object)
                if not ((wv.isna() & gv.isna()) | (wo == go)).all():
                    mism = (wo != go) & ~(wv.isna() & gv.isna())
                    idx = mism[mism].index[0]
                    bad = f"col {c} row {idx}: oracle={wv[idx]!r} " \
                          f"spark={gv[idx]!r}"
                    break
        if bad:
            print(f"FAIL {name}: {bad}")
        else:
            dt = [f"{c}:{want[c].dtype}/{got[c].dtype}" for c in want.columns
                  if str(want[c].dtype) != str(got[c].dtype)]
            tag = f" [dtype warn: {', '.join(dt)}]" if dt else ""
            print(f"OK   {name} ({len(want)} rows){tag}")
            n_ok += 1
    print(f"\n{n_ok}/{len(oracle)} queries match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
