#!/usr/bin/env python3
"""sf0.1-sweep companion for the DELIBERATELY-quadratic oracles
(r20: nine — q77/q79/q96/q98/q101/q107/q111/q112/q113).

The closest-family oracles are naive all-pairs argmins/rankings and the
subtract oracles are per-base explodes — deliberately so (the ENGINE
must be linear, the oracle maximally independent), but at sf0.1 they
are too heavy for the full-sweep DuckDB pass. This script validates
them by an independent 1-in-N-sampled DuckDB computation instead
(exact row equality on the sampled ids), the same procedure the r16
sweep documented.

Usage: sampled_sweep.py <sfdir> <verify_out_dir> [sample_mod=20]
"""
import sys

import duckdb
import pandas as pd

IVB = """SELECT o_orderkey AS iv_id,
 'chr' || (o_orderkey % 4) AS chrom,
 (o_custkey*9973) % 10000000 AS start,
 (o_custkey*9973) % 10000000 + 200 AS "end"
FROM orders"""

Q77_SAMPLED = """WITH a AS (SELECT c_custkey AS aid,
    'chr' || (c_custkey % 4) AS chrom,
    (c_custkey*5557) % 10000000 AS astart,
    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300 AS aend
  FROM customer WHERE c_custkey % {mod} = 0),
bv AS ({ivb}),
pair AS (SELECT a.aid, a.chrom, a.astart, a.aend,
    CASE WHEN b.iv_id IS NULL THEN NULL
      ELSE struct_pack(
        d := CASE WHEN a.astart < b."end" AND b."start" < a.aend THEN 0
                  WHEN b."end" <= a.astart THEN a.astart - b."end"
                  ELSE b."start" - a.aend END,
        s := b."start", i := b.iv_id, e := b."end") END AS c
  FROM a LEFT JOIN bv b ON a.chrom = b.chrom),
r AS (SELECT aid, chrom, astart, aend, min(c) AS m
  FROM pair GROUP BY 1, 2, 3, 4)
SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
  CAST(aend AS BIGINT) AS "end", m['i'] AS closest_id,
  CAST(m['s'] AS BIGINT) AS closest_start,
  CAST(m['e'] AS BIGINT) AS closest_end,
  CAST(m['d'] AS BIGINT) AS distance
FROM r ORDER BY aid"""

Q79_SAMPLED = """WITH a AS (SELECT c_custkey AS aid,
    'chr' || (c_custkey % 4) AS chrom,
    (c_custkey*5557) % 10000000 AS astart,
    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300 AS aend
  FROM customer WHERE c_custkey % {mod} = 0),
bv AS ({ivb}),
pos AS (SELECT aid, chrom, unnest(range(astart, aend)) AS p FROM a),
alive AS (SELECT aid, chrom, p FROM pos
  WHERE NOT EXISTS (SELECT 1 FROM bv b
    WHERE b.chrom = pos.chrom
      AND b."start" <= pos.p AND pos.p < b."end")),
isl AS (SELECT aid, chrom, p,
    p - row_number() OVER (PARTITION BY aid ORDER BY p) AS grp
  FROM alive)
SELECT aid, chrom, CAST(min(p) AS BIGINT) AS "start",
  CAST(max(p) + 1 AS BIGINT) AS "end"
FROM isl GROUP BY aid, chrom, grp
ORDER BY aid, "start\""""


STRAND_A = """CASE WHEN aid % 3 = 0 THEN '+'
  WHEN aid % 3 = 1 THEN '-' ELSE '.' END"""

IVB_S = """SELECT *, CASE WHEN iv_id % 3 = 0 THEN '+'
  WHEN iv_id % 3 = 1 THEN '-' ELSE '.' END AS strand
FROM ({ivb})"""

Q96_SAMPLED = """WITH a0 AS (SELECT c_custkey AS aid,
    'chr' || (c_custkey % 4) AS chrom,
    (c_custkey*5557) % 10000000 AS astart,
    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300 AS aend
  FROM customer WHERE c_custkey % {mod} = 0),
a AS (SELECT *, {strand_a} AS strand FROM a0),
bv AS ({ivbs}),
pair AS (SELECT a.aid, a.chrom, a.astart, a.aend,
    CASE WHEN b.iv_id IS NULL THEN NULL
      ELSE struct_pack(
        d := CASE WHEN a.astart < b."end" AND b."start" < a.aend THEN 0
                  WHEN b."end" <= a.astart THEN a.astart - b."end"
                  ELSE b."start" - a.aend END,
        s := b."start", i := b.iv_id, e := b."end") END AS c
  FROM a LEFT JOIN bv b
    ON a.chrom = b.chrom AND a.strand = b.strand),
r AS (SELECT aid, chrom, astart, aend, min(c) AS m
  FROM pair GROUP BY 1, 2, 3, 4)
SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
  CAST(aend AS BIGINT) AS "end", m['i'] AS closest_id,
  CAST(m['s'] AS BIGINT) AS closest_start,
  CAST(m['e'] AS BIGINT) AS closest_end,
  CAST(m['d'] AS BIGINT) AS distance
FROM r ORDER BY aid"""

Q98_SAMPLED = """WITH a0 AS (SELECT c_custkey AS aid,
    'chr' || (c_custkey % 4) AS chrom,
    (c_custkey*5557) % 10000000 AS astart,
    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300 AS aend
  FROM customer WHERE c_custkey % {mod} = 0),
a AS (SELECT *, {strand_a} AS strand FROM a0),
bv AS ({ivbs}),
pos AS (SELECT aid, chrom, strand, unnest(range(astart, aend)) AS p
  FROM a),
alive AS (SELECT aid, chrom, p FROM pos
  WHERE NOT EXISTS (SELECT 1 FROM bv b
    WHERE b.chrom = pos.chrom AND b.strand = pos.strand
      AND b."start" <= pos.p AND pos.p < b."end")),
isl AS (SELECT aid, chrom, p,
    p - row_number() OVER (PARTITION BY aid ORDER BY p) AS grp
  FROM alive)
SELECT aid, chrom, CAST(min(p) AS BIGINT) AS "start",
  CAST(max(p) + 1 AS BIGINT) AS "end"
FROM isl GROUP BY aid, chrom, grp
ORDER BY aid, "start\""""

Q107_SAMPLED = """WITH a0 AS (SELECT c_custkey AS aid,
    'chr' || (c_custkey % 4) AS chrom,
    (c_custkey*5557) % 10000000 AS astart,
    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300 AS aend
  FROM customer WHERE c_custkey % {mod} = 0),
a AS (SELECT *, {strand_a} AS strand FROM a0),
bv AS ({ivbs}),
pos AS (SELECT aid, chrom, strand, unnest(range(astart, aend)) AS p
  FROM a),
alive AS (SELECT aid, chrom, p FROM pos
  WHERE NOT EXISTS (SELECT 1 FROM bv b
    WHERE b.chrom = pos.chrom
      AND ((pos.strand = '+' AND b.strand = '-') OR
           (pos.strand = '-' AND b.strand = '+'))
      AND b."start" <= pos.p AND pos.p < b."end")),
isl AS (SELECT aid, chrom, p,
    p - row_number() OVER (PARTITION BY aid ORDER BY p) AS grp
  FROM alive)
SELECT aid, chrom, CAST(min(p) AS BIGINT) AS "start",
  CAST(max(p) + 1 AS BIGINT) AS "end"
FROM isl GROUP BY aid, chrom, grp
ORDER BY aid, "start\""""

Q101_SAMPLED = """WITH a AS (SELECT c_custkey AS aid,
    'chr' || (c_custkey % 4) AS chrom,
    (c_custkey*5557) % 10000000 AS astart,
    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300 AS aend
  FROM customer WHERE c_custkey % {mod} = 0),
bv AS ({ivb}),
pair AS (SELECT a.aid, b.iv_id AS bid,
    b."start" AS bs, b."end" AS be,
    CASE WHEN a.astart < b."end" AND b."start" < a.aend THEN 0
         WHEN b."end" <= a.astart THEN a.astart - b."end"
         ELSE b."start" - a.aend END AS d
  FROM a JOIN bv b ON a.chrom = b.chrom),
mn AS (SELECT aid, min(d) AS md FROM pair GROUP BY 1),
ties AS (SELECT p.* FROM pair p
  JOIN mn ON p.aid = mn.aid AND p.d = mn.md)
SELECT a.aid, a.chrom, CAST(a.astart AS BIGINT) AS "start",
  CAST(a.aend AS BIGINT) AS "end",
  t.bid AS closest_id,
  CAST(t.bs AS BIGINT) AS closest_start,
  CAST(t.be AS BIGINT) AS closest_end,
  CAST(t.d AS BIGINT) AS distance,
  CAST(CASE WHEN t.d = 0 THEN 0
    WHEN t.be <= a.astart THEN -t.d ELSE t.d END
    AS BIGINT) AS signed_distance
FROM a LEFT JOIN ties t ON a.aid = t.aid
ORDER BY a.aid, closest_id"""


Q111_SAMPLED = """WITH a AS (SELECT c_custkey AS aid,
    'chr' || (c_custkey % 4) AS chrom,
    (c_custkey*5557) % 10000000 AS astart,
    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300 AS aend
  FROM customer WHERE c_custkey % {mod} = 0),
bv AS ({ivb}),
pair AS (SELECT a.aid, b.iv_id AS bid,
    b."start" AS bs, b."end" AS be,
    CASE WHEN a.astart < b."end" AND b."start" < a.aend THEN 0
         WHEN b."end" <= a.astart THEN a.astart - b."end"
         ELSE b."start" - a.aend END AS d
  FROM a JOIN bv b ON a.chrom = b.chrom),
rk AS (SELECT *, row_number() OVER
    (PARTITION BY aid ORDER BY d, bs, bid) AS rnk
  FROM pair)
SELECT a.aid, a.chrom, CAST(a.astart AS BIGINT) AS "start",
  CAST(a.aend AS BIGINT) AS "end",
  r.bid AS closest_id,
  CAST(r.bs AS BIGINT) AS closest_start,
  CAST(r.be AS BIGINT) AS closest_end,
  CAST(r.d AS BIGINT) AS distance,
  CAST(CASE WHEN r.d = 0 THEN 0
    WHEN r.be <= a.astart THEN -r.d ELSE r.d END
    AS BIGINT) AS signed_distance,
  CAST(r.rnk AS BIGINT) AS "rank"
FROM a LEFT JOIN rk r ON a.aid = r.aid AND r.rnk <= 3
ORDER BY a.aid, "rank\""""

Q112_SAMPLED = """WITH a0 AS (SELECT c_custkey AS aid,
    'chr' || (c_custkey % 4) AS chrom,
    (c_custkey*5557) % 10000000 AS astart,
    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300 AS aend
  FROM customer WHERE c_custkey % {mod} = 0),
a AS (SELECT *, {strand_a} AS strand FROM a0),
bv AS ({ivb}),
pair AS (SELECT a.aid, a.chrom, a.astart, a.aend, a.strand,
    CASE WHEN b.iv_id IS NULL THEN NULL
      ELSE struct_pack(
        d := CASE WHEN b."end" <= a.astart THEN a.astart - b."end"
                  ELSE b."start" - a.aend END,
        s := b."start", i := b.iv_id, e := b."end") END AS c
  FROM a LEFT JOIN bv b ON a.chrom = b.chrom
    AND NOT (a.astart < b."end" AND b."start" < a.aend)),
r AS (SELECT aid, chrom, astart, aend, strand, min(c) AS m
  FROM pair GROUP BY 1, 2, 3, 4, 5)
SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
  CAST(aend AS BIGINT) AS "end", m['i'] AS closest_id,
  CAST(m['s'] AS BIGINT) AS closest_start,
  CAST(m['e'] AS BIGINT) AS closest_end,
  CAST(m['d'] AS BIGINT) AS distance,
  CAST((CASE WHEN m['d'] = 0 THEN 0
      WHEN m['e'] <= astart THEN -m['d'] ELSE m['d'] END)
    * (CASE WHEN strand = '-' THEN -1 ELSE 1 END)
    AS BIGINT) AS signed_distance
FROM r ORDER BY aid"""

Q113_SAMPLED = """WITH a AS (SELECT c_custkey AS aid,
    'chr' || (c_custkey % 4) AS chrom,
    (c_custkey*5557) % 10000000 AS astart,
    (c_custkey*5557) % 10000000 + 30 + c_custkey % 300 AS aend
  FROM customer WHERE c_custkey % {mod} = 0),
bv AS ({ivbs}),
pu AS (SELECT a.aid, a.chrom, a.astart, a.aend,
    CASE WHEN b.iv_id IS NULL THEN NULL
      ELSE struct_pack(
        d := CASE WHEN a.astart < b."end"
                    AND b."start" < a.aend THEN 0
                  WHEN b."end" <= a.astart THEN a.astart - b."end"
                  ELSE b."start" - a.aend END,
        s := b."start", i := b.iv_id, e := b."end") END AS c
  FROM a LEFT JOIN bv b ON a.chrom = b.chrom
    AND b."end" >= a.astart),
ru AS (SELECT aid, chrom, astart, aend, min(c) AS m
  FROM pu GROUP BY 1, 2, 3, 4),
pd AS (SELECT a.aid, a.chrom, a.astart, a.aend,
    CASE WHEN b.iv_id IS NULL THEN NULL
      ELSE struct_pack(
        d := CASE WHEN a.astart < b."end"
                    AND b."start" < a.aend THEN 0
                  WHEN b."end" <= a.astart THEN a.astart - b."end"
                  ELSE b."start" - a.aend END,
        s := b."start", i := b.iv_id, e := b."end",
        t := b.strand) END AS c
  FROM a LEFT JOIN bv b ON a.chrom = b.chrom
    AND NOT ((b.strand <> '-' AND b."start" > a.aend)
      OR (b.strand = '-' AND b."end" < a.astart))),
rd AS (SELECT aid, chrom, astart, aend, min(c) AS m
  FROM pd GROUP BY 1, 2, 3, 4)
SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
  CAST(aend AS BIGINT) AS "end", m['i'] AS closest_id,
  CAST(m['s'] AS BIGINT) AS closest_start,
  CAST(m['e'] AS BIGINT) AS closest_end,
  CAST(m['d'] AS BIGINT) AS distance,
  CAST(CASE WHEN m['d'] = 0 THEN 0
    WHEN m['e'] <= astart THEN -m['d'] ELSE m['d'] END
    AS BIGINT) AS signed_distance,
  'iu' AS mode
FROM ru
UNION ALL
SELECT aid, chrom, CAST(astart AS BIGINT) AS "start",
  CAST(aend AS BIGINT) AS "end", m['i'] AS closest_id,
  CAST(m['s'] AS BIGINT) AS closest_start,
  CAST(m['e'] AS BIGINT) AS closest_end,
  CAST(m['d'] AS BIGINT) AS distance,
  CAST((CASE WHEN m['d'] = 0 THEN 0
      WHEN m['e'] <= astart THEN -m['d'] ELSE m['d'] END)
    * (CASE WHEN m['t'] = '-' THEN -1 ELSE 1 END)
    AS BIGINT) AS signed_distance,
  'idb' AS mode
FROM rd ORDER BY mode, aid"""


def check(name, con, outdir, sql, id_col, mod):
    want = con.execute(sql).df()
    got = pd.read_parquet(f"{outdir}/{name}")
    got = got[got[id_col] % mod == 0].reset_index(drop=True)
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)]
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs "
              f"{list(want.columns)}")
        return False
    if len(want) != len(got):
        print(f"FAIL {name}: sampled rows {len(got)} vs oracle {len(want)}")
        return False
    for c in want.columns:
        # numeric columns compare NUMERICALLY (NaN == NaN): a null
        # anywhere in the engine's FULL parquet column makes pandas
        # read it as float64 while the sampled oracle subset may have
        # no nulls at all (int64) — stringly comparison would then
        # fail on '200.0' vs '200' with both values exact
        import pandas.api.types as ptypes
        if (ptypes.is_numeric_dtype(want[c])
                and ptypes.is_numeric_dtype(got[c])):
            # nullable Int64 when BOTH sides are integral (r21 ADVICE
            # fix: an astype(float) round-trip loses exactness above
            # 2^53, so two large ids differing only there would
            # false-PASS); float columns keep the float compare
            if (ptypes.is_integer_dtype(want[c])
                    and ptypes.is_integer_dtype(got[c])):
                wv = want[c].astype("Int64")
                gv = got[c].astype("Int64")
            else:
                wv = want[c].astype(float)
                gv = got[c].astype(float)
            # fillna(False): under nullable Int64 a null-vs-value
            # compare yields pd.NA, and bool(pd.NA) raises in all()
            eq = ((wv.isna() & gv.isna())
                  | (wv == gv).fillna(False)).tolist()
            if not all(eq):
                i = eq.index(False)
                print(f"FAIL {name}: col {c} row {i}: "
                      f"{gv.iloc[i]} vs {wv.iloc[i]}")
                return False
            continue
        wv = want[c].astype(str).tolist()
        gv = got[c].astype(str).tolist()
        if wv != gv:
            i = next(i for i in range(len(wv)) if wv[i] != gv[i])
            print(f"FAIL {name}: col {c} row {i}: {gv[i]} vs {wv[i]}")
            return False
    print(f"OK   {name} (sampled 1-in-{mod}: {len(got)} rows exact)")
    return True


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    con = duckdb.connect()
    for t in ["customer", "orders"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    ivbs = IVB_S.format(ivb=IVB)
    ok = check("q77_closest", con, outdir,
               Q77_SAMPLED.format(mod=mod, ivb=IVB), "aid", mod)
    ok &= check("q79_subtract", con, outdir,
                Q79_SAMPLED.format(mod=mod, ivb=IVB), "aid", mod)
    ok &= check("q96_closest_stranded", con, outdir,
                Q96_SAMPLED.format(mod=mod, ivbs=ivbs,
                                   strand_a=STRAND_A), "aid", mod)
    ok &= check("q98_subtract_stranded", con, outdir,
                Q98_SAMPLED.format(mod=mod, ivbs=ivbs,
                                   strand_a=STRAND_A), "aid", mod)
    ok &= check("q107_subtract_opposite", con, outdir,
                Q107_SAMPLED.format(mod=mod, ivbs=ivbs,
                                    strand_a=STRAND_A), "aid", mod)
    ok &= check("q101_closest_all", con, outdir,
                Q101_SAMPLED.format(mod=mod, ivb=IVB), "aid", mod)
    ok &= check("q111_closest_k", con, outdir,
                Q111_SAMPLED.format(mod=mod, ivb=IVB), "aid", mod)
    ok &= check("q112_closest_io", con, outdir,
                Q112_SAMPLED.format(mod=mod, ivb=IVB,
                                    strand_a=STRAND_A), "aid", mod)
    ok &= check("q113_closest_updown", con, outdir,
                Q113_SAMPLED.format(mod=mod, ivbs=ivbs), "aid", mod)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
