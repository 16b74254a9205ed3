#!/usr/bin/env python3
"""Reproducible 1x/2x/4x data-volume scaling CURVE (driver-side
tooling; the run_scale2x.py artifact extended one rung — r18 verdict
"next" #4: the 2x artifact had been the ceiling for six rounds).

Builds the sf1x/sf2x/sf4x parquet ladder with make_scale4x.py
(marker-cached), runs graft.Bench over each rung (a SAMPLED query
subset — the interval family, dedup/text, ANN, plus q50 — 2
interleaved passes, untimed output-row counts, recall at every
density), and assembles bench_out/scale4x_r{N}.json with per-query
seconds/rows/throughput at the three rungs and the pairwise ratios.

The curve answers what a single 2x point cannot: whether time ratios
are FLAT in the data (2x/1x approximately equals 4x/2x — input-linear)
or compounding (4x/2x > 2x/1x — superlinear work hiding below the 2x
noise floor).

Usage: run_scale4x.py <round-number> [src-sf-dir] [scale-dir]
"""
import json
import os
import subprocess
import sys

# Sampled subset (the r18 verdict's suggestion verbatim: "the interval
# family + dedup/ANN + q50"): every interval-algebra gate family
# member with a distinct plan shape, the dedup/text ladder, the
# production ANN paths, and the two historically volatile text rows.
SUBSET = ",".join([
    # interval family
    "q14_interval_join", "q36_merge_intervals", "q74_coverage",
    "q77_closest", "q78_complement", "q79_subtract",
    "q83_interval_map", "q87_interval_window",
    "q88_interval_coverage_by", "q89_interval_cluster",
    "q92_multiinter", "q93_reldist", "q95_interval_annotate",
    "q96_closest_stranded", "q100_map_fraction", "q101_closest_all",
    "q104_merge_gap", "q105_overlap_filter", "q107_subtract_opposite",
    "q108_intersect_wo", "q109_intersect_wao",
    "q111_closest_k", "q112_closest_io", "q113_closest_updown",
    "q114_intersect_split",
    # dedup / text
    "q22_fingerprint", "q23_minhash_sig", "q24_neardup_pairs",
    "q37_dedup_clusters", "q40_dedup_star", "q50_leakage_split",
    "q52_para_dedup", "q68_bm25", "q115_chunking",
    # ANN (recall block rides separately via BENCH_ANN=1)
    "q33_ann_banded", "q41_ann_ivf", "q65_ann_ivf_trained",
    "q66_ann_ivfpq", "q72_ann_ivfadc",
])


def run_bench(sfdir, out, ann_scale):
    # REUSE=1 resumes an interrupted ladder (same contract as
    # run_scale2x.py): opt-in only, never silently stale.
    if os.environ.get("SPARK_GRAFT_SCALE4X_REUSE") == "1" \
            and os.path.exists(out):
        try:
            rec = json.load(open(out))
            if rec.get("sf") == sfdir and rec.get("queries"):
                print(f"reusing existing record {out} (REUSE=1)")
                return rec
        except Exception:
            pass
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sfdir,
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_ONLY=SUBSET,
               SPARK_GRAFT_BENCH_RUNS="2",
               SPARK_GRAFT_BENCH_READERS="0",
               SPARK_GRAFT_BENCH_COUNTS="1",
               SPARK_GRAFT_BENCH_ANN="1",
               SPARK_GRAFT_ANN_SCALE=str(ann_scale),
               SPARK_GRAFT_BENCH_OUT=out)
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd="/root/repo", env=env, check=True,
                   stdout=subprocess.DEVNULL)
    return json.load(open(out))


def main():
    rnd = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    scale_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_scale4"
    marker = os.path.join(scale_dir, "scale4x.marker")
    tag = f"v1:{src}"
    if not (os.path.exists(marker) and open(marker).read().strip() == tag):
        subprocess.run([sys.executable,
                        "/root/repo/tools/make_scale4x.py", src, scale_dir],
                       check=True)
        with open(marker, "w") as f:
            f.write(tag)
    recs = {}
    for rung, ann in (("sf1x", 1), ("sf2x", 2), ("sf4x", 4)):
        recs[rung] = run_bench(os.path.join(scale_dir, rung),
                               f"/tmp/scale4x_{rung}.json", ann_scale=ann)
    qs = {r: recs[r]["queries"] for r in recs}
    rows = {r: recs[r].get("rows") or {} for r in recs}
    names = set(qs["sf1x"]) & set(qs["sf2x"]) & set(qs["sf4x"])
    missing = sorted(
        (set(qs["sf1x"]) | set(qs["sf2x"]) | set(qs["sf4x"])) - names
        | set().union(*(set(recs[r].get("failed", [])) for r in recs)))
    per = {}
    for name in sorted(names):
        t1, t2, t4 = (qs[r][name] for r in ("sf1x", "sf2x", "sf4x"))
        n1, n2, n4 = (rows[r].get(name, -1) for r in ("sf1x", "sf2x",
                                                      "sf4x"))
        e = {"sec": {"1x": round(t1, 3), "2x": round(t2, 3),
                     "4x": round(t4, 3)},
             "rows": {"1x": n1, "2x": n2, "4x": n4},
             "time_ratio_2x_1x": round(t2 / t1, 2) if t1 > 0 else None,
             "time_ratio_4x_2x": round(t4 / t2, 2) if t2 > 0 else None,
             "time_ratio_4x_1x": round(t4 / t1, 2) if t1 > 0 else None}
        # row_ratio needs only row counts (r21 ADVICE fix: the old
        # combined guard also suppressed this pure row-count ratio
        # whenever any rung reported a 0.0-second time)
        if n1 > 0 and n4 > 0 and n2 > 0:
            e["row_ratio_4x_1x"] = round(n4 / n1, 2)
            # min(t) > 0 mirrors the time-ratio guards: a 0.0-second
            # measurement (trivial rung or malformed REUSE record) must
            # not ZeroDivisionError away the whole assembled artifact
            if min(t1, t2, t4) > 0:
                # throughput at each rung; a DROPPING sequence flags
                # compounding degradation even when each step looks
                # small
                e["rows_per_sec"] = {"1x": round(n1 / t1),
                                     "2x": round(n2 / t2),
                                     "4x": round(n4 / t4)}
                e["throughput_ratio_4x_1x"] = round((n4 / t4) / (n1 / t1),
                                                    2)
        per[name] = e
    tsum = {r: sum(qs[r][n] for n in names) for r in recs}
    art = {
        "round": rnd,
        "what": ("per-query runtime AND output-row scaling over a "
                 "1x/2x/4x clone ladder (tools/make_scale4x.py, same "
                 "writer); sampled subset (interval family + dedup/ANN "
                 "+ q50), min of 2 interleaved passes, local[32]. The "
                 "health signal is a FLAT ratio curve: "
                 "time_ratio_4x_2x close to time_ratio_2x_1x means "
                 "input-linear; 4x_2x well above 2x_1x means "
                 "superlinear work. Pair-producing queries normalize "
                 "through throughput_ratio_4x_1x (output grows "
                 "quadratically by construction when every planted "
                 "class quadruples)."),
        "totals_sec": {r: round(tsum[r], 3) for r in tsum},
        "total_ratio_2x_1x": round(tsum["sf2x"] / tsum["sf1x"], 3),
        "total_ratio_4x_2x": round(tsum["sf4x"] / tsum["sf2x"], 3),
        "total_ratio_4x_1x": round(tsum["sf4x"] / tsum["sf1x"], 3),
        "calibration_sec": {r: recs[r].get("calibration_sec")
                            for r in recs},
        "calibration_median_sec": {
            r: recs[r].get("calibration_median_sec") for r in recs},
        "ann_recall": {r: recs[r].get("ann_recall") for r in recs},
        "missing_or_failed": missing,
        "per_query": per,
    }
    # calibrated ratios (r19 verdict "next" #4): each rung's total
    # divided by ITS OWN fixed-pure-Spark calibration median, so a
    # machine-state drift between rungs (or between rounds, when a
    # future judge compares curves) divides out instead of being
    # read as a scaling change
    calib = art["calibration_median_sec"]
    if all(isinstance(calib.get(r), (int, float)) and calib[r] > 0
           for r in recs):
        ct = {r: tsum[r] / calib[r] for r in recs}
        art["calibrated_totals"] = {r: round(ct[r], 3) for r in ct}
        art["calibrated_total_ratio_2x_1x"] = round(
            ct["sf2x"] / ct["sf1x"], 3)
        art["calibrated_total_ratio_4x_2x"] = round(
            ct["sf4x"] / ct["sf2x"], 3)
        art["calibrated_total_ratio_4x_1x"] = round(
            ct["sf4x"] / ct["sf1x"], 3)
    breaches = []
    for rung in ("sf1x", "sf2x", "sf4x"):
        ar = art["ann_recall"].get(rung)
        for key in ("clustered_banded_at10", "clustered_ivf_at10"):
            v = ar.get(key) if isinstance(ar, dict) else None
            if not (isinstance(v, (int, float)) and v >= 0.9):
                breaches.append(f"{rung}:{key}={v}")
    art["ann_recall_floor"] = {"floor": 0.9, "breaches": breaches}
    out = f"/root/repo/bench_out/scale4x_r{rnd}.json"
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {out}: totals 1x={art['totals_sec']['sf1x']} "
          f"2x={art['totals_sec']['sf2x']} 4x={art['totals_sec']['sf4x']} "
          f"(2x/1x {art['total_ratio_2x_1x']}, "
          f"4x/2x {art['total_ratio_4x_2x']})")
    if missing:
        print(f"  WARNING missing/failed at some rung: {missing}")
    if breaches:
        print(f"  WARNING recall floor breaches: {breaches}")
    worst = sorted((e["time_ratio_4x_2x"], n) for n, e in per.items()
                   if e.get("time_ratio_4x_2x") is not None)
    for tr, n in reversed(worst[-5:]):
        print(f"  steepest 4x/2x time ratio {tr}: {n} "
              f"(2x/1x was {per[n]['time_ratio_2x_1x']})")


if __name__ == "__main__":
    main()
