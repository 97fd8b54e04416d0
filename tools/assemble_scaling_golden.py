#!/usr/bin/env python3
"""Assemble golden/scaling_r14.json.

Inputs (in order):
  1. p10       -- full heavy list, round-14 PPJoin producer
  2. p50       -- graph-family subset, round-14 PPJoin producer
  3. p10_pre   -- full heavy list, PRE-fix source-blocked producer
  4. p50_pre   -- 5-query subset, PRE-fix producer (the quadratic evidence)
  5. iso10_pre -- q_graph_degree isolate at 10x, pre-fix
  6. iso50_pre -- q_graph_degree isolate at 50x, pre-fix
  7. p50_pre_shuffle160 -- pre-fix graph family at 5x partitions
       (refuted the partition-pressure hypothesis)
"""
import json, sys

(p10, p50, p10_pre, p50_pre, iso10, iso50, p50sh) = [
    json.load(open(a)) for a in sys.argv[1:8]]

out = {
    "note": (
        "Two-point scaling canary (VERDICT r13 #6) on the round-14 "
        "suffix-tag fixture family (uncapped in K; the Caesar family "
        "capped at 26). ratio_vs_ratio = (time_ratio_50x / "
        "time_ratio_10x) / 5 -- 1.0 means the 10x trend extrapolates "
        "exactly; > 1 means marginal super-linear bending. STORY OF "
        "THIS ROUND: the pre-fix artifacts price a REAL quadratic the "
        "canary caught -- the shared pair-graph producer stage blocked "
        "its similarity self-join on `source` alone, so block sizes "
        "grew with the corpus: the q_graph_degree isolate (= pairGraph "
        "+ a map-only readout) ran 80.7x the base time at 50x data "
        "(fits sum-of-block-squares exactly), while a 5x-partitions "
        "re-run (p50_pre_shuffle160) got SLOWER, refuting the "
        "per-partition-memory hypothesis and pinning the bend on the "
        "plan. Fix: PPJoin prefix filtering on (source, rare-token) "
        "equality -- lossless, results byte-identical (oracle-checked "
        "at both SFs). Post-fix, the isolate's 50x ratio drops 80.7 -> "
        "~8 and every graph-family marginal lands ~1.0. Disclosed "
        "family constant: the char-gram q_llm_winnow_dup sees a fixed "
        "~3.25x within-copy pair-density lift from the tags "
        "(rows_ratio 32.5 at 10x) -- exactly linear in K."
    ),
    "p10": p10,
    "p50": p50,
    "pre_fix": {
        "p10": p10_pre,
        "p50": p50_pre,
        "isolate_10x": iso10,
        "isolate_50x": iso50,
        "p50_shuffle160": p50sh,
    },
}

rvr = {}
for q, v in p50["queries"].items():
    r10 = p10["queries"][q]["time_ratio"]
    r50 = v["time_ratio"]
    entry = {"ratio_10x": r10, "ratio_50x": round(r50, 3),
             "ratio_vs_ratio": round(r50 / r10 / 5.0, 3)}
    if q in p50_pre.get("queries", {}):
        r10p = p10_pre["queries"][q]["time_ratio"]
        r50p = p50_pre["queries"][q]["time_ratio"]
        entry["pre_fix_ratio_vs_ratio"] = round(r50p / r10p / 5.0, 3)
    rvr[q] = entry
out["ratio_vs_ratio"] = rvr

json.dump(out, open("golden/scaling_r14.json", "w"), indent=1)
print(json.dumps(rvr, indent=1))
