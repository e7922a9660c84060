#!/usr/bin/env python3
"""Emit tools/new_entries_scale_r12.md: the scale curves of every
round-12 entry (plus the round-11 post-sweep waves that got their first
committed numbers this round) across the four committed sweep points."""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

R12 = [
    "q_agg_hll_merge", "q_agg_hll_rolling", "q_ts_holt",
    "q_stat_mahalanobis", "q_mix_decompose", "q_emb_drift",
    "q_sessionize_incremental", "q_scd2_asof", "q_write_retention",
    "q_part_evolution", "q_agg_wpercentile", "q_dedup_threshold_curve",
    "q_media_audio_energy",
]
R11_LATE = [
    "q_roc_auc", "q_survival", "q_markov_acc", "q_ldiversity",
    "q_zonemap_prune", "q_dbscan_grid", "q_join_dpp", "q_skew_audit",
    "q_calibration", "q_feature_woe", "q_tcloseness", "q_join_null_aware",
    "q_stream_late", "q_graph_modularity", "q_join_existence",
    "q_rank_ndcg", "q_ts_rolling_median", "q_scan_merge_schema",
    "q_profile_psi", "q_dedup_prefix_filter", "q_ngram_novelty",
    "q_cdc_chunks", "q_ks_test", "q_mannwhitney", "q_skyline_3d",
]

points = [("sf0.1", "BENCH_sf01.json"), ("sf1", "BENCH_sf1.json"),
          ("sf3", "BENCH_sf3.json"), ("sf10", "BENCH_sf10.json")]
qs = {}
totals = {}
for name, fn in points:
    d = json.load(open(os.path.join(REPO, fn)))
    qs[name] = d["queries"]
    totals[name] = (d["value"], len(d["queries"]))

out = ["# New-entry scale curves — round 12 sweep", "",
       "Times from the committed 4-point sweep (median protocol, "
       "tools/sweep_report_r12.md). Row growth across points: "
       "1x / 10x / 30x / 100x.", ""]
for title, names in [("Round-12 entries", R12),
                     ("Round-11 post-sweep waves (first committed numbers)",
                      R11_LATE)]:
    out.append(f"## {title}")
    out.append("")
    out.append("| query | sf0.1 | sf1 | sf3 | sf10 | x100 |")
    out.append("|---|---|---|---|---|---|")
    for q in names:
        row = [qs[p].get(q) for p, _ in points]
        if row[0] is None:
            continue
        ratio = (f"{row[3] / row[0]:.1f}x" if row[0] and row[3] else "-")
        cells = " | ".join("-" if v is None else f"{v:.2f}" for v in row)
        out.append(f"| {q} | {cells} | {ratio} |")
    out.append("")
out.append("## Totals")
out.append("")
out.append("| point | total (s) | entries |")
out.append("|---|---|---|")
for name, _ in points:
    t, n = totals[name]
    out.append(f"| {name} | {t:.1f} | {n} |")
out.append("")

open(os.path.join(REPO, "tools/new_entries_scale_r12.md"), "w").write(
    "\n".join(out) + "\n")
print("wrote tools/new_entries_scale_r12.md")
