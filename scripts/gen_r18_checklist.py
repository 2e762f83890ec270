"""Emit the OPTIMIZATION_r18.md per-face checklist table: every registered
face with its pre-optimization and end-of-round bench numbers (wall and
process-tree CPU) and its r18 disposition.

Usage: python scripts/gen_r18_checklist.py PRE.json POST.json > table.md
"""
from __future__ import annotations

import json
import sys

CHANGED = {
    # batch 1 (db8edc6)
    "pagerank": "b1: per-iteration localCheckpoint (plan 2,870→13 lines); b2: shingle cache",
    "ann_recall": "b1: single left-join recall agg; b2: IVF staged-norm persist propagated",
    "lsh_recall": "b1: single full-outer recall agg (40→20 Exchanges); b3: sig/shingle cache handles propagated (leak fix)",
    "bpe_merges": "b1: per-round eager count dropped (13→6 jobs), deferred cache release",
    "somatic_calls": "b1: pairs/fusions persisted (plan 1,915→1,161 lines); b5: eager fill (race-proof)",
    "somatic_calls_bucketed": "b1: same pairs/fusions persists; write IS the face's claim",
    "mad_anomalies": "b1: per-key totals ride the cumulative window's exchange; b2: tiny med frame persisted",
    "countmin_tokens": "b1: one explode+agg instead of 4 unioned scans; distinct-token md5 weighted by count",
    # batch 2
    "distribution_drift": "b2: vals persist tried, MEASURED SLOWER, reverted in b5 (pruned re-aggs beat cache round-trip; 100 TB flip documented)",
    "ngram_jaccard": "b2: exploded shingle table cached once (explode 3×→1); b5: eager fill",
    "ngram_jaccard_stoplist": "b2: cache the EXPLODED table, consumers re-apply broadcast anti-probe (CPU 31.4→13.9)",
    "containment_dedup": "b2: same exploded-table cache (CPU 16.5→1.0)",
    "embedding_dups": "b2: staged-norm frame persisted (3 consumers)",
    "ann_ivf": "b2: IVF core staged-norm frame persisted (2 consumers)",
    "ann_ivf_trained": "b2: same IVF core persist",
    "minhash_lsh": "b2: conv() base hash (~1/40th nodes; CPU 13.3→8.2)",
    "simhash_pairs": "b2: 64 votes as one codegen'd hash agg + conv() packing (wall 2.9→2.6)",
    "substring_dedup": "b2: posexploded gram table persisted (2 consumers)",
    "hash_sample": "b2: conv() hash_bucket",
    "dataset_split": "b2: conv() hash_bucket",
    "sequence_pack": "b2: conv() hash_bucket",
    "temperature_mix": "b2: conv() hash_bucket (shared helper)",
    "quality_weighted_sample": "b2: conv() hash_bucket (shared helper)",
    "group_sample": "b2: conv() hash_bucket (shared helper)",
    "llm_corpus_pipeline": "b2: conv() hash_bucket in the split stage",
    "curation_pipeline": "b2: conv() hash_bucket in weighted sampling",
    # batch 3 (leak fixes / propagation)
    "bfs_hops": "b2: shingle cache; b3: per-round checkpoint release (9 leaked RDDs→0)",
    "sssp_weighted": "b2: shingle cache; b3: per-round checkpoint release",
    "kcore": "b2: shingle cache propagated",
    "triangle_count": "b2: shingle cache (CPU 18.7→10.3)",
    "dedup_components": "b2: shingle cache + upstream handle propagation",
    "dedup_canonical": "b2: shingle cache; b3: handles propagated past the joins (leak fix)",
    "dedup_weights": "b2: shingle cache (lazy form raced — CPU 12.8→27); b5: eager fill",
    "hierarchy_rollup": "b3: tree_roots per-round checkpoint release",
    "heavy_hitters": "b3: checkpoint handle on the returned frame (leak fix)",
    "jaccard_estimate": "b3: sig cache handled + 4×-consumed token table persisted; b5: eager fill",
    "clinical_merge_flow": "b3: merge checkpoint handle released by the bench hook (leak fix)",
    # batch 4
    "grouped_quantiles": "b4: opt-in bucketed two-phase prefix sum (n_buckets>1); default plan unchanged",
    "weighted_quantiles": "b4: same operator; default plan unchanged",
}

LEFT_ALONE = {
    "multimodal_features": "two mapInPandas crossings ARE the face's codec-path claim; payloads never shuffle",
    "multimodal_audio": "same contract as multimodal_features",
    "clinical_merge_bucketed": "bucketed write IS the claim; exchange-free re-merge verified r17",
    "maf_reconcile": "re-derived subtrees are cheap string projections over one scan",
    "decontaminate": "already minimal: one tokenize pass, broadcast probe, pruned id re-scan",
    "exact_quantiles": "bounded parameter-sized control-flow collects by design",
    "drift_by_segment": "ks_drift_by_key is already a single declarative plan",
    "trend_slopes": "two map-side-combinable aggs, no window — already minimal",
    "anomaly_flags": "one stats agg + join back — already minimal",
    "interval_join": "binned join shape settled r14; no repeated subtree",
}

DEFAULT = (
    "examined: profiled (wall+CPU, plan-shape counters, before-plan in "
    "plans/r18/); no multiply-consumed subtree, no Python boundary in the "
    "plan, filters/pruning reach the scan — left alone"
)


def main():
    pre = json.loads(open(sys.argv[1]).read().strip().splitlines()[0])
    post = json.loads(open(sys.argv[2]).read().strip().splitlines()[0])
    qp, qn = pre["queries"], post["queries"]
    cp, cn = pre.get("queries_cpu", {}), post.get("queries_cpu", {})
    print("| face | pre s | post s | pre CPU | post CPU | disposition |")
    print("|---|---|---|---|---|---|")
    for name in sorted(qn, key=lambda k: -qn[k]):
        disp = CHANGED.get(name) or LEFT_ALONE.get(name) or DEFAULT
        print(
            f"| {name} | {qp.get(name, float('nan')):.2f} | {qn[name]:.2f} "
            f"| {cp.get(name, float('nan')):.1f} | {cn.get(name, float('nan')):.1f} "
            f"| {disp} |"
        )


if __name__ == "__main__":
    main()
