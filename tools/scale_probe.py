"""Scaling evidence: run headline queries at sf0.001 / sf0.01 / sf0.1
(100× data spread) and report wall-clock growth. A plan that scales
linearly shows time growth ≈ data growth on the big step (0.01→0.1, 10×
rows) once per-job fixed overhead (~0.2-0.3 s in local mode) is
subtracted; super-linear growth flags a plan that won't survive 100 TB.

Usage: python tools/scale_probe.py [query ...]   (default: headline set)
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

HEADLINE = [
    "field_stats_events",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "dedup_minhash_pairs_documents",
    "dedup_jaccard_pairs_documents",
    "simhash_documents",
    "similarity_topk_embeddings",
    "ann_srp_topk_embeddings",
    "embedding_near_dup_pairs",
    "dynamic_schema_histogram_events",
    "corpus_build_documents",
    "window_top3_orders_per_customer",
    # round-6/7 heavy tier (verdict-r6 #5): the iterative / gram-join /
    # Arrow-stage families, probed by default so every round's SCALE.md
    # step table includes them
    "remove_repeated_ngrams_documents",
    "remove_repeated_spans_documents",
    "semantic_dedup_embeddings",
    "kmeans_step_embeddings",
    "pagerank_near_dup",
    "bpe_token_counts_documents",
    "token_budget_select_bpe_documents",
    # round-10 tiers (SCALE.md round-10 step table): sketch, codec,
    # window, composed-ANN, and certification families
    "wav_audio_features_documents",
    "mg_heavy_hitters_events",
    "triangle_count_near_dup",
    "ewma_smooth_events",
    "scd2_event_type_events",
    "ivfpq_topk_embeddings",
    "minhash_estimate_error_pairs",
    "quantile_sketch_by_type_events",
]


def main() -> None:
    from mongo_analyser_spark import get_spark
    from mongo_analyser_spark.queries import QUERIES

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("scale_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    # warm-up at the largest sf so codegen/classloading is paid up front
    for n in names:
        QUERIES[n](spark, SFS[-1]).collect()

    results: dict[str, list[float]] = {}
    for n in names:
        times = []
        for sf in SFS:
            t0 = time.time()
            QUERIES[n](spark, sf).collect()
            times.append(round(time.time() - t0, 3))
        results[n] = times

    print("| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | 10× data step ratio |")
    print("|---|---|---|---|---|")
    for n, (t1, t2, t3) in results.items():
        # growth on the 0.01→0.1 step, with ~0.2 s fixed job overhead removed
        oh = 0.2
        ratio = (t3 - oh) / max(t2 - oh, 0.05)
        print(f"| {n} | {t1:.2f} | {t2:.2f} | {t3:.2f} | {ratio:.1f}× |")
    print(json.dumps({"metric": "scale_probe", "sfs": [0.001, 0.01, 0.1], "times": results}))


if __name__ == "__main__":
    main()
