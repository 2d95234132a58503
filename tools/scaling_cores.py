"""Core-scaling evidence (verdict-r15 #6): run the heavy registry rows
at the sf1 tier (10× sf0.1, tools/scale_probe.build_sf1) at two core
counts and report the low/high wall ratio per row — the parallel
fraction the sf0.1 bench cannot see (there the per-row Spark floor
dominates and the single-row-group fixture caps scans at one task).

Two measurement preconditions, both fixture-artifact corrections that
a production table has for free (committed with rationale in
OPTIMIZATION_r16.md):
* the sf1 tables are written with ROW_GROUP_SIZE 4096 so scans can
  split (a 100 TB table has thousands of row groups);
* ``spark.sql.files.maxPartitionBytes`` is lowered to 256 KB in THIS
  probe session only, so the ~6 MB fixture files yield ~24 scan tasks
  the way a real table's size would under the default 128 MB.

Usage: python tools/scaling_cores.py <cpus> [row,row,...]
Run once per core count (fresh process per count — local[N] is fixed
per JVM); compare the JSON lines.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_ROWS = [
    "dedup_minhash_pairs_documents",
    "remove_repeated_spans_documents",
    "decontaminate_documents",
    "pca_project_wide_embeddings",
    "ivfpq_wide_topk_embeddings",
    "minhash_signatures_documents",
    "dsir_select_documents",
    "theta_overlap_pairs_documents",
    "bloom_decontaminate_documents",
    "kneser_ney_nll_documents",
    "semantic_dedup_embeddings",
    "deep_melt_documents",
    "field_stats_events",
    "q1_pricing_summary",
    "wav_resample_features_documents",
    "bpe_token_counts_pretok_documents",
]


def main() -> int:
    cpus = int(sys.argv[1])
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_ROWS

    from scale_probe import build_sf1

    sf1 = build_sf1()

    from mongo_analyser_spark import get_spark
    from mongo_analyser_spark.queries import QUERIES

    spark = get_spark(f"scaling_cores_{cpus}", cpus=cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))

    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf1).collect()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf1).collect()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(json.dumps({"name": name, "cpus": cpus, "sec": out[name]}), flush=True)
    print(json.dumps({"cpus": cpus, "rows": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
