"""Scaling evidence: run headline queries at sf0.001 / sf0.01 / sf0.1
(100× data spread) and report wall-clock growth. A plan that scales
linearly shows time growth ≈ data growth on the big step (0.01→0.1, 10×
rows) once per-job fixed overhead (~0.2-0.3 s in local mode) is
subtracted; super-linear growth flags a plan that won't survive 100 TB.

Usage: python tools/scale_probe.py [query ...]   (default: headline set)
       python tools/scale_probe.py --long-docs [query ...]
Prints a markdown table + one JSON line.

--long-docs probes the DOC-LENGTH axis (round-10 verdict #1): the
driver corpus varies doc COUNT but every document is ~300 chars, so a
text operator superlinear in L — exactly how round 9's char_entropy
blew up — is invisible to the count-axis table. This mode synthesizes
a deterministic long-doc tier (300 docs of 10–100 KB built by cyclic
concatenation of the sf0.1 corpus, ~16 MB vs the 1.5 MB baseline; other
tables symlinked from sf0.1) under .scale/longdocs/ and reports each
text family's cost normalized PER MEGABYTE of corpus text at both
lengths. per-MB ratio ≈ 1 means linear in L; >2 flags superlinearity
the count axis cannot see.
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


# text-heavy families whose per-row cost grows with doc LENGTH: regex
# chains, HOF stacks, sorted/boundary arrays, gram explodes, Arrow BPE
LONGDOC_QUERIES = [
    "text_stats_documents",
    "gopher_rules_documents",
    "char_entropy_documents",
    "pii_scrub_extended_documents",
    "fingerprint_documents",
    "unigram_nll_documents",
    "kneser_ney_nll_documents",
    "bpe_token_counts_documents",
    "chunk_tokens_documents",
    "remove_repeated_ngrams_documents",
    "remove_repeated_spans_documents",
    "minhash_signatures_documents",
    "lang_histogram_documents",
]

LONGDOC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale",
    "longdocs",
)


def build_longdocs(base_sf: str = "/root/testdata/sf0.1") -> tuple[str, float]:
    """Deterministic long-doc tier: 300 documents whose doc i has target
    length (i%10+1)*10 KB, built by cyclically concatenating the base
    corpus texts starting at offset i (so content varies per doc but is
    fully reproducible). Returns (dir, corpus_megabytes)."""
    import duckdb

    os.makedirs(LONGDOC_DIR, exist_ok=True)
    out = os.path.join(LONGDOC_DIR, "documents.parquet")
    if not os.path.exists(out):
        con = duckdb.connect()
        texts = [
            t[0]
            for t in con.execute(
                "SELECT text FROM read_parquet(?) ORDER BY doc_id",
                [os.path.join(base_sf, "documents.parquet")],
            ).fetchall()
        ]
        rows = []
        for i in range(300):
            target = (i % 10 + 1) * 10_000
            parts, size, j = [], 0, i
            while size < target:
                parts.append(texts[j % len(texts)] or "")
                size += len(parts[-1]) + 1
                j += 1
            doc = " ".join(parts)[:target]
            rows.append((i, doc, ["en", "de", "zh"][i % 3], f"src{i % 4}",
                         len(doc)))
        con.execute(
            "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
            " source VARCHAR, n_chars BIGINT)"
        )
        con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
        con.execute(f"COPY t TO '{out}' (FORMAT PARQUET)")
    # the text families only read documents, but symlink the rest so any
    # load_table call resolves
    for f in os.listdir(base_sf):
        dst = os.path.join(LONGDOC_DIR, f)
        if f != "documents.parquet" and not os.path.exists(dst):
            os.symlink(os.path.join(base_sf, f), dst)
    import duckdb as d

    mb = d.sql(
        f"SELECT sum(length(text))/1e6 FROM read_parquet('{out}')"
    ).fetchone()[0]
    return LONGDOC_DIR, float(mb)


SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale",
    "sf1",
)

#: flagship families for the sf0.1 -> sf1 decade (verdict-r10 #6)
SF1_QUERIES = [
    "field_stats_events",
    "dedup_minhash_pairs_documents",
    "simhash_pairs_documents",
    "ivfpq_topk_embeddings",
    "remove_repeated_ngrams_documents",
    "scd2_event_type_events",
    "ewma_smooth_events",
    "mg_heavy_hitters_events",
    "quantile_sketch_by_type_events",
    "wav_audio_features_documents",
]


def build_sf1(base_sf: str = "/root/testdata/sf0.1") -> str:
    """Deterministic 10x tier (the driver ships no sf1): each base table
    replicated 10x with re-keyed ids. Copies are DECORRELATED so the
    synthetic growth matches a real corpus's structure, not a
    pathological one: documents rotate their word order per copy (a
    copy of doc A stays near-dup-similar to the same copy of its true
    near-dups but NOT to other copies of A — cluster COUNT grows 10x,
    cluster SIZE stays constant, so pair populations grow ~linearly as
    they would in reality. Decorrelation is per-copy WORD SALTING, a
    bijection on the shingle space: within-copy Jaccard is EXACTLY the
    base corpus's, cross-copy shared shingles are zero. The first
    attempt rotated word order instead — rotations preserve cyclic
    shingles, so copies of one doc stayed near-dups of each other and
    the pair population grew ~100x, which showed up immediately as a
    phony 11.8x step on dedup_minhash_pairs); embeddings perturb one
    dimension per copy;
    events shift user_id per copy (10x users, same history depth per
    user). TPC-H tables are symlinked (the flagship set doesn't read
    them)."""
    import duckdb

    os.makedirs(SF1_DIR, exist_ok=True)
    con = duckdb.connect()
    ev = os.path.join(SF1_DIR, "events.parquet")
    if not os.path.exists(ev):
        con.execute(f"""
COPY (
  SELECT event_id + c.c * 100000 AS event_id, ts,
         user_id + c.c * 1500 AS user_id, event_type, value, props
  FROM read_parquet('{base_sf}/events.parquet')
  CROSS JOIN generate_series(0, 9) c(c)
) TO '{ev}' (FORMAT PARQUET)""")
    dc = os.path.join(SF1_DIR, "documents.parquet")
    if not os.path.exists(dc):
        con.execute(f"""
COPY (
  SELECT doc_id + c.c * 5000 AS doc_id,
         CASE WHEN c.c = 0 THEN text
              ELSE array_to_string(list_transform(
                     string_split(text, ' '), w -> w || '~' || c.c), ' ')
         END AS text,
         lang, source, n_chars
  FROM read_parquet('{base_sf}/documents.parquet')
  CROSS JOIN generate_series(0, 9) c(c)
) TO '{dc}' (FORMAT PARQUET)""")
    em = os.path.join(SF1_DIR, "embeddings.parquet")
    if not os.path.exists(em):
        con.execute(f"""
COPY (
  SELECT vec_id + c.c * 2000 AS vec_id,
         list_transform(embedding, (x, i) ->
           CAST(CASE WHEN i = (c.c % 64) + 1
                     THEN x + 0.05 * (c.c + 1) ELSE x END AS FLOAT)
         ) AS embedding,
         label
  FROM read_parquet('{base_sf}/embeddings.parquet')
  CROSS JOIN generate_series(0, 9) c(c)
) TO '{em}' (FORMAT PARQUET)""")
    for f in os.listdir(base_sf):
        dst = os.path.join(SF1_DIR, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(base_sf, f), dst)
    return SF1_DIR


def main_sf1(names: list[str]) -> None:
    from mongo_analyser_spark import get_spark
    from mongo_analyser_spark.queries import QUERIES

    base_sf = "/root/testdata/sf0.1"
    sf1 = build_sf1(base_sf)
    spark = get_spark(
        "scale_probe_sf1", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    names = names or SF1_QUERIES
    for n in names:
        QUERIES[n](spark, base_sf).collect()  # warm-up
    print("| query | sf0.1 (s) | sf1-synth (s) | 10× step ratio |")
    print("|---|---|---|---|")
    results = {}
    oh = 0.2
    for n in names:
        t0 = time.time()
        QUERIES[n](spark, base_sf).collect()
        tb = time.time() - t0
        t0 = time.time()
        QUERIES[n](spark, sf1).collect()
        tl = time.time() - t0
        ratio = (tl - oh) / max(tb - oh, 0.05)
        results[n] = {"sf0.1_s": round(tb, 3), "sf1_s": round(tl, 3),
                      "step": round(ratio, 2)}
        print(f"| {n} | {tb:.2f} | {tl:.2f} | {ratio:.1f}× |")
    print(json.dumps({"metric": "sf1_probe", "results": results}))


def main_longdocs(names: list[str]) -> None:
    from mongo_analyser_spark import get_spark
    from mongo_analyser_spark.queries import QUERIES

    base_sf = "/root/testdata/sf0.1"
    long_dir, long_mb = build_longdocs(base_sf)
    import duckdb

    base_mb = float(
        duckdb.sql(
            "SELECT sum(length(text))/1e6 FROM "
            f"read_parquet('{base_sf}/documents.parquet')"
        ).fetchone()[0]
    )
    spark = get_spark(
        "scale_probe_L", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    names = names or LONGDOC_QUERIES
    for n in names:  # warm-up: codegen + Arrow init at the small scale
        QUERIES[n](spark, base_sf).collect()
    print(
        f"| query | sf0.1 {base_mb:.1f} MB (s) | longdocs {long_mb:.1f} MB (s)"
        " | s/MB base | s/MB long | per-MB ratio |"
    )
    print("|---|---|---|---|---|---|")
    results = {}
    oh = 0.2  # fixed per-job overhead in local mode
    for n in names:
        t0 = time.time()
        QUERIES[n](spark, base_sf).collect()
        tb = time.time() - t0
        t0 = time.time()
        QUERIES[n](spark, long_dir).collect()
        tl = time.time() - t0
        pb = max(tb - oh, 0.01) / base_mb
        pl = max(tl - oh, 0.01) / long_mb
        results[n] = {
            "base_s": round(tb, 3), "long_s": round(tl, 3),
            "per_mb_base": round(pb, 4), "per_mb_long": round(pl, 4),
            "ratio": round(pl / pb, 2),
        }
        print(
            f"| {n} | {tb:.2f} | {tl:.2f} | {pb:.3f} | {pl:.3f} |"
            f" {pl / pb:.2f}× |"
        )
    print(json.dumps({
        "metric": "longdoc_probe", "base_mb": round(base_mb, 2),
        "long_mb": round(long_mb, 2), "results": results,
    }))


def main() -> None:
    from mongo_analyser_spark import get_spark
    from mongo_analyser_spark.queries import QUERIES

    argv = sys.argv[1:]
    if argv and argv[0] == "--long-docs":
        main_longdocs(argv[1:])
        return
    if argv and argv[0] == "--sf1":
        main_sf1(argv[1:])
        return
    names = argv or HEADLINE
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
