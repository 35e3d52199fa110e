"""sf10 crossover bench: the round-11 scale-trend directive.

Runs the top headline rows (plus floor-calibration rows) at a 100x
staged copy of sf0.1 (~sf10, `tools/make_scaled_sf.py 100 OUT`) —
Spark side with bench.py's exact protocol (per-query table profile,
noop sink, best-of-2), DuckDB side via tools/duck_bench.py (subprocess,
pinned threads, best-of-2, hard timeout). Prints one JSON line.

The claim under test: every floor-bound sf1 ratio shrinks or flips as
data grows (DuckDB's advantage is fixed-cost, not algorithmic).

Usage: python tools/sf10_bench.py [SF10_DIR] [DUCK_TIMEOUT_S] [ROW,ROW,...]
(third arg overrides the default row set — used to extend the pinned
table to the full headline set without re-running the first batch)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

ROWS = [
    # the six rows the r10 verdict named
    "text_doc_profile",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "q5_nation_volume",
    "insert_if_absent",
    "corpus_stats_battery",
    # floor-trend calibration rows
    "q1_pricing_summary",
    "scan_filter_project",
    "join_semi_anti_tagged",
    "embedding_cosine_topk",
]

# same map as bench.py for the rows it carries; additions here
QUERY_TABLES = {
    "q1_pricing_summary": ["lineitem"],
    "q3_shipping_priority": ["customer", "orders", "lineitem"],
    "q5_nation_volume": [
        "region", "nation", "customer", "supplier", "orders", "lineitem",
    ],
    "scan_filter_project": ["lineitem"],
    "join_semi_anti_tagged": ["customer", "orders"],
    "insert_if_absent": ["lineitem"],
    "window_battery": ["lineitem"],
    "agg_distinct_battery": ["lineitem"],
    "grouping_sets_battery": ["lineitem"],
    "events_tumbling_counts": ["events"],
    "events_sessionize": ["events"],
    "events_asof_last_purchase": ["events"],
    "text_token_stats": ["documents"],
    "text_doc_profile": ["documents"],
    "dedup_exact": ["documents"],
    "dedup_minhash_lsh": ["documents"],
    "dedup_clusters": ["documents"],
    "corpus_clean_pipeline": ["documents"],
    "corpus_stats_battery": ["documents"],
    "embedding_cosine_topk": ["embeddings"],
    "embedding_ivf_topk": ["embeddings"],
    # r13 campaign extension: the scale-shaped rows the r12 verdict named
    "skew_salted_join_agg": ["lineitem", "orders"],
    "bucketed_store_join": ["part", "lineitem"],
    "corpus_prep_battery": ["documents"],
    "model_ops_battery": ["documents", "orders", "customer", "embeddings"],
    "scd2_battery": ["orders"],
    # r14 campaign completion: the five remaining scale-shaped rows the
    # r13 verdict named, plus the two rows new this round
    "iterative_ts_battery": [
        "customer", "events", "lineitem", "orders", "supplier",
    ],
    "merge_update_status": ["customer", "orders"],
    "dedup_text_battery": ["documents"],
    "embedding_ann_trained": ["embeddings"],
    "embedding_kmeans_centroids": ["embeddings"],
    "skew_adaptive_join_detail": ["lineitem", "orders"],
    # r15: retrieval_decon_probe folded into corpus_stats_battery (the
    # 'rdprobe' component) — no longer a standalone registry name
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
    duck_timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0
    rows = ROWS
    if len(sys.argv) > 3:
        rows = [r for r in sys.argv[3].split(",") if r]
        unknown = set(rows) - set(QUERY_TABLES)
        if unknown:
            raise SystemExit(f"unknown rows: {sorted(unknown)}")

    import duck_bench

    import __spark_entry__ as entrymod
    from hrdp_variant_load_pipeline_spark.session import (
        get_spark,
        tune_for_tables,
    )

    spark = get_spark("sf10-bench")
    queries = entrymod.queries()
    spark_times: dict[str, float] = {}
    for name in rows:
        fn = queries[name]
        tune_for_tables(spark, sf_dir, QUERY_TABLES.get(name))
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            spark.catalog.clearCache()
        spark_times[name] = round(best, 3)
        print(
            f"# spark {name}: {spark_times[name]:.3f}s "
            f"load1={os.getloadavg()[0]:.1f}",
            file=sys.stderr, flush=True,
        )
    spark.stop()

    duck = duck_bench.run(
        sf_dir, rows, entrymod.oracle_sql(), timeout=duck_timeout
    )
    out = {
        "metric": "sf10_crossover",
        "sf_dir": sf_dir,
        "spark": spark_times,
        "duckdb": duck,
        "duckdb_threads": duck_bench.effective_threads(),
        "duck_timeout_s": duck_timeout,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
