"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the ``noop`` sink so EVERY output
column is computed — a bare ``count()`` lets Catalyst prune the projected
expressions away entirely, silently timing just the scan for any query
that ends in a projection (the DuckDB side fetches full rows, so count()
timings would not be comparable). Timings exclude session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from hrdp_variant_load_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: the flagship relational queries + one from each extension
# family (dedup, similarity, text, events). Heavy O(n^2)-flavored ops
# (ngram_jaccard, near_dup) are exercised at sf0.01 by tests; the bench
# keeps the scale-path variants.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_volume",
    "scan_filter_project",
    "join_semi_anti_tagged",
    "insert_if_absent",
    "window_battery",
    "agg_distinct_battery",
    "grouping_sets_battery",
    "events_tumbling_counts",
    "events_sessionize",
    "events_asof_last_purchase",
    "text_token_stats",
    "text_doc_profile",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "corpus_clean_pipeline",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
]


def main() -> None:
    queries = entrymod.queries()
    spark = get_spark("bench")
    # warm the JVM: codegen, parquet reader, shuffle + broadcast machinery.
    # Run two representative queries at the tiny sf so steady-state JIT is
    # reached before any timed run.
    warm_sf = "/root/testdata/sf0.001"
    for wname in ("q1_pricing_summary", "q3_shipping_priority"):
        queries[wname](spark, warm_sf).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        best = None
        for _ in range(2):  # best-of-2: report steady state, not JIT noise
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            # drop operator-internal persists so runs stay independent
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = SF_DIR
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
