"""Isolated best-of-N re-measure for single bench rows (r14 verdict
directive #5): the sf0.1 sub-second rows live inside a session-state
band (JIT warmth, code-cache, heap shape — BENCH_NOTES r14 measured
corpus_clean at 0.46-0.71 s across sessions on identical binaries), so
a protocol delta on a <1 s row is NOT a regression until it reproduces
under THIS harness: a fresh JVM per row, same tuning path as bench.py
(tune_for_tables), one warm-up action, then best of N timed noop-sink
materializations.

Usage: python tools/isolated_row.py q1_pricing_summary[,row2,...] \
           [SF_DIR] [N]
Prints one JSON line per row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rows = [r for r in sys.argv[1].split(",") if r]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import bench as benchmod
    import __spark_entry__ as entrymod
    from hrdp_variant_load_pipeline_spark.session import (
        get_spark,
        tune_for_tables,
    )

    queries = entrymod.queries()
    for name in rows:
        if name not in queries:
            raise SystemExit(f"unknown query {name!r}")

    for name in rows:
        spark = get_spark(f"isolated-{name}")
        fn = queries[name]
        tune_for_tables(spark, sf_dir, benchmod.QUERY_TABLES.get(name))
        times = []
        # one un-timed warm-up: scan caches + codegen, the same state
        # bench.py's earlier rows give later rows in a shared session
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        spark.stop()
        print(
            json.dumps(
                {
                    "metric": "isolated_row",
                    "query": name,
                    "sf_dir": sf_dir,
                    "best_s": round(min(times), 3),
                    "times_s": [round(t, 3) for t in times],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
