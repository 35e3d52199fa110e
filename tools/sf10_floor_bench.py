"""sf10 primitive floors under the small-aggregate family.

Round-11 verdict: `grouping_sets_battery` and `events_tumbling_counts`
were the only rows whose DuckDB ratio GREW from sf1 to sf10, and the
"engine-constant per-row gap" triage was asserted from the sf1 floor
table, never re-measured at sf10 size. This tool measures the raw Spark
primitives each row decomposes into, at the same staged sf10 data and
under the same protocol (per-table tune, noop sink, best-of-2), next to
the rows themselves in the SAME session — so BENCH_NOTES can pin
"row sits within ~2x of its own primitive floor" with sf10 numbers, or
expose a plan defect if it doesn't.

Floors:
  li_scan_sum       lineitem, 1-col scan + scalar agg  (scan floor)
  li_onekey_agg     lineitem, 1-key hash agg (count+sum), 1 exchange
  li_expand4_agg    lineitem, GROUPING SETS Expand x4 + agg (the battery's
                    physical core, minus its output expressions)
  ev_scan_sum       events, 1-col scan + scalar agg
  ev_onekey_agg     events, 1-key hash agg
  ev_exchange       events, one full-row hash exchange (repartition)
  ev_window_lag     events, per-user sort window + lag + agg (sessionize's
                    physical core)

Rows re-timed beside them: grouping_sets_battery, events_tumbling_counts,
events_sessionize.

Usage: python tools/sf10_floor_bench.py [SF10_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"

    import __spark_entry__ as entrymod
    from pyspark.sql import Window, functions as F

    from hrdp_variant_load_pipeline_spark.session import get_spark, tune_for_tables
    from hrdp_variant_load_pipeline_spark.sources.tables import table

    spark = get_spark("sf10-floor-bench")

    def li():
        return table(spark, sf_dir, "lineitem")

    def ev():
        return table(spark, sf_dir, "events")

    def expand4(_s):
        table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_floor")
        return spark.sql(
            """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   sum(l_quantity) AS s
            FROM li_floor
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), (l_linestatus), ())
            """
        )

    floors = {
        "li_scan_sum": ("lineitem", lambda s: li().agg(F.sum("l_quantity"))),
        "li_onekey_agg": (
            "lineitem",
            lambda s: li()
            .groupBy("l_returnflag")
            .agg(F.count("*"), F.sum("l_quantity")),
        ),
        "li_expand4_agg": ("lineitem", expand4),
        "ev_scan_sum": ("events", lambda s: ev().agg(F.sum("value"))),
        "ev_onekey_agg": (
            "events",
            lambda s: ev().groupBy("event_type").agg(F.count("*"), F.sum("value")),
        ),
        "ev_exchange": ("events", lambda s: ev().repartition("event_id")),
        "ev_window_lag": (
            "events",
            lambda s: ev()
            .withColumn(
                "prev",
                F.lag("ts").over(Window.partitionBy("user_id").orderBy("ts")),
            )
            .groupBy("user_id")
            .agg(F.count("prev")),
        ),
    }

    queries = entrymod.queries()
    rows = {
        "grouping_sets_battery": "lineitem",
        "events_tumbling_counts": "events",
        "events_sessionize": "events",
    }

    def timed(build, tables) -> float:
        tune_for_tables(spark, sf_dir, tables)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            spark.catalog.clearCache()
        return round(best, 3)

    out: dict = {"metric": "sf10_floor", "sf_dir": sf_dir, "floors": {}, "rows": {}}
    for name, (tbl, build) in floors.items():
        out["floors"][name] = timed(lambda b=build: b(spark), [tbl])
        print(
            f"# floor {name}: {out['floors'][name]:.3f}s "
            f"load1={os.getloadavg()[0]:.1f}",
            file=sys.stderr, flush=True,
        )
    for name, tbl in rows.items():
        fn = queries[name]
        out["rows"][name] = timed(lambda f=fn: f(spark, sf_dir), [tbl])
        print(
            f"# row {name}: {out['rows'][name]:.3f}s "
            f"load1={os.getloadavg()[0]:.1f}",
            file=sys.stderr, flush=True,
        )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
