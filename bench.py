"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

When benching the default sf0.1 dir, the line also carries a "scaled"
section: the same queries at a 10x staged copy (~sf1, auto-generated once
under benchdata/sf1 via tools/make_scaled_sf.py) with a per-query DuckDB
side-by-side (tools/duck_bench.py, subprocess-isolated, hard timeout).
The sub-second sf0.1 oracles are dominated by Spark's fixed per-job
overhead; the scaled section is the data-dominated comparison at the same
queries, reproducible from the staged dir. Disable with
SPARK_GRAFT_BENCH_SCALED=0 (or force on a non-default dir with =1).

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

_HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))
sys.path.insert(0, str(_HERE / "tools"))

import __spark_entry__ as entrymod  # noqa: E402
from hrdp_variant_load_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED_DIR = os.environ.get("SPARK_GRAFT_SCALED_DIR", str(_HERE / "benchdata" / "sf1"))
SCALED_K = 10
DUCK_TIMEOUT = float(os.environ.get("SPARK_GRAFT_DUCK_TIMEOUT", "60"))
_ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

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


def _jvm_stats(spark) -> tuple[float, float]:
    """(cumulative GC seconds, heap used MiB) of the local JVM — the
    evidence that separates a real plan regression from host noise or
    memory pressure when a per-query timing moves between rounds."""
    try:
        mf = spark._jvm.java.lang.management.ManagementFactory
        gc_ms = sum(
            b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans()
        )
        heap = mf.getMemoryMXBean().getHeapMemoryUsage().getUsed()
        return gc_ms / 1000.0, heap / 1024.0 / 1024.0
    except Exception:  # noqa: BLE001 — provenance is additive, never fatal
        return 0.0, 0.0


#: tables each headline query reads — drives the PER-QUERY runtime
#: profile (tune_for_tables): a small-input query inside a large dataset
#: keeps the small profile instead of paying AQE + cores-sized shuffles
QUERY_TABLES = {
    "q1_pricing_summary": ["lineitem"],
    "q3_shipping_priority": ["customer", "orders", "lineitem"],
    "q5_nation_volume": ["region", "nation", "customer", "supplier", "orders", "lineitem"],
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
    "embedding_cosine_topk": ["embeddings"],
    "embedding_ivf_topk": ["embeddings"],
}

# hand-maintained maps drift: a renamed query or a table absent from every
# sf dir would silently size a profile from 0 bytes. Fail fast instead.
assert set(QUERY_TABLES) == set(HEADLINE), (
    "QUERY_TABLES out of sync with HEADLINE: "
    f"{set(QUERY_TABLES) ^ set(HEADLINE)}"
)
assert all(
    t in set(_ALL_TABLES) for ts in QUERY_TABLES.values() for t in ts
), "QUERY_TABLES references an unknown table name"


def _bench_spark(
    spark, queries, sf_dir: str, tag: str, provenance: dict | None = None
) -> dict[str, float]:
    from hrdp_variant_load_pipeline_spark.session import (
        tune_for_input,
        tune_for_tables,
    )

    # input-size-aware profile (AQE / shuffle partitions) per benched dir
    applied = tune_for_input(spark, sf_dir)
    print(f"# {tag} profile: {applied}", file=sys.stderr)
    if provenance is not None:
        provenance["profile"] = applied
        provenance["queries"] = {}
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        best = None
        gc0, _ = _jvm_stats(spark)
        # per-query profile from the query's own input tables (falls back
        # to the dir-level profile for unmapped names)
        tune_for_tables(spark, sf_dir, QUERY_TABLES.get(name))
        for _ in range(2):  # best-of-2: report steady state, not JIT noise
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            # drop operator-internal persists so runs stay independent
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        if provenance is not None:
            gc1, heap = _jvm_stats(spark)
            provenance["queries"][name] = {
                "gc_s": round(gc1 - gc0, 3),  # GC across both timed runs
                "heap_mb": round(heap, 1),
                # 1-min host load BEFORE this query finished: >> cpus
                # means the timing was taken on a contended host (the r5
                # driver sf1 anomaly: shuffle-heavy rows 4-7x on a host
                # whose DuckDB side also slowed 21%)
                "load1": round(os.getloadavg()[0], 2),
            }
        print(f"# {tag} {name}: {timings[name]:.3f}s", file=sys.stderr)
    return timings


def _scaled_ready(out_dir: str) -> bool:
    return all(
        (Path(out_dir) / f"{t}.parquet" / "_SUCCESS").exists() for t in _ALL_TABLES
    )


DETAIL_FILE = "BENCH_DETAIL.json"
FINAL_LINE_BUDGET = 1500  # driver tail-captures ~2000 chars; stay well under


def final_line(out: dict) -> str:
    """Compact final stdout line for the driver: sf-dir per-query timings +
    totals-only summaries of the scaled/DuckDB sections (full detail lives
    in BENCH_DETAIL.json). Guaranteed < FINAL_LINE_BUDGET chars — if the
    per-query dict ever pushes past it, queries are dropped (detail file
    still has them) rather than risk the driver's tail truncating the line.
    """
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out.get("queries", {}),
        "sf": out["sf"],
        "detail": DETAIL_FILE,
    }
    scaled = out.get("scaled")
    if scaled:
        s: dict = {"sf": scaled.get("sf")}
        for key in ("value", "error", "duckdb_finished_total", "duckdb_error"):
            if key in scaled:
                s[key] = scaled[key]
        duck = scaled.get("duckdb")
        if isinstance(duck, dict):
            unfinished = sorted(
                k for k, v in duck.items() if not isinstance(v, (int, float))
            )
            if unfinished:
                s["duckdb_unfinished"] = unfinished
        compact["scaled"] = s
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > FINAL_LINE_BUDGET:
        compact["queries"] = "see detail file"
        line = json.dumps(compact, separators=(",", ":"))
    return line


def _sf_of(sf_dir: str):
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(sf)
    except ValueError:
        return sf_dir


def main() -> None:
    queries = entrymod.queries()
    spark = get_spark("bench")
    # warm the JVM: codegen, parquet reader, shuffle + broadcast machinery.
    # Run EVERY headline query once at the tiny sf so each query SHAPE
    # reaches steady-state JIT before its timed runs — measured: the first
    # execution of a shape carries 0.2-0.4 s of codegen/JIT that a
    # two-rep best-of at the timed sf only partially sheds (cost: a few
    # seconds at sf0.001, once per process).
    warm_sf = "/root/testdata/sf0.001"
    for wname in HEADLINE:
        try:
            queries[wname](spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001 — warmup is best-effort
            print(f"# warmup {wname} failed: {exc!r}", file=sys.stderr)

    prov: dict = {"cpus": os.cpu_count()}
    timings = _bench_spark(spark, queries, SF_DIR, f"sf{_sf_of(SF_DIR)}", prov)
    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        # per-query GC/heap/host-load evidence (detail file only — the
        # compact final line never carries it)
        "provenance": prov,
    }

    scaled_env = os.environ.get("SPARK_GRAFT_BENCH_SCALED")
    run_scaled = (
        scaled_env == "1"
        if scaled_env is not None
        else SF_DIR.rstrip("/").endswith("sf0.1")
    )
    if run_scaled:
        # the scaled + DuckDB side-by-side is additive signal: NO failure in
        # it may erase the sf0.1 Spark timings above (round 3 lost the whole
        # artifact to one unguarded parse of DuckDB's stdout progress bar).
        # Each sub-stage is guarded; whatever completed lands in the JSON.
        scaled_out: dict = {
            "sf": round(_sf_of(SF_DIR) * SCALED_K, 3),
            "dir": SCALED_DIR,
            "duckdb_timeout_s": DUCK_TIMEOUT,
            "note": (
                "reproduce: python tools/duck_bench.py <dir>; staged via "
                f"tools/make_scaled_sf.py {SCALED_K} <dir>"
            ),
        }
        try:
            if not _scaled_ready(SCALED_DIR):
                print(f"# staging {SCALED_K}x data at {SCALED_DIR}", file=sys.stderr)
                import make_scaled_sf

                make_scaled_sf.generate(spark, SCALED_K, SCALED_DIR)
            sprov: dict = {}
            scaled = _bench_spark(spark, queries, SCALED_DIR, "sf1", sprov)
            scaled_out["value"] = round(sum(scaled.values()), 3)
            scaled_out["queries"] = scaled
            scaled_out["provenance"] = sprov
        except Exception as exc:  # noqa: BLE001 — record, don't die
            scaled_out["error"] = f"spark-scaled: {exc!r}"[:500]
            print(f"# scaled spark section failed: {exc!r}", file=sys.stderr)
        if not _scaled_ready(SCALED_DIR):
            # never time a partially-staged dir: the worker creates views
            # only for files that exist, so timings would look plausible
            # while reading a fraction of the data
            scaled_out["duckdb_error"] = "scaled dir not fully staged"
        else:
            try:
                import duck_bench

                duck = duck_bench.run(
                    SCALED_DIR, HEADLINE, entrymod.oracle_sql(), timeout=DUCK_TIMEOUT
                )
                finished = [v for v in duck.values() if isinstance(v, (int, float))]
                scaled_out["duckdb"] = duck
                scaled_out["duckdb_threads"] = duck_bench.effective_threads()
                scaled_out["duckdb_finished_total"] = round(sum(finished), 3)
            except Exception as exc:  # noqa: BLE001
                scaled_out["duckdb_error"] = repr(exc)[:500]
                print(f"# duckdb section failed: {exc!r}", file=sys.stderr)
        out["scaled"] = scaled_out

    # full detail goes to a file (and stderr); the LAST stdout line must
    # stay compact — the driver captures only a ~2000-char tail, and three
    # rounds of perf data were lost to one fat JSON line overflowing it.
    detail_path = _HERE / DETAIL_FILE
    detail_path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"# full detail: {json.dumps(out)}", file=sys.stderr)
    print(final_line(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
