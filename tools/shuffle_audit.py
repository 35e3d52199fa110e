"""Exchange-volume audit: measure what actually crosses a shuffle.

The scale claims in BENCH_NOTES ("text never crosses an exchange",
"shuffle volume = candidate pairs, not the corpus", "the LM model table
is the only broadcast") are plan-audited today; this tool turns them
into MEASURED bytes. For each named registry query it runs the query
once with the Spark UI enabled and sums per-stage executor metrics from
the UI's REST endpoint (the same numbers the Spark history server
shows): input bytes read from source, shuffle write/read bytes, output
rows. The headline ratio shuffle_write/input is the operator's
exchange amplification — the number that decides whether a plan
survives 100x, since shuffle is the only cost that must cross the
network on a real cluster.

Protocol notes: one warm run per query is measured (exchange bytes are
plan properties, not timing — identical across reps, load-insensitive),
AQE left exactly as the bench profile sets it, metrics scoped to the
stages newly completed during that query's run. The denominator for
the amplification ratio is the ON-DISK size of the parquet tables the
query reads (from sf10_bench.QUERY_TABLES) — the stage-level
``inputBytes`` is kept as ``scan_read_mb`` but is informational only:
Hadoop FS read statistics under-count in many-threaded local mode.

Usage: python tools/shuffle_audit.py [SF_DIR] [ROW,ROW,...]
Prints one JSON line: {query: {tables_mb, scan_read_mb,
shuffle_write_mb, shuffle_read_mb, amplification}}.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def _table_mb(sf_dir: str, tables: list[str] | None) -> float | None:
    if not tables:
        return None
    total = 0
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            total += sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(p)
                for f in fs
            )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return round(total / (1024.0 * 1024.0), 2)

DEFAULT_ROWS = [
    # text/dedup family: the "text never crosses an exchange" claim
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_text_battery",
    # corpus/LM family: the "model-sized aggregates" claim
    "corpus_stats_battery",
    "text_token_stats",
    # join family: the shuffle-bound floor rows
    "q3_shipping_priority",
    "skew_salted_join_agg",
    "bucketed_store_join",
    # embedding family: the "vectors shuffle once, candidates only" claim
    "embedding_cosine_topk",
    "embedding_ivf_topk",
]


def _stages(ui: str, app_id: str) -> dict[int, dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        rows = json.load(r)
    # attempt 0 unless retried; keep the latest attempt per stage
    out: dict[int, dict] = {}
    for s in rows:
        sid = s["stageId"]
        if sid not in out or s["attemptId"] > out[sid]["attemptId"]:
            out[sid] = s
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rows = (
        [r for r in sys.argv[2].split(",") if r]
        if len(sys.argv) > 2
        else DEFAULT_ROWS
    )

    import __spark_entry__ as entrymod
    from hrdp_variant_load_pipeline_spark.session import (
        get_spark,
        tune_for_tables,
    )

    spark = get_spark(
        "shuffle-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    queries = entrymod.queries()
    unknown = set(rows) - set(queries)
    if unknown:
        raise SystemExit(f"unknown rows: {sorted(unknown)}")

    report: dict[str, dict] = {}
    for name in rows:
        tune_for_tables(spark, sf_dir, None)
        before = set(_stages(ui, app_id))
        # the bench sink: the FULL plan executes (count() would let the
        # terminal aggregate prune columns and understate exchanges)
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        after = _stages(ui, app_id)
        new = [s for sid, s in after.items() if sid not in before]
        mb = 1024.0 * 1024.0
        inp = sum(s.get("inputBytes", 0) for s in new)
        sw = sum(s.get("shuffleWriteBytes", 0) for s in new)
        sr = sum(s.get("shuffleReadBytes", 0) for s in new)
        from sf10_bench import QUERY_TABLES

        tmb = _table_mb(sf_dir, QUERY_TABLES.get(name))
        report[name] = {
            "stages": len(new),
            "tables_mb": tmb,
            "scan_read_mb": round(inp / mb, 2),
            "shuffle_write_mb": round(sw / mb, 2),
            "shuffle_read_mb": round(sr / mb, 2),
            "amplification": round(sw / mb / tmb, 4) if tmb else None,
        }
        print(f"# {name}: {report[name]}", file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({"metric": "shuffle_audit", "sf_dir": sf_dir,
                      "rows": report}))


if __name__ == "__main__":
    main()
