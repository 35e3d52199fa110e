"""Per-batch latency of the streaming corpus ingest vs history size.

Evidence for the O(batch + candidates) per-batch contract
(`streaming/corpus_stream.py`, candidate-pruned probe in
`operators/dedup.incremental_minhash_dedup`): seed the docs + signature
stores with H historical documents, stream a few fixed-size JSONL
batches through the REAL `stream_corpus_ingest`, and report the median
trigger latency from the query's own progress events. Run at two history
sizes (10x apart); the pass criterion is ONE-SIDED no-growth (large ≤
1.2× small; ≤1.5× across two decades for the optional xlarge point) — an
O(history) probe would show ~10x, while a larger history running FASTER
is host-load noise and passes.

Usage: python tools/stream_ingest_bench.py [small] [large] [xlarge]
(histories; default 2000 20000 0 — pass a third 10x point, e.g. 200000,
to pin the candidate-pushdown scan claim across two decades). Prints one
JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_DOCS = 300
N_BATCHES = 4  # batch 1 warms the stream; 2..N are measured

def _text(i: int) -> str:
    # deterministic 24-word docs over a 50k-word hash-mixed vocabulary —
    # docs are genuinely distinct (candidate pairs stay sparse, as in a
    # real corpus); every 50th doc reuses the previous doc's text so each
    # batch still carries a few real near-dup candidates
    import hashlib

    base = i - 1 if i % 50 == 0 and i > 0 else i
    h = hashlib.md5(f"doc{base}".encode()).hexdigest()
    words = [
        f"w{(int(h[j % 32], 16) * 3119 + base * 31 + j * 977) % 50000}"
        for j in range(24)
    ]
    return " ".join(words) + f" tail{base}"


def _jsonl(lo: int, hi: int) -> str:
    return "\n".join(
        json.dumps({"doc_id": i, "text": _text(i), "lang": "en"})
        for i in range(lo, hi)
    )


def run_one(spark, history_n: int) -> dict:
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        banded_signatures,
    )
    from hrdp_variant_load_pipeline_spark.sources.store import append_to_store
    from hrdp_variant_load_pipeline_spark.streaming.corpus_stream import (
        stream_corpus_ingest,
    )

    root = tempfile.mkdtemp(prefix="ingest_bench_")
    dirs = {k: os.path.join(root, k) for k in ("in", "docs", "index", "quar", "ckpt")}
    os.makedirs(dirs["in"])
    try:
        hist = spark.range(history_n).select(
            F.col("id").alias("doc_id"),
            F.udf(_text, "string")(F.col("id").cast("int")).alias("text"),
            F.lit("en").alias("lang"),
        ).repartition(8).localCheckpoint()
        # cluster the seeded history exactly like the real ingest's
        # appends: without doc-range-disjoint files, the candidate-id
        # pushdown the bench exists to evidence cannot prune a single
        # history file and the measured curve stops being the contract's
        append_to_store(
            banded_signatures(hist, "doc_id", "text"),
            dirs["index"],
            cluster_by=["doc"],
        )
        append_to_store(hist, dirs["docs"], cluster_by=["doc_id"])
        for b in range(N_BATCHES):
            lo = 1_000_000 + b * BATCH_DOCS
            with open(os.path.join(dirs["in"], f"b{b}.jsonl"), "w") as f:
                f.write(_jsonl(lo, lo + BATCH_DOCS))
        q = stream_corpus_ingest(
            spark,
            dirs["in"],
            dirs["docs"],
            dirs["index"],
            dirs["quar"],
            dirs["ckpt"],
            max_files_per_trigger=1,
        )
        q.processAllAvailable()
        lat = [
            p["durationMs"]["triggerExecution"] / 1000.0
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
        q.stop()
        return {
            "history": history_n,
            "batch_docs": BATCH_DOCS,
            "per_batch_sec": [round(x, 3) for x in lat],
            "median_warm_sec": round(statistics.median(lat[1:]), 3),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    large = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    xlarge = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    from hrdp_variant_load_pipeline_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    r_small = run_one(spark, small)
    r_large = run_one(spark, large)
    ratio = r_large["median_warm_sec"] / max(r_small["median_warm_sec"], 1e-9)
    out = {
        "metric": "stream_ingest_per_batch",
        "small": r_small,
        "large": r_large,
        "large_over_small": round(ratio, 3),
        # ONE-SIDED criterion (the key name says exactly what is tested):
        # only GROWTH with history size fails — a larger history running
        # faster is host-load noise, not an O(history) signal, so there
        # is deliberately no lower bound
        "no_growth_within_20pct": ratio <= 1.2,
    }
    if xlarge:
        r_x = run_one(spark, xlarge)
        out["xlarge"] = r_x
        xr = r_x["median_warm_sec"] / max(r_small["median_warm_sec"], 1e-9)
        out["xlarge_over_small"] = round(xr, 3)
        out["no_growth_two_decades_within_50pct"] = xr <= 1.5
    print(json.dumps(out))


if __name__ == "__main__":
    main()
