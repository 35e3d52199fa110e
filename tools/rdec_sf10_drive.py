"""Retrieval-decontamination stage drive at sf10 (r13 drive, re-run on
the r14 Zipf-vocabulary fixture).

The r13 number (196 s, 12.7k flagged) was measured on the bounded
494-type dialect corpus — the probe's declared WORST CASE (every doc
shares every type, so term profiles barely discriminate). This drive
repeats the same shape on the v3 staged corpus (382k types, Zipf slope
-1.12): ingest -> scratch index build -> ONE batched probe with every
benchmark item -> anti-join, reporting wall time, per-stage split, and
the flagged-document count a discriminative corpus produces.

Benchmark items: every 250th document (~2k items at sf10), exactly the
r13 protocol. Prints one JSON line.

Usage: python tools/rdec_sf10_drive.py [SF10_DIR] [MODE]
MODE: "retrieval" (default) drives the BM25 retrieval stage;
"semantic" drives the r14 TF-IDF-cosine stage (bounded probe,
min_cosine 0.8, max_df_frac 0.05, max_probe_terms 8) on the same
benchmark split.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
    mode = sys.argv[2] if len(sys.argv) > 2 else "retrieval"
    if mode not in ("retrieval", "semantic"):
        raise SystemExit(f"unknown mode {mode!r}: retrieval | semantic")
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.plans.corpus_pipeline import (
        run_corpus_pipeline,
    )
    from hrdp_variant_load_pipeline_spark.session import (
        get_spark,
        tune_for_input,
    )

    spark = get_spark("rdec-sf10-drive")
    tune_for_input(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="rdec_sf10_")
    try:
        bench_dir = os.path.join(work, "bench")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = docs.count()
        docs.filter(F.col("doc_id") % 250 == 0).select(
            "doc_id", "text"
        ).write.parquet(bench_dir)
        n_bench = spark.read.parquet(bench_dir).count()
        cfg = {
            "input": {
                "format": "parquet",
                "path": f"{sf_dir}/documents.parquet",
            },
        }
        if mode == "retrieval":
            stage = "retrieval_decontaminated"
            cfg["retrieval_decontaminate"] = {
                "path": bench_dir,
                "k": 10,
                "max_df_frac": 0.05,
                "max_query_terms": 8,
                "index_dir": os.path.join(work, "idx"),
                "report": True,
            }
        else:
            stage = "semantic_decontaminated"
            cfg["dedup"] = {"exact": False}
            cfg["semantic_decontaminate"] = {
                "path": bench_dir,
                "min_cosine": 0.8,
                "max_vocab": 30000,
                "max_df_frac": 0.05,
                "max_probe_terms": 8,
                "report": True,
            }
        t0 = time.monotonic()
        res = run_corpus_pipeline(spark, cfg, collect_counts=True)
        total = time.monotonic() - t0
        # the chain's default exact-dedup stage runs first (retrieval
        # mode); the stage-flagged count is the drop across ITS boundary
        pre = res.counts.get("exact_dedup", n_docs)
        flagged = pre - res.counts[stage]
        out = {
            "metric": f"rdec_sf10_drive_{mode}",
            "sf_dir": sf_dir,
            "n_docs": n_docs,
            "n_bench_items": n_bench,
            "total_s": round(total, 3),
            "stages": res.timings,
            "counts": res.counts,
            "flagged_docs": flagged,
        }
        res.unpersist_all()
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
