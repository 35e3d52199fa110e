"""End-to-end wall time + per-stage breakdown of the one-call curation
chain (`plans/corpus_pipeline.run_corpus_pipeline`), plus a resume
drill.

Evidence for two contracts:

* the chain is O(stages) — stage timings come from the chain's own
  `CorpusResult.timings` (each boundary materialized exactly once), so
  the sum of stages ~= wall total, no hidden lineage re-execution;
* resume is O(remaining work) — the second run, after deleting nothing
  and changing nothing, restarts AFTER the last committed stage and its
  wall time collapses to the output side (chunk/pack/export) only.

Usage: python tools/corpus_chain_bench.py [sf_dir]
(default /root/testdata/sf0.1). Prints one JSON line:
{"total_s", "stages": {...}, "counts": {...}, "resume_total_s",
 "resumed_from"}.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.plans.corpus_pipeline import (
        run_corpus_pipeline,
    )
    from hrdp_variant_load_pipeline_spark.session import (
        get_spark,
        tune_for_input,
    )

    spark = get_spark("corpus-chain-bench")
    tune_for_input(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="corpus_chain_bench_")
    try:
        bench_dir = os.path.join(work, "bench")
        spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") % 10 == 0
        ).select("doc_id", "text").write.parquet(bench_dir)
        cfg = {
            "input": {
                "format": "parquet",
                "path": f"{sf_dir}/documents.parquet",
            },
            "pii": True,
            "gates": {
                "min_quality": 0.3,
                "gopher": {"min_words": 5, "min_stopword_hits": 0},
            },
            "dedup": {"exact": True, "fuzzy": {"threshold": 0.8}},
            "lm_gate": {"min_count": 2},
            "decontaminate": {"path": bench_dir, "n": 8},
            "selection": {
                "dsir": {
                    "target_lang": "en",
                    "n_buckets": 1024,
                    "keep_fraction": 0.6,
                }
            },
            "mixture": {"temperature": 0.3, "total_tokens": 10**9},
            "chunk": {"chunk_tokens": 512, "overlap_tokens": 32},
            "pack": {"max_tokens": 2048},
            "output": {
                "dir": os.path.join(work, "shards"),
                "n_shards": 16,
                "shuffle_seed": 7,
            },
            "checkpoint": {"dir": os.path.join(work, "ck")},
        }
        t0 = time.monotonic()
        res = run_corpus_pipeline(spark, cfg)
        total = time.monotonic() - t0
        res.unpersist_all()

        t1 = time.monotonic()
        res2 = run_corpus_pipeline(spark, cfg)
        resume_total = time.monotonic() - t1
        out = {
            "sf_dir": sf_dir,
            "total_s": round(total, 3),
            "stages": res.timings,
            "counts": res.counts,
            "resume_total_s": round(resume_total, 3),
            "resumed_from": res2.resumed_from,
            "resume_counts_match": res2.counts == res.counts,
        }
        res2.unpersist_all()
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
