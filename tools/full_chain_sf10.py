"""FULL curation chain at the 100x Zipf staging — every stage on
(r14 verdict directive #4): ingest -> normalize + PII scrub -> langid
fill -> quality + Gopher + C4 gates -> exact dedup -> cluster-canonical
fuzzy dedup (skew-routed CC) -> LM perplexity gate -> all THREE
decontamination modalities (shingle n-gram, retrieval/BM25 bounded
probe, semantic TF-IDF-cosine bounded probe) -> DSIR selection ->
mixture balancing -> chunk -> pack -> sharded JSONL output. One
wall-clock number + the chain's own per-stage decomposition
(CorpusResult.timings — each stage boundary materialized exactly
once), reproducible from the staged fixture.

This composes what r14 measured separately (124.3 s chain without the
retrieval/semantic stages; 43.8 s retrieval; 109 s semantic) into the
single product-story number the 100 TB design is graded on.

Benchmark items: every 250th document (the r13/r14 drive protocol,
~2k items at sf10), one shared parquet for all three decon stages.

Usage: python tools/full_chain_sf10.py [SF_DIR]
(default /root/repo/benchdata/sf10). Prints one JSON line.
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
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.plans.corpus_pipeline import (
        run_corpus_pipeline,
    )
    from hrdp_variant_load_pipeline_spark.session import (
        get_spark,
        tune_for_input,
    )

    spark = get_spark("full-chain-sf10")
    tune_for_input(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="full_chain_sf10_")
    try:
        bench_dir = os.path.join(work, "bench")
        raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # the staged corpus is single-line soup with NO terminal
        # punctuation — the C4 line rule (keep lines ending in .!?"')
        # would blank every text. Reshape deterministically the same
        # way corpus_stats_battery does (sentence breaks at the
        # ' line '/' row ' word boundaries + one terminal period) so
        # the gate executes its real per-line work on every doc; it is
        # non-discriminative on this fixture by construction (its
        # discrimination is driver-gated with trap lines in the
        # battery) — here we compose its COST into the chain number.
        t_rs = time.monotonic()
        src_dir = os.path.join(work, "docs_reshaped")
        docs = raw.withColumn(
            "text",
            F.concat(
                F.regexp_replace(F.col("text"), " (line|row) ", ".\n"),
                F.lit("."),
            ),
        )
        docs.write.parquet(src_dir)
        restage_s = round(time.monotonic() - t_rs, 3)
        docs = spark.read.parquet(src_dir)
        n_docs = docs.count()
        docs.filter(F.col("doc_id") % 250 == 0).select(
            "doc_id", "text"
        ).write.parquet(bench_dir)
        cfg = {
            "input": {"format": "parquet", "path": src_dir},
            "normalize": True,
            "pii": True,
            "langid": True,
            "gates": {
                "min_quality": 0.3,
                "gopher": {"min_words": 5, "min_stopword_hits": 0},
                "c4": {"min_sentences": 1},
            },
            "dedup": {
                "exact": True,
                "fuzzy": {"threshold": 0.8, "canonical": "cluster"},
            },
            # chain-level skew routing for the CC rounds (hub-heavy
            # pair graphs are the kit's non-collapsing-consumer case)
            "skew": {"salt": 8},
            "lm_gate": {"min_count": 2},
            "decontaminate": {"path": bench_dir, "n": 8, "report": True},
            "retrieval_decontaminate": {
                "path": bench_dir,
                "k": 10,
                "max_df_frac": 0.05,
                "max_query_terms": 8,
                "index_dir": os.path.join(work, "idx"),
                "report": True,
            },
            "semantic_decontaminate": {
                "path": bench_dir,
                "min_cosine": 0.8,
                "max_vocab": 30000,
                "max_df_frac": 0.05,
                "max_probe_terms": 8,
                "report": True,
            },
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
        }
        t0 = time.monotonic()
        res = run_corpus_pipeline(spark, cfg)
        total = time.monotonic() - t0
        out = {
            "metric": "full_chain_sf10",
            "sf_dir": sf_dir,
            "n_docs": n_docs,
            "restage_s": restage_s,
            "total_s": round(total, 3),
            "stages": res.timings,
            "counts": res.counts,
        }
        res.unpersist_all()
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
