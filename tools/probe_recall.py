"""Bounded-probe recall at PRODUCTION knobs vs the exhaustive forms
(r14 verdict directive #3): at a scale where exhaustive is still
runnable (the 50k-doc Zipf sf1 staging), measure

1. semantic decon — ``sparse_cosine_candidates`` (max_df_frac=0.05,
   max_probe_terms=8, min_cosine=0.8) vs ``sparse_cosine_pairs``:
   pair-level and flagged-DOC-level recall of the bounded probe
   against the exhaustive truth set. Precision is 1.0 by construction
   (every emitted pair carries the exact full-vector cosine), so the
   honest-evidence gap is recall only; misses are characterized by
   their minimum shared-term df (a miss means every shared term was
   either above the df cutoff or outside the item's 8 rarest).
2. retrieval decon — ``text_index_topk_many`` (k=10, max_df_frac=0.05,
   max_query_terms=8) vs the UNBOUNDED probe (no df cut, all query
   terms): flagged-set recall/precision. The bounded scores are BM25
   over the surviving rare terms (documented semantics, not an
   approximation of full-term BM25), so the comparison is between
   FLAGGED SETS — what a user of the stage actually consumes.

Benchmark items: every 250th document (the r13/r14 drive protocol,
~200 items at sf1). Prints one JSON line; intended for BENCH_NOTES.

For the retrieval stage the flagged-set overlap alone under-reads the
stage: bounded scores are BM25 over the 8 rarest terms, so the top-10
RANKINGS legitimately diverge from full-term BM25 — the operative
decontamination question is whether each bench item still retrieves
its TRUE source document. Bench items here are corpus docs verbatim,
so the truth is known: ``self_hit`` = fraction of queries whose own
source doc ranks in the top-k, reported for both forms.

Usage: python tools/probe_recall.py [SF_DIR] [semantic|retrieval|both]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FRAC, _MPT, _MIN_COS = 0.05, 8, 0.8
_RK, _RFRAC, _RTERMS = 10, 0.05, 8
_BENCH_EVERY = 250
_VOCAB = 30000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators.text_index import (
        append_text_index_batch,
        text_index_topk_many,
    )
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        bm25_tokens,
        build_vocab,
        sparse_cosine_candidates,
        sparse_cosine_pairs,
        tfidf_vectors,
    )
    from hrdp_variant_load_pipeline_spark.session import (
        get_spark,
        tune_for_input,
    )

    spark = get_spark("probe-recall")
    tune_for_input(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    bench = docs.filter(F.col("doc_id") % _BENCH_EVERY == 0).select(
        (-(F.col("doc_id").cast("long")) - 1).alias("doc_id"), "text"
    )
    out: dict = {
        "metric": "probe_recall",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_bench": bench.count(),
        "knobs": {
            "semantic": {
                "max_df_frac": _FRAC,
                "max_probe_terms": _MPT,
                "min_cosine": _MIN_COS,
            },
            "retrieval": {
                "k": _RK,
                "max_df_frac": _RFRAC,
                "max_query_terms": _RTERMS,
            },
        },
    }

    # ---- semantic: bounded vs exhaustive --------------------------------
    if mode in ("semantic", "both"):
        vocab = build_vocab(docs, "text", max_vocab=_VOCAB)
        dv = (
            tfidf_vectors(docs, "doc_id", "text", vocab, n_docs=n_docs)
            .select("doc_id", "tfidf_idx", "tfidf_val")
            .localCheckpoint()
        )
        bv = (
            tfidf_vectors(bench, "doc_id", "text", vocab, n_docs=n_docs)
            .select("doc_id", "tfidf_idx", "tfidf_val")
            .localCheckpoint()
        )
        t0 = time.monotonic()
        exact = {
            (r.id_a, r.id_b)
            for r in sparse_cosine_pairs(
                dv, bv, "doc_id", min_cosine=_MIN_COS
            ).collect()
        }
        t_exact = time.monotonic() - t0
        t0 = time.monotonic()
        bounded = {
            (r.id_a, r.id_b)
            for r in sparse_cosine_candidates(
                dv,
                bv,
                "doc_id",
                min_cosine=_MIN_COS,
                max_df_frac=_FRAC,
                max_probe_terms=_MPT,
            ).collect()
        }
        t_bounded = time.monotonic() - t0
        hit = len(exact & bounded)
        exact_docs = {a for a, _ in exact}
        bounded_docs = {a for a, _ in bounded}
        out["semantic"] = {
            "exhaustive_pairs": len(exact),
            "bounded_pairs": len(bounded),
            "pair_recall": round(hit / len(exact), 6) if exact else 1.0,
            "pair_precision": (
                round(hit / len(bounded), 6) if bounded else 1.0
            ),
            "flagged_docs_exhaustive": len(exact_docs),
            "flagged_docs_bounded": len(bounded_docs),
            "doc_recall": (
                round(len(exact_docs & bounded_docs) / len(exact_docs), 6)
                if exact_docs
                else 1.0
            ),
            "exhaustive_s": round(t_exact, 1),
            "bounded_s": round(t_bounded, 1),
        }
        missed = exact - bounded
        out["semantic"]["missed_pairs"] = len(missed)
        if missed:
            # characterize the miss class: for each missed pair, the
            # minimum corpus df among shared terms (high min-df == every
            # shared term was corpus-common == the documented exclusion;
            # low min-df == a rare shared term fell outside the 8-rarest
            # probe budget)
            miss_df = spark.createDataFrame(
                [(a, b) for a, b in sorted(missed)[:1000]], "id_a long, id_b long"
            )
            av = dv.select(
                F.col("doc_id").alias("id_a"), F.explode("tfidf_idx").alias("r")
            )
            bvx = bv.select(
                F.col("doc_id").alias("id_b"), F.explode("tfidf_idx").alias("r")
            )
            rank_df = (
                dv.select(F.explode("tfidf_idx").alias("r"))
                .groupBy("r")
                .agg(F.count("*").alias("df"))
            )
            shared = (
                miss_df.join(av, "id_a")
                .join(bvx, ["id_b", "r"])
                .join(rank_df, "r")
                .groupBy("id_a", "id_b")
                .agg(F.min("df").alias("min_shared_df"))
            )
            rows = shared.collect()
            cut = max(1.0, _FRAC * n_docs)
            n_common_only = sum(1 for r in rows if r.min_shared_df > cut)
            out["semantic"]["miss_class"] = {
                "df_cutoff": cut,
                "all_shared_terms_above_cutoff": n_common_only,
                "rare_term_outside_probe_budget": len(rows) - n_common_only,
            }

    # ---- retrieval: bounded vs unbounded --------------------------------
    if mode not in ("retrieval", "both"):
        print(json.dumps(out))
        return
    work = tempfile.mkdtemp(prefix="probe_recall_idx_")
    try:
        t0 = time.monotonic()
        append_text_index_batch(docs, work)
        t_idx = time.monotonic() - t0
        qdf = bench.select(
            F.col("doc_id").alias("query_id"),
            F.array_distinct(bm25_tokens(F.col("text"))).alias("terms"),
        ).filter(F.size("terms") > 0)
        t0 = time.monotonic()
        full = {
            (r.query_id, r.doc_id)
            for r in text_index_topk_many(
                spark, work, qdf, k=_RK, round_digits=6
            ).collect()
        }
        t_full = time.monotonic() - t0
        t0 = time.monotonic()
        bnd = {
            (r.query_id, r.doc_id)
            for r in text_index_topk_many(
                spark,
                work,
                qdf,
                k=_RK,
                max_df_frac=_RFRAC,
                max_query_terms=_RTERMS,
                round_digits=6,
            ).collect()
        }
        t_bnd = time.monotonic() - t0
        full_docs = {d for _, d in full}
        bnd_docs = {d for _, d in bnd}
        out["retrieval"] = {
            "unbounded_hits": len(full),
            "bounded_hits": len(bnd),
            "pair_recall": (
                round(len(full & bnd) / len(full), 6) if full else 1.0
            ),
            "flagged_docs_unbounded": len(full_docs),
            "flagged_docs_bounded": len(bnd_docs),
            "doc_recall": (
                round(len(full_docs & bnd_docs) / len(full_docs), 6)
                if full_docs
                else 1.0
            ),
            "doc_precision": (
                round(len(full_docs & bnd_docs) / len(bnd_docs), 6)
                if bnd_docs
                else 1.0
            ),
            "index_build_s": round(t_idx, 1),
            "unbounded_s": round(t_full, 1),
            "bounded_s": round(t_bnd, 1),
        }
        # the decontamination-operative metric: bench items ARE corpus
        # docs (query -(d)-1's true source is doc d) — does each form
        # still put the true source in its top-k?
        n_q = qdf.count()
        self_full = sum(1 for q, d in full if d == -q - 1)
        self_bnd = sum(1 for q, d in bnd if d == -q - 1)
        out["retrieval"]["self_hit_unbounded"] = (
            round(self_full / n_q, 6) if n_q else 1.0
        )
        out["retrieval"]["self_hit_bounded"] = (
            round(self_bnd / n_q, 6) if n_q else 1.0
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
