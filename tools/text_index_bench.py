"""Probe latency of the persisted inverted index vs index size.

Evidence for the O(postings-of-probed-terms) probe contract
(`operators/text_index.py`): the probed terms appear in a FIXED set of
documents while the rest of the corpus grows 10x with disjoint filler
vocabulary — so the index (postings, terms, files) grows 10x but the
probe's match set does not. If the bucket/term pushdown contract holds,
probe latency stays ~flat (one-sided pass: large <= 1.5x small, the
stream_ingest_bench rule); if pruning ever regressed to a full postings
scan, the large probe would track the 10x index instead.

Also reports the one-shot ``bm25_scores`` full-corpus rescan at the
large size — the cost a standing index amortizes away per query.

Usage: python tools/text_index_bench.py [small_docs] [large_docs]
(default 20000 200000). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TERMS = ["alpha", "bravo", "charlie", "delta"]
MATCH_DOCS = 2000  # docs containing query terms — FIXED across sizes
WORDS_PER_DOC = 40


def main() -> None:
    small_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    large_n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from hrdp_variant_load_pipeline_spark.operators.text_index import (
        append_text_index_batch,
        describe_text_index,
        text_index_scores,
    )
    from hrdp_variant_load_pipeline_spark.operators.vocab import bm25_scores
    from hrdp_variant_load_pipeline_spark.session import get_spark

    spark = get_spark("text-index-bench")

    def synth(n: int):
        # first MATCH_DOCS docs carry the query terms at fixed positions;
        # everything else is per-doc-unique filler (vocabulary AND
        # postings grow with n while the probed terms' posting count
        # stays pinned at MATCH_DOCS)
        return spark.range(0, n).selectExpr(
            "id AS doc_id",
            f"""concat_ws(' ',
              CASE WHEN id < {MATCH_DOCS}
                   THEN concat_ws(' ', '{TERMS[0]}', '{TERMS[1]}',
                                  CASE WHEN id % 2 = 0 THEN '{TERMS[2]}'
                                       ELSE '{TERMS[3]}' END)
                   ELSE '' END,
              array_join(transform(sequence(1, {WORDS_PER_DOC}),
                j -> concat('w', cast(id AS string), 'x',
                            cast(j AS string))), ' ')
            ) AS text""",
        )

    def probe_time(store: str) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            text_index_scores(spark, store, TERMS).count()
            best = min(best, time.monotonic() - t0)
        return best

    out: dict = {"metric": "text_index_probe_flat", "unit": "sec"}
    stores = []
    # JIT/codegen warmup on a throwaway store so 'small' isn't charged
    # for first-call compilation the 'large' pass then gets for free
    warm = tempfile.mkdtemp(prefix="tix_warm_")
    append_text_index_batch(synth(2000).localCheckpoint(), warm, n_buckets=256)
    probe_time(warm)
    shutil.rmtree(warm, ignore_errors=True)
    for label, n in (("small", small_n), ("large", large_n)):
        store = tempfile.mkdtemp(prefix=f"tix_{label}_")
        stores.append(store)
        docs = synth(n).localCheckpoint()  # stage once; time the index, not the synth
        t0 = time.monotonic()
        append_text_index_batch(docs, store, n_buckets=256)
        build_s = time.monotonic() - t0
        d = describe_text_index(spark, store)
        out[label] = {
            "docs": n,
            "build_s": round(build_s, 3),
            "postings": d["postings"],
            "terms": d["terms"],
            "probe_s": round(probe_time(store), 3),
        }
        if label == "large":
            t0 = time.monotonic()
            bm25_scores(docs, "doc_id", "text", TERMS).filter(
                "bm25 > 0"
            ).count()
            out["full_rescan_s"] = round(time.monotonic() - t0, 3)

    ratio = out["large"]["probe_s"] / max(out["small"]["probe_s"], 1e-9)
    out["probe_ratio"] = round(ratio, 3)
    out["pass"] = ratio <= 1.5
    print(json.dumps(out))
    for s in stores:
        shutil.rmtree(s, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
