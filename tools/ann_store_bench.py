"""Per-batch latency of the persisted-IVF probe + incremental semantic
dedup vs history size.

Evidence for the O(batch x probed-bucket-rows) per-batch contract
(`operators/ann_store.py`): seed the index with H historical vectors,
then time (a) a fixed-size query probe (`ivf_store_topk`) and (b) a
fixed-size `incremental_semantic_dedup` batch, at two history sizes 10x
apart. The probe reads only the probed buckets' files, so its cost
grows with BUCKET size (history / n_centroids), not file count per se —
with n_centroids scaled 10x alongside history (the SemDeDup knob:
cluster size, not corpus size), per-batch latency should hold ~flat.
Pass criterion is ONE-SIDED no-growth (large <= 1.5x small), same rule
as stream_ingest_bench.

Usage: python tools/ann_store_bench.py [small_h] [large_h]
(default 5000 50000). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 500
N_QUERIES = 16


def main() -> None:
    small_h = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    large_h = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators.ann_store import (
        append_ivf_batch,
        incremental_semantic_dedup,
        ivf_store_topk,
    )
    from hrdp_variant_load_pipeline_spark.session import get_spark

    spark = get_spark("ann-store-bench")

    def synth(n: int, offset: int, dim: int = 64):
        # deterministic synthetic vectors: md5-mixed components in [-1, 1]
        return spark.range(offset, offset + n).selectExpr(
            "id AS vec_id",
            f"transform(sequence(0, {dim - 1}), j -> "
            "(conv(substring(md5(concat(cast(id AS string), ':', "
            "cast(j AS string))), 1, 6), 16, 10) % 1000) / 500.0 - 1.0"
            ") AS embedding",
        )

    def centroids_for(n_hist: int):
        # scale the bucket count with history (bucket size stays ~flat)
        n_cent = max(8, n_hist // 625)
        base = synth(n_cent, 10_000_000)
        return base.selectExpr("vec_id AS cent_id", "embedding AS cvec")

    results = {}
    for label, n_hist in (("small", small_h), ("large", large_h)):
        work = tempfile.mkdtemp(prefix=f"ann_bench_{label}_")
        try:
            store = os.path.join(work, "ivf")
            cents = centroids_for(n_hist).localCheckpoint()
            append_ivf_batch(synth(n_hist, 0), cents, store)
            queries = synth(N_QUERIES, 20_000_000).localCheckpoint()

            probe_times = []
            for _ in range(3):
                t0 = time.monotonic()
                ivf_store_topk(
                    spark, store, queries, cents, k=5, nprobe=2
                ).count()
                probe_times.append(time.monotonic() - t0)

            dedup_times = []
            for b in range(3):
                batch = synth(BATCH, 30_000_000 + b * BATCH)
                t0 = time.monotonic()
                incremental_semantic_dedup(
                    batch, cents, store, threshold=0.95
                ).filter("NOT is_semantic_dup").count()
                dedup_times.append(time.monotonic() - t0)

            results[label] = {
                "history": n_hist,
                "n_centroids": cents.count(),
                "probe_best_s": round(min(probe_times), 3),
                "dedup_best_s": round(min(dedup_times), 3),
            }
        finally:
            shutil.rmtree(work, ignore_errors=True)

    ratio_probe = results["large"]["probe_best_s"] / max(
        results["small"]["probe_best_s"], 1e-9
    )
    ratio_dedup = results["large"]["dedup_best_s"] / max(
        results["small"]["dedup_best_s"], 1e-9
    )
    print(
        json.dumps(
            {
                **results,
                "probe_ratio_large_over_small": round(ratio_probe, 2),
                "dedup_ratio_large_over_small": round(ratio_dedup, 2),
                "no_growth_probe": ratio_probe <= 1.5,
                "no_growth_dedup": ratio_dedup <= 1.5,
            }
        )
    )


if __name__ == "__main__":
    main()
