"""Per-arm decomposition of corpus_stats_battery (r16 directive #2):
construct the battery once (timing the construction — the blocking
driver jobs: metadata count, DSIR LUT collect, LM broadcast-gate
count, index-cache probe), then time each component's union branch
through the noop sink. Catalyst folds the literal component filter and
prunes every other branch, so each timing is that arm's subtree alone.

Attribution caveat (stated so the table reads honestly): the lazy
snapshots (counts, vecs, lm_scored, dsir scored, sd_vocab, dv2)
materialize inside the FIRST arm that consumes them — that arm's
number carries the shared build; later consumers read the snapshot.
The tool times arms in battery order, so e.g. `ngram` pays the bigram
aggregate that `lmscore` then reuses. The full-battery union action
(one number, printed last) is the in-situ A/B quantity; the per-arm
rows locate where its time lives.

Usage: python tools/corpus_stats_decomp.py [SF_DIR] [N]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_HERE))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

COMPONENTS = [
    "paradedup", "spandedup", "ngram", "tfidf", "lmscore", "ccnet",
    "gopher", "c4", "bm25", "bm25_idx", "dsir", "dsirpick", "rdprobe",
    "semdecon",
]


def main() -> None:
    from hrdp_variant_load_pipeline_spark.queries_model import (
        corpus_stats_battery,
    )
    from hrdp_variant_load_pipeline_spark.session import (
        get_spark,
        tune_for_tables,
    )

    spark = get_spark("corpus_stats_decomp")
    tune_for_tables(spark, SF_DIR, ["documents"])
    # JIT warmup at the smallest SF (same discipline as bench.py)
    warm = corpus_stats_battery(spark, "/root/testdata/sf0.001")
    warm.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    t0 = time.monotonic()
    battery = corpus_stats_battery(spark, SF_DIR)
    construct_s = round(time.monotonic() - t0, 3)
    out = {"metric": "corpus_stats_decomp", "sf_dir": SF_DIR,
           "construct_s": construct_s, "arms": {}}
    for comp in COMPONENTS:
        best = None
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"arm:{comp}")
            t1 = time.monotonic()
            battery.filter(F.col("component") == comp).write.format(
                "noop"
            ).mode("overwrite").save()
            el = time.monotonic() - t1
            best = el if best is None or el < best else best
        out["arms"][comp] = round(best, 3)
        print(f"# arm {comp}: {best:.3f}s", file=sys.stderr)
    # the in-situ quantity: the whole union through one action, fresh
    # battery frame so arm-pass snapshot warmth does not flatter it
    spark.catalog.clearCache()
    t0 = time.monotonic()
    battery2 = corpus_stats_battery(spark, SF_DIR)
    out["construct2_s"] = round(time.monotonic() - t0, 3)
    spark.sparkContext.setJobDescription("full battery union")
    t1 = time.monotonic()
    battery2.write.format("noop").mode("overwrite").save()
    out["union_s"] = round(time.monotonic() - t1, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
