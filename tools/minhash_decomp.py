"""Decompose minhash_lsh_pairs: signatures vs band self-join vs verify,
each timed through the noop sink, same session, best-of-N.

Usage: python tools/minhash_decomp.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_HERE))

from pyspark.sql import functions as F  # noqa: E402

from hrdp_variant_load_pipeline_spark.operators import dedup as DD  # noqa: E402
from hrdp_variant_load_pipeline_spark.session import get_spark, tune_for_tables  # noqa: E402
from hrdp_variant_load_pipeline_spark.sources.tables import spread_for_cpu, table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
K, NH, BR = 3, 6, 2


def main() -> None:
    spark = get_spark("minhash_decomp")
    tune_for_tables(spark, SF_DIR, ["documents"])

    def docs_frame():
        src = table(spark, SF_DIR, "documents").select(
            F.col("doc_id").alias("doc"), F.col("text").alias("__text")
        )
        src = spread_for_cpu(src, spark.sparkContext.defaultParallelism)
        return DD._with_minhash_cols(
            src.select("doc", DD.shingle_array(F.col("__text"), K).alias("sh")), NH
        )

    def bands_of(docs):
        n_bands = NH // BR
        bands = F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band_idx"),
                    DD._band_key(
                        [F.col(f"mh{bi * BR + r}") for r in range(BR)]
                    ).alias("band_val"),
                )
                for bi in range(n_bands)
            ]
        )
        return docs.select("doc", F.explode(bands).alias("b")).select(
            "doc", F.col("b.band_idx").alias("band_idx"), F.col("b.band_val").alias("band_val")
        )

    def arm_signatures():
        return docs_frame().drop("sh")

    def arm_sig_with_sh():
        return docs_frame()

    def arm_cands():
        docs = docs_frame()
        exploded = bands_of(docs)
        a, b = exploded.alias("a"), exploded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .distinct()
        )

    def arm_full():
        return DD.minhash_lsh_pairs(
            table(spark, SF_DIR, "documents"), "doc_id", "text",
            k=K, num_hashes=NH, band_rows=BR, verify_threshold=0.5,
        )

    arms = [
        ("signatures_only", arm_signatures),
        ("signatures_with_sh", arm_sig_with_sh),
        ("cands_join", arm_cands),
        ("full_operator", arm_full),
    ]
    for _, fn in arms:
        fn().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    for name, fn in arms:
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            spark.catalog.clearCache()
        print(f"ARM {name}: best={best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
