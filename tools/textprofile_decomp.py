"""Decompose text_doc_profile per output column: time each projection
subtree through the noop sink (guide §1.4) at the given sf dir, same
session, best-of-N — tells which of the four text functions owns the row.

Usage: python tools/textprofile_decomp.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_HERE))

from pyspark.sql import functions as F  # noqa: E402

from hrdp_variant_load_pipeline_spark.functions import text as TXT  # noqa: E402
from hrdp_variant_load_pipeline_spark.session import get_spark, tune_for_tables  # noqa: E402
from hrdp_variant_load_pipeline_spark.sources.tables import spread_for_cpu, table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    spark = get_spark("textprofile_decomp")
    tune_for_tables(spark, SF_DIR, ["documents"])

    def d():
        return spread_for_cpu(table(spark, SF_DIR, "documents").select("doc_id", "text"))

    def arm_scan():
        return d().select("doc_id", F.length("text").alias("x"))

    def arm_lang():
        return d().select("doc_id", TXT.lang_predict(F.col("text")).alias("x"))

    def arm_quality():
        return d().select("doc_id", TXT.quality_score(F.col("text")).alias("x"))

    def arm_fingerprint():
        return d().select("doc_id", TXT.fingerprint(F.col("text")).alias("x"))

    def arm_winnow():
        staged = d().select(
            "doc_id", TXT.char_codes(F.lower(F.col("text"))).alias("__c")
        )
        staged = staged.select(
            "doc_id", TXT.gram_code_hashes(F.col("__c"), k=5).alias("__h")
        )
        return staged.select("doc_id", TXT.winnow_fp(F.col("__h"), window=8).alias("x"))

    def arm_gram_only():
        staged = d().select(
            "doc_id", TXT.char_codes(F.lower(F.col("text"))).alias("__c")
        )
        return staged.select("doc_id", TXT.gram_code_hashes(F.col("__c"), k=5).alias("x"))

    def arm_chars_only():
        return d().select("doc_id", TXT.char_codes(F.lower(F.col("text"))).alias("x"))

    arms = [
        ("scan_floor", arm_scan),
        ("chars_only", arm_chars_only),
        ("gram_hashes", arm_gram_only),
        ("winnow_full", arm_winnow),
        ("lang_predict", arm_lang),
        ("quality_score", arm_quality),
        ("fingerprint", arm_fingerprint),
    ]
    # JIT warm each shape once
    for _, fn in arms:
        fn().write.format("noop").mode("overwrite").save()
    for name, fn in arms:
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        print(f"ARM {name}: best={best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
