"""Pin the r15 gram_code_hashes fast path (guard hoisted out of the
per-element taps) against the always-guarded reference formula, across
the doc-length boundary where the branch switches (len < k, == k, > k,
empty, single char). The absolute values are separately driver-gated via
text_doc_profile's winnow oracle; this pins branch equivalence directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.functions.text import (
    char_codes,
    gram_code_hashes,
    winnow_fp,
)


def _reference_gram(codes, k):
    """The pre-r15 formulation: every tap coalesce-guarded, sequence
    floored at one element via greatest()."""
    n = F.size(codes)

    def gram(i):
        h = F.coalesce(F.get(codes, i - 1), F.lit(0)).cast("bigint")
        for j in range(1, k):
            h = h * 31 + F.coalesce(F.get(codes, i - 1 + j), F.lit(0))
        return h

    return F.transform(F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))), gram)


TEXTS = [
    "",  # empty: split('') -> [''], ascii('') = 0
    "a",
    "ab",
    "abcd",  # len == k-1
    "abcde",  # len == k: exactly one gram, fast branch boundary
    "abcdef",
    "the quick brown fox jumps over the lazy dog",
    "ZZ yy 09 !? éü",  # non-ascii code points
]


@pytest.mark.parametrize("k", [2, 5])
def test_gram_fast_path_matches_guarded_reference(spark, k):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id long, text string")
    staged = df.select("id", char_codes(F.lower(F.col("text"))).alias("c"))
    out = staged.select(
        "id",
        gram_code_hashes(F.col("c"), k=k).alias("fast"),
        _reference_gram(F.col("c"), k).alias("ref"),
    ).collect()
    for r in out:
        assert r["fast"] == r["ref"], f"id={r['id']} k={k}: {r['fast']} != {r['ref']}"


def test_winnow_fp_unchanged_over_fast_path(spark):
    """End-to-end through winnow_fp: the downstream md5 fingerprint is
    identical whichever gram formulation feeds it."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id long, text string")
    staged = df.select("id", char_codes(F.lower(F.col("text"))).alias("c"))
    out = staged.select(
        "id",
        winnow_fp(gram_code_hashes(F.col("c"), k=5), window=8).alias("fast"),
        winnow_fp(_reference_gram(F.col("c"), 5), window=8).alias("ref"),
    ).collect()
    for r in out:
        assert r["fast"] == r["ref"]
