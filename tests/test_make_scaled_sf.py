"""make_scaled_sf v3 (hierarchical context-keyed Zipf occurrence
expansion): the staged-fixture properties every scale measurement
depends on, pinned at K=2 over sf0.001 so a generator regression is
caught before it distorts a whole campaign's numbers."""

from __future__ import annotations

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

SRC = "/root/testdata/sf0.001"


def _stage(spark, tmp_path, k=2):
    import make_scaled_sf

    out = str(tmp_path / f"v3_k{k}")
    src_keep = make_scaled_sf.SRC
    make_scaled_sf.SRC = SRC
    try:
        make_scaled_sf.generate(spark, k, out)
    finally:
        make_scaled_sf.SRC = src_keep
    return out


def test_v3_staging_properties(spark, tmp_path):
    out = _stage(spark, tmp_path, k=2)
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    staged = spark.read.parquet(f"{out}/documents.parquet")
    n_base, n_staged = base.count(), staged.count()
    assert n_staged == 2 * n_base

    def toks(df):
        return df.select(
            F.explode(
                F.filter(F.split("text", r"\s+"), lambda t: t != "")
            ).alias("t")
        )

    # token count is invariant (occurrence mapping, never drops/adds)
    assert toks(staged).count() == 2 * toks(base).count()

    # vocabulary EXPANDS well beyond the 31-type source and the type
    # frequencies decay power-law-ish: log-log OLS slope over the
    # mid-range ranks must be clearly negative (the v2 dialect measured
    # ~-0.3 at this scale; the 3-level Zipf form ~-0.8). Loose bound so
    # the pin survives small-K noise while catching a flat-vocab
    # regression outright.
    freqs = np.array(
        [
            r["c"]
            for r in toks(staged)
            .groupBy("t")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("t"))
            .collect()
        ],
        dtype=float,
    )
    n_types = len(freqs)
    assert n_types > 20 * 31  # >20x the source's 31 types
    ranks = np.arange(1, n_types + 1, dtype=float)
    lo, hi = 10, n_types // 2
    slope = np.polyfit(np.log(ranks[lo:hi]), np.log(freqs[lo:hi]), 1)[0]
    assert slope < -0.5, slope

    # replica 0 is the source verbatim (doc_ids 0..max preserved)
    m = base.agg(F.max("doc_id")).collect()[0][0]
    rep0 = staged.filter(F.col("doc_id") <= m).select("doc_id", "text")
    assert (
        rep0.exceptAll(base.select("doc_id", "text")).count() == 0
        and rep0.count() == n_base
    )

    # quality gates score replicas like the source: identical pass rate
    from hrdp_variant_load_pipeline_spark.functions.text import gopher_rules

    def pass_rate(df):
        g = df.select(gopher_rules(F.col("text")).alias("g"))
        return g.where("g.passes").count() / df.count()

    assert abs(pass_rate(staged) - pass_rate(base)) < 1e-9

    # cross-replica isolation: no exact duplicate spans replicas
    cross = (
        staged.groupBy("text")
        .agg(
            F.count("*").alias("c"),
            F.count_distinct(
                (F.col("doc_id") / (m + 1)).cast("int")
            ).alias("reps"),
        )
        .filter((F.col("c") > 1) & (F.col("reps") > 1))
        .count()
    )
    assert cross == 0
