"""Interval join strategies: broadcast vs binned equivalence (incl. negative
coordinates), and the reference's inverted-probe quirk."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.operators.interval_join import (
    interval_join,
    interval_join_binned,
    with_exists_flag,
)


def _random_frames(spark, seed=7, n_probes=300, n_intervals=120):
    rng = random.Random(seed)
    probes = []
    for i in range(n_probes):
        chrom = rng.choice(["1", "2", "X"])
        s = rng.randint(-5_000_000, 5_000_000)
        probes.append((i, chrom, s, s + rng.randint(0, 500_000)))
    intervals = []
    for i in range(n_intervals):
        chrom = rng.choice(["1", "2", "X"])
        s = rng.randint(-5_000_000, 5_000_000)
        intervals.append((i, chrom, s, s + rng.randint(0, 800_000)))
    p = spark.createDataFrame(probes, "pid int, chromosome string, q_start long, q_stop long")
    iv = spark.createDataFrame(
        intervals, "iid int, chromosome string, start_pos long, stop_pos long"
    )
    return p, iv


def test_binned_matches_broadcast(spark):
    p, iv = _random_frames(spark)
    broadcast_pairs = {
        (r["pid"], r["iid"])
        for r in interval_join(p, iv, how="inner")
        .select(F.col("pr.pid"), F.col("iv.iid"))
        .collect()
    }
    binned_pairs = {
        (r["pid"], r["iid"])
        for r in interval_join_binned(p, iv, bin_size=250_000)
        .select(F.col("pr.pid"), F.col("iv.iid"))
        .collect()
    }
    assert broadcast_pairs == binned_pairs
    assert broadcast_pairs  # non-degenerate


def test_binned_small_bins_still_exact(spark):
    p, iv = _random_frames(spark, seed=11, n_probes=100, n_intervals=50)
    a = interval_join(p, iv, how="inner").count()
    b = interval_join_binned(p, iv, bin_size=10_000).select("pid", "iid").distinct().count()
    assert a == b


def test_inverted_probe_quirk(spark):
    """The loader's multi-allelic probe (q_stop=0 < q_start) degrades the
    3-disjunct predicate to q_start >= g_start (SURVEY.md §1.4)."""
    p = spark.createDataFrame(
        [(1, "1", 500, 0), (2, "1", 50, 0)],
        "pid int, chromosome string, q_start long, q_stop long",
    )
    iv = spark.createDataFrame(
        [(10, "1", 100, 200)], "iid int, chromosome string, start_pos long, stop_pos long"
    )
    flagged = {r["pid"]: r["hit"] for r in with_exists_flag(p, iv, "hit").collect()}
    assert flagged[1] is True  # 500 >= 100 even though [500,0] is inverted
    assert flagged[2] is False  # 50 < 100
