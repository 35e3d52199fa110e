"""Atomic store replacement for the genic-QC repair path.

The reference's QC repair is a transactional batch UPDATE (DAO.java
updateGenicStatus); the previous Spark emulation overwrote the store
parquet in place, so a failure mid-write (executor loss, disk full,
bad expression) destroyed the only copy. ``_atomic_replace_store``
writes the new version to a sibling temp dir first — these tests pin
that a failed write leaves the original store fully readable and that a
successful swap leaves no temp/backup litter behind.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.cli import _atomic_replace_store


def _siblings(tmp_path) -> set[str]:
    return set(os.listdir(tmp_path))


def test_failed_write_leaves_original_store_readable(spark, tmp_path):
    store = str(tmp_path / "store")
    spark.range(10).withColumn("tag", F.lit("orig")).write.parquet(store)

    # a frame that fails at EXECUTION time, after the write job starts —
    # the shape of a mid-write executor failure
    poison = spark.range(5).select(
        F.assert_true(F.col("id") < 0).alias("boom"), F.col("id")
    )
    with pytest.raises(Exception):
        _atomic_replace_store(poison, store)

    out = spark.read.parquet(store)
    assert out.count() == 10
    assert out.filter(F.col("tag") == "orig").count() == 10
    assert "store" in _siblings(tmp_path)


def test_successful_swap_replaces_content_and_cleans_up(spark, tmp_path):
    store = str(tmp_path / "store")
    spark.range(10).withColumn("tag", F.lit("orig")).write.parquet(store)

    new = spark.range(3).withColumn("tag", F.lit("repaired"))
    _atomic_replace_store(new, store)

    out = spark.read.parquet(store)
    assert out.count() == 3
    assert out.filter(F.col("tag") == "repaired").count() == 3
    # no temp / backup leftovers
    assert _siblings(tmp_path) == {"store"}


def test_first_write_with_no_existing_store(spark, tmp_path):
    store = str(tmp_path / "store")
    _atomic_replace_store(spark.range(4), store)
    assert spark.read.parquet(store).count() == 4
    assert _siblings(tmp_path) == {"store"}


def test_stale_temp_dirs_from_prior_crash_are_cleared(spark, tmp_path):
    store = str(tmp_path / "store")
    spark.range(10).write.parquet(store)
    os.makedirs(store + ".__new__")
    os.makedirs(store + ".__old__")
    _atomic_replace_store(spark.range(2), store)
    assert spark.read.parquet(store).count() == 2
    assert _siblings(tmp_path) == {"store"}
