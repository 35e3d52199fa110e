"""Skew-mitigation join: explicit key salting.

AQE's skew-join handling (enabled in session.py) splits oversized
post-shuffle partitions automatically; explicit salting is the manual tool
for cases AQE can't fix — e.g. a single hot key whose build side must
still be replicated, or sort-merge paths where one key dominates the
probe side. The fact side gains a salt in [0, salt); the dimension side is
replicated once per salt value; the join key becomes (key..., salt), so a
hot key's rows spread over ``salt`` reducers instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``keys`` with salt-spread hot keys.

    Correctness is salt-independent: every fact row carries exactly one
    salt value, and the dim side carries all of them, so each matching
    (fact, dim) pair appears exactly once. Salt is derived from a hash of
    the fact row's columns — deterministic, no RNG, survives recompute.
    """
    fact_s = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt))
    )
    dim_s = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    out = fact_s.join(dim_s, [*keys, SALT_COL], how)
    return out.drop(SALT_COL)


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt: int = 32,
    out_col: str = "n_distinct",
) -> DataFrame:
    """``count(DISTINCT value) GROUP BY keys`` with the VALUE SPACE sharded
    across ``salt`` reducers per key.

    Algebraic aggregates (sum/count/min/max) don't need salting — map-side
    partial aggregation already collapses a hot key to one row per map
    task. Distinct-style aggregates are different: every distinct value of
    the hot key must meet in one reducer, whose state is the full distinct
    set. Sharding by ``hash(value) % salt`` partitions that state — each
    reducer deduplicates a DISJOINT slice of the value space, so the
    per-shard counts add exactly and the hot key's memory/CPU spreads over
    ``salt`` tasks. Deterministic (hash, no RNG).

    NULL values are ignored, matching ``count(DISTINCT ...)``.
    """
    shard = F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt))
    per_shard = df.groupBy(*keys, shard.alias(SALT_COL)).agg(
        F.count_distinct(F.col(value_col)).alias("__n")
    )
    return (
        per_shard.groupBy(*keys)
        .agg(F.sum("__n").alias(out_col))
        .withColumn(out_col, F.col(out_col).cast("long"))
    )
