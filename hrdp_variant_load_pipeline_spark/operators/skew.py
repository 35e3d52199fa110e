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
