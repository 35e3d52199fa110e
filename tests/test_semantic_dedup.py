"""SemDeDup-style semantic dedup: numpy-oracle parity on a fixed centroid
set, the keep-set invariant, and end-to-end with the trained k-means path.

Reference scope: extension surface (LLM training-data curation), not a
reference-repo behavior — the reference (hrdp-variant-load-pipeline) has no
embedding operators; this implements Abbas et al. 2023 (arXiv:2303.09540)
semantics on the engine's existing k-means/near-dup primitives.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.operators.similarity import (
    assign_clusters,
    semantic_dedup,
)


def _mk_corpus(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _numpy_semdedup(vecs, cents, threshold, round_digits=6):
    """Independent oracle: nearest-centroid assignment (rounded cosine,
    ties to the smaller cent_id) then the exists-smaller-id drop rule."""
    vecs = np.asarray(vecs, dtype=float)
    cents = np.asarray(cents, dtype=float)
    vn = np.linalg.norm(vecs, axis=1)
    cn = np.linalg.norm(cents, axis=1)
    cos = np.round(vecs @ cents.T / np.outer(vn, cn), round_digits)
    cluster = np.argmax(cos, axis=1)  # argmax takes the first (smallest) id
    dup = np.zeros(len(vecs), dtype=bool)
    for j in range(len(vecs)):
        for i in range(j):
            if cluster[i] != cluster[j]:
                continue
            c = round(float(vecs[i] @ vecs[j] / (vn[i] * vn[j])), round_digits)
            if c >= threshold:
                dup[j] = True
                break
    return cluster, dup


@pytest.fixture()
def fixed_centroids(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "cent_id long, cvec array<double>",
    )


def test_semantic_dedup_matches_numpy_oracle(spark, fixed_centroids):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(6, 3))
    vecs = []
    for b in base:
        vecs.append(b)
        vecs.append(b + rng.normal(scale=0.01, size=3))  # a near-dup of each
    vecs.extend(rng.normal(size=(8, 3)))  # singletons
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]

    out = (
        semantic_dedup(
            _mk_corpus(spark, vecs), threshold=0.98, centroids=fixed_centroids
        )
        .orderBy("vec_id")
        .collect()
    )
    cluster, dup = _numpy_semdedup(vecs, cents, threshold=0.98)
    assert [r.cluster for r in out] == [int(c) for c in cluster]
    assert [r.is_semantic_dup for r in out] == [bool(d) for d in dup]
    # the synthetic near-dup pairs land in the same cluster, so at least
    # the paired copies whose twin shares a cluster must be dropped
    assert sum(dup) >= 1


def test_semantic_dedup_keep_set_invariant(spark, fixed_centroids):
    """No two KEPT docs in one cluster sit at/above the threshold — the
    exists-smaller-id rule makes this a theorem; pin it anyway."""
    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(40, 3))
    vecs[13] = vecs[7] * 1.7  # exact-direction dup (cos == 1.0)
    vecs[29] = vecs[7] * 0.4 + rng.normal(scale=0.001, size=3)
    out = semantic_dedup(
        _mk_corpus(spark, vecs), threshold=0.95, centroids=fixed_centroids
    ).collect()
    kept = [(r.vec_id, r.cluster, np.array(r.embedding)) for r in out if not r.is_semantic_dup]
    assert len(kept) < len(out)
    for ai in range(len(kept)):
        for bi in range(ai + 1, len(kept)):
            ida, ca, va = kept[ai]
            idb, cb, vb = kept[bi]
            if ca != cb:
                continue
            cos = round(
                float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6
            )
            assert cos < 0.95, (ida, idb, cos)
    # row count preserved: the flag marks, it does not filter
    assert len(out) == len(vecs)


def test_semantic_dedup_trained_path_runs_and_flags(spark):
    """End-to-end with train_centroids (the production path): two tight
    bundles of 6 copies each — at least the redundant copies drop, and
    survivors keep the smallest id of each bundle."""
    rng = np.random.default_rng(5)
    a = rng.normal(size=3)
    b = rng.normal(size=3)
    vecs = [a + rng.normal(scale=0.005, size=3) for _ in range(6)]
    vecs += [b + rng.normal(scale=0.005, size=3) for _ in range(6)]
    out = semantic_dedup(
        _mk_corpus(spark, vecs), threshold=0.99, n_centroids=2, n_iter=3
    ).collect()
    dropped = {r.vec_id for r in out if r.is_semantic_dup}
    # ids 0 and 6 are each bundle's smallest id; whichever cluster they land
    # in, a smaller-id twin exists for every other member of their bundle
    assert 0 not in dropped
    assert len(dropped) >= 8  # at least 4 of each bundle's 5 copies


def test_assign_clusters_is_row_local(spark, fixed_centroids):
    """Plan guard: no Exchange on the corpus side of the assignment — the
    centroid array is broadcast, assignment is per-row."""
    corpus = _mk_corpus(spark, np.eye(3).tolist())
    plan = assign_clusters(corpus, fixed_centroids)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    import re

    # the only exchanges allowed are the broadcast of the 1-row centroid
    # array; no shuffle exchange may touch the corpus
    assert not re.search(r"Exchange (hash|range)partitioning", plan), plan


def test_output_column_collisions_raise(spark, fixed_centroids):
    """Re-running dedup (or pre-blocked input) must fail loudly, not
    produce duplicate/ambiguous column names."""
    import pytest

    corpus = _mk_corpus(spark, np.eye(3).tolist())
    clustered = corpus.withColumn("cluster", F.lit(0))
    with pytest.raises(ValueError, match="cluster"):
        assign_clusters(clustered, fixed_centroids)
    with pytest.raises(ValueError, match="is_semantic_dup"):
        semantic_dedup(
            corpus.withColumn("is_semantic_dup", F.lit(False)),
            centroids=fixed_centroids,
        )
