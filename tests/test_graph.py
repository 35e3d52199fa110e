"""PageRank (operators/graph.py) against a numpy power-iteration oracle."""

from __future__ import annotations

import numpy as np

from hrdp_variant_load_pipeline_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n_iter=10, d=0.85):
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = {}
    for s, t in set(edges):
        out.setdefault(s, []).append(t)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.zeros(n)
        dangling = 0.0
        for v in verts:
            targets = out.get(v)
            if not targets:
                dangling += r[idx[v]]
                continue
            share = r[idx[v]] / len(targets)
            for t in targets:
                nxt[idx[t]] += share
        r = (1 - d) / n + d * dangling / n + d * nxt
    return {v: r[idx[v]] for v in verts}


_EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3),  # 4 is a source; 3 is a hub
    (5, 6),                                   # 6 dangles
]


def test_pagerank_matches_power_iteration(spark):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    got = {r["vertex"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
    want = _numpy_pagerank(_EDGES, n_iter=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # rank mass conserved
    # the hub out-ranks everything; a pure source gets the floor rank
    assert got[3] == max(got.values())
    assert got[4] == min(got.values())


def test_pagerank_duplicate_edges_collapse(spark):
    df = spark.createDataFrame(_EDGES + _EDGES[:3], "src long, dst long")
    base = spark.createDataFrame(_EDGES, "src long, dst long")
    a = {r["vertex"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    b = {r["vertex"]: r["rank"] for r in pagerank(base, n_iter=5).collect()}
    assert a == b


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, n_iter=3).count() == 0


def test_pagerank_one_action_per_iteration(spark, monkeypatch):
    """The dangling-mass scalar must ride the iteration's checkpoint job
    (broadcast 1-row aggregate), never a driver collect: zero collect()
    calls inside pagerank, and the per-iteration job count is FLAT
    (under AQE each stage materialization is its own job, so "one action"
    shows as a constant, not 1, in the job counter)."""
    from pyspark.sql import DataFrame

    sc = spark.sparkContext
    df = spark.createDataFrame(_EDGES, "src long, dst long")

    calls = {"collect": 0}
    orig = DataFrame.collect

    def counting(self):
        calls["collect"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counting)

    def n_jobs(n_iter, tag):
        sc.setJobGroup(tag, tag)
        try:
            pagerank(df, n_iter=n_iter)
        finally:
            sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    j2 = n_jobs(2, "pr-2")
    j4 = n_jobs(4, "pr-4")
    j6 = n_jobs(6, "pr-6")
    assert calls["collect"] == 0
    assert j4 - j2 == j6 - j4, (j2, j4, j6)  # flat cost per iteration
