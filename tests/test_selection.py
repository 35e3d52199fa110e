"""k-center greedy coreset selection (operators/selection.py)."""

from __future__ import annotations

import math

import pytest

from hrdp_variant_load_pipeline_spark.operators.selection import kcenter_greedy


def _model(rows, k, seed_id=None):
    """Brute-force Python mirror: rounded cosine distance, min over
    selected, argmax with smallest-id tie-break."""
    vecs = {i: v for i, v in rows}

    def cosd(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(1.0 - dot / (na * nb), 6)

    ids = sorted(i for i, v in vecs.items()
                 if math.sqrt(sum(x * x for x in v)) > 0)
    sel = [seed_id if seed_id is not None else ids[0]]
    out = [(0, sel[0], None)]
    for step in range(1, k):
        best = None
        for i in ids:
            if i in sel:
                continue
            d = min(cosd(vecs[i], vecs[s]) for s in sel)
            if best is None or d > best[0] or (d == best[0] and i < best[1]):
                best = (d, i)
        if best is None or best[0] <= 0:
            break
        out.append((step, best[1], best[0]))
        sel.append(best[1])
    return out


ROWS = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0]),   # near 1
    (3, [0.0, 1.0, 0.0]),   # orthogonal to 1
    (4, [0.0, 0.0, 1.0]),   # orthogonal to both
    (5, [-1.0, 0.0, 0.0]),  # antipodal to 1 (dist 2)
    (6, [0.5, 0.5, 0.0]),
]


def test_matches_python_model(spark):
    df = spark.createDataFrame(ROWS, "vec_id long, embedding array<double>")
    got = kcenter_greedy(df, "vec_id", "embedding", k=4)
    want = _model(ROWS, k=4)
    assert got == want
    # farthest-first: the antipodal point must be picked first
    assert got[1][1] == 5 and got[1][2] == 2.0


def test_duplicates_never_repick_and_early_stop(spark):
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [2.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # all three are cosine-identical: after the seed there is nothing
    # at distance > 0, so the trajectory is just the seed
    assert kcenter_greedy(df, "vec_id", "embedding", k=3) == [(0, 1, None)]


def test_seed_and_zero_vector_handling(spark):
    rows = ROWS + [(7, [0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kcenter_greedy(df, "vec_id", "embedding", k=3, seed_id=3)
    assert got[0] == (0, 3, None)
    assert all(i != 7 for _, i, _ in got)  # zero vector excluded
    assert got == _model(ROWS, k=3, seed_id=3)


def test_guards(spark):
    df = spark.createDataFrame(
        [(1, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k must be"):
        kcenter_greedy(df, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError, match="empty input"):
        kcenter_greedy(df, "vec_id", "embedding", k=2, seed_id=99)


def test_no_shuffle_no_join_per_iteration(spark):
    """Scale contract: the per-iteration plan is scan → row-local
    min-dist → one aggregate. No Exchange other than the final
    single-partition agg, no join operator."""
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators.selection import (
        _dot_sql,
        _vec_literal,
    )
    from hrdp_variant_load_pipeline_spark.operators.similarity import (
        _norm_sql,
    )

    df = spark.createDataFrame(ROWS, "vec_id long, embedding array<double>")
    base = df.selectExpr(
        "vec_id AS __id", "embedding AS __v",
        f"{_norm_sql('embedding')} AS __n",
    ).filter("__n > 0")
    lit = _vec_literal([1.0, 0.0, 0.0])
    scored = base.selectExpr(
        "__id",
        f"round(1.0d - {_dot_sql('__v', lit)} / (__n * {_norm_sql(lit)}), 6)"
        " AS __d",
    ).agg(F.max(F.struct("__d", "__id")))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange") <= 1, plan


# ------------------------------------------------------------------- MMR
def test_mmr_matches_python_model(spark):
    from hrdp_variant_load_pipeline_spark.operators.selection import mmr_rerank

    # rel scores favor 1 and 2 (near-duplicates); diversity must demote 2
    rows = [
        (1, [1.0, 0.0, 0.0], 1.00),
        (2, [0.99, 0.14, 0.0], 0.95),  # near-dup of 1
        (3, [0.0, 1.0, 0.0], 0.60),
        (4, [0.0, 0.0, 1.0], 0.40),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, embedding array<double>, score double"
    )
    got = mmr_rerank(df, k=3, lam=0.5)

    def model(rows, k, lam):
        import math

        pool = {i: (v, math.sqrt(sum(x * x for x in v)), r) for i, v, r in rows}

        def cosd(a, b):
            va, na, _ = pool[a]
            vb, nb, _ = pool[b]
            return round(sum(x * y for x, y in zip(va, vb)) / (na * nb), 6)

        sel, out = [], []
        while len(out) < k and len(sel) < len(pool):
            best = None
            for i in sorted(pool):
                if i in sel:
                    continue
                pen = max((cosd(i, s) for s in sel), default=0.0)
                m = round(lam * pool[i][2] - (1 - lam) * pen, 6)
                if best is None or m > best[0] or (m == best[0] and i < best[1]):
                    best = (m, i)
            out.append((len(out) + 1, best[1], best[0]))
            sel.append(best[1])
        return out

    assert got == model(rows, 3, 0.5)
    # diversity wins: the near-dup of the first pick is NOT second
    assert [i for _, i, _ in got][:3] == [1, 3, 4]
    # lam=1 reduces to pure relevance order
    rel_only = mmr_rerank(df, k=4, lam=1.0)
    assert [i for _, i, _ in rel_only] == [1, 2, 3, 4]


def test_mmr_guards(spark):
    from hrdp_variant_load_pipeline_spark.operators.selection import mmr_rerank

    df = spark.createDataFrame(
        [(1, [1.0], 0.5)], "doc_id long, embedding array<double>, score double"
    )
    with pytest.raises(ValueError, match="k must be"):
        mmr_rerank(df, k=0)
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, k=1, lam=1.5)
    z = spark.createDataFrame(
        [(9, [0.0], 0.5)], "doc_id long, embedding array<double>, score double"
    )
    with pytest.raises(ValueError, match="zero vector for id 9"):
        mmr_rerank(z, k=1)
    assert mmr_rerank(df.filter("doc_id < 0"), k=2) == []


def test_mmr_rejects_duplicate_candidate_ids(spark):
    """ADVICE r12: duplicate pool ids must fail loud (the convention of
    the other query-sized-input operators), not silently collapse."""
    from hrdp_variant_load_pipeline_spark.operators.selection import (
        mmr_rerank,
    )

    cands = spark.createDataFrame(
        [(1, [1.0, 0.0], 0.9), (1, [0.0, 1.0], 0.5)],
        "doc_id long, embedding array<double>, score double",
    )
    with pytest.raises(ValueError, match="duplicate candidate id 1"):
        mmr_rerank(cands, k=2)


def test_kcenter_carried_matches_literal_form(spark):
    """The carried-min-dist form returns the IDENTICAL trajectory to the
    literal form (same 6dp rounds, same ties, same duplicate early
    stop), and releases every superseded per-step checkpoint."""
    from hrdp_variant_load_pipeline_spark.operators.selection import (
        kcenter_greedy_carried,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def cached_ids():
        sc = spark.sparkContext
        return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}

    before = cached_ids()
    want = kcenter_greedy(e, "vec_id", "embedding", 12)
    got = kcenter_greedy_carried(e, "vec_id", "embedding", 12)
    assert got == want and len(got) == 12
    assert cached_ids() - before == set()  # no leaked step checkpoints

    # duplicate-point early stop parity
    import pyspark.sql.functions as F

    dup = e.limit(3).union(e.limit(3)).withColumn(
        "vec_id", F.monotonically_increasing_id()
    )
    assert kcenter_greedy_carried(dup, "vec_id", "embedding", 6) == (
        kcenter_greedy(dup, "vec_id", "embedding", 6)
    )


def test_kcenter_literal_k_ceiling_fails_loud(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="max_literal_k"):
        kcenter_greedy(e, "vec_id", "embedding", 129)
