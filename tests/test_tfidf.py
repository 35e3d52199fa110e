"""TF-IDF document vectors + sparse cosine (operators/vocab.py) against a
pure-Python oracle, and exact per-group sampling (operators/corpus.py)."""

from __future__ import annotations

import math

from hrdp_variant_load_pipeline_spark.operators.corpus import sample_n_per_group
from hrdp_variant_load_pipeline_spark.operators.vocab import (
    build_vocab,
    sparse_cosine_pairs,
    tfidf_vectors,
)

_DOCS = [
    (1, "spark shuffles data between stages"),
    (2, "spark broadcasts small tables"),
    (3, "duckdb scans parquet fast"),
    (4, "spark spark spark"),
    (5, ""),  # no tokens at all
]


def _oracle(docs, max_vocab=100):
    tf: dict[str, int] = {}
    dfreq: dict[str, int] = {}
    for _, text in docs:
        toks = text.split()
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    ranked = sorted(tf, key=lambda t: (-tf[t], t))[:max_vocab]
    rank = {t: i + 1 for i, t in enumerate(ranked)}
    n = len(docs)
    out = {}
    for doc_id, text in docs:
        counts: dict[int, float] = {}
        for t in text.split():
            if t in rank:
                counts[rank[t]] = counts.get(rank[t], 0) + 1
        w = {
            r: c * (math.log((n + 1) / (dfreq_for_rank(r, rank, dfreq) + 1)) + 1)
            for r, c in counts.items()
        }
        norm = math.sqrt(sum(v * v for v in w.values())) or 1.0
        out[doc_id] = {r: round(v / norm, 6) for r, v in sorted(w.items())}
    return out


def dfreq_for_rank(r, rank, dfreq):
    for t, rr in rank.items():
        if rr == r:
            return dfreq[t]
    raise KeyError(r)


def test_tfidf_matches_python_oracle(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    vocab = build_vocab(df, "text", max_vocab=100)
    got = tfidf_vectors(df, "doc_id", "text", vocab)
    rows = {r.doc_id: dict(zip(r.tfidf_idx, r.tfidf_val)) for r in got.collect()}
    want = _oracle(_DOCS)
    assert rows == want
    # indices ascending; empty doc keeps empty arrays, not nulls
    for r in got.collect():
        assert list(r.tfidf_idx) == sorted(r.tfidf_idx)
    empty = [r for r in got.collect() if r.doc_id == 5][0]
    assert list(empty.tfidf_idx) == [] and list(empty.tfidf_val) == []


def test_tfidf_unit_norm_and_n_docs_param(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    vocab = build_vocab(df, "text", max_vocab=100)
    got = tfidf_vectors(df, "doc_id", "text", vocab, n_docs=len(_DOCS))
    for r in got.collect():
        if r.tfidf_val:
            assert abs(sum(v * v for v in r.tfidf_val) - 1.0) < 1e-4


def test_sparse_cosine_self_similarity_and_overlap(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    vocab = build_vocab(df, "text", max_vocab=100)
    vecs = tfidf_vectors(df, "doc_id", "text", vocab)
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in sparse_cosine_pairs(vecs, vecs, "doc_id").collect()
    }
    # docs 1 and 2 share only 'spark'; doc 3 shares nothing with them
    assert pairs[(1, 2)] > 0
    assert pairs.get((1, 3), 0.0) == 0.0
    # symmetric
    assert pairs[(1, 2)] == pairs[(2, 1)]
    # cosine of a doc against a doc with identical text would be 1; check
    # the dominant-token doc against itself is excluded (no self pairs)
    assert (4, 4) not in pairs


def test_sample_n_per_group_exact_and_deterministic(spark):
    rows = [(i, "g%d" % (i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, grp string")
    a = sample_n_per_group(df, "grp", 5, "id")
    b = sample_n_per_group(df, "grp", 5, "id")
    got_a = sorted((r.grp, r.id) for r in a.collect())
    got_b = sorted((r.grp, r.id) for r in b.collect())
    assert got_a == got_b  # deterministic
    from collections import Counter

    counts = Counter(g for g, _ in got_a)
    assert counts == {"g0": 5, "g1": 5, "g2": 5}
    # different salt draws a different sample
    c = sorted(
        (r.grp, r.id) for r in sample_n_per_group(df, "grp", 5, "id", salt="x").collect()
    )
    assert c != got_a
    # n larger than the group returns the whole group
    small = spark.createDataFrame([(1, "g"), (2, "g")], "id long, grp string")
    assert sample_n_per_group(small, "grp", 10, "id").count() == 2


def test_sparse_cosine_candidates_matches_exhaustive(spark):
    """The candidate-bounded form (r14): every pair sharing a probed
    rank scores EXACTLY like the exhaustive broadcast-cross form; pairs
    whose shared terms are all corpus-common are the (documented)
    bounded-probe exclusion; loose knobs (frac=1, terms=inf) recover
    the exhaustive result exactly."""
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        build_vocab,
        sparse_cosine_candidates,
        sparse_cosine_pairs,
        tfidf_vectors,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha beta gamma delta rare1 rare2"),
        (2, "alpha beta gamma delta rare1 rare3"),
        (3, "alpha beta gamma delta other words"),
        (4, "unrelated text entirely different tokens"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = build_vocab(d, "text", max_vocab=100)
    v = tfidf_vectors(d, "doc_id", "text", vocab, n_docs=4)
    q = v.filter(F.col("doc_id") == 1)
    # min_cosine > 0: the exhaustive form emits cosine-0.0 rows for
    # pairs sharing NOTHING (>= 0.0 passes), which no candidate form
    # can or should produce — any positive threshold makes the forms
    # comparable
    exact = sorted(
        map(
            tuple,
            sparse_cosine_pairs(v, q, "doc_id", min_cosine=1e-9).collect(),
        )
    )
    loose = sorted(
        map(
            tuple,
            sparse_cosine_candidates(
                v, q, "doc_id", min_cosine=1e-9,
                max_df_frac=1.0, max_probe_terms=10**6,
            ).collect(),
        )
    )
    assert loose == exact and exact
    # bounded probe: rare terms of doc 1 are rare1/rare2 (df 2, 1 of 4);
    # with max_df_frac=0.6 the common alpha..delta (df 3/4) are not
    # probed, so doc 3 (shares only common terms) is the documented
    # exclusion while doc 2 (shares rare1) scores exactly
    bounded = {
        (r.id_a, r.id_b): r.cosine
        for r in sparse_cosine_candidates(
            v, q, "doc_id", max_df_frac=0.6, max_probe_terms=4
        ).collect()
    }
    exact_map = {(r[0], r[1]): r[2] for r in exact}
    assert (2, 1) in bounded and bounded[(2, 1)] == exact_map[(2, 1)]
    assert (3, 1) not in bounded
    assert all(k in exact_map and exact_map[k] == c for k, c in bounded.items())


def test_sparse_cosine_candidates_empty_probe_falls_back(spark):
    """A b row whose EVERY term is above the df cutoff (empty probe
    set) must not be silently skipped (r14 ADVICE: the smoothed idf
    floors at 1.0, so an all-common-words rewrite can still score
    cosine ~ 1): it falls back to exhaustive scoring against all of a,
    value-identical to the plain form; probed b rows keep the bounded
    semantics in the same call."""
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        build_vocab,
        sparse_cosine_candidates,
        sparse_cosine_pairs,
        tfidf_vectors,
    )

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "alpha beta gamma delta rare1"),
        (4, "unrelated text entirely different"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = build_vocab(d, "text", max_vocab=100)
    v = tfidf_vectors(d, "doc_id", "text", vocab, n_docs=4)
    # query 1 is ALL common terms (alpha..delta have df 3/4 > 0.6) ->
    # empty probe set; query 3 has rare1 (df 1/4) -> probed normally
    q = v.filter(F.col("doc_id").isin(1, 3))
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in sparse_cosine_candidates(
            v, q, "doc_id", min_cosine=1e-9,
            max_df_frac=0.6, max_probe_terms=4,
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in sparse_cosine_pairs(
            v, q, "doc_id", min_cosine=1e-9
        ).collect()
    }
    # the empty-probe query scores against EVERYTHING the plain form
    # scores it against (doc 2 identical -> cosine 1.0, doc 3 shares
    # the common mass), bit-equal
    fallback_pairs = {k: c for k, c in exact.items() if k[1] == 1}
    assert fallback_pairs and (2, 1) in fallback_pairs
    assert all(got.get(k) == c for k, c in fallback_pairs.items())
    # the probed query keeps bounded semantics: (4, 3) shares nothing
    # probed and nothing at all; every emitted pair matches the exhaustive
    assert all(k in exact and exact[k] == c for k, c in got.items())
    # no duplicate scoring: one row per pair
    rows_out = sparse_cosine_candidates(
        v, q, "doc_id", min_cosine=1e-9, max_df_frac=0.6, max_probe_terms=4
    ).collect()
    assert len(rows_out) == len({(r.id_a, r.id_b) for r in rows_out})
