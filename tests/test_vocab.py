"""Vocabulary builder + frequency scorer (operators/vocab.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.operators.vocab import (
    build_vocab,
    frequency_score,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog  sat"),  # double space: no phantom token
            (3, "cat cat cat"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


def test_build_vocab_tf_df_and_rank(spark):
    v = {r.token: r for r in build_vocab(_corpus(spark), "text").collect()}
    assert v["the"].tf == 3 and v["the"].df == 2
    assert v["cat"].tf == 4 and v["cat"].df == 2
    assert v["sat"].tf == 2 and v["sat"].df == 2
    assert v["dog"].tf == 1 and v["dog"].df == 1
    # rank: by tf desc, token asc on ties; dense 1..n
    assert v["cat"].rank == 1 and v["the"].rank == 2 and v["sat"].rank == 3
    assert sorted(r.rank for r in v.values()) == list(range(1, len(v) + 1))


def test_build_vocab_truncation_and_min_count(spark):
    top2 = build_vocab(_corpus(spark), "text", max_vocab=2).collect()
    assert {r.token for r in top2} == {"cat", "the"}
    no_hapax = build_vocab(_corpus(spark), "text", min_count=2).collect()
    assert "dog" not in {r.token for r in no_hapax}


def test_frequency_score_matches_manual(spark):
    docs = _corpus(spark)
    vocab = build_vocab(docs, "text")
    tf = {r.token: r.tf for r in vocab.collect()}
    out = {r.doc_id: r.freq_score for r in frequency_score(docs, "doc_id", "text", vocab).collect()}
    want1 = sum(math.log10(tf[t]) for t in "the cat sat on the mat".split()) / 6
    assert abs(out[1] - round(want1, 4)) < 1e-9
    assert out[3] == round(math.log10(4), 4)
    assert out[4] is None  # empty doc: no tokens, null score


def test_frequency_score_oov_counts_as_one(spark):
    docs = _corpus(spark)
    vocab = build_vocab(docs, "text", max_vocab=2)  # only cat/the in vocab
    out = {r.doc_id: r.freq_score for r in frequency_score(docs, "doc_id", "text", vocab).collect()}
    # doc 2: the(3), dog(OOV->1), sat(OOV->1) -> mean(log10(3), 0, 0)
    assert out[2] == round(math.log10(3) / 3, 4)


def test_frequency_score_broadcast_no_token_shuffle(spark):
    """The vocab side must broadcast; no exchange may feed the join's
    probe (token) side — the corpus explode stays map-local."""
    docs = _corpus(spark)
    vocab = build_vocab(docs, "text")
    plan = (
        frequency_score(docs, "doc_id", "text", vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    join_at = plan.index("BroadcastHashJoin")
    gen_at = plan.index("Generate explode", join_at)
    assert "Exchange hashpartitioning" not in plan[join_at:gen_at]


def test_build_vocab_matches_duckdb_on_documents(spark):
    """Cross-engine parity on the real documents fixture: tf, df, and the
    deterministic (tf desc, token asc) rank agree with independent SQL."""
    import os

    import duckdb

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    got = {
        r.token: (r.tf, r.df, r.rank)
        for r in build_vocab(docs, "text", max_vocab=50).collect()
    }
    con = duckdb.connect()
    want = {
        t: (tf, df, rank)
        for t, tf, df, rank in con.execute(
            f"""
            WITH src AS (SELECT row_number() OVER () AS d, text
                         FROM '{sf}/documents.parquet'),
            tok AS (SELECT d, unnest(list_filter(
                      regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token
                    FROM src),
            stats AS (SELECT token, count(*) AS tf, count(DISTINCT d) AS df
                      FROM tok GROUP BY token),
            r AS (SELECT *, row_number() OVER (ORDER BY tf DESC, token) AS rank
                  FROM stats)
            SELECT token, tf, df, rank FROM r WHERE rank <= 50
            """
        ).fetchall()
    }
    assert got == want


def test_build_vocab_rank_window_input_is_bounded(spark):
    """The exact global rank must run over a TakeOrdered top-k of the
    distinct-token table, never sort the full table through one window
    partition (the web-scale contract)."""
    from hrdp_variant_load_pipeline_spark.operators.vocab import build_vocab

    df = spark.createDataFrame(
        [(1, "a b c a b a x y z w v u t s r q")], "doc_id long, text string"
    )
    out = build_vocab(df, "text", max_vocab=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the window sits ABOVE the take (bounded input), not directly on the
    # token aggregate
    assert plan.find("Window") < plan.find("TakeOrderedAndProject")


def test_lm_doc_score_matches_manual(spark):
    """Add-k bigram scoring against a hand-computed oracle on a tiny
    corpus: counts from the corpus itself (min_count=1), k=1."""
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        lm_doc_score,
        ngram_counts,
    )

    docs = _corpus(spark)
    counts = ngram_counts(docs, "text", n=2)
    crows = {tuple(r.gram): r["count"] for r in counts.collect()}
    ctx = {}
    for g, c in crows.items():
        ctx[g[0]] = ctx.get(g[0], 0) + c
    vocab_v = len({g[1] for g in crows}) + 1
    out = {
        r.doc_id: r.lm_logprob
        for r in lm_doc_score(docs, "doc_id", "text", counts).collect()
    }

    def score(text):
        ws = ["<s>"] + [w for w in text.split(" ") if w] + ["</s>"]
        lps = [
            math.log(
                (crows.get((a, b), 0) + 1.0) / (ctx.get(a, 0) + vocab_v)
            )
            for a, b in zip(ws, ws[1:])
        ]
        return round(sum(lps) / len(lps), 6)

    for did, text in [(1, "the cat sat on the mat"), (2, "the dog  sat"), (3, "cat cat cat"), (4, "")]:
        assert abs(out[did] - score(text)) < 1e-9, did


def test_lm_doc_score_pruned_counts_smooth_as_unseen(spark):
    """Grams pruned by min_count score exactly like unseen grams (the
    OOV bucket), and rarer-gram docs score lower than common-gram docs."""
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        lm_doc_score,
        ngram_counts,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y")], "doc_id long, text string"
    )
    counts = ngram_counts(docs, "text", n=2, min_count=2)
    got = {
        r.doc_id: r.lm_logprob
        for r in lm_doc_score(docs, "doc_id", "text", counts).collect()
    }
    assert got[1] > got[2]  # frequent bigrams beat pruned/unseen ones


def test_lm_doc_score_corpus_side_has_no_token_shuffle(spark):
    """Plan guards, both sides of the r12 snapshot boundary: the probe
    plan broadcasts the model frames (counts-derived scores / V-N) and
    its only hash exchange is the doc-keyed aggregate; the public
    function then pins that aggregate, so the OUTER plan carries no
    Generate (the exploded probe never re-executes when a consumer runs
    a second job, e.g. the perplexity-threshold pass)."""
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        _lm_scored,
        lm_doc_score,
        ngram_counts,
    )

    docs = _corpus(spark)
    counts = ngram_counts(docs, "text", n=2).localCheckpoint()
    probe = _lm_scored(
        docs, "doc_id", "text", counts, 2, 1.0, "<s>", "</s>",
        "lm_logprob", "stupid_backoff", 0.4,
    )
    pplan = probe._jdf.queryExecution().executedPlan().toString()
    assert pplan.count("BroadcastExchange") >= 2
    # the corpus explode feeds a map-side partial aggregate BEFORE any
    # exchange: grams collapse to one row per (doc, partition) on the
    # map side, so the wire carries O(docs), never O(tokens). (The other
    # hash exchanges in the plan belong to the model-sized counts
    # derivations, not the corpus path.)
    gen = pplan.find("Generate explode")
    assert gen != -1
    corpus_side = pplan[:gen]  # operators ABOVE the explode in the tree
    agg_pos = corpus_side.rfind("HashAggregate")
    exch_pos = corpus_side.rfind("Exchange hashpartitioning")
    assert agg_pos != -1 and exch_pos != -1
    # partial agg prints BELOW the exchange (closer to the Generate)
    assert agg_pos > exch_pos

    outer = (
        lm_doc_score(docs, "doc_id", "text", counts)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in outer  # probe pinned behind the snapshot
    assert "Scan ExistingRDD" in outer


def test_lm_stupid_backoff_matches_manual(spark):
    """Stupid-backoff scoring against a hand-computed oracle: seen grams
    score c/ctx, unseen ones 0.4 * add-1 unigram frequency."""
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        lm_doc_score,
        ngram_counts,
    )

    docs = _corpus(spark)
    counts = ngram_counts(docs, "text", n=2)
    crows = {tuple(r.gram): r["count"] for r in counts.collect()}
    ctx, uni = {}, {}
    for g, c in crows.items():
        ctx[g[0]] = ctx.get(g[0], 0) + c
        uni[g[1]] = uni.get(g[1], 0) + c
    vocab_v = len(uni) + 1
    total_n = sum(crows.values())
    out = {
        r.doc_id: r.lm_logprob
        for r in lm_doc_score(
            docs, "doc_id", "text", counts, smoothing="stupid_backoff"
        ).collect()
    }

    def score(text):
        ws = ["<s>"] + [w for w in text.split(" ") if w] + ["</s>"]
        lps = []
        for a, b in zip(ws, ws[1:]):
            if (a, b) in crows:
                s = crows[(a, b)] / ctx[a]
            else:
                s = 0.4 * (uni.get(b, 0) + 1.0) / (total_n + vocab_v)
            lps.append(math.log(s))
        return round(sum(lps) / len(lps), 6)

    for did, text in [
        (1, "the cat sat on the mat"),
        (2, "the dog  sat"),
        (3, "cat cat cat"),
        (4, ""),
    ]:
        assert abs(out[did] - score(text)) < 1e-9, did


def test_lm_stupid_backoff_beats_add_k_on_held_out_bigrams(spark):
    """The upgrade's point, pinned: a HELD-OUT bigram made of frequent
    words (seen in training, never adjacent) is flattened to near the
    OOV floor by add-k, while backoff credits the continuation word's
    unigram frequency — so the held-out doc scores strictly higher under
    backoff, and by a wide margin relative to a junk-word doc."""
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        lm_doc_score,
        ngram_counts,
    )

    train = spark.createDataFrame(
        [
            (i, t)
            for i, t in enumerate(
                ["the cat sat on the mat"] * 5
                + ["the dog ran to the mat"] * 5
                + ["a cat and a dog"] * 5
            )
        ],
        "doc_id long, text string",
    )
    counts = ngram_counts(train, "text", n=2).localCheckpoint()
    # 'mat cat': both words frequent; the bigram itself never occurs
    held_out = spark.createDataFrame(
        [(100, "mat cat"), (101, "qq zz")], "doc_id long, text string"
    )

    def scores(sm):
        return {
            r.doc_id: r.lm_logprob
            for r in lm_doc_score(
                held_out, "doc_id", "text", counts, smoothing=sm
            ).collect()
        }

    addk, backoff = scores("add_k"), scores("stupid_backoff")
    # held-out-frequent-words doc: backoff strictly better than add-k
    assert backoff[100] > addk[100]
    # and backoff separates real-word docs from junk more sharply
    assert (backoff[100] - backoff[101]) > (addk[100] - addk[101])


def test_lm_doc_score_null_text_contract(spark):
    """Pinned contract (both smoothings): score is null ONLY for null
    text — empty text still scores (its single padded gram)."""
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        lm_doc_score,
        ngram_counts,
    )

    docs = spark.createDataFrame(
        [(1, "the cat"), (2, ""), (3, None)], "doc_id long, text string"
    )
    counts = ngram_counts(_corpus(spark), "text", n=2).localCheckpoint()
    for sm in ("add_k", "stupid_backoff"):
        got = {
            r.doc_id: r.lm_logprob
            for r in lm_doc_score(
                docs, "doc_id", "text", counts, smoothing=sm
            ).collect()
        }
        assert got[1] is not None and got[2] is not None, sm
        assert got[3] is None, sm


def test_lm_doc_score_rejects_unknown_smoothing(spark):
    import pytest

    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        lm_doc_score,
        ngram_counts,
    )

    docs = _corpus(spark)
    counts = ngram_counts(docs, "text", n=2)
    with pytest.raises(ValueError, match="smoothing"):
        lm_doc_score(docs, "doc_id", "text", counts, smoothing="kneser_ney")


def test_perplexity_buckets_tiers_nulls_and_guards(spark):
    import pytest

    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        perplexity_buckets,
    )

    # 9 distinct scores -> exact thirds; one null rides along
    rows = [(i, float(-i)) for i in range(9)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, lp double")
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(df, "lp").collect()
    }
    # highest scores (ids 0-2) = head, lowest (ids 6-8) = tail
    assert {i: got[i] for i in range(9)} == {
        0: "head", 1: "head", 2: "head",
        3: "middle", 4: "middle", 5: "middle",
        6: "tail", 7: "tail", 8: "tail",
    }
    assert got[99] is None  # null score never lands in 'head'

    with pytest.raises(ValueError, match="already exists"):
        perplexity_buckets(df.withColumn("ppl_bucket", F.lit("x")), "lp")
    with pytest.raises(ValueError, match="fracs"):
        perplexity_buckets(df, "lp", fracs=(0.7, 0.3))


# ------------------------------------------------------------------ bm25
def _bm25_model(docs, terms, k1=1.2, b=0.75):
    """Brute-force Python BM25 (Robertson & Zaragoza 2009, Lucene idf)."""
    toks = {i: [w for w in t.split() if w] for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for i, _ in docs:
        s = 0.0
        dl = len(toks[i])
        for term in terms:
            tf = toks[i].count(term)
            df = sum(1 for w in toks.values() if term in w)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        out[i] = s
    return out


def test_bm25_matches_python_model(spark):
    from hrdp_variant_load_pipeline_spark.operators.vocab import bm25_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog  sat"),
        (3, "cat cat cat"),
        (4, "dog runs far away from the cat and the dog"),
        (5, "nothing relevant here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["cat", "dog", "mat"]
    got = {
        r.doc_id: r.bm25
        for r in bm25_scores(df, "doc_id", "text", terms).collect()
    }
    want = _bm25_model(rows, terms)
    assert got.keys() == want.keys()
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])
    # no query term -> exactly 0.0; k1 saturation means the two-term
    # match (cat + rare mat, doc 1) outranks the tf-3 single-term doc 3
    assert got[5] == 0.0
    assert got[1] > got[3] > 0.0


def test_bm25_guards(spark):
    import pytest as _pt

    from hrdp_variant_load_pipeline_spark.operators.vocab import bm25_scores

    df = _corpus(spark)
    with _pt.raises(ValueError, match="duplicate"):
        bm25_scores(df, "doc_id", "text", ["cat", "cat"])
    with _pt.raises(ValueError, match="empty"):
        bm25_scores(df, "doc_id", "text", [])
    with _pt.raises(ValueError, match="already exists"):
        bm25_scores(df, "doc_id", "text", ["cat"], out_col="text")


def test_bm25_plan_is_shuffle_free_after_scalar_agg(spark):
    """The scoring side must be one scan + broadcast of the 1-row stats:
    no Exchange keyed on the corpus, no explode of the token array."""
    from hrdp_variant_load_pipeline_spark.operators.vocab import bm25_scores

    df = _corpus(spark)
    plan = bm25_scores(df, "doc_id", "text", ["cat", "dog"])._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no explode
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bm25_extreme_params_never_nan(spark):
    """b=1.0 (full length normalization) with a tokenless doc, and k1=0:
    non-matching docs must score an exact 0.0, never NaN; parameters
    outside the legal range are rejected."""
    import math

    from hrdp_variant_load_pipeline_spark.operators.vocab import bm25_scores

    df = spark.createDataFrame(
        [(1, "cat dog"), (2, ""), (3, "bird")], "doc_id long, text string"
    )
    for k1, b in ((1.2, 1.0), (0.0, 0.75), (0.0, 1.0)):
        got = {r.doc_id: r.bm25
               for r in bm25_scores(df, "doc_id", "text", ["cat"], k1=k1, b=b)
               .collect()}
        assert not any(math.isnan(v) for v in got.values()), (k1, b, got)
        assert got[2] == 0.0 and got[3] == 0.0
        assert got[1] > 0.0
    import pytest as _pt

    with _pt.raises(ValueError, match="b must be"):
        bm25_scores(df, "doc_id", "text", ["cat"], b=1.5)
    with _pt.raises(ValueError, match="k1 must be"):
        bm25_scores(df, "doc_id", "text", ["cat"], k1=-1)


def test_word_weighted_stats_matches_per_doc_form(spark):
    """The distinct-word decomposition must equal a direct per-doc pass:
    Σ_docs Σ_w f(w) == Σ_(g,w) freq·f(w) — including wordless docs
    (counted in n_docs, zero contribution), multi-space splits, and a
    group whose docs are ALL wordless (left-join coalesce path)."""
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        word_weighted_stats,
    )

    df = spark.createDataFrame(
        [
            ("en", "the cat  sat on the mat"),
            ("en", "cat cat"),
            ("en", ""),
            ("de", "der hund"),
            ("xx", ""),  # group with no words at all
        ],
        "lang string, text string",
    )

    def stats(words):
        return words.select(
            "word",
            F.length("word").alias("n_chars"),
            (F.length("word").cast("double") / 2).alias("half"),
        )

    got = {
        r["lang"]: r
        for r in word_weighted_stats(df, "text", ["lang"], stats).collect()
    }
    # direct per-doc reference, computed in Python
    import collections

    ref = collections.defaultdict(lambda: [0, 0.0, 0.0])
    for lang, text in [
        ("en", "the cat  sat on the mat"),
        ("en", "cat cat"),
        ("en", ""),
        ("de", "der hund"),
        ("xx", ""),
    ]:
        ref[lang][0] += 1
        for w in text.split():
            ref[lang][1] += len(w)
            ref[lang][2] += len(w) / 2
    assert set(got) == set(ref)
    for lang, (n, sc, sh) in ref.items():
        assert got[lang]["n_docs"] == n, lang
        assert got[lang]["sum_n_chars"] == sc, lang
        assert got[lang]["sum_half"] == sh, lang
