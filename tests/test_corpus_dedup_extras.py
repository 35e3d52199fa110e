"""Paragraph-level exact dedup (operators/dedup.py) and n-gram count
tables (operators/vocab.py) against pure-Python oracles."""

from __future__ import annotations

from hrdp_variant_load_pipeline_spark.operators.dedup import paragraph_dedup
from hrdp_variant_load_pipeline_spark.operators.vocab import ngram_counts

_DOCS = [
    (1, "shared boilerplate header\n\nunique first body\n\nshared footer text"),
    (2, "shared boilerplate header\n\nunique second body\n\nshared footer text"),
    (3, "totally unique document\n\nshared boilerplate header"),
    (4, "shared footer text"),
    (5, ""),
]


def _oracle_paragraph_dedup(docs, sep="\n\n", min_chars=1):
    seen = set()
    out = {}
    for doc_id, text in docs:
        kept = []
        for para in text.split(sep):
            if len(para) < min_chars:
                kept.append(para)
            elif para not in seen:
                seen.add(para)
                kept.append(para)
        out[doc_id] = sep.join(kept)
    return out


def test_paragraph_dedup_matches_oracle(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert got == _oracle_paragraph_dedup(_DOCS)
    # doc 1 keeps everything (first occurrences), doc 2 keeps only its
    # unique body, doc 4 becomes empty, doc 5 stays empty
    assert got[1] == _DOCS[0][1]
    assert got[2] == "unique second body"
    assert got[4] == ""
    assert got[5] == ""


def test_paragraph_dedup_min_chars_exempts_short_paragraphs(spark):
    docs = [(1, "hi\n\nlong shared paragraph"), (2, "hi\n\nlong shared paragraph")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in paragraph_dedup(df, "doc_id", "text", min_chars=5).collect()
    }
    assert got[1] == "hi\n\nlong shared paragraph"
    assert got[2] == "hi"  # the short 'hi' survives everywhere


def test_paragraph_dedup_keeps_other_columns(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "a b c", "de")],
        "doc_id long, text string, lang string",
    )
    rows = {r.doc_id: (r.text, r.lang) for r in
            paragraph_dedup(df, "doc_id", "text").collect()}
    assert rows[1] == ("a b c", "en")
    assert rows[2] == ("", "de")


def _oracle_ngrams(texts, n, bos="<s>", eos="</s>"):
    from collections import Counter

    c: Counter = Counter()
    for t in texts:
        w = [bos] * (n - 1) + t.split() + [eos]
        for i in range(len(w) - n + 1):
            c[tuple(w[i : i + n])] += 1
    return c


def test_ngram_counts_match_oracle(spark):
    texts = ["the cat sat", "the cat ran", "cat", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for n in (1, 2, 3):
        got = {
            tuple(r.gram): r["count"]
            for r in ngram_counts(df, "text", n=n).collect()
        }
        assert got == dict(_oracle_ngrams(texts, n)), n


def test_ngram_counts_min_count_prunes(spark):
    texts = ["a b", "a b", "a c"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        tuple(r.gram): r["count"]
        for r in ngram_counts(df, "text", n=2, min_count=2).collect()
    }
    assert got == {("<s>", "a"): 3, ("a", "b"): 2, ("b", "</s>"): 2}


def test_paragraph_dedup_idempotent_and_globally_unique(spark):
    """Eligible paragraphs are globally unique after one pass, so a second
    pass is a no-op; original paragraph order is preserved."""
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    once = paragraph_dedup(df, "doc_id", "text")
    twice = paragraph_dedup(once, "doc_id", "text")
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text for r in twice.collect()}
    assert a == b
    paras = [
        p
        for t in a.values()
        for p in t.split("\n\n")
        if len(p) >= 1
    ]
    assert len(paras) == len(set(paras))
    # order preserved inside the fully-kept doc
    assert a[1].split("\n\n") == _DOCS[0][1].split("\n\n")


def test_scd2_merge_single_pass_plan(spark):
    """scd2_merge must emit all three outcomes from ONE pass over the
    open-slice join: exactly one scan of the update source in the plan
    (the old three-filter-branch form scanned it once per branch)."""
    import tempfile

    from hrdp_variant_load_pipeline_spark.operators.upsert import scd2_merge
    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "a", "2020-01-01"), (2, "b", "2020-01-02")],
            "k long, v string, ts string",
        ).withColumn("batch_ts", F.col("ts").cast("timestamp")).drop(
            "ts"
        ).write.parquet(d + "/u")
        updates = spark.read.parquet(d + "/u")
        empty = spark.createDataFrame(
            [], "k long, v string, effective_from timestamp, effective_to timestamp"
        )
        merged = scd2_merge(empty, updates, ["k"], ["v"])
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan parquet") == 1, plan.count("FileScan parquet")


# ------------------------------------------------- repeated_span_dedup
def _span_corpus(spark):
    boiler = "all rights reserved contact us at example dot com for more info"
    return spark.createDataFrame(
        [
            (1, f"unique alpha text one {boiler} trailing words here"),
            (2, f"different beta opening {boiler} other ending tokens"),
            (3, "totally unrelated document with no repeats at all"),
        ],
        "doc_id long, text string",
    )


def test_repeated_span_dedup_removes_later_copies_only(spark):
    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        repeated_span_dedup,
    )

    out = {
        r.doc_id: r.text
        for r in repeated_span_dedup(
            _span_corpus(spark), "doc_id", "text", k=5
        ).collect()
    }
    boiler = "all rights reserved contact us at example dot com for more info"
    # first occurrence (doc 1) keeps the span; doc 2 loses exactly it
    assert boiler in out[1]
    assert "rights reserved" not in out[2]
    assert out[2].startswith("different beta opening")
    assert out[2].endswith("other ending tokens")
    # untouched doc unchanged
    assert out[3] == "totally unrelated document with no repeats at all"


def test_repeated_span_dedup_intra_doc_and_idempotent(spark):
    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        repeated_span_dedup,
    )

    span = "q w e r t y u i o p"
    docs = spark.createDataFrame(
        [(1, f"{span} middle bit {span}")], "doc_id long, text string"
    )
    once = repeated_span_dedup(docs, "doc_id", "text", k=10)
    got = once.collect()[0].text
    # the second intra-doc copy is removed, the first kept
    assert got.startswith(span)
    assert got.count("q w e") == 1
    assert "middle bit" in got
    twice = repeated_span_dedup(once, "doc_id", "text", k=10).collect()[0].text
    assert twice == got  # idempotent: survivors are unique spans


def test_repeated_span_dedup_short_docs_and_sub_k_repeats_survive(spark):
    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        repeated_span_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in repeated_span_dedup(docs, "doc_id", "text", k=5).collect()}
    # 2-word docs hold no 5-gram window: nothing is removable
    assert out == {1: "tiny doc", 2: "tiny doc", 3: ""}


def test_repeated_span_anchor_is_order_sensitive(spark):
    """Regression guard on the rot-XOR window anchor family: windows
    that are PERMUTATIONS of each other (same word multiset, different
    order) must not anchor together — a plain (unrotated) XOR of word
    hashes would collide them all and falsely dedup reordered spans."""
    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        repeated_span_dedup,
    )

    a = "alpha beta gamma delta epsilon zeta"
    b = "zeta epsilon delta gamma beta alpha"  # reversed: same multiset
    c = "beta alpha gamma delta zeta epsilon"  # pairwise swaps
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.text
        for r in repeated_span_dedup(docs, "doc_id", "text", k=6).collect()
    }
    # no two docs share an ORDERED 6-gram, so every doc must survive whole
    assert out == {1: a, 2: b, 3: c}


def test_span_and_paragraph_dedup_plan_shapes(spark):
    """Scale-contract guards: both corpus-wide dedups are linear chains
    of hash aggregates/joins — no cartesian product, no broadcast of a
    corpus-sized side forced by hint, and the sparse-cosine query path
    (tfidf battery shape) broadcasts only the query side."""
    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        paragraph_dedup,
        repeated_span_dedup,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc{i} end") for i in range(20)],
        "doc_id long, text string",
    )
    for out in (
        paragraph_dedup(docs, "doc_id", "text", sep=" ", min_chars=3),
        repeated_span_dedup(docs, "doc_id", "text", k=4),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # removal-keyed rebuild contract: the piece explode appears
        # exactly twice (the occurrence frame feeds the keeper agg AND
        # the dup join; re-running the row-local explode beats pinning a
        # corpus-sized frame) and each drops the text column before any
        # exchange. The old survivor-keyed tail had a THIRD corpus-sized
        # explode plus a text-bearing reassembly shuffle — a regression
        # back to that shape fails this count.
        assert plan.count("Generate") == 2, plan


def test_sparse_cosine_broadcasts_query_side_only(spark):
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        build_vocab,
        sparse_cosine_pairs,
        tfidf_vectors,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, "text").localCheckpoint()
    vecs = tfidf_vectors(docs, "doc_id", "text", vocab, n_docs=10).localCheckpoint()
    from pyspark.sql import functions as F

    pairs = sparse_cosine_pairs(vecs, vecs.filter(F.col("doc_id") < 2), "doc_id")
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # the corpus (a) side must not be exchanged: query side rides one
    # broadcast into a nested-loop (cross) join, dot product is row-local
    assert "BroadcastExchange" in plan
    import re

    assert not re.search(r"Exchange (hash|range)partitioning", plan), plan
