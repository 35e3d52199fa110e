"""Unigram-LM tokenizer (functions/unigram.py): seed → hard-EM → prune,
Viterbi apply, roundtrip + determinism + scale-shape contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.functions.unigram import (
    _viterbi_segment,
    learn_unigram,
    unigram_tokenize,
)


def _corpus(spark):
    rows = [
        (1, "ababab ababab cdcd"),
        (2, "ababab cdcd cdcd"),
        (3, "ababab ababab ababab xyz"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_viterbi_prefers_likely_pieces():
    logp = {"ab": -1.0, "a": -3.0, "b": -3.0, "c": -3.0}
    assert _viterbi_segment("abab", logp, 4) == ["ab", "ab"]
    # unknown chars survive with the OOV penalty (total segmentation)
    assert _viterbi_segment("abq", logp, 4) == ["ab", "q"]


def test_learn_unigram_finds_repeated_pieces_and_ranks(spark):
    vocab = learn_unigram(
        _corpus(spark), "text", vocab_size=12, max_piece_len=6, n_iter=2
    )
    rows = {r.piece: r for r in vocab.collect()}
    # every single character of the corpus is present (total segmentation)
    for ch in set("ababcdxyz"):
        assert ch in rows, ch
    # the dominant substring family survives pruning
    assert any(len(p) > 1 and "ab" in p for p in rows), rows.keys()
    ranks = sorted(r.rank for r in rows.values())
    assert ranks == list(range(1, len(rows) + 1))


def test_learn_unigram_deterministic(spark):
    a = learn_unigram(_corpus(spark), "text", vocab_size=12, n_iter=2)
    b = learn_unigram(_corpus(spark), "text", vocab_size=12, n_iter=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_unigram_tokenize_roundtrips_and_is_row_local(spark):
    docs = _corpus(spark)
    vocab = learn_unigram(docs, "text", vocab_size=12, n_iter=2)
    out = unigram_tokenize(docs, "text", vocab)
    for r in out.collect():
        assert "".join(r.pieces) == r.text.replace(" ", "")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # corpus-side: one Arrow-batched map, no shuffle
    assert "Exchange" not in plan


def test_learn_unigram_vocab_size_bound(spark):
    vocab = learn_unigram(
        _corpus(spark), "text", vocab_size=9, max_piece_len=6, n_iter=3
    )
    rows = vocab.collect()
    n_single = sum(1 for r in rows if len(r.piece) == 1)
    # singles are exempt from the floor; multis obey the budget
    assert len(rows) <= max(9, n_single)
