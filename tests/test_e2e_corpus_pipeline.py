"""End-to-end training-data pipeline over the driver documents fixture:
every corpus operator composed in production order, with invariants at
each stage. This is the integration test for the README's pipeline
cookbook — if a stage's contract drifts, this breaks before a user does.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.functions.text import (
    normalize_text,
    quality_score,
    token_count,
)
from hrdp_variant_load_pipeline_spark.operators.corpus import (
    apply_mixture,
    chunk_documents,
    decontaminate,
    pack_sequences,
    plan_mixture,
)
from hrdp_variant_load_pipeline_spark.operators.dedup import exact_dedup_groups
from hrdp_variant_load_pipeline_spark.sources.corpus_io import write_shards
from hrdp_variant_load_pipeline_spark.sources.tables import table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_full_corpus_pipeline(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    n_raw = docs.count()

    # 1. normalize + quality/token columns (all row-local)
    scored = docs.select(
        "doc_id",
        "lang",
        normalize_text(F.col("text")).alias("text"),
    ).select(
        "*",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )

    # 2. quality gate + exact-dup canonicalization
    kept = scored.filter(F.col("quality") >= 0.4)
    canon_ids = exact_dedup_groups(kept, "doc_id", "text").select(
        F.col("keeper_id").alias("doc_id")
    )
    unique = kept.join(canon_ids, "doc_id", "left_semi")
    n_unique = unique.count()
    assert 0 < n_unique <= n_raw

    # 2b. corpus-wide paragraph dedup (single-paragraph docs here, so the
    # operator must be a value-preserving pass for already-unique texts)
    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        paragraph_dedup,
    )

    para = paragraph_dedup(unique, "doc_id", "text")
    assert para.count() == n_unique
    assert para.filter(F.col("text") == "").count() == 0

    # 2c. repeated-span (substring-level) dedup: the low-vocabulary
    # fixture DOES share >= 12-word spans across docs (word-soup texts),
    # so the operator genuinely fires here — every doc row survives
    # (empty-text docs included: the caller decides to drop), the corpus
    # only shrinks, and a second pass removes nothing more (survivor
    # spans are unique by construction)
    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        repeated_span_dedup,
    )

    span = repeated_span_dedup(unique, "doc_id", "text", k=12)
    assert span.count() == n_unique
    tokens_before = unique.select(
        F.sum(F.size(F.split("text", r"\s+")))
    ).collect()[0][0]
    tokens_after = span.select(
        F.sum(F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")))
    ).collect()[0][0]
    assert 0 < tokens_after < tokens_before  # it fired, and kept most
    span2 = repeated_span_dedup(span, "doc_id", "text", k=12)
    assert (
        span2.select(F.md5(F.concat_ws("|", "doc_id", "text")).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
        .collect()
        == span.select(F.md5(F.concat_ws("|", "doc_id", "text")).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
        .collect()
    )

    # 2d. LM-score gate (the CCNet chain, stupid-backoff smoothing):
    # counts from the surviving corpus itself; every doc gets a finite
    # score, and the gate keeps a non-trivial fraction
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        lm_doc_score,
        ngram_counts,
    )

    counts = ngram_counts(unique, "text", n=2, min_count=2)
    lm = lm_doc_score(
        unique, "doc_id", "text", counts, smoothing="stupid_backoff"
    )
    assert lm.filter(F.col("lm_logprob").isNull()).count() == 0
    cutoff = lm.approxQuantile("lm_logprob", [0.1], 0.01)[0]
    lm_kept = lm.filter(F.col("lm_logprob") >= cutoff)
    assert 0 < lm_kept.count() <= n_unique

    # 2e. web-curation keys + per-domain cap + PII scrub: synthesize a
    # crawl url per doc (deterministic eTLD+1 skew), key it through the
    # bundled-PSL curation helper, cap pages per registered domain, and
    # scrub the synthetic contact line — the README cookbook's gate
    # column stages, composed on the real fixture
    from hrdp_variant_load_pipeline_spark.functions.text import redact_pii
    from hrdp_variant_load_pipeline_spark.operators.corpus import (
        sample_n_per_group,
        url_curation_keys,
    )

    crawl = unique.withColumn(
        "url",
        F.concat(
            F.lit("HTTPS://Sub"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".host"),
            (F.col("doc_id") % 2).cast("string"),
            F.lit(".CO.UK:443/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_source=e2e"),
        ),
    )
    keyed = url_curation_keys(crawl)
    assert keyed.filter(F.col("domain").isNull()).count() == 0
    assert (
        keyed.filter(~F.col("domain").rlike(r"^host[01]\.co\.uk$")).count() == 0
    )
    capped = sample_n_per_group(keyed, "domain", n=5, id_col="doc_id")
    assert (
        capped.groupBy("domain").count().filter(F.col("count") > 5).count() == 0
    )
    scrubbed = capped.withColumn(
        "text",
        redact_pii(F.concat(F.col("text"), F.lit(" contact x@pii.example.com"))),
    )
    assert scrubbed.filter(~F.col("text").endswith("contact <EMAIL>")).count() == 0

    # 2f. gopher rule gate: thresholds that bracket the fixture's word
    # soup — the gate fires on some docs but keeps a working majority,
    # and the struct exposes per-rule attribution for the dropped ones
    from hrdp_variant_load_pipeline_spark.functions.text import gopher_rules

    flagged = unique.withColumn(
        "g",
        gopher_rules(
            F.col("text"),
            min_words=20,
            max_words=80,
            min_avg_word_len=3.0,
            max_avg_word_len=6.0,
            min_stopword_hits=0,
        ),
    )
    n_gopher = flagged.filter(F.col("g.passes")).count()
    assert 0 < n_gopher < n_unique
    dropped = flagged.filter(~F.col("g.passes"))
    # every dropped doc has at least one concrete failing rule
    assert (
        dropped.filter(
            F.col("g.words_ok")
            & F.col("g.avg_len_ok")
            & F.col("g.symbol_ok")
            & F.col("g.bullet_ok")
            & F.col("g.ellipsis_ok")
            & F.col("g.alpha_ok")
            & F.col("g.stopword_ok")
        ).count()
        == 0
    )

    # 2g. DSIR selection toward the 'en' slice: english docs must be
    # overrepresented among the resampled set relative to the pool
    from hrdp_variant_load_pipeline_spark.operators.dsir import (
        bucket_logratio,
        dsir_log_weight,
        dsir_resample,
    )

    pool = unique.select("doc_id", "text", "lang")
    lr = bucket_logratio(
        pool.filter(F.col("lang") == "en"), pool, "text", n_buckets=64
    )
    dsir_scored = dsir_log_weight(pool, lr, "text", 64)
    picked = dsir_resample(dsir_scored, 50, "doc_id")
    assert picked.count() == 50
    en_pool = pool.filter(F.col("lang") == "en").count() / pool.count()
    en_pick = picked.filter(F.col("lang") == "en").count() / 50
    assert en_pick > en_pool

    # 3. decontaminate against a pseudo eval set (docs 0 mod 10)
    bench = unique.filter(F.col("doc_id") % 10 == 0)
    corpus = decontaminate(
        unique.filter(F.col("doc_id") % 10 != 0), bench, "doc_id", "text", n=8
    )
    n_clean = corpus.count()
    assert 0 < n_clean < n_unique

    # 4. mixture: rebalance languages to a 5k-token budget
    plan = plan_mixture(
        corpus,
        "lang",
        "n_tokens",
        weights={"en": 0.6, "de": 0.2, "zh": 0.2},
        total_tokens=5000,
    )
    mixed = apply_mixture(corpus, "lang", "doc_id", plan)
    tok_by_lang = {
        r["lang"]: r["tok"]
        for r in mixed.groupBy("lang").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    assert set(tok_by_lang) <= {"en", "de", "zh"}  # unplanned langs dropped
    assert sum(tok_by_lang.values()) <= 5000 * 1.5  # budget respected (hash tolerance)

    # 5. chunk + per-language pack (the 100 TB partitioned path)
    # lang rides through the explode via carry_cols — no corpus-cardinality
    # re-join (the scale-breaking shape ADVICE r10 flagged in the pipeline)
    chunks = chunk_documents(
        mixed, "doc_id", "text", chunk_tokens=64, overlap_tokens=16,
        carry_cols=["lang"],
    )
    with_lang = chunks
    packed = pack_sequences(
        with_lang.withColumn(
            "chunk_uid", F.col("doc_id") * 100000 + F.col("chunk_idx")
        ),
        id_col="doc_id",
        token_count_col="n_tokens",
        max_tokens=256,
        order_col="chunk_uid",
        partition_col="lang",
    )
    over = packed.filter(~F.col("oversize")).groupBy("lang", "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens")
    )
    # every non-final bin obeys capacity + one-chunk overflow
    assert over.filter(F.col("bin_tokens") > 256 + 64).count() == 0

    # 6. shard export: disjoint bin ranges per file, lossless
    out = str(tmp_path / "shards")
    write_shards(
        packed.withColumn(
            "shard_key",
            F.abs(F.hash("lang")).cast("long") * 10000 + F.col("bin_id"),
        ),
        out,
        "shard_key",
        n_shards=4,
        order_col="chunk_uid",
    )
    back = spark.read.parquet(out)
    assert back.count() == packed.count()
    assert set(back.columns) == set(packed.columns) | {"shard_key"}
