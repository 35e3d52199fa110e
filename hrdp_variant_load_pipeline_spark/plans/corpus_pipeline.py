"""One-call corpus curation pipeline — the LLM-data counterpart of
``plans.load.run_load``: the README cookbook's stage chain (ingest →
normalize/scrub → quality gates → dedup → LM gate → decontaminate →
selection → mixture → chunk → pack → shards) composed from the engine's
operators and driven by ONE plain-dict config, so the whole curation
run is declarative, reproducible, and auditable stage by stage.

Everything here is composition — no new semantics. Each stage is the
already-tested operator; the plan only decides order, wiring, and what
to count. Stage order is fixed and deliberate:

  1. ingest (jsonl | parquet | warc)           sources/
  2. normalize + PII scrub (row-local)         functions/text.py
  3. heuristic gates: quality_score, gopher    functions/text.py
  4. dedup: exact → paragraph → span → fuzzy   operators/dedup.py
  5. LM perplexity gate (counts from corpus)   operators/vocab.py
  6. decontaminate vs eval set                 operators/corpus.py
  7. DSIR selection toward a target slice      operators/dsir.py
  8. mixture rebalance to a token budget       operators/corpus.py
  9. chunk + pack + shard export               operators/corpus.py, sources/corpus_io.py

Cheap row-local gates run BEFORE expensive corpus-wide stages so
rejected docs never pay shingling or shuffles, mirroring the measured
stage costs in BENCH_NOTES.md.

Metrics: every enabled stage boundary persists and materializes its
frame once (chained pin/release — exactly one stage cached at a time),
which is what keeps the chain O(stages) instead of O(stages^2): stage
counts AND the internal actions several stages perform (the DSIR
log-ratio collect, the mixture-plan collect) would otherwise each
re-execute the whole upstream lineage. ``collect_counts`` only
controls whether the per-stage counts are REPORTED; the
materialization is inherent to the pinning and happens either way.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class CorpusResult:
    """Final frames + per-stage counts. ``packed``/``shard_dir`` are None
    when the chunk/pack/output stages are disabled. ``cached`` holds the
    frames the plan left persisted (the final stage boundary) — release
    with :meth:`unpersist_all` once outputs are materialized, same
    contract as ``LoadResult.cached``."""

    docs: DataFrame
    packed: DataFrame | None
    counts: dict[str, int] = field(default_factory=dict)
    shard_dir: str | None = None
    cached: list = field(default_factory=list)

    def unpersist_all(self) -> None:
        for df in self.cached:
            df.unpersist()
        self.cached.clear()


def _ingest(spark: SparkSession, cfg: dict) -> tuple[DataFrame, DataFrame | None]:
    src = cfg["input"]
    fmt, path = src["format"], src["path"]
    if fmt == "parquet":
        return spark.read.parquet(path), None
    if fmt == "jsonl":
        from hrdp_variant_load_pipeline_spark.sources.corpus_io import (
            read_jsonl_docs,
        )

        docs, quarantine = read_jsonl_docs(
            spark, path, schema=src.get("schema", "doc_id LONG, text STRING, lang STRING")
        )
        return docs, quarantine
    if fmt == "warc":
        from hrdp_variant_load_pipeline_spark.sources.warc import (
            html_to_text,
            read_warc,
        )

        raw = read_warc(spark, path)
        docs = html_to_text(raw).select(
            # deterministic id from the record's identity — stable across
            # reruns and partitionings, so downstream dedup/joins are
            # replay-idempotent (monotonically_increasing_id is neither)
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("\x00", "source_file",
                                      F.col("record_offset").cast("string"))),
                    1, 15,
                ), 16, 10,
            ).cast("long").alias("doc_id"),
            F.col("text"),
            F.lit(None).cast("string").alias("lang"),
            "url",
        )
        return docs, None
    raise ValueError(f"run_corpus_pipeline: unknown input format {fmt!r}")


def run_corpus_pipeline(
    spark: SparkSession, cfg: dict, collect_counts: bool = True
) -> CorpusResult:
    """Run the configured curation chain; see module docstring for the
    stage order. Unknown top-level config keys raise (a typo'd stage
    name silently skipping a GATE would ship uncurated data — same
    failure mode redact_pii guards against)."""
    known = {
        "input", "id_col", "text_col", "lang_col", "normalize", "pii",
        "gates", "dedup", "lm_gate", "decontaminate", "selection",
        "mixture", "chunk", "pack", "output",
    }
    unknown = set(cfg) - known
    if unknown:
        raise ValueError(
            f"run_corpus_pipeline: unknown config keys {sorted(unknown)}"
        )
    id_col = cfg.get("id_col", "doc_id")
    text_col = cfg.get("text_col", "text")
    lang_col = cfg.get("lang_col", "lang")
    counts: dict[str, int] = {}
    # chained stage pinning — see the module docstring's Metrics note;
    # the final pin is handed to the caller via CorpusResult.cached
    pinned: list[DataFrame] = []

    def tick(stage: str, df: DataFrame) -> DataFrame:
        df = df.persist()
        n = df.count()  # materialize the new pin FIRST — releasing the
        # previous one before this would force a full-lineage recompute
        if pinned:
            pinned.pop().unpersist()
        pinned.append(df)
        if collect_counts:
            counts[stage] = n
        return df

    docs, quarantine = _ingest(spark, cfg)
    if collect_counts and quarantine is not None:
        counts["quarantined"] = quarantine.count()
    docs = tick("ingested", docs)

    # ---- 2. row-local normalize + scrub ------------------------------
    from hrdp_variant_load_pipeline_spark.functions import text as TXT

    t = F.col(text_col)
    if cfg.get("normalize", True):
        docs = docs.withColumn(text_col, TXT.normalize_text(t))
    pii = cfg.get("pii", False)
    if pii:
        kinds = None if pii is True else tuple(pii)
        docs = docs.withColumn(text_col, TXT.redact_pii(t, kinds=kinds))

    # ---- 3. heuristic gates (row-local, before anything corpus-wide) -
    gates = cfg.get("gates", {})
    if "min_quality" in gates:
        docs = tick(
            "quality_gate",
            docs.filter(TXT.quality_score(t) >= float(gates["min_quality"])),
        )
    if gates.get("gopher") is not None:
        docs = tick(
            "gopher_gate",
            docs.filter(TXT.gopher_rules(t, **gates["gopher"])["passes"]),
        )

    # ---- 4. dedup ----------------------------------------------------
    from hrdp_variant_load_pipeline_spark.operators import dedup as DD

    dd = cfg.get("dedup", {})
    if dd.get("exact", True):
        canon = DD.exact_dedup_groups(docs, id_col, text_col).select(
            F.col("keeper_id").alias(id_col)
        )
        docs = tick("exact_dedup", docs.join(canon, id_col, "left_semi"))
    if dd.get("paragraph", False):
        docs = tick(
            "paragraph_dedup", DD.paragraph_dedup(docs, id_col, text_col)
        )
    if dd.get("span_k"):
        docs = tick(
            "span_dedup",
            DD.repeated_span_dedup(docs, id_col, text_col, k=int(dd["span_k"])),
        )
    if dd.get("fuzzy") is not None:
        fz = dd["fuzzy"]
        pairs = DD.minhash_lsh_pairs(
            docs, id_col, text_col,
            verify_threshold=float(fz.get("threshold", 0.8)),
        )
        # canonical = lowest id of each near-dup pair survives
        drop = pairs.select(
            F.greatest("doc_a", "doc_b").alias(id_col)
        ).distinct()
        docs = tick("fuzzy_dedup", docs.join(drop, id_col, "left_anti"))

    # ---- 5. LM perplexity gate (counts from the surviving corpus) ----
    lm_cfg = cfg.get("lm_gate")
    if lm_cfg is not None:
        from hrdp_variant_load_pipeline_spark.operators.vocab import (
            lm_doc_score,
            ngram_counts,
            perplexity_buckets,
        )

        counts_tbl = ngram_counts(
            docs, text_col, n=2, min_count=int(lm_cfg.get("min_count", 2))
        )
        scored = lm_doc_score(
            docs, id_col, text_col, counts_tbl,
            smoothing=lm_cfg.get("smoothing", "stupid_backoff"),
        )
        if lm_cfg.get("drop_tail", True):
            tiers = perplexity_buckets(scored, "lm_logprob")
            docs = tiers.filter(F.col("ppl_bucket") != "tail").drop(
                "ppl_bucket", "lm_logprob"
            )
        else:
            docs = scored.drop("lm_logprob")
        docs = tick("lm_gate", docs)

    # ---- 6. decontaminate vs the eval set ----------------------------
    dec = cfg.get("decontaminate")
    if dec is not None:
        from hrdp_variant_load_pipeline_spark.operators.corpus import (
            decontaminate,
        )

        bench = spark.read.parquet(dec["path"])
        docs = tick(
            "decontaminated",
            decontaminate(
                docs, bench, id_col, text_col,
                bench_text_col=dec.get("bench_text_col"),
                n=int(dec.get("n", 8)),
            ),
        )

    # ---- 7. DSIR selection toward a target slice ---------------------
    sel = cfg.get("selection")
    if sel is not None:
        from hrdp_variant_load_pipeline_spark.operators.dsir import (
            bucket_logratio,
            dsir_log_weight,
            dsir_select_fraction,
            featurize,
        )

        ds = sel["dsir"]
        n_buckets = int(ds.get("n_buckets", 1024))
        # featurize ONCE and pin: gram construction is the measured
        # dominant DSIR cost (BENCH_NOTES.md) and the naive chain pays
        # it 3x — raw counts, quantile pass, final filter all read the
        # cached bucket arrays instead
        feat = featurize(docs, text_col, n_buckets).persist()
        if "target_lang" in ds:
            # a slice of the pool rides the same cached gram arrays
            target = feat.filter(F.col(lang_col) == ds["target_lang"])
            target_bcol = "_dsir_buckets"
        else:
            target = spark.read.parquet(ds["target_path"])
            target_bcol = None
        lr = bucket_logratio(
            target, feat, text_col, n_buckets=n_buckets,
            raw_buckets_col="_dsir_buckets",
            target_buckets_col=target_bcol,
        )
        scored = dsir_log_weight(
            feat, lr, text_col, n_buckets, buckets_col="_dsir_buckets"
        )
        docs = tick(
            "dsir_selected",
            dsir_select_fraction(
                scored, float(ds.get("keep_fraction", 0.5))
            ).drop("dsir_logw", "_dsir_buckets"),
        )
        feat.unpersist()

    # ---- 8. mixture rebalance to a token budget ----------------------
    mix = cfg.get("mixture")
    n_tok_col = "n_tokens"
    docs = docs.withColumn(
        n_tok_col,
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != ""))
        .cast("long"),
    )
    if mix is not None:
        from hrdp_variant_load_pipeline_spark.operators.corpus import (
            apply_mixture,
            plan_mixture,
            temperature_weights,
        )

        weights = mix.get("weights")
        if weights is None:
            weights = temperature_weights(
                docs, lang_col, n_tok_col,
                alpha=float(mix.get("temperature", 0.3)),
            )
        plan = plan_mixture(
            docs, lang_col, n_tok_col, weights, int(mix["total_tokens"])
        )
        docs = tick(
            "mixed", apply_mixture(docs, lang_col, id_col, plan).drop("epoch")
        )

    # ---- 9. chunk + pack + shard export ------------------------------
    packed = None
    shard_dir = None
    ch = cfg.get("chunk")
    if ch is not None:
        from hrdp_variant_load_pipeline_spark.operators.corpus import (
            chunk_documents,
            pack_sequences,
        )
        from hrdp_variant_load_pipeline_spark.sources.corpus_io import (
            write_shards,
        )

        chunks = chunk_documents(
            docs, id_col, text_col,
            chunk_tokens=int(ch.get("chunk_tokens", 2048)),
            overlap_tokens=int(ch.get("overlap_tokens", 128)),
        )
        pk = cfg.get("pack", {})
        part_col = pk.get("partition_col", lang_col)
        with_part = chunks.join(
            F.broadcast(docs.select(id_col, part_col).distinct()), id_col
        ).withColumn(
            "chunk_uid", F.col(id_col) * 1_000_000 + F.col("chunk_idx")
        )
        packed = pack_sequences(
            with_part,
            id_col=id_col,
            token_count_col="n_tokens",
            max_tokens=int(pk.get("max_tokens", 8192)),
            order_col="chunk_uid",
            partition_col=part_col,
        )
        if collect_counts:
            counts["chunks_packed"] = packed.count()
        out = cfg.get("output")
        if out is not None:
            shard_dir = out["dir"]
            write_shards(
                packed.withColumn(
                    "shard_key",
                    F.abs(F.hash(part_col)).cast("long") * 100_000
                    + F.col("bin_id"),
                ),
                shard_dir,
                "shard_key",
                n_shards=int(out.get("n_shards", 16)),
                order_col="chunk_uid",
            )

    return CorpusResult(
        docs=docs, packed=packed, counts=counts, shard_dir=shard_dir,
        cached=pinned,
    )
