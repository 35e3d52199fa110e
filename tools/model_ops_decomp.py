"""Stage decomposition for model_ops_battery at a given SF (r13: the
row measured 23.4 s vs DuckDB 3.84 s at sf10 — before optimizing a
composite battery, find which arm pays).

Times each component arm SEPARATELY with the bench protocol (noop sink,
best-of-2, cache cleared between reps) plus the whole battery, so the
per-arm sum vs whole-battery delta exposes shared-subtree effects.

Usage: python tools/model_ops_decomp.py [SF_DIR]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"

    import __spark_entry__ as entrymod
    from hrdp_variant_load_pipeline_spark import queries_model as QM
    from hrdp_variant_load_pipeline_spark.functions.bpe import bpe_tokenize
    from hrdp_variant_load_pipeline_spark.functions.unigram import (
        unigram_tokenize,
    )
    from hrdp_variant_load_pipeline_spark.operators.pq import (
        pq_encode,
        pq_topk,
    )
    from hrdp_variant_load_pipeline_spark.operators.quality import (
        check_constraints,
    )
    from hrdp_variant_load_pipeline_spark.operators.selection import (
        kcenter_greedy,
    )
    from hrdp_variant_load_pipeline_spark.operators.vocab import build_vocab
    from hrdp_variant_load_pipeline_spark.session import (
        get_spark,
        tune_for_tables,
    )
    from hrdp_variant_load_pipeline_spark.sources.tables import table

    spark = get_spark("model-ops-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_tables(
        spark, sf, ["documents", "orders", "customer", "embeddings"]
    )

    d = table(spark, sf, "documents")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    e = table(spark, sf, "embeddings")

    def arm_bpe():
        return (
            d.select(bpe_tokenize(F.col("text"), QM._BPE_MERGES).alias("t"))
            .agg(F.sum(F.size("t")))
        )

    def arm_unigram():
        pieces = spark.createDataFrame(
            sorted(QM._UNI_PIECES.items()), "piece string, logprob double"
        )
        toked = unigram_tokenize(d.select("lang", "text"), "text", pieces)
        return toked.agg(F.sum(F.size("pieces")))

    def arm_tok_decomp():
        # the r15 battery form: ONE word_weighted_stats pass carrying
        # both tokenizers over the distinct-word table (the old arm_bpe
        # + arm_unigram rows above keep the per-doc forms for A/B)
        from hrdp_variant_load_pipeline_spark.operators.vocab import (
            word_weighted_stats,
        )

        pieces = spark.createDataFrame(
            sorted(QM._UNI_PIECES.items()), "piece string, logprob double"
        )
        lp_map = F.create_map(
            *[F.lit(v) for kv in sorted(QM._UNI_PIECES.items()) for v in kv]
        )

        def word_stats(words):
            toked = unigram_tokenize(words, "word", pieces)
            return toked.select(
                "word",
                F.size(
                    bpe_tokenize(F.col("word"), QM._BPE_MERGES)
                ).alias("n_toks"),
                F.size("pieces").alias("np"),
                F.aggregate(
                    F.transform(
                        "pieces",
                        lambda p: F.coalesce(
                            F.try_element_at(lp_map, p), F.lit(-100.0)
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("sc"),
            )

        return word_weighted_stats(d, "text", ["lang"], word_stats)

    def arm_vocab():
        return build_vocab(d, "text", max_vocab=50)

    def arm_quality():
        rules = [
            {"type": "not_null", "col": "o_custkey"},
            {"type": "in_range", "col": "o_totalprice",
             "min": 0.0, "max": 150000.0},
            {"type": "in_set", "col": "o_orderstatus", "values": ["F", "O"]},
            {"type": "matches", "col": "o_orderpriority",
             "pattern": "^[1-3]-"},
            {"type": "predicate", "expr": "o_totalprice > 1000"},
            {"type": "unique", "cols": ["o_custkey"]},
            {"type": "ref", "col": "o_custkey",
             "ref_df": c.filter(F.col("c_custkey") % 3 == 0),
             "ref_col": "c_custkey"},
        ]
        return check_constraints(o, rules)

    def arm_pq():
        cb = spark.createDataFrame(
            [
                (j, c_id, [float(v)] * QM._PQ_DSUB)
                for j, vals in enumerate(QM._PQ_CENTROIDS)
                for c_id, v in enumerate(vals)
            ],
            "subspace int, code_id int, cvec array<double>",
        )
        enc = pq_encode(e, cb, id_col="vec_id", vec_col="embedding")
        return pq_topk(
            enc, e.filter(F.col("vec_id") < QM._PQ_QUERIES), cb,
            k=QM._PQ_K, id_col="vec_id",
        )

    times: dict[str, float] = {}

    def run(name, fn, driver_side=False):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            if driver_side:
                fn()
            else:
                fn().write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            spark.catalog.clearCache()
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]:.3f}s", file=sys.stderr, flush=True)

    run("bpe_tokenize", arm_bpe)
    run("unigram_tokenize", arm_unigram)
    run("tok_decomp_combined", arm_tok_decomp)
    run("build_vocab", arm_vocab)
    run("constraints", arm_quality)
    run("pq_encode_topk", arm_pq)
    run(
        "kcenter_k4",
        lambda: kcenter_greedy(e, "vec_id", "embedding", QM._KC_K),
        driver_side=True,
    )
    run(
        "whole_battery",
        lambda: entrymod.queries()["model_ops_battery"](spark, sf),
    )
    # arm_sum mirrors the CURRENT battery composition: the per-doc
    # bpe/unigram rows are A/B references, superseded by tok_decomp
    arm_sum = round(
        sum(
            v
            for k, v in times.items()
            if k not in ("whole_battery", "bpe_tokenize", "unigram_tokenize")
        ),
        3,
    )
    print(
        json.dumps(
            {
                "metric": "model_ops_decomp",
                "sf_dir": sf,
                "arms": times,
                "arm_sum": arm_sum,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
