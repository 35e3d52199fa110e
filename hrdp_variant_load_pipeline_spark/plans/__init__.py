from hrdp_variant_load_pipeline_spark.plans.load import LoadResult, parse_variants, run_load
from hrdp_variant_load_pipeline_spark.plans.genic_qc import genic_qc
from hrdp_variant_load_pipeline_spark.plans.corpus_pipeline import (
    CorpusResult,
    run_corpus_pipeline,
)

__all__ = [
    "CorpusResult",
    "LoadResult",
    "genic_qc",
    "parse_variants",
    "run_corpus_pipeline",
    "run_load",
]
