from hrdp_variant_load_pipeline_spark.plans.load import LoadResult, parse_variants, run_load
from hrdp_variant_load_pipeline_spark.plans.genic_qc import genic_qc

__all__ = ["LoadResult", "parse_variants", "run_load", "genic_qc"]
