from hrdp_variant_load_pipeline_spark.functions.normalize import (
    derive_strain_name,
    is_unplaced_contig,
    normalize_allele,
    normalize_chromosome,
)
from hrdp_variant_load_pipeline_spark.functions.zygosity import zygosity_struct

__all__ = [
    "derive_strain_name",
    "is_unplaced_contig",
    "normalize_allele",
    "normalize_chromosome",
    "zygosity_struct",
]
