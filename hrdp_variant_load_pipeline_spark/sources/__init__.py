from hrdp_variant_load_pipeline_spark.sources.tables import load_tables

__all__ = ["load_tables"]
