from hrdp_variant_load_pipeline_spark.operators.interval_join import (
    interval_join,
    interval_join_binned,
    overlap_predicate,
)
from hrdp_variant_load_pipeline_spark.operators.upsert import (
    anti_join_new,
    assign_surrogate_ids,
    merge_update,
)

__all__ = [
    "interval_join",
    "interval_join_binned",
    "overlap_predicate",
    "anti_join_new",
    "assign_surrogate_ids",
    "merge_update",
]
