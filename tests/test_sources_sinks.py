"""Config source (S10) and sink-side reconstitution (S7-S9)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark import schemas
from hrdp_variant_load_pipeline_spark.sources.config import (
    SAMPLE_DEFAULTS,
    load_config,
    samples_dimension,
)
from hrdp_variant_load_pipeline_spark.sources.sinks import (
    rgd_ids_registry,
    split_variant_sinks,
    write_parquet_store,
)


def test_config_roundtrip(tmp_path):
    cfg = {"map_key": 372, "input_dir": "/data/vcfs", "samples": {"S1": 1, "S2": 2}}
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    loaded = load_config(str(p))
    assert loaded == cfg


def test_samples_dimension_defaults(spark):
    dim = samples_dimension(spark, {"S2": 2, "S1": 1}, map_key=372)
    rows = {r["analysis_name"]: r for r in dim.collect()}
    assert set(rows) == {"S1", "S2"}
    assert rows["S1"]["sample_id"] == 1
    assert rows["S1"]["gender"] == SAMPLE_DEFAULTS["gender"]
    assert rows["S1"]["patient_id"] == SAMPLE_DEFAULTS["patient_id"]
    assert rows["S1"]["grant_number"] == SAMPLE_DEFAULTS["grant_number"]
    assert rows["S1"]["map_key"] == 372


def _variant_rows(spark):
    return spark.createDataFrame(
        [
            (1, "A", "G", None, None, "snv", 3, "1", None, 100, 101, "GENIC", 372),
            (2, "AC", None, "rs1", None, "deletion", 3, "2", "A", 200, 202, "INTERGENIC", 372),
        ],
        schemas.VARIANT,
    )


def test_split_variant_sinks(spark):
    v, vmd = split_variant_sinks(_variant_rows(spark))
    assert v.columns == [
        "rgd_id", "ref_nuc", "variant_type", "var_nuc", "rs_id", "clinvar_id",
        "species_type_key",
    ]
    assert vmd.columns == [
        "rgd_id", "chromosome", "start_pos", "end_pos", "padding_base",
        "genic_status", "map_key",
    ]
    # 1:1 reconstitution on rgd_id
    assert v.join(vmd, "rgd_id").count() == 2


def test_rgd_ids_registry(spark):
    reg = rgd_ids_registry(_variant_rows(spark))
    rows = reg.collect()
    assert all(r["object_key"] == 6 and r["object_status"] == "ACTIVE" for r in rows)


def test_write_parquet_store_partitioned(spark, tmp_path):
    path = str(tmp_path / "store")
    write_parquet_store(
        _variant_rows(spark), path, partition_by=["map_key", "chromosome"], mode="overwrite"
    )
    back = spark.read.parquet(path)
    assert back.count() == 2
    # partition pruning: a chromosome filter must prune to one directory
    pruned = back.filter(F.col("chromosome") == "1")
    assert pruned.count() == 1
