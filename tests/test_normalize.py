"""Golden tests for the §1.4 normalization rules.

Every expected row below is hand-traced from HrdpVariants.java:205-280
(single-allele path) and :331-434 (multi-allelic copy path), including the
quirks: copy-path deletions/insertions not advancing start_pos, `snp` vs
`snv`, and the copy branch-2 end_pos arithmetic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.functions.normalize import (
    derive_strain_name,
    is_unplaced_contig,
    normalize_allele,
    normalize_chromosome,
    null_if_dot,
)


def _normalize(spark, cases, is_copy):
    """cases: list of (copy_ref, orig_ref, var, raw_start)."""
    df = spark.createDataFrame(
        cases, "copy_ref string, orig_ref string, var string, raw_start long"
    )
    out = df.select(
        normalize_allele(
            F.col("copy_ref"),
            F.col("orig_ref"),
            F.col("var"),
            F.col("raw_start"),
            F.lit(is_copy),
        ).alias("n")
    ).select("n.*")
    return [r.asDict() for r in out.collect()]


MAIN_CASES = [
    # (ref, alt, pos) -> expected (type, ref_nuc, var_nuc, padding, start, end)
    (("A", "A", "G", 100), ("snv", "A", "G", None, 100, 101)),
    (("AT", "AT", "GC", 100), ("mnv", "AT", "GC", None, 100, 102)),
    (("ACG", "ACG", "*", 100), ("deletion", "ACG", None, None, 100, 103)),
    # deletion, alt len 1: start+1, ref loses first base (java :224-232)
    (("ACG", "ACG", "A", 100), ("deletion", "CG", None, "A", 101, 103)),
    # deletion, ref startswith alt (java :233-240)
    (("ACGT", "ACGT", "AC", 100), ("deletion", "GT", None, "AC", 102, 104)),
    # insertion, ref len 1 (java :241-249)
    (("A", "A", "ACG", 100), ("insertion", None, "CG", "A", 101, 102)),
    # insertion, alt startswith ref (java :250-257)
    (("AC", "AC", "ACGT", 100), ("insertion", None, "GT", "AC", 102, 103)),
    # delins, ref longer (java :270-272)
    (("ACGT", "ACGT", "TG", 100), ("delins", "ACGT", "TG", None, 100, 104)),
    # delins, alt longer (java :273-276)
    (("AC", "AC", "GTCA", 100), ("delins", "AC", "GTCA", None, 100, 101)),
]


def test_normalize_single_allele_goldens(spark):
    got = _normalize(spark, [c for c, _ in MAIN_CASES], is_copy=False)
    for (case, exp), row in zip(MAIN_CASES, got):
        vtype, ref, var, pad, start, end = exp
        assert row == {
            "variant_type": vtype,
            "ref_nuc": ref,
            "var_nuc": var,
            "padding_base": pad,
            "start_pos": start,
            "end_pos": end,
        }, f"case {case}"


COPY_CASES = [
    # copy path quirk: deletion alt-len-1 keeps raw start, end one less
    # than the single-allele path (java :352-360)
    (("ACG", "ACG", "A", 100), ("deletion", "CG", None, "A", 100, 102)),
    # copy branch 2: start advanced, end = raw + len(trimmed ref) → can
    # produce end < start (java :361-369)
    (("ACG", "ACG", "AC", 100), ("deletion", "G", None, "AC", 102, 101)),
    # copy insertion, ref len 1: keeps raw start, end = raw+1 (java :370-377)
    (("A", "A", "ACG", 100), ("insertion", None, "CG", "A", 100, 101)),
    # copy insertion, alt startswith ref (java :378-386)
    (("AC", "AC", "ACGT", 100), ("insertion", None, "GT", "AC", 102, 101)),
    # copy equal-length single base: labelled snp, not snv (java :395)
    (("A", "A", "G", 100), ("snp", "A", "G", None, 100, 101)),
    (("AT", "AT", "GC", 100), ("mnv", "AT", "GC", None, 100, 102)),
    (("ACG", "ACG", "*", 100), ("deletion", "ACG", None, None, 100, 103)),
]


def test_normalize_copy_path_goldens(spark):
    got = _normalize(spark, [c for c, _ in COPY_CASES], is_copy=True)
    for (case, exp), row in zip(COPY_CASES, got):
        vtype, ref, var, pad, start, end = exp
        assert row == {
            "variant_type": vtype,
            "ref_nuc": ref,
            "var_nuc": var,
            "padding_base": pad,
            "start_pos": start,
            "end_pos": end,
        }, f"copy case {case}"


def test_chromosome_normalization(spark):
    df = spark.createDataFrame(
        [("chr1",), ("chrX",), ("chrM",), ("M",), ("m",), ("12",)], "c string"
    )
    got = [r[0] for r in df.select(normalize_chromosome(F.col("c"))).collect()]
    assert got == ["1", "X", "MT", "MT", "MT", "12"]


def test_contig_filter(spark):
    df = spark.createDataFrame(
        [("chr1",), ("chr1_unplaced",), ("scaffold_12",), ("x_contig_9",), ("chrUn_unloc3",)],
        "c string",
    )
    got = [r[0] for r in df.select(is_unplaced_contig(F.col("c"))).collect()]
    assert got == [False, True, True, True, True]


def test_rs_id_null_if_dot(spark):
    df = spark.createDataFrame([(".",), ("rs123",)], "c string")
    got = [r[0] for r in df.select(null_if_dot(F.col("c"))).collect()]
    assert got == [None, "rs123"]


@pytest.mark.parametrize(
    "filename,expected",
    [
        ("BN_NHsdMcwi_2019_v1_sorted_PASS.vcf.gz", "BN/NHsdMcwi (2019)"),
        ("SHR_OlaIpcv_XX_2019_v1_sorted_PASS.vcf.gz", "SHR-OlaIpcv/XX (2019)"),
    ],
)
def test_strain_name(spark, filename, expected):
    df = spark.createDataFrame([(filename,)], "f string")
    got = df.select(derive_strain_name(F.col("f"))).collect()[0][0]
    assert got == expected
