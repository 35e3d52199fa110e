"""Golden tests for rgdcore Zygosity.computeZygosityStatus semantics
(disassembled from lib/rgdcore_1.1.3.jar; thresholds 100/85/15, float
percent, round-half-up percent_read, build-36 PAR)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.functions.zygosity import zygosity_struct

CASES = [
    # (var_freq, depth, gender, chrom, pos) -> (status, percent_read, poss_error, in_pseudo)
    ((41, 41, "U", "1", 100), ("homozygous", 100, "N", "N")),
    ((9, 41, "U", "1", 100), ("heterozygous", 22, "N", "N")),
    ((5, 41, "U", "1", 100), ("heterozygous", 12, "Y", "N")),
    ((35, 41, "U", "1", 100), ("possibly homozygous", 85, "N", "N")),
    ((17, 20, "U", "1", 100), ("possibly homozygous", 85, "N", "N")),
    ((0, 10, "U", "1", 100), ("heterozygous", 0, "Y", "N")),
    ((10, 0, "U", "1", 100), ("heterozygous", 0, "Y", "N")),  # depth 0 → percent 0
    # male X inside PAR (build-36 human coords, wrong for rat but faithful)
    ((20, 20, "M", "X", 1000), ("homozygous", 100, "N", "Y")),
    ((17, 20, "M", "X", 1000), ("possibly homozygous", 85, "N", "Y")),
    # male X outside PAR → hemizygous ladder
    ((20, 20, "M", "X", 3000000), ("hemizygous", 100, "N", "N")),
    ((17, 20, "M", "X", 3000000), ("probably hemizygous", 85, "N", "N")),
    ((1, 20, "M", "X", 3000000), ("possibly hemizygous", 5, "Y", "N")),
    # male Y second PAR window
    ((20, 20, "M", "Y", 57443438), ("homozygous", 100, "N", "Y")),
    # gender P behaves like M
    ((20, 20, "P", "X", 3000000), ("hemizygous", 100, "N", "N")),
    # female on X → normal ladder
    ((20, 20, "F", "X", 3000000), ("homozygous", 100, "N", "N")),
]


def test_zygosity_goldens(spark):
    df = spark.createDataFrame(
        [c for c, _ in CASES],
        "var_freq int, depth int, gender string, chrom string, pos long",
    )
    out = df.select(
        zygosity_struct(
            F.col("var_freq"), F.col("depth"), F.col("gender"), F.col("chrom"), F.col("pos")
        ).alias("z")
    ).select("z.*")
    for (case, exp), row in zip(CASES, out.collect()):
        status, pread, perr, pseudo = exp
        got = (
            row["zygosity_status"],
            row["zygosity_percent_read"],
            row["zygosity_poss_error"],
            row["zygosity_in_pseudo"],
        )
        assert got == (status, pread, perr, pseudo), f"case {case}: {got}"
