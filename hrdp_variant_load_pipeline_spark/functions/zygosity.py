"""Zygosity computation as pure column expressions.

Reproduces rgdcore ``Zygosity.computeZygosityStatus(int,int,String,
VariantMapData,VariantSampleDetail)`` (disassembled from
lib/rgdcore_1.1.3.jar) exactly:

* ``percent = depth == 0 ? 0f : varFreq * 100f / depth`` (float math);
* ``zygosity_percent_read = (int)(percent + 0.5f)`` (round half up) —
  NOTE the caller then OVERWRITES this with integer division
  ``varFreq / depth`` (HrdpVariants.java:489-490); both forms are exposed;
* status thresholds compare the RAW float percent: ``== 100`` →
  homozygous, ``>= 85`` → possibly homozygous, else heterozygous;
* gender ``M``/``P`` on chromosome X/Y: inside the pseudoautosomal region
  the homozygous ladder applies with ``zygosity_in_pseudo='Y'``; outside it
  the ladder is hemizygous / probably hemizygous (>=85) / possibly
  hemizygous with ``zygosity_in_pseudo='N'``;
* ``zygosity_poss_error = percent <= 15 ? 'Y' : 'N'``;
* PAR intervals are the hardcoded human build-36 values
  (rgdcore PseudoAutosomalRegion.buildPAR("36")) — biologically wrong for
  rat but observed behavior: X [1, 2709520] ∪ [154584238, 154913754],
  Y [1, 2709520] ∪ [57443438, 57772954].
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOMOZYGOUS_PERCENT = 100
POSSIBLY_HOMOZYGOUS_PERCENT = 85
PROBABLY_HEMIZYGOUS_PERCENT = 85
POSSIBLE_ERROR_PERCENT = 15

# build-36 human PAR coordinates (rgdcore PseudoAutosomalRegion)
PAR_X = ((1, 2709520), (154584238, 154913754))
PAR_Y = ((1, 2709520), (57443438, 57772954))


def _in_par(chromosome: Column, pos: Column) -> Column:
    def ranges(par):
        pred = F.lit(False)
        for lo, hi in par:
            pred = pred | ((pos >= lo) & (pos <= hi))
        return pred

    return ((chromosome == "X") & ranges(PAR_X)) | ((chromosome == "Y") & ranges(PAR_Y))


def zygosity_struct(
    var_freq: Column,
    depth: Column,
    gender: Column,
    chromosome: Column,
    start_pos: Column,
) -> Column:
    """Struct ``(zygosity_status, zygosity_percent_read,
    zygosity_poss_error, zygosity_in_pseudo)``.

    ``zygosity_percent_read`` here is the rgdcore round-half-up value; the
    loader overwrites it with the HrdpVariants.java:489 integer-division
    quirk (see plans/load.py).
    """
    percent = (
        F.when(depth == 0, F.lit(0.0))
        .otherwise(var_freq.cast("double") * 100.0 / depth.cast("double"))
        .cast("float")
    )
    percent_read = (percent + F.lit(0.5)).cast("int")

    homo_ladder = (
        F.when(percent == HOMOZYGOUS_PERCENT, "homozygous")
        .when(percent >= POSSIBLY_HOMOZYGOUS_PERCENT, "possibly homozygous")
        .otherwise("heterozygous")
    )
    hemi_ladder = (
        F.when(percent == HOMOZYGOUS_PERCENT, "hemizygous")
        .when(percent >= PROBABLY_HEMIZYGOUS_PERCENT, "probably hemizygous")
        .otherwise("possibly hemizygous")
    )

    sex_branch = gender.isin("M", "P") & chromosome.isin("X", "Y")
    in_par = _in_par(chromosome, start_pos)

    status = (
        F.when(sex_branch & in_par, homo_ladder)
        .when(sex_branch, hemi_ladder)
        .otherwise(homo_ladder)
    )
    in_pseudo = F.when(sex_branch & in_par, "Y").otherwise("N")
    poss_error = F.when(percent <= POSSIBLE_ERROR_PERCENT, "Y").otherwise("N")

    return F.struct(
        status.alias("zygosity_status"),
        percent_read.alias("zygosity_percent_read"),
        poss_error.alias("zygosity_poss_error"),
        in_pseudo.alias("zygosity_in_pseudo"),
    )
