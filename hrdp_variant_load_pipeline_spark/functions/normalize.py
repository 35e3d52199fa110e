"""Variant normalization rules as pure Catalyst column expressions.

Every rule here reproduces reference behavior bit-for-bit (SURVEY.md §1.4) —
including its quirks — while staying JVM-side (no UDFs, whole-stage
codegen-able). Sources of truth:

* chromosome / contig handling: HrdpVariants.java:180-185
* rs id null-if: HrdpVariants.java:192-194
* single-allele typing: HrdpVariants.java:205-280
* multi-allelic copy-path typing (deliberately different!):
  HrdpVariants.java:331-434 — copy deletions/insertions do NOT advance
  start_pos the way the single-allele path does, and single-base
  substitutions are labelled ``snp`` instead of ``snv``.
* strain-name from filename: HrdpVariants.java:138-161
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: CHROM values containing any of these are dropped (HrdpVariants.java:180-182)
UNPLACED_TOKENS = ("unplaced", "unloc", "contig", "scaffold")


def is_unplaced_contig(chrom: Column) -> Column:
    """True when the raw CHROM is an unplaced/contig/scaffold line to drop."""
    pred = F.lit(False)
    for tok in UNPLACED_TOKENS:
        pred = pred | chrom.contains(tok)
    return pred


def normalize_chromosome(chrom: Column) -> Column:
    """Strip every ``chr`` occurrence; ``M`` (case-insensitive) → ``MT``.

    Ref: HrdpVariants.java:183-185 (`replace("chr","")` replaces ALL
    occurrences; `equalsIgnoreCase("M")`).
    """
    c = F.replace(chrom, F.lit("chr"), F.lit(""))
    return F.when(F.upper(c) == "M", F.lit("MT")).otherwise(c)


def null_if_dot(c: Column) -> Column:
    """VCF ``.`` placeholder → NULL (HrdpVariants.java:192-194)."""
    return F.when(c == ".", F.lit(None).cast("string")).otherwise(c)


def _drop_prefix(s: Column, prefix: Column) -> Column:
    """Remove `prefix` from the front of `s`.

    The reference uses Java ``String.replaceFirst(prefix, "")`` after a
    ``startsWith(prefix)`` check; regex-first-match therefore always matches
    at index 0, so this is exact prefix removal. Alleles are ACGT strings,
    no regex metacharacters reach this path (`*` is handled earlier).
    """
    return s.substr(F.length(prefix) + 1, F.length(s))


def normalize_allele(
    copy_ref: Column,
    orig_ref: Column,
    var: Column,
    raw_start: Column,
    is_copy: Column,
) -> Column:
    """Classify one (ref, alt-allele) pair and derive the normalized record.

    Returns a struct ``(variant_type, ref_nuc, var_nuc, padding_base,
    start_pos, end_pos)``.

    Parameters mirror the two reference code paths:

    * single-allele path (``is_copy`` false): ``copy_ref == orig_ref`` = the
      line's REF, ``var`` = the ALT (HrdpVariants.java:205-280);
    * multi-allelic copy path (``is_copy`` true): ``copy_ref`` = this
      allele's REF (refNucs[i] when REF had commas, else the line REF),
      ``orig_ref`` = the line's raw REF (commas and all — the copy path
      deliberately consults it in branches 2/4), ``var`` = this allele
      (HrdpVariants.java:331-434).

    Faithful quirks: copy-path deletion branch 1 and insertion branch 3 do
    NOT advance start_pos; copy-path branch 2's end_pos is
    ``raw_start + len(ref_after_trim)`` (one shorter than the single-allele
    path); equal-length single-base substitutions are ``snv`` on the
    single-allele path but ``snp`` on the copy path (HrdpVariants.java:267
    vs :395). Divergence: when REF itself is multi-allelic and no special
    branch matches, the reference crashes on an empty varNucs array
    (HrdpVariants.java:389) — we classify using the allele instead.
    """
    start = raw_start.cast("long")
    lref = F.length(copy_ref)
    lvar = F.length(var)

    def out(vtype, ref_nuc, var_nuc, padding, start_pos, end_pos):
        return F.struct(
            F.lit(vtype).alias("variant_type") if isinstance(vtype, str) else vtype.alias("variant_type"),
            ref_nuc.alias("ref_nuc"),
            var_nuc.alias("var_nuc"),
            padding.alias("padding_base"),
            start_pos.cast("long").alias("start_pos"),
            end_pos.cast("long").alias("end_pos"),
        )

    null_s = F.lit(None).cast("string")

    # branch *: ALT '*' is a spanning deletion (HrdpVariants.java:216-220,345-350)
    star = out("deletion", copy_ref, null_s, null_s, start, start + lref)

    # deletion, alt length 1 (HrdpVariants.java:224-232 vs copy :352-360)
    del1_main = out(
        "deletion", copy_ref.substr(F.lit(2), lref), null_s, var, start + 1, start + lref
    )
    del1_copy = out(
        "deletion", copy_ref.substr(F.lit(2), lref), null_s, var, start, start + lref - 1
    )

    # deletion, ref startswith alt (HrdpVariants.java:233-240 vs copy :361-369;
    # copy path consults the ORIGINAL line ref)
    del2_main = out(
        "deletion", _drop_prefix(copy_ref, var), null_s, var, start + lvar, start + lref
    )
    del2_copy = out(
        "deletion",
        _drop_prefix(orig_ref, var),
        null_s,
        var,
        start + lvar,
        start + F.length(orig_ref) - lvar,
    )

    # insertion, ref length 1 (HrdpVariants.java:241-249 vs copy :370-377)
    ins1_main = out(
        "insertion", null_s, var.substr(F.lit(2), lvar), copy_ref, start + 1, start + 2
    )
    ins1_copy = out(
        "insertion", null_s, var.substr(F.lit(2), lvar), orig_ref, start, start + 1
    )

    # insertion, alt startswith ref (HrdpVariants.java:250-257 vs copy :378-386)
    lorig = F.length(orig_ref)
    ins2_main = out(
        "insertion", null_s, _drop_prefix(var, copy_ref), copy_ref, start + lref, start + lref + 1
    )
    ins2_copy = out(
        "insertion", null_s, _drop_prefix(var, orig_ref), orig_ref, start + lorig, start + 1
    )

    # equal length: snv/snp vs mnv (HrdpVariants.java:262-269 vs copy :388-400)
    snv = out(F.when(is_copy, "snp").otherwise("snv"), copy_ref, var, null_s, start, start + 1)
    mnv = out("mnv", copy_ref, var, null_s, start, start + lref)

    # remaining length mismatches → delins (HrdpVariants.java:270-276,401-407)
    delins_del = out("delins", copy_ref, var, null_s, start, start + lref)
    delins_ins = out("delins", copy_ref, var, null_s, start, start + 1)

    # Branch order must match the Java if/else chain exactly. Branches 2 and
    # 4 test against the ORIGINAL ref on the copy path (HrdpVariants.java:361,378).
    ref2 = F.when(is_copy, orig_ref).otherwise(copy_ref)  # ref consulted by branches 2/4
    lref2 = F.length(ref2)
    return (
        F.when(var == "*", star)
        .when((lref > lvar) & (lvar == 1), F.when(is_copy, del1_copy).otherwise(del1_main))
        .when((lref2 > lvar) & ref2.startswith(var), F.when(is_copy, del2_copy).otherwise(del2_main))
        .when((lvar > lref) & (lref == 1), F.when(is_copy, ins1_copy).otherwise(ins1_main))
        .when((lvar > lref2) & var.startswith(ref2), F.when(is_copy, ins2_copy).otherwise(ins2_main))
        .when(lref == lvar, F.when(lref > 1, mnv).otherwise(snv))
        .when(lref > lvar, delins_del)
        .otherwise(delins_ins)
    )


def _replace_first(s: Column, find: str, repl: str) -> Column:
    """First-occurrence literal replacement (Java String.replaceFirst)."""
    pos = F.instr(s, find)
    return F.when(
        pos > 0,
        F.concat(
            s.substr(F.lit(1), pos - 1),
            F.lit(repl),
            s.substr(pos + len(find), F.length(s)),
        ),
    ).otherwise(s)


def derive_strain_name(filename: Column) -> Column:
    """Strain symbol from VCF filename (HrdpVariants.java:138-161).

    e.g. ``BN_NHsdMcwi_2019_XX_PASS.vcf.gz`` → ``BN/NHsdMcwi (2019)``:
    drop ``_PASS``, truncate at the last ``_`` twice, append ``)``, if more
    than two ``_`` remain replace the first with ``-``, then the first
    ``_`` → ``/`` and every remaining ``_`` → `` (``.
    """
    s = F.replace(filename, F.lit("_PASS"), F.lit(""))
    # truncate at last underscore, twice (regex: final '_' and tail)
    s = F.regexp_replace(s, "_[^_]*$", "")
    s = F.concat(F.regexp_replace(s, "_[^_]*$", ""), F.lit(")"))
    n_underscores = F.length(s) - F.length(F.replace(s, F.lit("_"), F.lit("")))
    s = F.when(n_underscores > 2, _replace_first(s, "_", "-")).otherwise(s)
    s = _replace_first(s, "_", "/")
    return F.replace(s, F.lit("_"), F.lit(" ("))
