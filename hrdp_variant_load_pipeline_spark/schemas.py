"""Engine schemas (SURVEY.md §1.2-1.3).

variant / variant_map_data are kept as ONE DataFrame (1:1 on rgd_id) and
split only at the sink for reference-schema compatibility
(ref: DAO.java:93-119). variant_sample_detail is the variant×sample fact
table (ref: DAO.java:68-88).
"""

from __future__ import annotations

from pyspark.sql import types as T

# unified variant + variant_map_data row (ref: rgdcore VariantMapData bean,
# populated at HrdpVariants.java:165-309)
VARIANT = T.StructType(
    [
        T.StructField("rgd_id", T.LongType(), False),
        T.StructField("ref_nuc", T.StringType(), True),
        T.StructField("var_nuc", T.StringType(), True),
        T.StructField("rs_id", T.StringType(), True),
        T.StructField("clinvar_id", T.StringType(), True),
        T.StructField("variant_type", T.StringType(), True),
        T.StructField("species_type_key", T.IntegerType(), False),
        T.StructField("chromosome", T.StringType(), False),
        T.StructField("padding_base", T.StringType(), True),
        T.StructField("start_pos", T.LongType(), False),
        T.StructField("end_pos", T.LongType(), False),
        T.StructField("genic_status", T.StringType(), True),
        T.StructField("map_key", T.IntegerType(), False),
    ]
)

# ref: rgdcore VariantSampleDetail bean + INSERT at DAO.java:68-88
VARIANT_SAMPLE_DETAIL = T.StructType(
    [
        T.StructField("rgd_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("sample_id", T.IntegerType(), False),
        T.StructField("total_depth", T.IntegerType(), True),
        T.StructField("var_freq", T.IntegerType(), False),
        T.StructField("zygosity_status", T.StringType(), True),
        T.StructField("zygosity_percent_read", T.IntegerType(), True),
        T.StructField("zygosity_poss_error", T.StringType(), True),
        T.StructField("zygosity_ref_allele", T.StringType(), True),
        T.StructField("zygosity_num_allele", T.IntegerType(), True),
        T.StructField("zygosity_in_pseudo", T.StringType(), True),
        T.StructField("quality_score", T.IntegerType(), True),
    ]
)

# ref: rgdcore Sample bean; defaults at HrdpVariants.java:66-83
SAMPLE = T.StructType(
    [
        T.StructField("sample_id", T.IntegerType(), False),
        T.StructField("analysis_name", T.StringType(), False),
        T.StructField("gender", T.StringType(), True),
        T.StructField("patient_id", T.IntegerType(), True),
        T.StructField("map_key", T.IntegerType(), True),
        T.StructField("strain_rgd_id", T.IntegerType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("grant_number", T.StringType(), True),
    ]
)

# ref: gene interval dimension, GeneCache.java:27-43
GENE = T.StructType(
    [
        T.StructField("gene_rgd_id", T.IntegerType(), False),
        T.StructField("chromosome", T.StringType(), False),
        T.StructField("start_pos", T.LongType(), False),
        T.StructField("stop_pos", T.LongType(), False),
        T.StructField("object_status", T.StringType(), True),
        T.StructField("map_key", T.IntegerType(), True),
    ]
)

# raw VCF data row after header-driven parse (sources/vcf.py);
# sample cells kept as an array aligned with the header's sample names
VCF_ROW = T.StructType(
    [
        T.StructField("chrom", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("vcf_id", T.StringType(), True),
        T.StructField("ref", T.StringType(), True),
        T.StructField("alt", T.StringType(), True),
        T.StructField("qual", T.StringType(), True),
        T.StructField("filter", T.StringType(), True),
        T.StructField("info", T.StringType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("sample_cells", T.ArrayType(T.StringType()), True),
        T.StructField("source_file", T.StringType(), True),
    ]
)
