"""146-sample joint-VCF drill: the reference's production workload shape.

The reference's deployed config maps 146 sample columns of one joint
GATK VCF to sample ids (``AppConfigure.xml:10-159``, consumed at
``HrdpVariants.java:97-110``); every e2e measurement before round 12
used 3-sample fixtures, so the J5 unpivot fan-out (x146 detail-candidate
cells per variant line) and the 146-entry broadcast dims had no
measurement behind them. This tool builds a deterministic 146-column
fixture whose expected load metrics are computed WHILE emitting lines
(an independent Python model of the keep rules — GT 0/0 and ./. skipped,
AD[j+1] null/0 skipped, unknown sample columns dropped), then drives the
real CLI surfaces end-to-end:

  gzip ``--runLoad``  ->  restaged ``--runLoad`` (fresh stores)  ->
  idempotent re-run  ->  ``--genicQc`` fixpoint

and prints one JSON line with wall times and the metric assertions.

Usage: python tools/vcf146_bench.py [N_LINES] [N_FILES] [OUT_DIR]
Defaults: 20000 lines, 4 files, scratch under /tmp.

tests/test_cli.py::test_cli_146_sample_production_shape runs the same
generator at small scale and asserts the exact expected metrics.
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import time
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_SAMPLES = 146

#: the 9 fixed VCF columns ahead of the sample columns
_FIXED = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"


def sample_names(n: int = N_SAMPLES) -> list[str]:
    """Deterministic strain-like analysis names (the reference's are
    ``STRAIN_Source_Year``, e.g. ``ACI_EurMcwi_2019``)."""
    return [f"STR{i:03d}_CubMcwi_{2019 + i % 6}" for i in range(n)]


def sample_config(n: int = N_SAMPLES) -> dict[str, int]:
    """name -> sample_id map, ids from the reference's 380000 block."""
    return {name: 380000 + i for i, name in enumerate(sample_names(n))}


def _h(*xs) -> int:
    """Deterministic small hash for fixture choices."""
    return zlib.crc32(":".join(map(str, xs)).encode())


def write_joint_vcf(
    vdir: str | Path,
    n_lines: int,
    n_samples: int = N_SAMPLES,
    n_files: int = 4,
) -> dict[str, int]:
    """Write ``n_files`` gzip joint VCFs totalling ``n_lines`` variant
    lines x (``n_samples`` known + 1 unknown) sample columns; return the
    EXPECTED load metrics for a load into fresh stores.

    Per line: chrom cycles chr1..chr5, pos unique per line (so every
    allele is a new, distinct variant and (variant, sample) pairs are
    unique); every 10th line is multi-allelic (ALT ``G,T`` -> two
    variants, AD carries three depths). Per sample cell the GT/AD mix
    exercises every keep/skip rule: ~15% ``0/0``, ~10% ``./.``, ~6%
    called-but-zero-AD; the trailing unknown column must be dropped by
    the sample-dim join.
    """
    vdir = Path(vdir)
    vdir.mkdir(parents=True, exist_ok=True)
    names = sample_names(n_samples)
    header = _FIXED + "\t" + "\t".join(names) + "\tUNKNOWN_SMP\n"

    expected_variants = 0
    expected_details = 0
    per_file = (n_lines + n_files - 1) // n_files
    gi = 0
    for fi in range(n_files):
        path = vdir / f"HRDP_{n_samples}smp_part{fi}_PASS.vcf.gz"
        with gzip.open(path, "wt") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write(f"##contig=<ID=chr{fi + 1},length=282763074>\n")
            f.write(header)
            for _ in range(min(per_file, n_lines - gi)):
                chrom = f"chr{1 + gi % 5}"
                pos = 1000 + gi * 10
                multi = gi % 10 == 0
                alt = "G,T" if multi else "G"
                n_alleles = 2 if multi else 1
                expected_variants += n_alleles
                cells = []
                for si in range(n_samples + 1):  # +1 unknown column
                    r = _h(gi, si) % 100
                    if r < 15:
                        gt, ads = "0/0", None
                    elif r < 25:
                        gt, ads = "./.", None
                    else:
                        if multi:
                            gt = ("0/1", "1/2", "0/2")[r % 3]
                        else:
                            gt = ("0/1", "1/1")[r % 2]
                        # per-allele depths; ~6% of called cells zero out
                        # allele 0's depth (F5 skip for that variant)
                        ads = [
                            0 if (r >= 25 and r < 31 and j == 0) else (
                                1 + _h(gi, si, j) % 9
                            )
                            for j in range(n_alleles)
                        ]
                    if ads is None:
                        cells.append(f"{gt}:.:.")
                    else:
                        dp = sum(ads) + 2
                        ad = ",".join(["2"] + [str(a) for a in ads])
                        cells.append(f"{gt}:{ad}:{dp}")
                        if si < n_samples:  # unknown column never counts
                            expected_details += sum(1 for a in ads if a != 0)
                f.write(
                    f"{chrom}\t{pos}\t.\tA\t{alt}\t50\tPASS\t.\tGT:AD:DP\t"
                    + "\t".join(cells)
                    + "\n"
                )
                gi += 1
    return {
        "variants_entered": expected_variants,
        "sample_details_entered": expected_details,
    }


def drive(spark, work: Path, n_lines: int, n_files: int) -> dict:
    """Generate the fixture, run gzip load / restaged load / re-load /
    genic QC through the CLI functions, and return timings + metrics."""
    from hrdp_variant_load_pipeline_spark import schemas
    from hrdp_variant_load_pipeline_spark.cli import cmd_genic_qc, cmd_run_load

    vdir = work / "vcfs"
    t0 = time.perf_counter()
    expected = write_joint_vcf(vdir, n_lines, n_files=n_files)
    gen_s = time.perf_counter() - t0

    genes_path = str(work / "genes")
    # one gene interval per chromosome covering the low half of the pos
    # range, so genic/intergenic both occur and QC has real work
    hi = 1000 + n_lines * 5
    spark.createDataFrame(
        [(i + 1, str(i + 1), 1, hi, "ACTIVE", 372) for i in range(5)],
        schemas.GENE,
    ).write.mode("overwrite").parquet(genes_path)

    def cfg_for(tag: str, restage: bool) -> dict:
        c = {
            "map_key": 372,
            "input_dir": str(vdir),
            "samples": sample_config(),
            "genes_path": genes_path,
            "variant_store": str(work / f"variants_{tag}"),
            "detail_store": str(work / f"details_{tag}"),
        }
        if restage:
            c["restage_dir"] = str(work / "restage")
        return c

    out: dict = {"expected": expected, "gen_s": round(gen_s, 2)}

    # gzip path (fresh stores)
    cfg = cfg_for("gz", restage=False)
    t0 = time.perf_counter()
    m = cmd_run_load(spark, cfg)
    out["gzip_load_s"] = round(time.perf_counter() - t0, 2)
    out["gzip_metrics"] = m

    # restage write + restaged load (fresh stores)
    cfg_r = cfg_for("rs", restage=True)
    from hrdp_variant_load_pipeline_spark.sources.vcf import (
        read_vcf,
        restage_to_parquet,
    )

    t0 = time.perf_counter()
    restage_to_parquet(read_vcf(spark, str(vdir)), cfg_r["restage_dir"])
    out["restage_write_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    m_r = cmd_run_load(spark, cfg_r)
    out["restaged_load_s"] = round(time.perf_counter() - t0, 2)
    out["restaged_metrics"] = m_r

    # idempotent re-run on the restaged path
    t0 = time.perf_counter()
    m2 = cmd_run_load(spark, cfg_r)
    out["rerun_s"] = round(time.perf_counter() - t0, 2)
    out["rerun_metrics"] = m2

    # genic QC over the loaded store. The FIRST pass may legitimately
    # update rows: QC point-probes (start_pos, start_pos) where the
    # loader range-probes — the reference's own deliberate divergence
    # (GenicQc.java:190-238 vs HrdpVariants.java:316-434), visible on
    # multi-allelic lines. The SECOND pass must be a fixpoint.
    t0 = time.perf_counter()
    q = cmd_genic_qc(spark, cfg_r)
    out["genic_qc_s"] = round(time.perf_counter() - t0, 2)
    out["genic_qc_metrics"] = q
    q2 = cmd_genic_qc(spark, cfg_r)
    out["genic_qc_fixpoint_metrics"] = q2

    ok = (
        m["variants_entered"] == expected["variants_entered"]
        and m["sample_details_entered"] == expected["sample_details_entered"]
        and m_r["variants_entered"] == expected["variants_entered"]
        and m_r["sample_details_entered"] == expected["sample_details_entered"]
        and m2["variants_entered"] == 0
        and m2["sample_details_entered"] == 0
        and q2["genic_status_updated"] == 0
    )
    out["all_assertions_pass"] = ok
    return out


def main() -> None:
    n_lines = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    import tempfile

    workdir = (
        Path(sys.argv[3])
        if len(sys.argv) > 3
        else Path(tempfile.mkdtemp(prefix="vcf146_"))
    )
    from hrdp_variant_load_pipeline_spark.session import get_spark

    spark = get_spark("vcf146-bench")
    out = drive(spark, workdir, n_lines, n_files)
    out.update(
        {
            "metric": "vcf146_production_shape",
            "n_lines": n_lines,
            "n_files": n_files,
            "n_samples": N_SAMPLES,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        }
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
