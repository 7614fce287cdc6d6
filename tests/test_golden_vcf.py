"""Golden-VCF acceptance gates: full CLI runs must reproduce the committed
snapshots BYTE-IDENTICALLY (no tolerance — these runs are deterministic
by design: fixed reduction orders, canonical tie-breaks, position-sorted
output).

Scope of the claim, stated precisely: the snapshots are THIS repo's own
outputs, so these tests pin DETERMINISM and regression-freedom, not
reference parity. Parity with the reference is pinned at the layers where
it is checkable in this environment: ported per-locus unit suites
(PileupSuite/LikelihoodSuite/SomaticStandardCallerSuite cases), f64
operation-order likelihood parity (likelihood.py), and fuzz vs the host
oracle. A direct diff against a reference-generated chrM VCF needs a JVM
this environment lacks; concordance.compare_vcf_records is the
record-level comparator to run when one is obtainable (the reference's
own chrM run was manual — SURVEY.md §4)."""

import os
import subprocess
import sys

import pytest

from conftest import REFERENCE_RESOURCES, resource_path

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def run_cli(args, out_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, "-m", "guacamole_tpu.cli"] + args + ["--out", out_path],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]


def assert_matches_golden(out_path, golden_name):
    with open(out_path) as f:
        got = f.read()
    with open(os.path.join(GOLDEN, golden_name)) as f:
        want = f.read()
    assert got == want, f"output differs from golden {golden_name}"


def test_germline_threshold_golden(resources_dir, tmp_path):
    out = str(tmp_path / "out.vcf")
    run_cli(
        [
            "germline-threshold",
            "--reads", resource_path("chrM.sorted.bam"),
            "--parallelism", "2",
        ],
        out,
    )
    assert_matches_golden(out, "chrM.germline-threshold.vcf")


def test_germline_standard_golden(resources_dir, tmp_path):
    out = str(tmp_path / "out.vcf")
    run_cli(
        [
            "germline-standard",
            "--reads", resource_path("chrM.sorted.bam"),
            "--parallelism", "2",
        ],
        out,
    )
    assert_matches_golden(out, "chrM.germline-standard.vcf")


def test_somatic_standard_golden(resources_dir, tmp_path):
    out = str(tmp_path / "out.vcf")
    run_cli(
        [
            "somatic-standard",
            "--tumor-reads", resource_path("tumor.chr20.tough.sam"),
            "--normal-reads", resource_path("normal.chr20.tough.sam"),
            "--odds", "120",
            "--min-tumor-read-depth", "8",
            "--min-normal-read-depth", "4",
            "--max-tumor-read-depth", "200",
            "--min-tumor-alternate-read-depth", "3",
            "--min-vaf", "5",
            "--min-likelihood", "70",
        ],
        out,
    )
    assert_matches_golden(out, "chr20.somatic-standard.vcf")


def test_golden_with_mesh_forced(resources_dir, tmp_path):
    """The shard_map mesh execution path (--mesh on, over the 8-device
    virtual mesh) must reproduce the same golden bytes for all three main
    callers — the mesh is a production execution shape, not a fork."""
    out = str(tmp_path / "thresh.vcf")
    run_cli(
        [
            "germline-threshold",
            "--reads", resource_path("chrM.sorted.bam"),
            "--parallelism", "2",
            "--mesh", "on",
        ],
        out,
    )
    assert_matches_golden(out, "chrM.germline-threshold.vcf")

    out = str(tmp_path / "standard.vcf")
    run_cli(
        [
            "germline-standard",
            "--reads", resource_path("chrM.sorted.bam"),
            "--parallelism", "2",
            "--mesh", "on",
        ],
        out,
    )
    assert_matches_golden(out, "chrM.germline-standard.vcf")

    out = str(tmp_path / "somatic.vcf")
    run_cli(
        [
            "somatic-standard",
            "--tumor-reads", resource_path("tumor.chr20.tough.sam"),
            "--normal-reads", resource_path("normal.chr20.tough.sam"),
            "--odds", "120",
            "--min-tumor-read-depth", "8",
            "--min-normal-read-depth", "4",
            "--max-tumor-read-depth", "200",
            "--min-tumor-alternate-read-depth", "3",
            "--min-vaf", "5",
            "--min-likelihood", "70",
            "--mesh", "on",
        ],
        out,
    )
    assert_matches_golden(out, "chr20.somatic-standard.vcf")


def test_threshold_golden_with_python_decoder(resources_dir, tmp_path):
    """The pure-Python decoding backend must produce the same bytes."""
    out = str(tmp_path / "out.vcf")
    run_cli(
        [
            "germline-threshold",
            "--reads", resource_path("chrM.sorted.bam"),
            "--parallelism", "2",
            "--bam-reader-api", "python",
        ],
        out,
    )
    assert_matches_golden(out, "chrM.germline-threshold.vcf")


def run_cli_raw(args):
    """Run the CLI without appending --out (tools name their output flag
    differently: --output / --local-out)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, "-m", "guacamole_tpu.cli"] + args,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]


SUPPORT_SITES = os.path.join(os.path.dirname(__file__), "data",
                             "support_sites.vcf")


@pytest.mark.parametrize("mesh", ["off", "on"])
def test_variant_support_golden(resources_dir, tmp_path, mesh):
    """End-to-end variant-support CLI: allele-count CSV at VCF sites
    covering SNVs, insertions, and mid-deletions must match the committed
    snapshot byte-for-byte (output format cf. VariantSupport.scala:59-62,
    91-118)."""
    out = str(tmp_path / "support.csv")
    run_cli_raw(
        [
            "variant-support",
            "--input-variant", SUPPORT_SITES,
            "--output", out,
            "--mesh", mesh,
            resource_path("gatk_mini_bundle_extract.bam"),
        ]
    )
    assert_matches_golden(out, "gatk.variant-support.csv")


@pytest.mark.parametrize("mesh", ["off", "on"])
def test_vaf_histogram_golden(resources_dir, tmp_path, mesh):
    """End-to-end vaf-histogram CLI: the binned histogram file must match
    the committed snapshot (header + line format cf.
    VAFHistogram.scala:154-172)."""
    out = str(tmp_path / "vaf.csv")
    run_cli_raw(
        [
            "vaf-histogram",
            "--bins", "20",
            "--min-read-depth", "2",
            "--local-out", out,
            "--mesh", mesh,
            resource_path("chrM.sorted.bam"),
        ]
    )
    assert_matches_golden(out, "chrM.vaf-histogram.csv")


def test_structural_variant_golden(resources_dir, tmp_path):
    """End-to-end structural-variant CLI: the per-contig SV range text
    must match the committed snapshot (output format cf.
    StructuralVariantCaller.scala:273-287)."""
    out = str(tmp_path / "sv.txt")
    run_cli_raw(
        [
            "structural-variant",
            "--reads", resource_path("gatk_mini_bundle_extract.bam"),
            "--output", out,
        ]
    )
    assert_matches_golden(out, "gatk.structural-variant.txt")


def test_reference_flag_parity():
    """Every CLI option the reference's args4j traits declare must be
    accepted by the corresponding command here (inert ones — --out-chunks,
    --fragment-length — parse but have no effect; --reference is the one
    deliberate omission, see DEVIATIONS.md #10). The reverse direction
    (extensions like --tile-size) is allowed."""
    import argparse

    from guacamole_tpu import cli

    # Reference arg-trait composition per command (args4j name=
    # occurrences in /root/reference/src/main/scala):
    #   DistributedUtil.Arguments extends Base with Loci (+parallelism)
    #   Reads = Base + NoSequenceDictionary + ReadLoadingConfigArgs
    #   GermlineCallerArgs = GenotypeOutput + Reads + Concordance + Dist
    #   SomaticCallerArgs = GenotypeOutput + TumorNormalReads + Dist
    base_loci_dist = ["--debug", "--loci", "--loci-from-file",
                      "--parallelism", "--partition-accuracy"]
    read_cfg = ["--bam-reader-api", "--recompute-md-tags"]
    reads = ["--reads", "--no-sequence-dictionary"] + read_cfg
    tn_reads = ["--tumor-reads", "--normal-reads",
                "--no-sequence-dictionary"] + read_cfg
    output = ["--out", "--out-chunks", "--max-genotypes"]
    concord = ["--truth", "--exclude-snv", "--exclude-indel", "--chr"]
    germline_filters = ["--min-read-depth", "--max-read-depth",
                        "--min-alternate-read-depth", "--min-likelihood",
                        "--debug-genotype-filters"]
    somatic_filters = ["--min-likelihood", "--min-vaf", "--min-lod",
                       "--min-average-mapping-quality",
                       "--min-average-base-quality",
                       "--min-tumor-read-depth", "--min-normal-read-depth",
                       "--max-tumor-read-depth",
                       "--min-tumor-alternate-read-depth",
                       "--max-median-mismatches", "--debug-genotype-filters"]
    pileup_filters = ["--min-mapq", "--filter-multi-allelic",
                      "--min-edge-distance"]
    per_command = {
        "germline-threshold": base_loci_dist + output + reads + concord
        + ["--threshold", "--emit-ref", "--emit-no-call"],
        "germline-standard": base_loci_dist + output + reads + concord
        + pileup_filters + germline_filters + ["--emit-ref"],
        "somatic-standard": base_loci_dist + output + tn_reads
        + somatic_filters + pileup_filters
        + ["--odds", "--dbsnp-vcf", "--reference-fasta"],
        "variant-support": base_loci_dist + read_cfg
        + ["--input-variant", "--output"],
        "vaf-histogram": base_loci_dist + read_cfg
        + ["--bins", "--cluster", "--num-clusters", "--min-read-depth",
           "--min-vaf", "--print-stats", "--sample-percent", "--out",
           "--local-out"],
        "structural-variant": base_loci_dist + reads
        + ["--filter-contig", "--output"],
    }

    for command, flags in per_command.items():
        help_text = _command_help(cli, command)
        parser_flags = set(help_text)
        missing = [f for f in flags if f not in parser_flags]
        assert not missing, f"{command} missing reference flags: {missing}"


def _command_help(cli, command):
    """All option strings a command's parser accepts (including
    help-suppressed ones), without running the command."""
    import argparse
    import unittest.mock as mock

    captured = []
    real_add = argparse.ArgumentParser.add_argument

    def spy(self, *args, **kwargs):
        captured.extend(a for a in args if isinstance(a, str) and a.startswith("--"))
        return real_add(self, *args, **kwargs)

    real_parse = argparse.ArgumentParser.parse_args
    with mock.patch.object(argparse.ArgumentParser, "add_argument", spy), \
         mock.patch.object(
             argparse.ArgumentParser, "parse_args",
             lambda self, argv=None: (_ for _ in ()).throw(SystemExit(0)),
         ):
        try:
            cli.main([command])
        except SystemExit:
            pass
    return captured


def test_cli_error_reporting(tmp_path):
    """Operational errors exit 1 with a one-line message; --debug keeps
    the full traceback."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def run(extra):
        return subprocess.run(
            [sys.executable, "-m", "guacamole_tpu.cli", "germline-threshold",
             "--reads", "/nonexistent.bam", "--out", str(tmp_path / "x.vcf")]
            + extra,
            env=env, capture_output=True, text=True, timeout=300,
        )

    clean = run([])
    assert clean.returncode == 1
    assert "error: FileNotFoundError" in clean.stderr
    assert "Traceback" not in clean.stderr

    debug = run(["--debug"])
    assert debug.returncode != 0
    assert "Traceback" in debug.stderr
