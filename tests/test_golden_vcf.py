"""Golden-VCF acceptance gates: full CLI runs must reproduce the committed
snapshots BYTE-IDENTICALLY (modulo no tolerance at all — these runs are
deterministic by design: fixed reduction orders, canonical tie-breaks,
position-sorted output).

The snapshots are the bit-identical-output acceptance artifact the
reference repo itself lacked (its chrM run was manual, SURVEY.md §4)."""

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
