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


REFERENCE_MAIN = os.path.join(
    os.path.dirname(REFERENCE_RESOURCES.rstrip("/")), "..", "main", "scala"
)

# Flags declared by the reference but deliberately not implemented here,
# each with its documented rationale:
DELIBERATE_FLAG_OMISSIONS = {
    # --reference / --fragment-length (Common.scala:122-130, trait
    # Reference): dead code in the reference — no command's Arguments
    # class extends that trait, so the flags are unreachable from any
    # CLI invocation. Kept here as documented omissions in case a
    # parser change ever surfaces them; see DEVIATIONS.md #10.
    "--reference",
    "--fragment-length",
}


def _reference_arg_decls():
    """Parse every trait/class declaration + its @Args4jOption flags out of
    the reference's Scala source (no hand-transcription): returns
    {simple_or_qualified_name: (parent_names, own_flags)}."""
    import re

    decl_re = re.compile(
        r"(?:trait|class)\s+(\w+)(?:\[[^\]]*\])?"
        r"(?:\s*\([^)]*\))?\s+extends\s+([^{\n]+)(\{?)"
    )
    flag_re = re.compile(r'@Args4jOption\(\s*name\s*=\s*"(--[\w-]+)"')
    decls = {}
    for root, _dirs, files in os.walk(REFERENCE_MAIN):
        for fn in files:
            if not fn.endswith(".scala"):
                continue
            path = os.path.join(root, fn)
            with open(path) as fh:
                text = fh.read()
            file_stem = fn[: -len(".scala")]
            for m in decl_re.finditer(text):
                name, parents_str, brace = m.group(1), m.group(2), m.group(3)
                parents = [
                    p.strip().split("[")[0]
                    for p in re.split(r"\bwith\b", parents_str)
                    if p.strip()
                ]
                flags = []
                if brace == "{":
                    # brace-match the body to scope flag ownership
                    depth, i = 1, m.end()
                    while i < len(text) and depth > 0:
                        if text[i] == "{":
                            depth += 1
                        elif text[i] == "}":
                            depth -= 1
                        i += 1
                    body = text[m.end(): i]
                    # flags of NESTED decls belong to them, not to us
                    nested_spans = []
                    for nm in decl_re.finditer(body):
                        if nm.group(3) == "{":
                            d, j = 1, nm.end()
                            while j < len(body) and d > 0:
                                if body[j] == "{":
                                    d += 1
                                elif body[j] == "}":
                                    d -= 1
                                j += 1
                            nested_spans.append((nm.start(), j))
                    for fm in flag_re.finditer(body):
                        if not any(
                            s <= fm.start() < e for s, e in nested_spans
                        ):
                            flags.append(fm.group(1))
                entry = (parents, flags)
                decls[f"{file_stem}.{name}"] = entry
                # simple name: first writer wins unless qualified use only
                decls.setdefault(name, entry)
    return decls


def _resolve_reference_flags(decls, class_name):
    """Transitive closure of @Args4jOption flags for one Arguments class."""
    seen, flags, stack = set(), set(), [class_name]
    while stack:
        name = stack.pop()
        key = name if name in decls else name.split(".")[-1]
        if key in seen or key not in decls:
            continue  # external parents (Args4jBase, ParquetArgs) skipped
        seen.add(key)
        parents, own = decls[key]
        flags.update(own)
        stack.extend(parents)
    return flags


def test_reference_flag_parity():
    """Every CLI option the reference's args4j traits declare must be
    accepted by the corresponding command here. The reference flag sets
    are DERIVED from the reference source at test time (args4j
    annotations + trait inheritance), so a new or renamed reference flag
    fails this test instead of silently weakening it. Inert ones
    (--out-chunks, --fragment-length) parse but have no effect; deliberate
    omissions are listed in DELIBERATE_FLAG_OMISSIONS with rationale. The
    reverse direction (extensions like --tile-size) is allowed."""
    from guacamole_tpu import cli

    decls = _reference_arg_decls()
    command_to_class = {
        "germline-threshold": "GermlineThresholdCaller.Arguments",
        "germline-standard": "GermlineStandardCaller.Arguments",
        "somatic-standard": "SomaticStandardCaller.Arguments",
        "variant-support": "VariantSupport.Arguments",
        "vaf-histogram": "VAFHistogram.Arguments",
        "structural-variant": "StructuralVariantCaller.Arguments",
    }
    # sanity: the parser actually found the reference's flag surface
    all_flags = {
        f
        for cls in command_to_class.values()
        for f in _resolve_reference_flags(decls, cls)
    }
    assert len(all_flags) >= 35, (
        f"reference source parse looks broken: only {sorted(all_flags)}"
    )
    for command, cls in command_to_class.items():
        want = _resolve_reference_flags(decls, cls)
        assert want, f"no reference flags resolved for {command}"
        parser_flags = set(_command_help(cli, command))
        missing = sorted(
            f
            for f in want
            if f not in parser_flags and f not in DELIBERATE_FLAG_OMISSIONS
        )
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


def test_truth_concordance_through_cli(resources_dir, tmp_path):
    """--truth prints precision/recall/F1 in the reference's tab format
    through the full CLI (Concordance.scala:72-113 flow)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # calls measured against THEMSELVES as truth: the metrics must be 1.0,
    # so the full VCF-read + SNV-matching path is exercised non-vacuously
    truth_vcf = str(tmp_path / "truth.vcf")
    run_cli(
        ["germline-threshold", "--reads", resource_path("chrM.sorted.bam")],
        truth_vcf,
    )
    out2 = str(tmp_path / "g.vcf")
    result = subprocess.run(
        [sys.executable, "-m", "guacamole_tpu.cli", "germline-threshold",
         "--reads", resource_path("chrM.sorted.bam"),
         "--truth", truth_vcf,
         "--out", out2],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    lines = result.stdout.splitlines()
    header_idx = [
        i for i, l in enumerate(lines)
        if l.startswith("Precision\tRecall\tF1Score")
    ]
    assert header_idx, f"no concordance table in output:\n{result.stdout[-800:]}"
    values = [float(v) for v in lines[header_idx[0] + 1].split("\t")]
    assert values == [1.0, 1.0, 1.0], values


def test_germline_threshold_adam016_header_compat(resources_dir, tmp_path):
    """--vcf-header-compat adam016 swaps ONLY the header boilerplate for
    the reconstructed ADAM-0.16 saveAsVcf header (Common.scala:290-293);
    body records are byte-identical to the default golden."""
    out = str(tmp_path / "compat.vcf")
    run_cli(
        [
            "germline-threshold",
            "--reads", resource_path("chrM.sorted.bam"),
            "--parallelism", "2",
            "--vcf-header-compat", "adam016",
        ],
        out,
    )
    from guacamole_tpu.gio.vcf import ADAM016_HEADER_LINES

    with open(out) as f:
        lines = f.read().splitlines()
    n = len(ADAM016_HEADER_LINES)
    assert lines[:n] == ADAM016_HEADER_LINES
    # htsjdk emits no ##source line; contig lines follow the boilerplate.
    assert lines[n].startswith("##contig=")
    with open(os.path.join(GOLDEN, "chrM.germline-threshold.vcf")) as f:
        golden_lines = f.read().splitlines()
    body = [l for l in lines if not l.startswith("##")]
    golden_body = [l for l in golden_lines if not l.startswith("##")]
    assert body == golden_body
