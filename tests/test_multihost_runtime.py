"""Real multi-host process runtime: spawn TWO OS processes against a
localhost jax.distributed coordinator, each running the full CLI on its
own loci shard (.bai/region pushdown per process), and assert the merged
VCF that process 0 writes equals a single-process whole-file run.

This is the process-level counterpart of tests/test_multihost_sharding.py
(which proves the sharding model in-process): it exercises the actual
bootstrap (`jax.distributed.initialize`), the per-`process_index` shard
assignment, and the DCN-merged record gather in parallel/multihost.py —
the analog of the reference's driver+executors deployment
(cf. /root/reference .../Command.scala:51-62, README.md:66-88).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from conftest import resource_path

CHRM = "chrM.sorted.bam"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _records(path) -> list:
    with open(path) as fh:
        return [line for line in fh if not line.startswith("##")]


def _spawn(argv, tmp_path, tag):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    log = open(tmp_path / f"{tag}.log", "w")
    proc = subprocess.Popen(
        [sys.executable, "-m", "guacamole_tpu.cli"] + argv,
        stdout=log,
        stderr=subprocess.STDOUT,
        env=env,
    )
    proc._log_path = tmp_path / f"{tag}.log"  # for failure reporting
    return proc


def _wait_all(procs):
    for proc in procs:
        code = proc.wait(timeout=600)
        if code != 0:
            log = proc._log_path.read_text()
            raise AssertionError(f"process failed (exit {code}):\n{log}")


@pytest.mark.parametrize(
    "command, extra",
    [
        ("germline-threshold", []),
        ("germline-standard", ["--min-mapq", "1"]),
    ],
)
def test_two_process_run_equals_single(tmp_path, command, extra):
    coordinator = f"127.0.0.1:{_free_port()}"
    base = [
        command,
        "--reads",
        resource_path(CHRM),
        "--loci",
        "chrM:0-16571",
        "--parallelism",
        "2",
    ] + extra

    multi_out = tmp_path / "multi.vcf"
    procs = [
        _spawn(
            base
            + [
                "--coordinator",
                coordinator,
                "--num-processes",
                "2",
                "--process-id",
                str(pid),
                "--out",
                str(multi_out),
            ],
            tmp_path,
            f"{command}-p{pid}",
        )
        for pid in range(2)
    ]
    _wait_all(procs)
    assert multi_out.exists()

    single_out = tmp_path / "single.vcf"
    single = _spawn(base + ["--out", str(single_out)], tmp_path, f"{command}-single")
    _wait_all([single])

    multi = _records(multi_out)
    assert multi == _records(single_out)
    assert len([l for l in multi if not l.startswith("#")]) > 0


def test_two_process_somatic_equals_single(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    pair = "synthetic.challenge.set1.%s.v2.withMDTags.chr2.syn1fp.sam"
    base = [
        "somatic-standard",
        "--tumor-reads",
        resource_path(pair % "tumor"),
        "--normal-reads",
        resource_path(pair % "normal"),
        "--loci",
        "2:0-243199373",
        "--parallelism",
        "2",
    ]
    multi_out = tmp_path / "multi.vcf"
    procs = [
        _spawn(
            base
            + [
                "--coordinator",
                coordinator,
                "--num-processes",
                "2",
                "--process-id",
                str(pid),
                "--out",
                str(multi_out),
            ],
            tmp_path,
            f"somatic-p{pid}",
        )
        for pid in range(2)
    ]
    _wait_all(procs)

    single_out = tmp_path / "single.vcf"
    _wait_all([_spawn(base + ["--out", str(single_out)], tmp_path, "somatic-1p")])
    multi = _records(multi_out)
    assert multi == _records(single_out)
    assert len([l for l in multi if not l.startswith("#")]) > 0


def test_two_process_variant_support_equals_single(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    base = [
        "variant-support",
        "-v",
        resource_path("truth.chr20.vcf"),
        resource_path("gatk_mini_bundle_extract.bam"),
    ]
    multi_out = tmp_path / "multi.csv"
    procs = [
        _spawn(
            base
            + [
                "-o",
                str(multi_out),
                "--coordinator",
                coordinator,
                "--num-processes",
                "2",
                "--process-id",
                str(pid),
            ],
            tmp_path,
            f"vs-p{pid}",
        )
        for pid in range(2)
    ]
    _wait_all(procs)
    single_out = tmp_path / "single.csv"
    _wait_all([_spawn(base + ["-o", str(single_out)], tmp_path, "vs-1p")])
    assert multi_out.read_text() == single_out.read_text()
    assert single_out.read_text().strip()  # non-empty counts


def test_two_process_vaf_histogram_equals_single(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    base = [
        "vaf-histogram",
        "--loci",
        "chrM:0-16571",
        resource_path(CHRM),
    ]
    multi_out = tmp_path / "multi.csv"
    procs = [
        _spawn(
            base
            + [
                "--out",
                str(multi_out),
                "--coordinator",
                coordinator,
                "--num-processes",
                "2",
                "--process-id",
                str(pid),
            ],
            tmp_path,
            f"vaf-p{pid}",
        )
        for pid in range(2)
    ]
    _wait_all(procs)
    single_out = tmp_path / "single.csv"
    _wait_all([_spawn(base + ["--out", str(single_out)], tmp_path, "vaf-1p")])
    assert multi_out.read_text() == single_out.read_text()
    assert len(single_out.read_text().splitlines()) > 1


def test_two_process_structural_variant_equals_single(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    base = [
        "structural-variant",
        "--reads",
        resource_path("gatk_mini_bundle_extract.bam"),
    ]
    multi_out = tmp_path / "multi.txt"
    procs = [
        _spawn(
            base
            + [
                "--output",
                str(multi_out),
                "--coordinator",
                coordinator,
                "--num-processes",
                "2",
                "--process-id",
                str(pid),
            ],
            tmp_path,
            f"sv-p{pid}",
        )
        for pid in range(2)
    ]
    _wait_all(procs)
    single_out = tmp_path / "single.txt"
    _wait_all(
        [_spawn(base + ["--output", str(single_out)], tmp_path, "sv-1p")]
    )
    assert multi_out.read_text() == single_out.read_text()


def test_multihost_helpers_single_process():
    """The helper API degrades to identity in single-process runs."""
    from guacamole_tpu.loci.lociset import parse_loci
    from guacamole_tpu.parallel.multihost import (
        SINGLE,
        allreduce_counters,
        gather_bytes,
        gather_objects,
        shard_loci_expression,
    )

    assert not SINGLE.active and SINGLE.is_writer
    assert allreduce_counters(SINGLE, {"reads": 7}) == {"reads": 7}
    assert gather_bytes(SINGLE, b"abc") == [b"abc"]
    assert gather_objects(SINGLE, [1, 2]) == [1, 2]
    loci = parse_loci("chrM:0-100").result({"chrM": 16571})
    assert shard_loci_expression(SINGLE, loci) == "chrM:0-100"


def test_shard_expressions_cover_and_partition():
    """Per-process shard expressions partition the loci set exactly."""
    from guacamole_tpu.loci.lociset import parse_loci
    from guacamole_tpu.parallel.multihost import (
        MultihostRuntime,
        shard_loci_expression,
    )

    loci = parse_loci("chrM:0-16571").result({"chrM": 16571})
    covered = np.zeros(16571, dtype=np.int32)
    for pid in range(3):
        expr = shard_loci_expression(MultihostRuntime(pid, 3), loci)
        shard = parse_loci(expr).result({"chrM": 16571})
        for start, end in shard.on_contig("chrM").ranges:
            covered[start:end] += 1
    assert (covered == 1).all()
