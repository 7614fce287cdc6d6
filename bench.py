#!/usr/bin/env python
"""Benchmark harness: the BASELINE.json configs measurable on this machine.

Runs the full production CLI (streaming + device screens + classify +
VCF write) for:

  #1 germline-threshold on chrM.sorted.bam      (headline stdout metric)
  #2 germline-standard on chrM.sorted.bam
  #3 somatic-standard on the chr20 tumor/normal pair
  #4 8-shard sharded-step scaling point (scripts/scaling_bench.py,
     virtual CPU mesh in a subprocess — this host has one chip)
  #5 2-process multi-host run (jax.distributed over localhost; both
     processes share this host's cores, so the number is a correctness/
     overhead point, not a DCN scaling measurement)

Every timed run's output VCF is byte-compared against the committed
golden snapshot (tests/golden) — a perf "win" from a correctness
regression fails the bench.

Baseline status: the reference publishes NO performance numbers
(BASELINE.md) and this environment has no JVM, so the reference's Spark
local[1] wall-clock is NOT measurable here. vs_baseline is computed
against a documented ASSUMPTION of 60 s for the reference's single-node
chrM run (JVM + Spark startup + single-core scan); the sidecar
BENCH_REPORT.json carries the full per-config results and marks the
baseline as an assumption, not a measurement.

Prints ONE JSON line to stdout; details go to BENCH_REPORT.json.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
RESOURCES = "/root/reference/src/test/resources"
GOLDEN = os.path.join(REPO, "tests", "golden")
SPARK_BASELINE_WALL_S = 60.0  # documented assumption — see module docstring

CONFIGS = {
    "germline-threshold-chrM": {
        "argv": [
            "germline-threshold",
            "--reads", os.path.join(RESOURCES, "chrM.sorted.bam"),
            "--parallelism", "2",
        ],
        "golden": "chrM.germline-threshold.vcf",
        "reads": [os.path.join(RESOURCES, "chrM.sorted.bam")],
        "iters": 5,
    },
    "germline-standard-chrM": {
        "argv": [
            "germline-standard",
            "--reads", os.path.join(RESOURCES, "chrM.sorted.bam"),
            "--parallelism", "2",
        ],
        "golden": "chrM.germline-standard.vcf",
        "reads": [os.path.join(RESOURCES, "chrM.sorted.bam")],
        "iters": 3,
    },
    "somatic-standard-chr20": {
        "argv": [
            "somatic-standard",
            "--tumor-reads", os.path.join(RESOURCES, "tumor.chr20.tough.sam"),
            "--normal-reads", os.path.join(RESOURCES, "normal.chr20.tough.sam"),
            "--odds", "120",
            "--min-tumor-read-depth", "8",
            "--min-normal-read-depth", "4",
            "--max-tumor-read-depth", "200",
            "--min-tumor-alternate-read-depth", "3",
            "--min-vaf", "5",
            "--min-likelihood", "70",
        ],
        "golden": "chr20.somatic-standard.vcf",
        "reads": [
            os.path.join(RESOURCES, "tumor.chr20.tough.sam"),
            os.path.join(RESOURCES, "normal.chr20.tough.sam"),
        ],
        "iters": 3,
    },
}


def count_reads(paths) -> int:
    from guacamole_tpu.callers.common import load_read_source
    from guacamole_tpu.loci.lociset import parse_loci
    from guacamole_tpu.reads.read import InputFilters

    filters = InputFilters.create(
        overlaps_loci=parse_loci("all"), non_duplicate=True, has_mdtag=True
    )
    return sum(load_read_source(p, filters)[0].n for p in paths)


def run_config(name, spec, tmp_root):
    """Time the full CLI for one config; assert golden-byte output."""
    from guacamole_tpu import cli

    with open(os.path.join(GOLDEN, spec["golden"]), "rb") as fh:
        want = fh.read()

    def once(tag):
        out = os.path.join(tmp_root, f"{name}-{tag}.vcf")
        t0 = time.time()
        rc = cli.main(spec["argv"] + ["--out", out])
        wall = time.time() - t0
        if rc != 0:
            raise RuntimeError(f"{name}: CLI exited {rc}")
        with open(out, "rb") as fh:
            got = fh.read()
        if got != want:
            raise RuntimeError(
                f"{name}: output differs from golden {spec['golden']} — "
                "refusing to report a perf number for wrong calls"
            )
        return wall

    once("warmup")  # populate the persistent compile cache
    best = min(once(i) for i in range(spec["iters"]))
    n_reads = count_reads(spec["reads"])
    return {
        "wall_s": round(best, 3),
        "reads_per_s": round(n_reads / best, 1),
        "n_reads": n_reads,
        "golden": spec["golden"],
        "golden_match": True,
    }


def run_scaling_subprocess():
    """Config #4: the 8-shard sharded-step scaling point (virtual CPU
    mesh — this host has one chip; on a pod the same code spans chips)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py"),
         "--devices", "8", "--iters", "5"],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    if proc.returncode != 0:
        return {"error": proc.stderr.strip()[-500:]}
    return json.loads(proc.stdout)


def run_multihost_2proc(tmp_root):
    """Config #5 point: 2-process jax.distributed run on localhost vs the
    same workload single-process. Shares one host's cores — reported as a
    correctness/overhead point, not DCN scaling."""
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    base = [
        sys.executable, "-m", "guacamole_tpu.cli", "germline-threshold",
        "--reads", os.path.join(RESOURCES, "chrM.sorted.bam"),
        "--loci", "chrM:0-16571", "--parallelism", "2",
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out1 = os.path.join(tmp_root, "mh-single.vcf")
    t0 = time.time()
    subprocess.run(base + ["--out", out1], env=env, check=True,
                   capture_output=True, timeout=600)
    single_wall = time.time() - t0
    out2 = os.path.join(tmp_root, "mh-multi.vcf")
    t0 = time.time()
    procs = [
        subprocess.Popen(
            base + [
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--out", out2,
            ],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for pid in range(2)
    ]
    for proc in procs:
        if proc.wait(timeout=600) != 0:
            return {"error": "multi-process run failed"}
    multi_wall = time.time() - t0
    with open(out1, "rb") as fh1, open(out2, "rb") as fh2:
        if fh1.read() != fh2.read():
            return {"error": "multi-process output differs from single"}
    return {
        "single_process_wall_s": round(single_wall, 3),
        "two_process_wall_s": round(multi_wall, 3),
        "outputs_identical": True,
        "note": "both processes share one host's cores + a localhost "
        "coordinator; measures runtime overhead, not DCN scaling",
    }


def main() -> int:
    from guacamole_tpu.platform import configure_platform

    configure_platform()

    report = {"configs": {}, "baseline": {
        "reference": "MartijnAB/guacamole (Scala/Spark, local[1])",
        "wall_s_assumed": SPARK_BASELINE_WALL_S,
        "status": "assumption — the reference publishes no numbers and "
        "no JVM exists in this environment to measure it",
    }}
    with tempfile.TemporaryDirectory() as tmp_root:
        for name, spec in CONFIGS.items():
            report["configs"][name] = run_config(name, spec, tmp_root)
        report["scaling_8shard_virtual"] = run_scaling_subprocess()
        report["multihost_2proc"] = run_multihost_2proc(tmp_root)

    with open(os.path.join(REPO, "BENCH_REPORT.json"), "w") as fh:
        json.dump(report, fh, indent=2)
        fh.write("\n")

    headline = report["configs"]["germline-threshold-chrM"]
    baseline_reads_per_s = headline["n_reads"] / SPARK_BASELINE_WALL_S
    result = {
        "metric": "chrM germline-threshold end-to-end CLI throughput "
        "(golden-verified)",
        "value": headline["reads_per_s"],
        "unit": "reads/s/chip",
        "vs_baseline": round(
            headline["reads_per_s"] / baseline_reads_per_s, 2
        ),
        "detail": {
            "wall_s": headline["wall_s"],
            "n_reads": headline["n_reads"],
            "golden_match": True,
            "configs_in_sidecar": sorted(report["configs"])
            + ["scaling_8shard_virtual", "multihost_2proc"],
            "baseline_status": "assumed 60 s Spark local[1] (unmeasurable "
            "here; see BENCH_REPORT.json)",
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
