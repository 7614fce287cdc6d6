"""Mesh-distributed caller equivalence: the shard_map'd screens over the
8-device CPU mesh must produce exactly the sequential callers' calls, for
all three main callers (threshold / germline-standard / somatic)."""

import jax
import pytest

from guacamole_tpu.callers.distributed import (
    call_somatic_mesh,
    call_standard_mesh,
    call_variants_mesh,
)
from guacamole_tpu.callers.germline_standard import (
    call_variants as call_standard,
)
from guacamole_tpu.callers.germline_threshold import call_variants
from guacamole_tpu.callers.somatic_standard import (
    call_variants as call_somatic,
)
from guacamole_tpu.gio.load import load_read_set
from guacamole_tpu.loci.lociset import parse_loci
from guacamole_tpu.loci.partition import partition_loci_uniformly
from guacamole_tpu.parallel.mesh import loci_mesh
from guacamole_tpu.reads.read import InputFilters

from conftest import resource_path


@pytest.fixture(scope="module")
def chrm_reads(resources_dir):
    filters = InputFilters.create(
        overlaps_loci=parse_loci("chrM:0-5000"),
        non_duplicate=True,
        has_mdtag=True,
    )
    return load_read_set(resource_path("chrM.sorted.bam"), filters).mapped_reads


def key(calls):
    return sorted((c.contig, c.start, c.allele, c.labels) for c in calls)


@pytest.mark.parametrize("tasks", [1, 8])
def test_mesh_caller_matches_sequential(chrm_reads, tasks):
    loci = parse_loci("chrM:0-5000").result()
    partitions = partition_loci_uniformly(tasks, loci)
    mesh = loci_mesh(jax.devices()[:8])
    sequential = call_variants(chrm_reads, partitions, tile_size=1024)
    distributed = call_variants_mesh(
        chrm_reads, partitions, tile_size=1024, mesh=mesh
    )
    assert key(distributed) == key(sequential)
    assert len(distributed) > 0


def test_mesh_caller_small_mesh(chrm_reads):
    loci = parse_loci("chrM:1000-2000").result()
    partitions = partition_loci_uniformly(2, loci)
    mesh = loci_mesh(jax.devices()[:2])
    sequential = call_variants(chrm_reads, partitions, tile_size=512)
    distributed = call_variants_mesh(
        chrm_reads, partitions, tile_size=512, mesh=mesh
    )
    assert key(distributed) == key(sequential)


@pytest.mark.parametrize("tasks", [1, 8])
def test_mesh_standard_matches_sequential(chrm_reads, tasks):
    loci = parse_loci("chrM:0-5000").result()
    partitions = partition_loci_uniformly(tasks, loci)
    mesh = loci_mesh(jax.devices()[:8])
    sequential = call_standard(
        chrm_reads, partitions, min_alignment_quality=1, tile_size=1024
    )
    distributed = call_standard_mesh(
        chrm_reads,
        partitions,
        min_alignment_quality=1,
        tile_size=1024,
        mesh=mesh,
    )

    def skey(calls):
        return [
            (c.reference_contig, c.start, c.allele, c.evidence)
            for c in calls
        ]

    assert skey(distributed) == skey(sequential)
    assert len(distributed) > 0


def test_mesh_somatic_matches_sequential(resources_dir):
    filters = InputFilters.create(
        overlaps_loci=parse_loci("all"),
        non_duplicate=True,
        passed_vendor_quality_checks=True,
        has_mdtag=True,
    )
    tumor = load_read_set(
        resource_path("tumor.chr20.tough.sam"), filters
    ).mapped_reads
    normal = load_read_set(
        resource_path("normal.chr20.tough.sam"), filters
    ).mapped_reads
    starts = [r.start for r in tumor + normal]
    loci = parse_loci(
        "20:%d-%d" % (min(starts), max(r.end for r in tumor + normal))
    ).result()
    partitions = partition_loci_uniformly(4, loci)
    mesh = loci_mesh(jax.devices()[:8])
    sequential = call_somatic(
        tumor, normal, partitions, odds_threshold=120, tile_size=1024
    )
    distributed = call_somatic_mesh(
        tumor,
        normal,
        partitions,
        odds_threshold=120,
        tile_size=1024,
        mesh=mesh,
    )

    def skey(calls):
        return [
            (
                c.reference_contig,
                c.start,
                c.allele,
                c.somatic_log_odds,
                c.tumor_variant_evidence,
                c.normal_reference_evidence,
            )
            for c in calls
        ]

    assert skey(distributed) == skey(sequential)
    assert len(distributed) > 0
