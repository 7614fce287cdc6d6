"""Mesh-distributed caller equivalence: call_variants_mesh over the
8-device CPU mesh must produce exactly the sequential caller's calls."""

import jax
import pytest

from guacamole_tpu.callers.distributed import call_variants_mesh
from guacamole_tpu.callers.germline_threshold import call_variants
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
