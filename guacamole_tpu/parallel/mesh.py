"""Multi-chip execution: loci-sharded device mesh.

The distribution model replaces the reference's Spark shuffle
(cf. /root/reference .../DistributedUtil.scala:558-634) with:

 - host-side loci partitioning (uniform or depth-balanced) assigning each
   device a contiguous span of loci tiles;
 - halo duplication on host: reads overlapping a shard boundary are packed
   into both shards (the reference's boundary-read duplication, :585-597),
   so per-locus compute is fully local to one device;
 - a shard_map'd per-tile kernel over a 1-D "loci" mesh axis; the only
   cross-device communication is the psum of global counters (the analog of
   Spark accumulators) over ICI.

Within one host, shards = chips; across hosts the same mesh spans all
chips with each host packing only its shard's byte ranges from the BAM.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from guacamole_tpu.ops.kernels import genotype_log_likelihoods, probability_correct
from guacamole_tpu.pack.tiles import LocusTile


def loci_mesh(devices: Sequence = None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, axis name 'loci'."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("loci",))


class ShardedBatch(NamedTuple):
    """Per-device stacked tile tensors: leading axis = device shard."""

    allele_id: jnp.ndarray  # [S, L, D]
    qual: jnp.ndarray
    mapq: jnp.ndarray
    strand: jnp.ndarray
    valid: jnp.ndarray
    is_variant: jnp.ndarray  # [S, L, K]


def stack_tiles(tiles: Sequence[LocusTile]) -> ShardedBatch:
    """Stack same-shape tiles into [S, L, D] arrays (one tile per shard)."""
    return ShardedBatch(
        allele_id=jnp.asarray(np.stack([t.allele_id for t in tiles])),
        qual=jnp.asarray(np.stack([t.qual for t in tiles])),
        mapq=jnp.asarray(np.stack([t.mapq for t in tiles])),
        strand=jnp.asarray(np.stack([t.strand for t in tiles])),
        valid=jnp.asarray(np.stack([t.valid for t in tiles])),
        is_variant=jnp.asarray(np.stack([t.is_variant for t in tiles])),
    )


class CallStepOutput(NamedTuple):
    counts: jnp.ndarray  # [S, L, K] per-locus allele counts
    forward_counts: jnp.ndarray  # [S, L, K]
    depth: jnp.ndarray  # [S, L]
    candidates: jnp.ndarray  # [S, L] bool: variant evidence present
    log_likelihoods: jnp.ndarray  # [S, L, P] genotype log-likelihoods
    total_elements: jnp.ndarray  # [] global element count (psum over shards)
    total_candidates: jnp.ndarray  # [] global candidate-locus count


def make_sharded_call_step(mesh: Mesh, max_alleles: int):
    """Build the jitted, shard_map'd per-shard calling step.

    Each device processes its own [L, D] tile; global counters are merged
    with psum over the loci axis (the Spark-accumulator analog).
    """
    spec = P("loci")
    replicated = P()

    def per_shard(allele_id, qual, mapq, strand, valid, is_variant):
        # shapes here are the per-device block: [1, L, D] -> squeeze
        allele_id = allele_id[0]
        qual = qual[0]
        mapq = mapq[0]
        strand = strand[0]
        valid = valid[0]
        is_variant = is_variant[0]

        k_range = jnp.arange(is_variant.shape[-1], dtype=allele_id.dtype)
        one_hot = (allele_id[:, :, None] == k_range) & valid[:, :, None]
        counts = jnp.sum(one_hot, axis=1, dtype=jnp.int32)
        fwd = jnp.sum(one_hot & strand[:, :, None], axis=1, dtype=jnp.int32)
        depth = jnp.sum(valid, axis=1, dtype=jnp.int32)
        candidates = jnp.any((counts > 0) & is_variant, axis=1)

        pc = probability_correct(qual, mapq, valid, include_alignment=False)
        ll = genotype_log_likelihoods(allele_id, pc, valid, is_variant.shape[-1])

        total_elements = jax.lax.psum(
            jnp.sum(depth, dtype=jnp.int32), axis_name="loci"
        )
        total_candidates = jax.lax.psum(
            jnp.sum(candidates, dtype=jnp.int32), axis_name="loci"
        )
        return (
            counts[None],
            fwd[None],
            depth[None],
            candidates[None],
            ll[None],
            total_elements,
            total_candidates,
        )

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=(spec, spec, spec, spec, spec, replicated, replicated),
    )

    @jax.jit
    def step(batch: ShardedBatch) -> CallStepOutput:
        outs = sharded(
            batch.allele_id,
            batch.qual,
            batch.mapq,
            batch.strand,
            batch.valid,
            batch.is_variant,
        )
        return CallStepOutput(*outs)

    return step


def sharded_call_step(
    tiles: Sequence[LocusTile], mesh: Mesh = None, max_alleles: int = 8
) -> CallStepOutput:
    """Convenience: stack tiles (one per device) and run the sharded step."""
    if mesh is None:
        mesh = loci_mesh()
    n = len(mesh.devices.flat)
    assert len(tiles) == n, f"need {n} tiles (one per device), got {len(tiles)}"
    batch = stack_tiles(tiles)
    step = make_sharded_call_step(mesh, max_alleles)
    return step(batch)
