"""Mesh-distributed calling: one shard_map step over all shards at once.

The single-device callers iterate loci shards sequentially; this module
runs the device phase of germline-threshold for ALL shards in one
shard_map'd step over the loci mesh (each device gets its shard's tile),
then classifies on host from the gathered counts. On a pod this is the
production execution shape: N chips process N loci shards concurrently,
with only the global counters crossing ICI.

Equivalent by construction (and by test) to the sequential caller.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from guacamole_tpu.callers.germline_threshold import (
    ThresholdCall,
    classify_locus,
)
from guacamole_tpu.callers.source import ReadSource
from guacamole_tpu.loci.locimap import LociMap
from guacamole_tpu.pack.tiles import LocusTile, pad_tile_loci
from guacamole_tpu.parallel.mesh import (
    ShardedBatch,
    loci_mesh,
    make_sharded_call_step,
)


def _pad_tile_depth(tile: LocusTile, target_d: int) -> LocusTile:
    import dataclasses

    pad = target_d - tile.D
    if pad <= 0:
        return tile

    def pad_d(a, fill=0):
        return np.concatenate(
            [a, np.full((a.shape[0], pad), fill, dtype=a.dtype)], axis=1
        )

    return dataclasses.replace(
        tile,
        allele_id=pad_d(tile.allele_id, -1),
        qual=pad_d(tile.qual),
        mapq=pad_d(tile.mapq),
        strand=pad_d(tile.strand),
        mismatches=pad_d(tile.mismatches),
        edge_distance=pad_d(tile.edge_distance),
        read_index=pad_d(tile.read_index, -1),
        valid=pad_d(tile.valid),
    )


def call_variants_mesh(
    reads,
    loci_partitions: LociMap,
    threshold_percent: int = 8,
    emit_ref: bool = False,
    emit_no_call: bool = False,
    tile_size: int = 4096,
    max_alleles: int = 8,
    reference_genome=None,
    mesh=None,
) -> List[ThresholdCall]:
    """germline-threshold over a device mesh: pack each shard's tiles,
    stack them [n_shards, L, D], run one sharded step, classify on host."""
    source = (
        reads if isinstance(reads, ReadSource) else ReadSource.from_reads(reads)
    )
    if mesh is None:
        mesh = loci_mesh()
    n_devices = len(mesh.devices.flat)

    inverse = loci_partitions.inverse_map()
    sample_sources = {
        name: source.for_sample(name) for name in source.sample_names()
    }

    # Pack every (task, sample, contig) into tiles, tracking shard metadata.
    all_tiles: List[Tuple[str, "ReadSource", LocusTile]] = []
    for task in sorted(inverse):
        task_loci = inverse[task]
        for sample_name, sample_source in sorted(sample_sources.items()):
            for contig in task_loci.contigs:
                for tile in sample_source.pack_tiles(
                    contig,
                    task_loci.on_contig(contig),
                    tile_size=tile_size,
                    max_alleles=max_alleles,
                    reference_genome=reference_genome,
                ):
                    all_tiles.append((sample_name, sample_source, tile))

    calls: List[ThresholdCall] = []
    step_cache: Dict[Tuple[int, int], object] = {}

    # Process tiles in groups of n_devices with one sharded step per group;
    # pad depth to the group max so the stack is rectangular.
    for group_start in range(0, len(all_tiles), n_devices):
        group = all_tiles[group_start : group_start + n_devices]
        real = len(group)
        target_d = max(t.D for _, _, t in group)
        tiles = [_pad_tile_depth(t, target_d) for _, _, t in group]
        while len(tiles) < n_devices:
            tiles.append(tiles[-1])  # replicate to fill the mesh
        batch = ShardedBatch(
            allele_id=np.stack([t.allele_id for t in tiles]),
            qual=np.stack([t.qual for t in tiles]),
            mapq=np.stack([t.mapq for t in tiles]),
            strand=np.stack([t.strand for t in tiles]),
            valid=np.stack([t.valid for t in tiles]),
            is_variant=np.stack([t.is_variant for t in tiles]),
        )
        key = (tiles[0].L, target_d)
        step = step_cache.get(key)
        if step is None:
            step = make_sharded_call_step(mesh, max_alleles)
            step_cache[key] = step
        out = step(batch)
        counts_all = np.asarray(out.counts)
        candidates_all = np.asarray(out.candidates)

        for shard in range(real):
            sample_name, sample_source, tile = group[shard]
            counts = counts_all[shard]
            variant_evidence = candidates_all[shard]
            for li in range(tile.L):
                total = int(tile.depth[li])
                if total == 0:
                    continue
                if not (emit_ref or emit_no_call) and not variant_evidence[li]:
                    if not tile.overflow[li]:
                        continue
                locus = int(tile.loci[li])
                if tile.overflow[li]:
                    pileup = sample_source.pileup_at(tile.contig, locus)
                    counts_map = {}
                    for e in pileup.elements:
                        counts_map[e.allele] = counts_map.get(e.allele, 0) + 1
                    alleles_and_counts = sorted(counts_map.items())
                    total = pileup.depth
                    reference_base = pileup.reference_base
                else:
                    n = int(tile.num_alleles[li])
                    alleles_and_counts = [
                        (tile.alleles[li][k], int(counts[li, k]))
                        for k in range(n)
                    ]
                    reference_base = int(tile.ref_base[li])
                calls.extend(
                    classify_locus(
                        alleles_and_counts,
                        total,
                        reference_base,
                        sample_name,
                        tile.contig,
                        locus,
                        threshold_percent,
                        emit_ref,
                        emit_no_call,
                    )
                )
    return calls
