"""Pallas TPU kernels: the fused per-locus pileup statistics + genotype
log-likelihood inner loop.

One kernel pass over a [L, D] tile block computes, entirely in VMEM:
  - per-locus allele counts and forward-strand counts [L, K]
  - depth and variant-evidence screening masks
  - diploid genotype log-likelihoods for all K(K+1)/2 pairs [L, P]

The XLA (jnp) implementation in ops/kernels.py materializes a [L, D, P]
pair-probability intermediate in HBM; this kernel keeps everything blocked
in VMEM and unrolls the (static) K and P loops on the VPU, so HBM traffic
is one read of the tile and one write of the outputs — the speed-of-light
regime for this memory-bound computation.

Falls back to the jnp implementation off-TPU (pallas_call with
interpret=True under tests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from guacamole_tpu.ops.kernels import LOG2, genotype_pairs


def _stats_ll_kernel(
    aid_ref,      # [TL, D] int32 (-1 invalid)
    qual_ref,     # [TL, D] f32
    mapq_ref,     # [TL, D] f32
    strand_ref,   # [TL, D] f32 (1.0 positive strand)
    valid_ref,    # [TL, D] f32 (1.0 valid)
    variant_ref,  # [TL, K] f32 (1.0 variant allele)
    counts_ref,   # [TL, K] i32 out
    fwd_ref,      # [TL, K] i32 out
    depth_ref,    # [TL, 1] i32 out
    cand_ref,     # [TL, 1] i32 out
    ll_ref,       # [TL, P] f32 out
    *,
    max_alleles: int,
    include_alignment: bool,
    threshold_percent=None,
):
    aid = aid_ref[:]
    valid = valid_ref[:]
    strand = strand_ref[:]

    # probability-correct per element
    pc = 1.0 - jnp.power(10.0, qual_ref[:] * (-0.1))
    if include_alignment:
        pc = pc * (1.0 - jnp.power(10.0, mapq_ref[:] * (-0.1)))
    pc = pc * valid  # zero outside valid slots
    one_minus_pc = (1.0 - pc) * valid

    depth = jnp.sum(valid, axis=1, keepdims=True)  # [TL, 1] f32
    depth_ref[:] = depth.astype(jnp.int32)

    # per-allele probabilities and counts, K unrolled
    i_idx, j_idx = genotype_pairs(max_alleles)
    p_allele = []
    counts_cols = []
    fwd_cols = []
    for k in range(max_alleles):
        match_k = (aid == k) & (valid > 0)
        counts_cols.append(jnp.sum(match_k, axis=1, dtype=jnp.int32))
        fwd_cols.append(
            jnp.sum(match_k & (strand > 0), axis=1, dtype=jnp.int32)
        )
        p_allele.append(jnp.where(match_k, pc, one_minus_pc))
    counts = jnp.stack(counts_cols, axis=1)
    counts_ref[:] = counts
    fwd_ref[:] = jnp.stack(fwd_cols, axis=1)

    if threshold_percent is None:
        variant_evidence = jnp.sum(
            (counts > 0).astype(jnp.float32) * variant_ref[:],
            axis=1,
            keepdims=True,
        )
        cand_ref[:] = (variant_evidence > 0).astype(jnp.int32)
    else:
        # Exact passing rule, division-free (see kernels.tile_stats); all
        # quantities < 2^24 so the f32 compare is exact.
        counts_f = counts.astype(jnp.float32)
        passing = (counts_f > 0) & (
            counts_f * 100.0 >= depth * float(threshold_percent + 1)
        )
        variant = variant_ref[:] > 0
        passing_variant = jnp.sum(
            (passing & variant).astype(jnp.float32), axis=1, keepdims=True
        )
        passing_ref = jnp.sum(
            (passing & ~variant).astype(jnp.float32), axis=1, keepdims=True
        )
        cand_ref[:] = ((passing_variant > 0) | (passing_ref >= 2)).astype(
            jnp.int32
        )

    # genotype log-likelihoods, P pairs unrolled
    neg_depth_log2 = depth * (-LOG2)  # [TL, 1]
    for p in range(len(i_idx)):
        pair_sum = p_allele[int(i_idx[p])] + p_allele[int(j_idx[p])]
        # log of pair_sum only where valid; invalid slots contribute 0
        safe = jnp.where(valid > 0, pair_sum, 1.0)
        ll_ref[:, p] = jnp.sum(jnp.log(safe), axis=1) + neg_depth_log2[:, 0]


class PallasTileStats(NamedTuple):
    counts: jnp.ndarray
    forward_counts: jnp.ndarray
    depth: jnp.ndarray
    candidates: jnp.ndarray
    log_likelihoods: jnp.ndarray


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_alleles",
        "include_alignment",
        "interpret",
        "block_l",
        "threshold_percent",
    ),
)
def fused_tile_stats_ll(
    allele_id: jnp.ndarray,  # [L, D] any int
    qual: jnp.ndarray,  # [L, D]
    mapq: jnp.ndarray,  # [L, D]
    strand: jnp.ndarray,  # [L, D] bool
    valid: jnp.ndarray,  # [L, D] bool
    is_variant: jnp.ndarray,  # [L, K] bool
    max_alleles: int,
    include_alignment: bool = False,
    interpret: bool = False,
    block_l: int = 256,
    threshold_percent=None,
) -> PallasTileStats:
    """Run the fused kernel over a whole tile (grid over L blocks)."""
    from jax.experimental import pallas as pl

    L, D = allele_id.shape
    K = max_alleles
    P = len(genotype_pairs(K)[0])
    if L % block_l != 0:
        block_l = int(np.gcd(L, block_l)) or 1

    aid = allele_id.astype(jnp.int32)
    qual_f = qual.astype(jnp.float32)
    mapq_f = mapq.astype(jnp.float32)
    strand_f = strand.astype(jnp.float32)
    valid_f = valid.astype(jnp.float32)
    variant_f = is_variant.astype(jnp.float32)

    grid = (L // block_l,)
    in_specs = [
        pl.BlockSpec((block_l, D), lambda i: (i, 0)),
        pl.BlockSpec((block_l, D), lambda i: (i, 0)),
        pl.BlockSpec((block_l, D), lambda i: (i, 0)),
        pl.BlockSpec((block_l, D), lambda i: (i, 0)),
        pl.BlockSpec((block_l, D), lambda i: (i, 0)),
        pl.BlockSpec((block_l, K), lambda i: (i, 0)),
    ]
    out_specs = (
        pl.BlockSpec((block_l, K), lambda i: (i, 0)),
        pl.BlockSpec((block_l, K), lambda i: (i, 0)),
        pl.BlockSpec((block_l, 1), lambda i: (i, 0)),
        pl.BlockSpec((block_l, 1), lambda i: (i, 0)),
        pl.BlockSpec((block_l, P), lambda i: (i, 0)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((L, K), jnp.int32),
        jax.ShapeDtypeStruct((L, K), jnp.int32),
        jax.ShapeDtypeStruct((L, 1), jnp.int32),
        jax.ShapeDtypeStruct((L, 1), jnp.int32),
        jax.ShapeDtypeStruct((L, P), jnp.float32),
    )
    kernel = functools.partial(
        _stats_ll_kernel,
        max_alleles=max_alleles,
        include_alignment=include_alignment,
        threshold_percent=threshold_percent,
    )
    counts, fwd, depth, cand, ll = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(aid, qual_f, mapq_f, strand_f, valid_f, variant_f)
    return PallasTileStats(
        counts=counts,
        forward_counts=fwd,
        depth=depth[:, 0],
        candidates=cand[:, 0].astype(bool),
        log_likelihoods=ll,
    )


def tile_stats_ll(
    allele_id,
    qual,
    mapq,
    strand,
    valid,
    is_variant,
    max_alleles: int,
    include_alignment: bool = False,
) -> PallasTileStats:
    """Dispatch: Pallas on TPU, interpreted Pallas elsewhere (tests), with
    identical semantics to the XLA reference kernels."""
    return fused_tile_stats_ll(
        jnp.asarray(allele_id),
        jnp.asarray(qual),
        jnp.asarray(mapq),
        jnp.asarray(strand),
        jnp.asarray(valid),
        jnp.asarray(is_variant),
        max_alleles,
        include_alignment=include_alignment,
        interpret=not _is_tpu(),
    )
