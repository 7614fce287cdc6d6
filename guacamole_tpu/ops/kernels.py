"""Device kernels over packed locus tiles (JAX/XLA).

These are the per-locus compute primitives of every caller, vectorized over
whole tiles of loci at once instead of per-locus objects:

 - allele/strand counting (germline-threshold, evidence stats, VAF)
 - per-element correctness probabilities from base/mapping qualities
 - diploid genotype log-likelihoods over all allele pairs (germline-standard
   and somatic screening; cf. the per-locus math at /root/reference
   .../likelihood/Likelihood.scala:149-201 — here one fused computation for
   L loci x D depth x P genotype pairs)

All kernels take fixed-shape arrays ([L, D] with -1/False padding) so XLA
compiles each (L, D, K) bucket once. f32 on device; exact f64 confirmation
for emitted calls happens host-side at candidate loci only.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOG2 = float(np.log(2.0))


@functools.lru_cache(maxsize=None)
def genotype_pairs(max_alleles: int) -> Tuple[np.ndarray, np.ndarray]:
    """Unordered diploid genotype index pairs (i <= j) over K alleles, in
    the same enumeration order as the reference (i outer, j inner)."""
    pairs = [
        (i, j)
        for i in range(max_alleles)
        for j in range(i, max_alleles)
    ]
    i_idx = np.array([p[0] for p in pairs], dtype=np.int32)
    j_idx = np.array([p[1] for p in pairs], dtype=np.int32)
    return i_idx, j_idx


def phred_to_success(phred: jnp.ndarray) -> jnp.ndarray:
    return 1.0 - jnp.power(10.0, phred.astype(jnp.float32) / -10.0)


@functools.partial(jax.jit, static_argnames=("max_alleles",))
def allele_counts(
    allele_id: jnp.ndarray,  # [L, D] int
    strand: jnp.ndarray,  # [L, D] bool
    valid: jnp.ndarray,  # [L, D] bool
    max_alleles: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-locus allele counts and forward-strand counts: [L, K] int32."""
    one_hot = (
        (allele_id[:, :, None] == jnp.arange(max_alleles, dtype=allele_id.dtype))
        & valid[:, :, None]
    )
    counts = jnp.sum(one_hot, axis=1, dtype=jnp.int32)
    fwd = jnp.sum(one_hot & strand[:, :, None], axis=1, dtype=jnp.int32)
    return counts, fwd


@functools.partial(jax.jit, static_argnames=("include_alignment",))
def probability_correct(
    qual: jnp.ndarray,  # [L, D] int
    mapq: jnp.ndarray,  # [L, D] int
    valid: jnp.ndarray,  # [L, D] bool
    include_alignment: bool = False,
) -> jnp.ndarray:
    """P(sequenced bases correct) per element, 0 outside valid slots."""
    pc = phred_to_success(qual)
    if include_alignment:
        pc = pc * phred_to_success(mapq)
    return jnp.where(valid, pc, 0.0)


@functools.partial(jax.jit, static_argnames=("max_alleles",))
def genotype_log_likelihoods(
    allele_id: jnp.ndarray,  # [L, D] int
    pc: jnp.ndarray,  # [L, D] f32 probability-correct
    valid: jnp.ndarray,  # [L, D] bool
    max_alleles: int,
) -> jnp.ndarray:
    """log L(g) for all K(K+1)/2 diploid genotypes per locus: [L, P] f32.

    log L(i,j) = sum_d log(p(i,d) + p(j,d)) - depth * log 2
    with p(a,d) = pc(d) if element d carries allele a else 1 - pc(d).
    """
    i_idx, j_idx = genotype_pairs(max_alleles)
    i_idx = jnp.asarray(i_idx)
    j_idx = jnp.asarray(j_idx)
    # [L, D, K]: per-element probability under each allele hypothesis
    k_range = jnp.arange(max_alleles, dtype=allele_id.dtype)
    matches = allele_id[:, :, None] == k_range  # [L, D, K]
    p = jnp.where(matches, pc[:, :, None], 1.0 - pc[:, :, None])
    # [L, D, P] pair sums -> log -> masked sum over depth
    pair_sum = p[:, :, i_idx] + p[:, :, j_idx]
    log_terms = jnp.where(valid[:, :, None], jnp.log(pair_sum), 0.0)
    depth = jnp.sum(valid, axis=1, dtype=jnp.float32)  # [L]
    return jnp.sum(log_terms, axis=1) - depth[:, None] * LOG2


class PackedScreen(NamedTuple):
    counts: jnp.ndarray  # [L, K] allele counts (int32)
    candidates: jnp.ndarray  # [L] bool


@functools.partial(
    jax.jit, static_argnames=("max_alleles", "threshold_percent")
)
def tile_stats_nibble(
    packed: jnp.ndarray,  # [L, ceil(D/2)] uint8, two 4-bit allele ids/byte
    is_variant: jnp.ndarray,  # [L, K] bool
    max_alleles: int,
    threshold_percent=None,
) -> PackedScreen:
    """Counting + candidate screen over nibble-packed allele ids.

    The host packs each element's allele id into 4 bits (0xF = empty /
    invalid slot; low nibble = even depth slot, high nibble = odd), which
    is the minimal transfer encoding for the counting screen: no caller
    consumes per-element strand/qual on device (evidence stats are exact
    host-side at candidate loci), so one byte carries two elements.
    Requires max_alleles <= 15. Semantics identical to tile_stats on the
    unpacked arrays (same counts, same candidate rule).
    """
    assert max_alleles <= 15, "nibble packing reserves 0xF for empty slots"
    lo = packed & jnp.uint8(0xF)
    hi = packed >> jnp.uint8(4)
    k_range = jnp.arange(max_alleles, dtype=jnp.uint8)
    counts = jnp.sum(
        lo[:, :, None] == k_range, axis=1, dtype=jnp.int32
    ) + jnp.sum(hi[:, :, None] == k_range, axis=1, dtype=jnp.int32)
    if threshold_percent is None:
        candidates = jnp.any((counts > 0) & is_variant, axis=1)
    else:
        depth = jnp.sum(lo != jnp.uint8(0xF), axis=1, dtype=jnp.int32) + jnp.sum(
            hi != jnp.uint8(0xF), axis=1, dtype=jnp.int32
        )
        passing = (counts > 0) & (
            counts * 100 >= depth[:, None] * (threshold_percent + 1)
        )
        candidates = jnp.any(passing & is_variant, axis=1) | (
            jnp.sum(passing & ~is_variant, axis=1) >= 2
        )
    return PackedScreen(counts, candidates)


@functools.partial(
    jax.jit, static_argnames=("max_alleles", "threshold_percent")
)
def tile_stats_csr(
    packed: jnp.ndarray,  # [B] uint8 nibble pairs, rows byte-aligned
    row_off: jnp.ndarray,  # [L+1] int32 byte offsets per row
    is_variant: jnp.ndarray,  # [L, K] bool
    max_alleles: int,
    threshold_percent=None,
) -> PackedScreen:
    """Counting screen over CSR nibble-packed elements (no depth axis).

    Each locus row's elements occupy bytes [row_off[r], row_off[r+1]) of
    packed (0xF = pad nibble). Counts come from a per-byte one-hot prefix
    sum differenced at row boundaries — dense, deterministic math with no
    scatters, and zero transfer padding beyond one nibble per odd-depth
    row. Depth (valid elements) is recovered as the row sum of counts,
    exactly matching tile_stats semantics on the unpacked arrays.
    """
    assert max_alleles <= 15, "nibble packing reserves 0xF for empty slots"
    lo = packed & jnp.uint8(0xF)
    hi = packed >> jnp.uint8(4)
    k_range = jnp.arange(max_alleles, dtype=jnp.uint8)
    one_hot = (lo[:, None] == k_range).astype(jnp.int32) + (
        hi[:, None] == k_range
    ).astype(jnp.int32)  # [B, K]
    prefix = jnp.concatenate(
        [
            jnp.zeros((1, max_alleles), jnp.int32),
            jnp.cumsum(one_hot, axis=0),
        ],
        axis=0,
    )  # [B+1, K]
    counts = prefix[row_off[1:]] - prefix[row_off[:-1]]  # [L, K]
    if threshold_percent is None:
        candidates = jnp.any((counts > 0) & is_variant, axis=1)
    else:
        depth = jnp.sum(counts, axis=1)
        passing = (counts > 0) & (
            counts * 100 >= depth[:, None] * (threshold_percent + 1)
        )
        candidates = jnp.any(passing & is_variant, axis=1) | (
            jnp.sum(passing & ~is_variant, axis=1) >= 2
        )
    # int16 halves the device->host transfer. Values only wrap at rows
    # deeper than 32767 elements, which the packer flags as overflow
    # (exact host fallback) — their device counts are never read.
    return PackedScreen(counts.astype(jnp.int16), candidates)


class TileStats(NamedTuple):
    counts: jnp.ndarray  # [L, K] allele counts
    forward_counts: jnp.ndarray  # [L, K]
    depth: jnp.ndarray  # [L] valid-slot depth
    forward_depth: jnp.ndarray  # [L]
    variant_evidence: jnp.ndarray  # [L] bool: any variant-allele element


@functools.partial(
    jax.jit, static_argnames=("max_alleles", "threshold_percent")
)
def tile_stats(
    allele_id: jnp.ndarray,
    strand: jnp.ndarray,
    valid: jnp.ndarray,
    is_variant: jnp.ndarray,  # [L, K] bool
    max_alleles: int,
    threshold_percent=None,
) -> TileStats:
    """Fused counting + candidate screening for one tile.

    Without a threshold, a locus is a candidate if any variant allele has
    evidence. With threshold_percent, the screen applies the exact
    germline-threshold passing rule (count * 100 // depth > threshold,
    rewritten division-free as count * 100 >= depth * (threshold + 1) for
    positive counts): candidates are loci where a variant allele passes —
    or where two reference alleles pass (the mixed-N corner that
    classify_locus must still see, GermlineThresholdCaller.scala:155-175).
    """
    counts, fwd = allele_counts(allele_id, strand, valid, max_alleles)
    depth = jnp.sum(valid, axis=1, dtype=jnp.int32)
    forward_depth = jnp.sum(valid & strand, axis=1, dtype=jnp.int32)
    if threshold_percent is None:
        variant_evidence = jnp.any((counts > 0) & is_variant, axis=1)
    else:
        passing = (counts > 0) & (
            counts * 100 >= depth[:, None] * (threshold_percent + 1)
        )
        variant_evidence = jnp.any(passing & is_variant, axis=1) | (
            jnp.sum(passing & ~is_variant, axis=1) >= 2
        )
    return TileStats(counts, fwd, depth, forward_depth, variant_evidence)
