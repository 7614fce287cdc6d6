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


# ---------------------------------------------------------------------------
# Pallas forms of the production compact-encoding screens (the kernels the
# CLI callers actually dispatch): the CSR counting screen and the two
# likelihood candidate screens. Inputs are the same minimal host encodings
# as the XLA forms (CSR nibble blob / uint16 ll_pack), so choosing Pallas
# costs nothing in H2D transfer; semantics are pinned bit-equal to the XLA
# kernels by tests/test_pallas_kernels.py (interpret mode).
# ---------------------------------------------------------------------------


def _lane_cumsum(x, interpret: bool):
    """Inclusive integer cumsum along the lane axis via log-step
    roll+mask adds (Mosaic has no cumsum lowering; this is the classic
    Hillis-Steele scan, exact for int32). Circular pltpu.roll with an
    iota mask avoids vector concatenation, which Mosaic's layout engine
    rejects for partially-offset operands."""
    n = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < n:
        if interpret:
            rolled = jnp.roll(x, shift, axis=1)
        else:
            from jax.experimental.pallas import tpu as pltpu

            rolled = pltpu.roll(x, shift, 1)
        x = x + jnp.where(idx >= shift, rolled, 0)
        shift *= 2
    return x


def _csr_prefix_kernel(
    bytes_ref, *out_and_carry, max_alleles, block_b, interpret
):
    """Blockwise inclusive one-hot prefix sum over the CSR nibble blob.

    Each grid step owns an [8, BB] slab of bytes (row-major byte order);
    the per-allele prefix within the slab is a lane cumsum plus a row
    base threaded through the 8 rows (unrolled — static stores per row,
    no sublane scan). TPU grid steps run sequentially, so the running
    total is carried in a VMEM scratch accumulator across slabs — one
    HBM read of the blob, one write per allele plane of the prefix."""
    from jax.experimental import pallas as pl

    *out_refs, carry_ref = out_and_carry
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    b = bytes_ref[...]  # [8, BB] int32 byte values
    lo = b & 0xF
    hi = (b >> 4) & 0xF
    for k in range(max_alleles):
        one_hot = (lo == k).astype(jnp.int32) + (hi == k).astype(jnp.int32)
        lane_csum = _lane_cumsum(one_hot, interpret)  # within each slab row
        # Thread the running base through the 8 slab rows; static slices
        # only (scalar indexing lowers to dynamic_slice, which Mosaic
        # does not implement).
        base = carry_ref[0:1, k : k + 1]  # [1, 1]
        for r in range(8):
            row_prefix = lane_csum[r : r + 1, :] + base  # [1, BB]
            out_refs[k][r : r + 1, :] = row_prefix
            base = row_prefix[:, block_b - 1 : block_b]
        carry_ref[0:1, k : k + 1] = base


@functools.partial(
    jax.jit,
    static_argnames=("max_alleles", "threshold_percent", "interpret", "block_b"),
)
def pallas_csr_screen(
    packed: jnp.ndarray,  # [B] uint8 nibble pairs, rows byte-aligned
    row_off: jnp.ndarray,  # [L+1] int32 byte offsets per row
    is_variant: jnp.ndarray,  # [L, K] bool
    max_alleles: int,
    threshold_percent=None,
    interpret: bool = False,
    block_b: int = 2048,
):
    """Pallas CSR counting screen: same contract as kernels.tile_stats_csr
    (int16 counts + bool candidates), same CSR nibble H2D encoding.

    The per-byte one-hot prefix sum runs as a sequential-grid Pallas
    kernel with a VMEM carry (one [K]-plane output per allele, all-2D
    blocks for Mosaic's (8, 128) tiling); the row difference at row_off
    (a gather — pure memory layout, which XLA lowers well) and the shared
    candidate rule stay in XLA. Bit-equal to the XLA form: counts are
    integers and the candidate rule is the shared counts_candidates."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from guacamole_tpu.ops.kernels import PackedScreen, counts_candidates

    B = packed.shape[0]
    slab = 8 * block_b
    nslabs = max(1, -(-B // slab))
    blob = jnp.full(nslabs * slab, 0xFF, jnp.int32)
    blob = blob.at[:B].set(packed.astype(jnp.int32))
    blob = blob.reshape(nslabs * 8, block_b)
    spec = pl.BlockSpec((8, block_b), lambda i: (i, 0))
    planes = pl.pallas_call(
        functools.partial(
            _csr_prefix_kernel,
            max_alleles=max_alleles,
            block_b=block_b,
            interpret=interpret,
        ),
        grid=(nslabs,),
        in_specs=[spec],
        out_specs=tuple(spec for _ in range(max_alleles)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nslabs * 8, block_b), jnp.int32)
            for _ in range(max_alleles)
        ),
        scratch_shapes=[pltpu.VMEM((1, max_alleles), jnp.int32)],
        interpret=interpret,
    )(blob)
    # Exclusive prefix at byte b is the inclusive prefix through b-1;
    # difference it at the row boundaries per allele plane.
    cols = []
    for k in range(max_alleles):
        flat = planes[k].reshape(-1)
        excl = jnp.concatenate([jnp.zeros(1, jnp.int32), flat])
        cols.append(excl[row_off[1:]] - excl[row_off[:-1]])
    counts = jnp.stack(cols, axis=1)  # [L, K]
    candidates = counts_candidates(
        counts, jnp.sum(counts, axis=1), is_variant, threshold_percent
    )
    return PackedScreen(counts.astype(jnp.int16), candidates)


def _ll_screen_kernel(
    pack_ref,      # [TL, D] int32 (uint16 ll_pack / uint8 ll_pack8 widened)
    mapq_ref,      # [TL, D] f32 (zeros when not include_alignment)
    variant_ref,   # [TL, K] f32
    standard_ref,  # [TL, K] f32
    tab_ref,       # [2, 16] f32 qual-dictionary tables (qdict form only)
    cand_ref,      # [TL, 1] i32 out
    *,
    max_alleles: int,
    margin: float,
    include_alignment: bool,
    min_phred: float = 0.0,
    use_qdict: bool = False,
):
    """Fused likelihood candidate screen over the uint16 ll_pack encoding.

    Same factored math as kernels.germline_screen_math /
    tumor_screen_math (per-allele sums C/G of the m=0 / m=2 log terms;
    the all-elements term cancels from the variant-vs-reference argmax
    comparison), entirely in VMEM: one HBM read of the packed tile, one
    [TL, 1] candidate write.
    """
    pack = pack_ref[:]
    valid = pack != (0xFF if use_qdict else 0xFFFF)
    aid = pack & 0xF
    if use_qdict:
        # Qual-dictionary byte form: per-element values select from the
        # <= 16-entry tables (germline: x/y log terms precomputed from
        # the same f32 qual values; tumor: the base-qual error, combined
        # with the MAPQ plane elementwise below).
        qidx = pack >> 4
        tab = tab_ref[:]

        def select(row):
            out = jnp.zeros(pack.shape, jnp.float32)
            for k in range(16):
                out = jnp.where(qidx == k, tab[row, k], out)
            return out

        if include_alignment:
            err = select(0)
            err_m = jnp.power(10.0, mapq_ref[:] / -10.0)
            pc = (1.0 - err) * (1.0 - err_m)
            one_minus_pc = err + err_m - err * err_m
            x = jnp.log(2.0 * one_minus_pc)
            y = jnp.log(2.0 * pc)
        else:
            x = select(0)
            y = select(1)
    elif include_alignment:
        q = (pack >> 4).astype(jnp.float32)
        err = jnp.power(10.0, q / -10.0)
        err_m = jnp.power(10.0, mapq_ref[:] / -10.0)
        pc = (1.0 - err) * (1.0 - err_m)
        one_minus_pc = err + err_m - err * err_m  # stable complement
        x = jnp.log(2.0 * one_minus_pc)  # m=0 term
        y = jnp.log(2.0 * pc)  # m=2 term
    else:
        q = (pack >> 4).astype(jnp.float32)
        err = jnp.power(10.0, q / -10.0)
        x = jnp.log(2.0 * err)
        y = jnp.log(2.0 - 2.0 * err)

    c_cols, g_cols = [], []
    for k in range(max_alleles):
        hit = (aid == k) & valid
        c_cols.append(jnp.sum(jnp.where(hit, x, 0.0), axis=1))  # [TL]
        g_cols.append(jnp.sum(jnp.where(hit, y, 0.0), axis=1))

    i_idx, j_idx = genotype_pairs(max_alleles)
    neg_inf = jnp.float32(-jnp.inf)
    shape = c_cols[0].shape
    best_variant = jnp.full(shape, neg_inf)
    best_ref = jnp.full(shape, neg_inf)
    has_var = jnp.zeros(shape, jnp.bool_)
    variant = variant_ref[:] > 0
    standard = standard_ref[:] > 0
    for p in range(len(i_idx)):
        i, j = int(i_idx[p]), int(j_idx[p])
        score = -c_cols[i] + (g_cols[i] if i == j else -c_cols[j])
        pair_exists = standard[:, i] & standard[:, j]
        pair_variant = variant[:, i] | variant[:, j]
        has_var = has_var | (pair_exists & pair_variant)
        best_variant = jnp.maximum(
            best_variant,
            jnp.where(pair_exists & pair_variant, score, neg_inf),
        )
        best_ref = jnp.maximum(
            best_ref,
            jnp.where(pair_exists & ~pair_variant, score, neg_inf),
        )
    # has_var guard: see kernels._screen_from_allele_sums.
    cand = (
        has_var
        & (best_variant >= best_ref - margin)
        & jnp.any(valid, axis=1)
    )
    if min_phred > 0:
        # Normalized-probability (GQ) gate — same formulation as
        # kernels._screen_from_allele_sums (runner/total form, no 1-p
        # cancellation; 2-phred safety band).
        smax = jnp.maximum(best_variant, best_ref)
        total = jnp.zeros(shape)
        for p in range(len(i_idx)):
            i, j = int(i_idx[p]), int(j_idx[p])
            score = -c_cols[i] + (g_cols[i] if i == j else -c_cols[j])
            pair_exists = standard[:, i] & standard[:, j]
            total = total + jnp.where(
                pair_exists, jnp.exp(score - smax), 0.0
            )
        runner = jnp.maximum(total - 1.0, 0.0)
        one_minus = runner / jnp.maximum(total, 1.0) + 1e-10
        gq = -10.0 * jnp.log10(one_minus)
        keep = ~jnp.isfinite(smax) | (gq >= min_phred - 2.0)
        cand = cand & keep
    cand_ref[:] = cand.astype(jnp.int32)[:, None]


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_alleles", "margin", "include_alignment", "interpret", "block_l",
        "min_phred",
    ),
)
def pallas_likelihood_screen(
    ll_pack: jnp.ndarray,  # [L, D] uint16 ll_pack (or uint8 ll_pack8)
    ll_mapq,  # [L, D] uint8 per-element MAPQ, or None (germline form)
    is_variant: jnp.ndarray,  # [L, K] bool
    is_standard_alt: jnp.ndarray,  # [L, K] bool
    max_alleles: int,
    margin: float = 0.5,
    include_alignment: bool = False,
    interpret: bool = False,
    block_l: int = 256,
    min_phred: float = 0.0,
    ll_qvals=None,  # [Q <= 16] uint8: ll_pack is the byte qdict form
) -> jnp.ndarray:
    """Pallas form of germline_likelihood_screen / tumor_likelihood_screen:
    [L] bool candidate mask, same ll_pack H2D encoding and same semantics
    (pinned bit-equal in interpret mode by tests). With ll_qvals, the
    uint8 qual-dictionary encoding (half the H2D/HBM bytes; identical
    flags)."""
    from jax.experimental import pallas as pl

    use_qdict = ll_qvals is not None
    L, D = ll_pack.shape
    K = max_alleles
    # Bound the VMEM working set: the kernel holds several [block_l, D]
    # f32 temporaries, so deep tiles must shrink the row block
    # (block_l * D <= 64k elements keeps the scoped VMEM stack well under
    # the 16 MB limit; D = 2048 overflowed it at the default 256 rows).
    block_l = min(block_l, max(8, (64 * 1024) // max(D, 1)))
    if min_phred > 0:
        # The GQ gate's second unrolled pair loop roughly doubles the
        # kernel's live temporaries; Mosaic's scoped-VMEM accounting
        # overflowed at block 256 even for D = 16 (measured on v5e).
        # Half the rows restores headroom at every depth; 128-row blocks
        # compile and run at all tested shapes.
        block_l = min(block_l, 128)
    if L % block_l != 0:
        block_l = int(np.gcd(L, block_l)) or 1
    pack32 = ll_pack.astype(jnp.int32)
    mapq_f = (
        ll_mapq.astype(jnp.float32)
        if include_alignment
        else jnp.zeros((L, D), jnp.float32)
    )
    # Qual-dictionary tables (f32 values identical to the uint16 form's
    # per-element computation): germline precomputes the x/y log terms;
    # tumor the base-qual error (combined with MAPQ in the kernel).
    tab = jnp.zeros((2, 16), jnp.float32)
    if use_qdict:
        qtab = jnp.zeros(16, jnp.float32).at[
            : ll_qvals.shape[0]
        ].set(jnp.asarray(ll_qvals).astype(jnp.float32))
        err_tab = jnp.power(10.0, qtab / -10.0)
        if include_alignment:
            tab = tab.at[0].set(err_tab)
        else:
            tab = tab.at[0].set(jnp.log(2.0 * err_tab))
            tab = tab.at[1].set(jnp.log(2.0 - 2.0 * err_tab))
    grid = (L // block_l,)
    spec_ld = pl.BlockSpec((block_l, D), lambda i: (i, 0))
    spec_lk = pl.BlockSpec((block_l, K), lambda i: (i, 0))
    cand = pl.pallas_call(
        functools.partial(
            _ll_screen_kernel,
            max_alleles=max_alleles,
            margin=margin,
            include_alignment=include_alignment,
            min_phred=min_phred,
            use_qdict=use_qdict,
        ),
        grid=grid,
        in_specs=[
            spec_ld, spec_ld, spec_lk, spec_lk,
            pl.BlockSpec((2, 16), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_l, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32),
        interpret=interpret,
    )(
        pack32,
        mapq_f,
        is_variant.astype(jnp.float32),
        is_standard_alt.astype(jnp.float32),
        tab,
    )
    return cand[:, 0].astype(bool)
