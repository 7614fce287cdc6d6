"""Kernel dispatch: fused Pallas kernels on TPU, XLA (jnp) elsewhere.

The interpreted Pallas path is only for correctness tests; production CPU
runs use the XLA kernels directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def use_pallas() -> bool:
    """Use the fused Pallas kernels for caller screening.

    Controlled by GUAC_USE_PALLAS: "1" forces Pallas (on TPU), "0" forces
    XLA. Default is OFF in this deployment: the development TPU is reached
    through a remote-compile tunnel where Mosaic compilations are not served
    from the persistent cache, so each CLI process would pay minutes of
    compile time for a kernel that saves fractions of a millisecond per
    tile. On a production pod (local compiles, long-lived processes) set
    GUAC_USE_PALLAS=1.
    """
    import os

    setting = os.environ.get("GUAC_USE_PALLAS", "0")
    return setting == "1" and on_tpu()


class ScreenResult(NamedTuple):
    counts: np.ndarray  # [L, K]
    forward_counts: np.ndarray
    depth: np.ndarray  # [L]
    candidates: np.ndarray  # [L] bool


def screen_tile(
    allele_id, qual, mapq, strand, valid, is_variant, max_alleles: int
) -> ScreenResult:
    """Per-locus counts + variant-evidence screening for one tile."""
    if use_pallas():
        from guacamole_tpu.ops.pallas_kernels import fused_tile_stats_ll

        import jax.numpy as jnp

        out = fused_tile_stats_ll(
            jnp.asarray(allele_id),
            jnp.asarray(qual),
            jnp.asarray(mapq),
            jnp.asarray(strand),
            jnp.asarray(valid),
            jnp.asarray(is_variant),
            max_alleles,
        )
        return ScreenResult(
            counts=np.asarray(out.counts),
            forward_counts=np.asarray(out.forward_counts),
            depth=np.asarray(out.depth),
            candidates=np.asarray(out.candidates),
        )
    from guacamole_tpu.ops.kernels import tile_stats

    stats = tile_stats(allele_id, strand, valid, is_variant, max_alleles)
    return ScreenResult(
        counts=np.asarray(stats.counts),
        forward_counts=np.asarray(stats.forward_counts),
        depth=np.asarray(stats.depth),
        candidates=np.asarray(stats.variant_evidence),
    )
