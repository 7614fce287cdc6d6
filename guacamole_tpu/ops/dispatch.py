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


def fetch_arrays(*arrays):
    """Device->host transfer of several arrays with overlapped RTTs.

    A plain np.asarray per output serializes one tunnel round-trip per
    array (~40 ms each on the remote TPU); starting all host copies
    asynchronously first makes the latencies overlap.
    """
    for arr in arrays:
        if isinstance(arr, jax.Array):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass
    return tuple(np.asarray(arr) for arr in arrays)


class ScreenResult(NamedTuple):
    counts: np.ndarray  # [L, K]
    forward_counts: np.ndarray
    depth: np.ndarray  # [L]
    candidates: np.ndarray  # [L] bool


class PendingScreen(NamedTuple):
    """Dispatched-but-unfetched screen kernel outputs (device arrays).

    JAX dispatch is asynchronous: callers can launch the kernels for many
    tiles, letting the device work and the host->device/device->host
    traffic overlap host-side packing/classification, then resolve each
    with result().
    """

    counts: object
    forward_counts: object
    depth: object
    candidates: object

    def result(self) -> ScreenResult:
        return ScreenResult(*fetch_arrays(*self))


def screen_tile_launch(
    allele_id, qual, mapq, strand, valid, is_variant, max_alleles: int,
    threshold_percent=None,
) -> PendingScreen:
    """Dispatch per-locus counts + variant-evidence screening for one tile
    without blocking on the device->host transfer."""
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
            threshold_percent=threshold_percent,
        )
        pending = PendingScreen(
            out.counts, out.forward_counts, out.depth, out.candidates
        )
    else:
        from guacamole_tpu.ops.kernels import tile_stats

        stats = tile_stats(
            allele_id, strand, valid, is_variant, max_alleles,
            threshold_percent=threshold_percent,
        )
        pending = PendingScreen(
            stats.counts,
            stats.forward_counts,
            stats.depth,
            stats.variant_evidence,
        )
    # Queue the host copies right behind the kernels so the transfer is
    # already in flight when result() is called.
    for arr in pending:
        if isinstance(arr, jax.Array):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass
    return pending


def screen_tile(
    allele_id, qual, mapq, strand, valid, is_variant, max_alleles: int,
    threshold_percent=None,
) -> ScreenResult:
    """Per-locus counts + variant-evidence screening for one tile."""
    return screen_tile_launch(
        allele_id, qual, mapq, strand, valid, is_variant, max_alleles,
        threshold_percent=threshold_percent,
    ).result()


def pipelined(items, launch, max_in_flight: int = 8):
    """Yield (item, launch(item)) with a bounded window of launches in
    flight ahead of consumption, so async device dispatches (and their
    device->host transfers) overlap host-side packing of later items."""
    from collections import deque

    in_flight = deque()
    for item in items:
        in_flight.append((item, launch(item)))
        if len(in_flight) > max_in_flight:
            yield in_flight.popleft()
    while in_flight:
        yield in_flight.popleft()
