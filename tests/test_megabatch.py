"""Megabatch transfer-shape guarantees (round-4 VERDICT item 2).

The latency-tolerant device path replaces per-4096-loci-tile streaming
(thousands of H2D/D2H hops — unusable over a high-latency link) with
auto megatiles + slabbed screen launches: O(1) kernel launches and
transfers per region. These tests pin the transfer COUNTS so a
regression back to per-tile streaming is caught without TPU hardware.
"""

import numpy as np
import pytest

from guacamole_tpu.ops import dispatch
from guacamole_tpu.pack.columnar import iter_tiles_columnar
from guacamole_tpu.runtime.columnar import decode_bam_columnar, native_available

from conftest import resource_path


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_chrm_screen_is_one_megatile_and_one_launch(monkeypatch):
    """Whole-chrM screen tiles: ONE auto megatile, ONE device launch on
    the forced-device path (the blob is far under the slab bound)."""
    cols = decode_bam_columnar(resource_path("chrM.sorted.bam"))
    cols = cols.select(cols.is_mapped_mask)
    tiles = list(
        iter_tiles_columnar(
            cols, "chrM", range(0, 16571), fields="screen"
        )
    )
    assert len(tiles) == 1, "chrM must pack as one auto megatile"

    monkeypatch.setenv("GUAC_HOST_SCREEN", "0")  # force the device path
    launches = []
    real = dispatch._compact_one_launch

    def counting(*a, **k):
        launches.append(1)
        return real(*a, **k)

    monkeypatch.setattr(dispatch, "_compact_one_launch", counting)
    items = [(t, "default", None) for t in tiles]
    results = list(
        dispatch.pipelined_batched_screens(
            iter(items),
            tile_of=lambda it: it[0],
            threshold_percent=8,
            compact_cap=512,
        )
    )
    assert len(results) == 1
    assert len(launches) == 1, (
        f"expected ONE compact screen launch for chrM, got {len(launches)}"
    )
    # The result must actually resolve (sanity: candidates exist on chrM).
    screen = results[0][1].result()
    assert screen.total > 0


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_slab_count_is_blob_bound(monkeypatch):
    """An oversized blob slabs into ceil(bytes/slab) launches — not one
    per 4096-loci tile — and the merged result equals the whole-tile
    screen."""
    cols = decode_bam_columnar(resource_path("chrM.sorted.bam"))
    cols = cols.select(cols.is_mapped_mask)
    (tile,) = iter_tiles_columnar(
        cols, "chrM", range(0, 16571), fields="screen"
    )
    blob = np.asarray(tile.csr_nib)
    row_off = np.asarray(tile.csr_off, np.int32)
    iv = np.asarray(tile.is_variant)

    monkeypatch.setenv("GUAC_HOST_SCREEN", "0")
    whole = dispatch.screen_csr_launch(
        blob, row_off, iv, tile.K, threshold_percent=8
    ).result()

    # Shrink the slab bound so this blob must split.
    monkeypatch.setattr(dispatch, "CSR_SLAB_BYTES", 1 << 18)
    launches = []
    real = dispatch._screen_csr_one_launch

    def counting(*a, **k):
        launches.append(1)
        return real(*a, **k)

    monkeypatch.setattr(dispatch, "_screen_csr_one_launch", counting)
    slabbed = dispatch.screen_csr_launch(
        blob, row_off, iv, tile.K, threshold_percent=8
    ).result()

    expected = -(-len(blob) // (1 << 18))  # ceil
    assert len(launches) <= expected + 1
    assert len(launches) >= 2
    np.testing.assert_array_equal(whole.counts, slabbed.counts)
    np.testing.assert_array_equal(whole.candidates, slabbed.candidates)
