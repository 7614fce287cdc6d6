"""Pallas kernel equivalence: the fused tile-stats/likelihood kernel must
match the XLA reference kernels (interpret mode on CPU)."""

import numpy as np
import pytest

from guacamole_tpu.ops.kernels import (
    genotype_log_likelihoods,
    probability_correct,
    tile_stats,
)
from guacamole_tpu.ops.pallas_kernels import tile_stats_ll


def random_tile(L=64, D=16, K=8, seed=0):
    rng = np.random.RandomState(seed)
    depth = rng.randint(0, D + 1, size=L)
    valid = np.arange(D)[None, :] < depth[:, None]
    allele_id = np.where(
        valid, rng.randint(0, K, size=(L, D)), -1
    ).astype(np.int16)
    qual = np.where(valid, rng.randint(2, 45, size=(L, D)), 0).astype(np.int16)
    mapq = np.where(valid, rng.randint(0, 70, size=(L, D)), 0).astype(np.int16)
    strand = valid & (rng.rand(L, D) < 0.5)
    is_variant = rng.rand(L, K) < 0.4
    return allele_id, qual, mapq, strand, valid, is_variant


@pytest.mark.parametrize("include_alignment", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_fused_kernel_matches_reference(seed, include_alignment):
    K = 8
    aid, qual, mapq, strand, valid, is_variant = random_tile(seed=seed, K=K)
    fused = tile_stats_ll(
        aid, qual, mapq, strand, valid, is_variant, K,
        include_alignment=include_alignment,
    )
    ref_stats = tile_stats(aid, strand, valid, is_variant, K)
    np.testing.assert_array_equal(fused.counts, ref_stats.counts)
    np.testing.assert_array_equal(
        fused.forward_counts, ref_stats.forward_counts
    )
    np.testing.assert_array_equal(fused.depth, ref_stats.depth)
    np.testing.assert_array_equal(
        fused.candidates, ref_stats.variant_evidence
    )
    pc = probability_correct(
        qual, mapq, valid, include_alignment=include_alignment
    )
    ref_ll = genotype_log_likelihoods(aid, pc, valid, K)
    np.testing.assert_allclose(
        fused.log_likelihoods, ref_ll, rtol=2e-5, atol=2e-5
    )


def test_fused_kernel_uneven_block():
    K = 4
    aid, qual, mapq, strand, valid, is_variant = random_tile(
        L=48, D=8, K=K, seed=3
    )
    fused = tile_stats_ll(aid, qual, mapq, strand, valid, is_variant, K)
    ref = tile_stats(aid, strand, valid, is_variant, K)
    np.testing.assert_array_equal(fused.counts, ref.counts)


def test_fused_kernel_empty_loci():
    K = 8
    aid = np.full((16, 8), -1, dtype=np.int16)
    qual = np.zeros((16, 8), dtype=np.int16)
    mapq = np.zeros((16, 8), dtype=np.int16)
    strand = np.zeros((16, 8), dtype=bool)
    valid = np.zeros((16, 8), dtype=bool)
    is_variant = np.zeros((16, K), dtype=bool)
    fused = tile_stats_ll(aid, qual, mapq, strand, valid, is_variant, K)
    assert (np.asarray(fused.depth) == 0).all()
    assert not np.asarray(fused.candidates).any()
    np.testing.assert_allclose(fused.log_likelihoods, 0.0, atol=1e-6)


@pytest.mark.parametrize("threshold_percent", [None, 0, 8, 50])
@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("D", [16, 15])  # even and odd depth axes
def test_nibble_screen_matches_reference(seed, threshold_percent, D):
    from guacamole_tpu.ops.dispatch import pack_nibbles
    from guacamole_tpu.ops.kernels import tile_stats_nibble

    K = 8
    aid, _qual, _mapq, strand, valid, is_variant = random_tile(
        L=64, D=D, K=K, seed=seed
    )
    packed = pack_nibbles(aid, valid)
    assert packed.dtype == np.uint8
    assert packed.shape == (64, (D + 1) // 2)
    out = tile_stats_nibble(
        packed, is_variant, K, threshold_percent=threshold_percent
    )
    ref = tile_stats(
        aid, strand, valid, is_variant, K,
        threshold_percent=threshold_percent,
    )
    np.testing.assert_array_equal(out.counts, ref.counts)
    np.testing.assert_array_equal(out.candidates, ref.variant_evidence)


def test_nibble_screen_masks_extra_valid():
    # valid_of-style masks (e.g. MAPQ filters) shrink validity after the
    # tile is packed: masked slots must vanish from counts and depth.
    from guacamole_tpu.ops.dispatch import pack_nibbles
    from guacamole_tpu.ops.kernels import tile_stats_nibble

    K = 8
    aid, _q, mapq, strand, valid, is_variant = random_tile(
        L=32, D=16, K=K, seed=7
    )
    masked = valid & (mapq >= 30)
    out = tile_stats_nibble(pack_nibbles(aid, masked), is_variant, K)
    ref = tile_stats(aid, strand, masked, is_variant, K)
    np.testing.assert_array_equal(out.counts, ref.counts)
    np.testing.assert_array_equal(out.candidates, ref.variant_evidence)


def _csr_encode(aid, valid, depth):
    """Reference CSR nibble encoding: row r's slots [0, depth[r]) as 4-bit
    ids (0xF where invalid), byte-aligned per row."""
    blobs, off = [], [0]
    for r in range(aid.shape[0]):
        nibs = [
            (int(aid[r, s]) & 0xF) if valid[r, s] else 0xF
            for s in range(int(depth[r]))
        ]
        if len(nibs) % 2:
            nibs.append(0xF)
        blobs.extend(nibs[i] | (nibs[i + 1] << 4) for i in range(0, len(nibs), 2))
        off.append(len(blobs))
    return (
        np.asarray(blobs, dtype=np.uint8),
        np.asarray(off, dtype=np.int32),
    )


@pytest.mark.parametrize("threshold_percent", [None, 8, 50])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_csr_screen_matches_dense(seed, threshold_percent):
    from guacamole_tpu.ops.kernels import tile_stats_csr

    K = 8
    aid, _q, _m, strand, valid, is_variant = random_tile(
        L=64, D=17, K=K, seed=seed
    )
    # Invalidate a few mid-row slots (beyond-allele-cap analog): CSR keeps
    # them as 0xF nibbles, dense masks them via valid.
    rng = np.random.RandomState(seed + 100)
    depth = valid.sum(axis=1)
    punch = (rng.rand(*valid.shape) < 0.1) & (
        np.arange(valid.shape[1])[None, :] < depth[:, None]
    )
    masked = valid & ~punch
    packed, row_off = _csr_encode(aid, masked, depth)
    out = tile_stats_csr(
        packed, row_off, is_variant, K, threshold_percent=threshold_percent
    )
    ref = tile_stats(
        aid, strand, masked, is_variant, K,
        threshold_percent=threshold_percent,
    )
    np.testing.assert_array_equal(out.counts, ref.counts)
    np.testing.assert_array_equal(out.candidates, ref.variant_evidence)


@pytest.mark.parametrize("threshold_percent", [None, 8])
@pytest.mark.parametrize("cap", [4, 64])
def test_csr_compact_matches_full(threshold_percent, cap):
    """The compact CSR screen's candidate rows/counts must equal the full
    screen's, and its footer total must be the true candidate count (so
    cap overflow is always detectable)."""
    from guacamole_tpu.ops.kernels import tile_stats_csr, tile_stats_csr_compact

    K = 8
    aid, _q, _m, _s, valid, is_variant = random_tile(L=64, D=17, K=K, seed=3)
    depth = valid.sum(axis=1)
    packed, row_off = _csr_encode(aid, valid, depth)
    full = tile_stats_csr(
        packed, row_off, is_variant, K, threshold_percent=threshold_percent
    )
    raw = np.asarray(
        tile_stats_csr_compact(
            packed, row_off, is_variant, K,
            threshold_percent=threshold_percent, cap=cap,
        )
    )
    cand_rows = np.nonzero(np.asarray(full.candidates))[0]
    total = int(raw[-1, 0])
    assert total == len(cand_rows)
    n = min(total, cap)
    np.testing.assert_array_equal(raw[:n, 0], cand_rows[:n])
    np.testing.assert_array_equal(
        raw[:n, 1:], np.asarray(full.counts)[cand_rows[:n]]
    )
    # Unused body rows are inert: idx -1, zero counts.
    assert (raw[n:cap, 0] == -1).all()
    assert (raw[n:cap, 1:] == 0).all()


def test_compact_launch_roundtrip_and_overflow_flag():
    from guacamole_tpu.ops.dispatch import screen_csr_compact_launch
    from guacamole_tpu.ops.kernels import tile_stats_csr

    K = 8
    aid, _q, _m, _s, valid, is_variant = random_tile(L=48, D=12, K=K, seed=9)
    depth = valid.sum(axis=1)
    packed, row_off = _csr_encode(aid, valid, depth)
    full = tile_stats_csr(packed, row_off, is_variant, K)
    n_cand = int(np.asarray(full.candidates).sum())
    assert n_cand > 2  # random tiles have variant evidence

    roomy = screen_csr_compact_launch(
        packed, row_off, is_variant, K, cap=n_cand + 8
    ).result()
    assert not roomy.overflowed and roomy.total == n_cand
    np.testing.assert_array_equal(
        roomy.idx, np.nonzero(np.asarray(full.candidates))[0]
    )
    np.testing.assert_array_equal(
        roomy.counts, np.asarray(full.counts)[roomy.idx]
    )

    tight = screen_csr_compact_launch(
        packed, row_off, is_variant, K, cap=n_cand - 1
    ).result()
    assert tight.overflowed and tight.total == n_cand


def test_csr_screen_bucket_padding_is_inert():
    from guacamole_tpu.ops.dispatch import screen_csr_launch
    from guacamole_tpu.ops.kernels import tile_stats_csr

    K = 8
    aid, _q, _m, strand, valid, is_variant = random_tile(
        L=32, D=16, K=K, seed=5
    )
    depth = valid.sum(axis=1)
    packed, row_off = _csr_encode(aid, valid, depth)
    direct = tile_stats_csr(packed, row_off, is_variant, K)
    bucketed = screen_csr_launch(packed, row_off, is_variant, K).result()
    np.testing.assert_array_equal(direct.counts, bucketed.counts)
    np.testing.assert_array_equal(direct.candidates, bucketed.candidates)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("include_alignment", [False, True])
def test_likelihood_screen_superset_of_f64_argmax(seed, include_alignment):
    """The f32 device likelihood screens must flag every locus whose exact
    f64 argmax genotype is variant — across extreme quals (0..93) where
    f32's 1-err rounds to 1."""
    from guacamole_tpu.ops.kernels import (
        genotype_pairs,
        germline_likelihood_screen,
        tumor_likelihood_screen,
    )

    rng = np.random.RandomState(seed)
    L, D, K = 48, 24, 8
    depth = rng.randint(1, D + 1, size=L)
    valid = np.arange(D)[None, :] < depth[:, None]
    aid = np.where(valid, rng.randint(0, 4, size=(L, D)), -1)
    qual = np.where(valid, rng.choice([0, 2, 20, 41, 70, 93], size=(L, D)), 0)
    mapq = np.where(valid, rng.choice([0, 10, 37, 60, 254], size=(L, D)), 0)
    is_variant = np.zeros((L, K), dtype=bool)
    is_variant[:, 1:4] = True
    is_standard = np.zeros((L, K), dtype=bool)
    is_standard[:, :4] = True

    ll_pack = np.where(
        valid, (aid & 0xF) | (qual.astype(np.uint16) << 4), 0xFFFF
    ).astype(np.uint16)
    if include_alignment:
        gots = {
            "tumor": np.asarray(
                tumor_likelihood_screen(
                    ll_pack, mapq.astype(np.uint8), is_variant, is_standard, K
                )
            )
        }
    else:
        from guacamole_tpu.ops.kernels import germline_likelihood_screen_mxu

        gots = {
            "vpu": np.asarray(
                germline_likelihood_screen(ll_pack, is_variant, is_standard, K)
            ),
            "mxu": np.asarray(
                germline_likelihood_screen_mxu(
                    ll_pack, is_variant, is_standard, K
                )
            ),
        }

    # f64 oracle: argmax over pairs of the exact per-element log terms.
    i_idx, j_idx = genotype_pairs(K)
    for li in range(L):
        lls = {}
        for p, (i, j) in enumerate(zip(i_idx, j_idx)):
            if not (is_standard[li, i] and is_standard[li, j]):
                continue
            acc = 0.0
            for s in range(int(depth[li])):
                err = 10.0 ** (qual[li, s] / -10.0)
                pc = 1.0 - err
                if include_alignment:
                    pc *= 1.0 - 10.0 ** (mapq[li, s] / -10.0)
                pi = pc if aid[li, s] == i else 1.0 - pc
                pj = pc if aid[li, s] == j else 1.0 - pc
                acc += np.log(pi + pj) if pi + pj > 0 else -np.inf
            lls[p] = acc
        if not lls:
            continue
        best = max(lls, key=lambda p: lls[p])
        argmax_variant = bool(
            is_variant[li, i_idx[best]] or is_variant[li, j_idx[best]]
        )
        if argmax_variant:
            for form, got in gots.items():
                assert got[li], (
                    f"{form} screen missed f64-argmax-variant locus {li}"
                )


@pytest.mark.parametrize("threshold_percent", [None, 8, 50])
@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_csr_screen_bit_equals_xla(seed, threshold_percent):
    """The Pallas CSR counting screen (production TPU path) must be
    bit-identical to the XLA form on the same CSR encoding."""
    from guacamole_tpu.ops.kernels import tile_stats_csr
    from guacamole_tpu.ops.pallas_kernels import pallas_csr_screen

    K = 8
    aid, _q, _m, _s, valid, is_variant = random_tile(L=64, D=17, K=K, seed=seed)
    depth = valid.sum(axis=1)
    packed, row_off = _csr_encode(aid, valid, depth)
    ref = tile_stats_csr(
        packed, row_off, is_variant, K, threshold_percent=threshold_percent
    )
    got = pallas_csr_screen(
        packed, row_off, is_variant, K,
        threshold_percent=threshold_percent, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got.counts), np.asarray(ref.counts))
    np.testing.assert_array_equal(
        np.asarray(got.candidates), np.asarray(ref.candidates)
    )


def test_pallas_csr_screen_multi_block_carry():
    """Rows spanning Pallas block boundaries must count correctly (the
    VMEM carry across sequential grid steps)."""
    from guacamole_tpu.ops.kernels import tile_stats_csr
    from guacamole_tpu.ops.pallas_kernels import pallas_csr_screen

    K = 8
    rng = np.random.RandomState(11)
    # One very deep row so its bytes straddle several 64-byte blocks.
    L, D = 16, 400
    depth = rng.randint(0, 12, size=L)
    depth[5] = 397
    valid = np.arange(D)[None, :] < depth[:, None]
    aid = np.where(valid, rng.randint(0, K, size=(L, D)), -1)
    is_variant = rng.rand(L, K) < 0.4
    packed, row_off = _csr_encode(aid, valid, depth)
    ref = tile_stats_csr(packed, row_off, is_variant, K)
    got = pallas_csr_screen(
        packed, row_off, is_variant, K, interpret=True, block_b=64
    )
    np.testing.assert_array_equal(np.asarray(got.counts), np.asarray(ref.counts))
    np.testing.assert_array_equal(
        np.asarray(got.candidates), np.asarray(ref.candidates)
    )


def _ll_fixture(seed, L=64, D=24, K=8):
    rng = np.random.RandomState(seed)
    depth = rng.randint(0, D + 1, size=L)
    valid = np.arange(D)[None, :] < depth[:, None]
    aid = np.where(valid, rng.randint(0, 4, size=(L, D)), -1)
    qual = np.where(valid, rng.choice([0, 2, 20, 41, 70, 93], size=(L, D)), 0)
    mapq = np.where(valid, rng.choice([0, 10, 37, 60, 254], size=(L, D)), 0)
    is_variant = np.zeros((L, K), bool)
    is_variant[:, 1:4] = True
    is_standard = np.zeros((L, K), bool)
    is_standard[:, :4] = True
    ll_pack = np.where(
        valid, (aid & 0xF) | (qual.astype(np.uint16) << 4), 0xFFFF
    ).astype(np.uint16)
    return ll_pack, mapq.astype(np.uint8), is_variant, is_standard


@pytest.mark.parametrize("include_alignment", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_likelihood_screen_bit_equals_xla(seed, include_alignment):
    """The Pallas likelihood screens (germline and tumor forms) must be
    bit-identical to the XLA kernels on the same ll_pack encoding."""
    from guacamole_tpu.ops.kernels import (
        germline_likelihood_screen,
        tumor_likelihood_screen,
    )
    from guacamole_tpu.ops.pallas_kernels import pallas_likelihood_screen

    K = 8
    ll_pack, mapq, is_variant, is_standard = _ll_fixture(seed, K=K)
    if include_alignment:
        ref = tumor_likelihood_screen(ll_pack, mapq, is_variant, is_standard, K)
    else:
        ref = germline_likelihood_screen(ll_pack, is_variant, is_standard, K)
    got = pallas_likelihood_screen(
        ll_pack,
        mapq if include_alignment else None,
        is_variant,
        is_standard,
        K,
        include_alignment=include_alignment,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestKernelPath:
    """kernel_path() resolution: explicit overrides beat the probe; the
    launch wrappers dispatch the Pallas forms when selected."""

    def _reset(self):
        from guacamole_tpu.ops import dispatch

        dispatch.kernel_path.cache_clear()
        dispatch.device_link_is_local.cache_clear()

    def test_env_overrides(self, monkeypatch):
        from guacamole_tpu.ops.dispatch import kernel_path

        self._reset()
        monkeypatch.setenv("GUAC_KERNEL_PATH", "pallas")
        assert kernel_path() == "pallas"
        self._reset()
        monkeypatch.setenv("GUAC_KERNEL_PATH", "xla")
        assert kernel_path() == "xla"
        self._reset()
        monkeypatch.delenv("GUAC_KERNEL_PATH", raising=False)
        monkeypatch.setenv("GUAC_USE_PALLAS", "1")
        assert kernel_path() == "pallas"
        self._reset()
        monkeypatch.setenv("GUAC_USE_PALLAS", "0")
        assert kernel_path() == "xla"
        self._reset()
        monkeypatch.delenv("GUAC_USE_PALLAS", raising=False)
        assert kernel_path() == "xla"  # CPU in tests
        self._reset()

    def test_link_probe_override(self, monkeypatch):
        from guacamole_tpu.ops.dispatch import device_link_is_local

        self._reset()
        monkeypatch.setenv("GUAC_ASSUME_LOCAL_LINK", "1")
        assert device_link_is_local()
        self._reset()
        monkeypatch.setenv("GUAC_ASSUME_LOCAL_LINK", "0")
        assert not device_link_is_local()
        self._reset()

    def test_launches_dispatch_pallas(self, monkeypatch):
        """With kernel_path forced to pallas (interpret on CPU), the CSR
        and likelihood launch wrappers must produce outputs identical to
        the XLA path."""
        from guacamole_tpu.ops import dispatch

        K = 8
        aid, _q, _m, _s, valid, is_variant = random_tile(
            L=32, D=12, K=K, seed=4
        )
        depth = valid.sum(axis=1)
        packed, row_off = _csr_encode(aid, valid, depth)

        self._reset()
        monkeypatch.setenv("GUAC_KERNEL_PATH", "xla")
        ref = dispatch.screen_csr_launch(
            packed, row_off, is_variant, K, threshold_percent=8
        ).result()
        self._reset()
        monkeypatch.setenv("GUAC_KERNEL_PATH", "pallas")
        got = dispatch.screen_csr_launch(
            packed, row_off, is_variant, K, threshold_percent=8
        ).result()
        self._reset()
        np.testing.assert_array_equal(got.counts, ref.counts)
        np.testing.assert_array_equal(got.candidates, ref.candidates)


class TestPrefetchIter:
    """prefetch_iter: background-thread tile production semantics."""

    def test_order_and_completeness(self):
        from guacamole_tpu.ops.dispatch import prefetch_iter

        assert list(prefetch_iter(iter(range(100)), ahead=3)) == list(range(100))
        assert list(prefetch_iter([], ahead=2)) == []

    def test_producer_exception_reraises(self):
        import pytest

        from guacamole_tpu.ops.dispatch import prefetch_iter

        def gen():
            yield 1
            yield 2
            raise ValueError("boom")

        it = prefetch_iter(gen(), ahead=1)
        assert next(it) == 1
        assert next(it) == 2
        with pytest.raises(ValueError, match="boom"):
            next(it)

    def test_abandoned_consumer_stops_producer(self):
        import threading
        import time

        from guacamole_tpu.ops.dispatch import prefetch_iter

        produced = []

        def gen():
            for i in range(10_000):
                produced.append(i)
                yield i

        it = prefetch_iter(gen(), ahead=1)
        assert next(it) == 0
        it.close()  # abandon: the producer must notice and exit
        deadline = time.time() + 5
        while time.time() < deadline:
            threads = [
                t for t in threading.enumerate() if t.name == "guac-prefetch"
            ]
            if not threads:
                break
            time.sleep(0.05)
        # Bounded production: at most the buffered window, never the
        # whole generator.
        assert len(produced) < 100


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("min_phred", [10.0, 40.0])
def test_screen_min_phred_gate_parity_and_superset(seed, min_phred):
    """The device screens' min-likelihood (GQ) gate: the Pallas form is
    bit-identical to the XLA form, the gated mask is a subset of the
    ungated one, and it keeps every locus whose EXACT f64 normalized
    argmax probability passes the filter (the safe-drop contract; the
    native f64 twin lives in guac_pack.cpp)."""
    import math

    from guacamole_tpu.ops.kernels import (
        genotype_pairs,
        germline_likelihood_screen,
    )
    from guacamole_tpu.ops.pallas_kernels import pallas_likelihood_screen

    K = 8
    ll_pack, _mapq, is_variant, is_standard = _ll_fixture(seed, K=K)
    ungated = np.asarray(
        germline_likelihood_screen(ll_pack, is_variant, is_standard, K)
    )
    gated = np.asarray(
        germline_likelihood_screen(
            ll_pack, is_variant, is_standard, K, min_phred=min_phred
        )
    )
    pallas = np.asarray(
        pallas_likelihood_screen(
            ll_pack, None, is_variant, is_standard, K,
            interpret=True, min_phred=min_phred,
        )
    )
    np.testing.assert_array_equal(gated, pallas)
    assert not np.any(gated & ~ungated)  # gate only removes

    # Exact f64 oracle: best normalized probability per locus; any locus
    # whose emission would pass the phred filter must stay flagged.
    i_idx, j_idx = genotype_pairs(K)
    L, D = ll_pack.shape
    for li in range(L):
        row = ll_pack[li]
        valid = row != 0xFFFF
        if not valid.any() or not ungated[li]:
            continue
        aid = (row & 0xF).astype(int)
        q = (row >> 4).astype(float)
        err = 10.0 ** (q / -10.0)
        scores = []
        variant_best = None
        for p in range(len(i_idx)):
            i, j = int(i_idx[p]), int(j_idx[p])
            if not (is_standard[li, i] and is_standard[li, j]):
                continue
            s = 0.0
            for d in range(D):
                if not valid[d]:
                    continue
                m = int(aid[d] == i) + int(aid[d] == j)
                term = m + (2 - 2 * m) * err[d]
                s += math.log(term) if term > 0 else -math.inf
            scores.append((s, is_variant[li, i] or is_variant[li, j]))
        if not scores:
            continue
        smax = max(s for s, _ in scores)
        best_is_variant = any(
            v for s, v in scores if s == smax
        )
        if not (best_is_variant and math.isfinite(smax)):
            continue
        total = sum(math.exp(s - smax) for s, _ in scores)
        p_best = 1.0 / total
        one_minus = 1.0 - (p_best - 1e-10)
        gq = (
            math.inf if one_minus <= 0 else -10.0 * math.log10(one_minus)
        )
        if round(gq) >= min_phred:
            assert gated[li], (
                f"seed={seed} locus {li}: exact GQ {gq:.1f} passes the "
                f"phred-{min_phred} filter but the gate dropped it"
            )


@pytest.mark.parametrize("include_alignment", [False, True])
@pytest.mark.parametrize("min_phred", [0.0, 40.0])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_qual_dictionary_screen_equals_uint16(
    seed, include_alignment, min_phred
):
    """The uint8 qual-dictionary screen forms (germline/tumor, XLA and
    Pallas) must produce the SAME candidate flags as the uint16 forms —
    the tables hold the same f32 qual values the wide form computes per
    element — at half the transfer bytes."""
    from guacamole_tpu.ops.kernels import (
        germline_likelihood_screen,
        germline_likelihood_screen8,
        tumor_likelihood_screen,
        tumor_likelihood_screen8,
    )
    from guacamole_tpu.ops.pallas_kernels import pallas_likelihood_screen

    if include_alignment and min_phred > 0:
        pytest.skip("the GQ gate is a germline-only emission bound")
    K = 8
    ll_pack, mapq, is_variant, is_standard = _ll_fixture(seed, K=K)
    # Build the byte form from the wide form: dictionary of the distinct
    # qual values, index in the high nibble.
    quals = np.unique((ll_pack >> 4)[ll_pack != 0xFFFF])
    assert len(quals) <= 16
    idx_of = {int(q): i for i, q in enumerate(quals)}
    lut = np.zeros(4096, np.uint8)
    for q, i in idx_of.items():
        lut[q] = i
    pack8 = np.where(
        ll_pack == 0xFFFF,
        np.uint8(0xFF),
        ((ll_pack & 0xF) | (lut[ll_pack >> 4].astype(np.uint16) << 4)).astype(
            np.uint8
        ),
    ).astype(np.uint8)
    qvals = quals.astype(np.uint8)

    if include_alignment:
        want = np.asarray(
            tumor_likelihood_screen(ll_pack, mapq, is_variant, is_standard, K)
        )
        got8 = np.asarray(
            tumor_likelihood_screen8(
                pack8, qvals, mapq, is_variant, is_standard, K
            )
        )
    else:
        want = np.asarray(
            germline_likelihood_screen(
                ll_pack, is_variant, is_standard, K, min_phred=min_phred
            )
        )
        got8 = np.asarray(
            germline_likelihood_screen8(
                pack8, qvals, is_variant, is_standard, K,
                min_phred=min_phred,
            )
        )
    np.testing.assert_array_equal(got8, want)

    got_pallas = np.asarray(
        pallas_likelihood_screen(
            pack8,
            mapq if include_alignment else None,
            is_variant,
            is_standard,
            K,
            include_alignment=include_alignment,
            interpret=True,
            min_phred=0.0 if include_alignment else min_phred,
            ll_qvals=qvals,
        )
    )
    np.testing.assert_array_equal(got_pallas, want)


def test_native_ll_pack8_roundtrip(resources_dir):
    """The native packer's qual-dictionary transcode: pack8/qvals decode
    to exactly the uint16 encoding (same validity, allele ids, quals) and
    the dispatch launch path produces the same candidates."""
    from guacamole_tpu.ops.dispatch import germline_screen_launch
    from guacamole_tpu.pack.columnar import pack_tile_columnar
    from guacamole_tpu.runtime.columnar import (
        decode_bam_columnar,
        native_available,
    )

    if not native_available():
        pytest.skip("native runtime not built")
    from conftest import resource_path

    # The chrM fixture carries 32 distinct quals -> falls back (no pack8).
    cols = decode_bam_columnar(resource_path("chrM.sorted.bam"))
    mc = cols.select(cols.is_mapped_mask)
    cid = mc.ref_names.index("chrM")
    wide = pack_tile_columnar(
        mc, cid, "chrM", list(range(0, 1024)), fields="likelihood",
        min_mapq=1,
    )
    assert wide.ll_pack8 is None  # 32 distinct quals: no dictionary

    # A quantized copy (quals binned to 8 levels, like modern basecallers)
    # must transcode.
    import dataclasses

    binned = mc.select(np.ones(mc.n, bool))
    binned.ev_qual[:] = (binned.ev_qual // 16) * 16
    t = pack_tile_columnar(
        binned, cid, "chrM", list(range(0, 1024)), fields="likelihood",
        min_mapq=1,
    )
    assert t.ll_pack8 is not None and t.ll_qvals is not None
    assert len(t.ll_qvals) <= 16
    p16, p8 = np.asarray(t.ll_pack), np.asarray(t.ll_pack8)
    valid = p16 != 0xFFFF
    np.testing.assert_array_equal(valid, p8 != 0xFF)
    np.testing.assert_array_equal(
        (p16 & 0xF)[valid], (p8 & 0xF)[valid]
    )
    np.testing.assert_array_equal(
        (p16 >> 4)[valid], t.ll_qvals[(p8 >> 4)[valid]]
    )
    # Launch path equality: pack8 launch == forced-wide launch.
    got = germline_screen_launch(t, min_mapq=1).result()
    wide_only = dataclasses.replace(t, ll_pack8=None, ll_qvals=None)
    want = germline_screen_launch(wide_only, min_mapq=1).result()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
