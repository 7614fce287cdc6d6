"""Steady-state device-kernel benchmark: XLA vs Pallas (vs MXU) forms of
every production screen, device-resident inputs (no H2D in the timed
region).

Methodology: N async dispatches with a single block_until_ready at the
end — the dispatch queue stays full, so the tunnel round trip is hidden
and per-call time approaches device execution time. (A one-dispatch
lax.map variant was tried and rejected: each measurement then pays one
~20 ms tunnel completion-poll, swamping sub-100 us kernels.) Run on an
OTHERWISE IDLE host: concurrent CPU load inflates these numbers 3-5x by
starving the dispatch thread.

Run on real TPU hardware; results are recorded in docs/SPEED_OF_LIGHT.md.
Usage: python scripts/kernel_bench.py
"""

import time

import numpy as np

import jax


def bench(fn, *a, n=200, repeats=3, **kw):
    out = fn(*a, **kw)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a, **kw)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    from guacamole_tpu.ops.kernels import (
        germline_likelihood_screen,
        germline_likelihood_screen_mxu,
        tile_stats_csr,
        tumor_likelihood_screen,
    )
    from guacamole_tpu.ops.pallas_kernels import (
        pallas_csr_screen,
        pallas_likelihood_screen,
    )

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    rng = np.random.RandomState(0)
    K = 8

    # H2D link probe (what dispatch.device_link_is_local measures).
    buf = np.zeros(1 << 20, np.uint8)
    jax.device_put(buf, dev).block_until_ready()
    best = min(
        bench(lambda: jax.device_put(buf, dev), n=1, repeats=1)
        for _ in range(5)
    )
    print(f"H2D 1MiB best: {best*1e3:.2f} ms "
          f"({'local' if best < 0.004 else 'remote/tunnel'} link)")

    # Likelihood screens: [8192, 64] ll_pack tile.
    L, D = 8192, 64
    valid = np.arange(D)[None, :] < rng.randint(8, D + 1, size=L)[:, None]
    aid = np.where(valid, rng.randint(0, 4, size=(L, D)), -1)
    q = np.where(valid, rng.randint(2, 45, size=(L, D)), 0)
    ll_pack = np.where(
        valid, (aid & 0xF) | (q.astype(np.uint16) << 4), 0xFFFF
    ).astype(np.uint16)
    mq = np.where(valid, rng.randint(10, 60, size=(L, D)), 0).astype(np.uint8)
    is_var = np.zeros((L, K), bool)
    is_var[:, 1:4] = True
    is_std = np.zeros((L, K), bool)
    is_std[:, :4] = True
    pk = jax.device_put(ll_pack, dev)
    vv = jax.device_put(is_var, dev)
    ss = jax.device_put(is_std, dev)
    mqd = jax.device_put(mq, dev)
    el = int(valid.sum())

    t = bench(germline_likelihood_screen, pk, vv, ss, K)
    print(f"LL  XLA:    {t*1e6:6.0f} us  {el/t/1e9:6.2f} G el/s")
    t = bench(germline_likelihood_screen_mxu, pk, vv, ss, K)
    print(f"LL  MXU:    {t*1e6:6.0f} us  {el/t/1e9:6.2f} G el/s")
    t = bench(pallas_likelihood_screen, pk, None, vv, ss, K)
    print(f"LL  Pallas: {t*1e6:6.0f} us  {el/t/1e9:6.2f} G el/s")
    t = bench(tumor_likelihood_screen, pk, mqd, vv, ss, K)
    print(f"TLL XLA:    {t*1e6:6.0f} us  {el/t/1e9:6.2f} G el/s")
    t = bench(
        pallas_likelihood_screen, pk, mqd, vv, ss, K, include_alignment=True
    )
    print(f"TLL Pallas: {t*1e6:6.0f} us  {el/t/1e9:6.2f} G el/s")

    # CSR counting screen: 16384 loci, mean depth ~64.
    L2 = 16384
    depth = rng.randint(8, 120, size=L2)
    nbytes = (depth + 1) // 2
    row_off = np.zeros(L2 + 1, np.int32)
    np.cumsum(nbytes, out=row_off[1:])
    blob = rng.randint(
        0, 256, size=int(row_off[-1]), dtype=np.uint8
    ) & 0x77
    iv = rng.rand(L2, K) < 0.4
    el2 = int(depth.sum())
    bd = jax.device_put(blob, dev)
    od = jax.device_put(row_off, dev)
    vd = jax.device_put(iv, dev)
    t = bench(tile_stats_csr, bd, od, vd, K, threshold_percent=8)
    print(f"CSR XLA:    {t*1e6:6.0f} us  {el2/t/1e9:6.2f} G el/s")
    t = bench(pallas_csr_screen, bd, od, vd, K, threshold_percent=8)
    print(f"CSR Pallas: {t*1e6:6.0f} us  {el2/t/1e9:6.2f} G el/s")


if __name__ == "__main__":
    main()
