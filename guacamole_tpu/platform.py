"""JAX platform selection.

The deployment environment may pin JAX to the TPU backend at interpreter
startup (sitecustomize), overriding the JAX_PLATFORMS environment variable.
configure_platform() re-applies the user's choice before any backend is
initialized, so `JAX_PLATFORMS=cpu guacamole ...` behaves as expected.
"""

from __future__ import annotations

import os
from typing import Optional


def tune_allocator() -> None:
    """Keep glibc from mmap/munmap-cycling the pipeline's large buffers.

    The streaming callers allocate and free hundreds of MB of decode and
    pack buffers per task; glibc's default policy mmaps every allocation
    over 128 KB and munmaps it on free, so each task re-faults its whole
    working set (~1M minor faults per 20 Mbp shard) and every munmap
    broadcasts TLB-shootdown IPIs that stall OTHER cores' processes —
    measured on the 2-core bench host: two concurrent 20 Mbp
    germline-standard runs spend 9-11.5 s/process in system time, vs
    5-7.7 s with this tuning (docs/MULTIHOST.md). Raising the mmap/trim
    thresholds makes freed task buffers stay on the heap and be REUSED by
    the next task — no re-fault, no shootdown. Peak RSS is unchanged (the
    heap high-water is one task's working set; gated by the bench's
    memory_scaling section). GUAC_NO_MALLOC_TUNING=1 disables."""
    if os.environ.get("GUAC_NO_MALLOC_TUNING", "") == "1":
        return
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        one_gb = 1 << 30
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD, M_MMAP_MAX = -1, -3, -4
        libc.mallopt(M_TRIM_THRESHOLD, one_gb)
        libc.mallopt(M_MMAP_THRESHOLD, one_gb)
        libc.mallopt(M_MMAP_MAX, 0)
    except Exception:
        pass  # non-glibc platform: default allocator behavior


def configure_platform(platform: Optional[str] = None) -> None:
    """Apply the requested JAX platform (or the JAX_PLATFORMS env var).

    Must run before any JAX backend is initialized; silently keeps the
    current configuration if it can't be changed anymore.
    """
    tune_allocator()
    try:
        import jax

        cache_dir = os.environ.get(
            "GUAC_JAX_CACHE", os.path.expanduser("~/.cache/guacamole_tpu/jax")
        )
        # Partition the cache by a host/toolchain fingerprint: XLA:CPU AOT
        # executables embed the compile machine's CPU-feature tuning, and
        # loading one written under a different host/LLVM configuration
        # warns of (and risks) SIGILL on every cache hit.
        cache_dir = os.path.join(cache_dir, _host_fingerprint(jax))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    choice = platform or os.environ.get("JAX_PLATFORMS")
    if not choice:
        return
    try:
        import jax

        jax.config.update("jax_platforms", choice)
    except Exception:
        pass


def _host_fingerprint(jax) -> str:
    import hashlib

    parts = [jax.__version__]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    parts.append(line.strip())
                    break
    except OSError:
        import platform as _platform

        parts.append(_platform.processor() or _platform.machine())
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]
