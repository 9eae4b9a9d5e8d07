"""Device/platform selection info.

Analog of `/root/reference/app/core/device.py:6-32` (CUDA > MPS > CPU
auto-select): JAX resolves the platform itself; this exposes the resolved
platform plus an explicit CPU override for tests/debugging.
"""

from __future__ import annotations

from typing import Optional

import jax


def get_platform(prefer: Optional[str] = None) -> str:
    """Return the active platform name ('tpu' | 'cpu' | ...), optionally
    forcing one (e.g. 'cpu') before any computation has run."""
    if prefer:
        jax.config.update("jax_platforms", prefer)
    return jax.devices()[0].platform


def device_summary() -> str:
    devs = jax.devices()
    return f"{len(devs)}x {devs[0].platform} ({devs[0].device_kind})"


def enable_persistent_compilation_cache(cache_dir: Optional[str] = None
                                        ) -> str:
    """Point JAX's persistent compilation cache at a stable directory so
    every CLI process (train, finetune, bench, serving) reuses compiled
    executables instead of re-walking the compile service per process —
    on this setup a fresh train-step shape costs 1-3 min through the
    REMOTE TPU compiler (CLAUDE.md), and the big jitted programs recur
    across runs at identical shapes.

    Resolution order: explicit arg > $LIPSYNC_JAX_CACHE_DIR > any cache
    dir already configured > ~/.cache/lipsync_tpu/jax. Safe to call
    multiple times.
    """
    import os

    if cache_dir is None:
        cache_dir = os.environ.get("LIPSYNC_JAX_CACHE_DIR")
    existing = jax.config.jax_compilation_cache_dir
    if cache_dir is None and existing:
        return existing
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "lipsync_tpu", "jax"
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
