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
