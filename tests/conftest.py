"""Test harness config: force an 8-virtual-device CPU platform so multi-chip
sharding tests run without TPU hardware.

Note on precision: XLA:CPU's *default* conv/matmul precision is relaxed
(~1e-3 relative vs fp64), and its *highest* precision path is slow. Parity
tests scope ``jax.default_matmul_precision("highest")`` around the traced
computation; everything else runs at default precision for speed."""

import os

# Must be set before the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (imported here so env vars above take effect)

# The env var JAX_PLATFORMS can be force-overridden by site customization
# (e.g. a TPU tunnel plugin); the config update below wins regardless.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the heavy conv graphs (train steps, tiny
# engines) compile once per machine instead of once per pytest run.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def reference_on_path():
    """Put the read-only reference repo on sys.path for golden comparisons."""
    import sys

    ref = "/root/reference"
    if os.path.isdir(ref) and ref not in sys.path:
        sys.path.insert(0, ref)
    return os.path.isdir(ref)


def small_model_config():
    """Reduced geometry exercising every module but cheap on 1 CPU core."""
    from lipsync_tpu.models import ModelConfig

    return ModelConfig(video_frames=8, crop_size=48, mel_bins=80, audio_frames=32)
