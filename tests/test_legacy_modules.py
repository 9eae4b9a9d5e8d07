"""Legacy API-parity modules: LegacyFusionModule + temporal_aggregation.

The reference ships `FusionModule` (fusion_module.py:127-175) and
`TemporalAggregation` (temporal.py:114-167) but never wires them into
`LipSyncModel`; they exist for API completeness. These tests pin our
ports to torch behavior directly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipsync_tpu.models.fusion import LegacyFusionModule
from lipsync_tpu.models.temporal import temporal_aggregation

torch = pytest.importorskip("torch")


def _torch_fusion(embed_dim, hidden_dim):
    fc = torch.nn.Sequential(
        torch.nn.Linear(2 * embed_dim, hidden_dim),
        torch.nn.ReLU(),
        torch.nn.Linear(hidden_dim, embed_dim),
        torch.nn.ReLU(),
    )
    return fc


def test_legacy_fusion_matches_torch():
    rng = np.random.default_rng(0)
    b, t_v, t_a, d = 2, 8, 11, 16
    v = rng.normal(size=(b, t_v, d)).astype(np.float32)
    a = rng.normal(size=(b, t_a, d)).astype(np.float32)

    mod = LegacyFusionModule(embed_dim=d, hidden_dim=24)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(v), jnp.asarray(a))

    fc = _torch_fusion(d, 24)
    with torch.no_grad():
        p = jax.tree_util.tree_map(
            lambda v: np.array(v), variables["params"]
        )
        fc[0].weight.copy_(torch.from_numpy(p["fc1"]["kernel"].T.copy()))
        fc[0].bias.copy_(torch.from_numpy(p["fc1"]["bias"]))
        fc[2].weight.copy_(torch.from_numpy(p["fc2"]["kernel"].T.copy()))
        fc[2].bias.copy_(torch.from_numpy(p["fc2"]["bias"]))
        a_interp = torch.nn.functional.interpolate(
            torch.from_numpy(a).transpose(1, 2),
            size=t_v,
            mode="linear",
            align_corners=False,
        ).transpose(1, 2)
        want = fc(torch.cat([torch.from_numpy(v), a_interp], dim=-1)).numpy()

    with jax.default_matmul_precision("highest"):
        got = np.asarray(
            mod.apply(variables, jnp.asarray(v), jnp.asarray(a))
        )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_legacy_fusion_same_length_skips_interp():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(1, 5, 8)).astype(np.float32)
    a = rng.normal(size=(1, 5, 8)).astype(np.float32)
    mod = LegacyFusionModule(embed_dim=8, hidden_dim=8)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(v), jnp.asarray(a))
    out = mod.apply(variables, jnp.asarray(v), jnp.asarray(a))
    assert out.shape == (1, 5, 8)
    assert np.all(np.asarray(out) >= 0.0)  # final ReLU


def test_legacy_fusion_rejects_bad_shapes():
    mod = LegacyFusionModule(embed_dim=8)
    v = jnp.zeros((2, 5, 8))
    with pytest.raises(ValueError):
        mod.init(jax.random.PRNGKey(0), v, jnp.zeros((2, 5)))
    with pytest.raises(ValueError):
        mod.init(jax.random.PRNGKey(0), v, jnp.zeros((3, 5, 8)))
    with pytest.raises(ValueError):
        mod.init(jax.random.PRNGKey(0), v, jnp.zeros((2, 5, 4)))


def test_temporal_aggregation_unmasked_is_mean():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 7, 5)).astype(np.float32)
    got = np.asarray(temporal_aggregation(jnp.asarray(x)))
    np.testing.assert_allclose(got, x.mean(axis=1), atol=1e-6)


def test_temporal_aggregation_masked_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 9, 6)).astype(np.float32)
    lengths = np.array([9, 4, 1, 0], dtype=np.int32)

    # Torch reference semantics (temporal.py:135-167): zero padded steps,
    # divide by clamp_min(lengths, 1).
    tx = torch.from_numpy(x)
    tl = torch.from_numpy(lengths)
    mask = (
        torch.arange(x.shape[1]).unsqueeze(0).expand(x.shape[0], -1)
        < tl.unsqueeze(1)
    ).unsqueeze(-1)
    want = (
        (tx * mask).sum(dim=1) / tl.clamp_min(1).to(tx.dtype).unsqueeze(-1)
    ).numpy()

    got = np.asarray(temporal_aggregation(jnp.asarray(x), jnp.asarray(lengths)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # Zero-length row pools to exactly zero, no NaNs.
    assert np.all(got[3] == 0.0)


def test_temporal_aggregation_rejects_bad_shapes():
    with pytest.raises(ValueError):
        temporal_aggregation(jnp.zeros((2, 3)))
    with pytest.raises(ValueError):
        temporal_aggregation(jnp.zeros((2, 3, 4)), jnp.zeros((3,), jnp.int32))
