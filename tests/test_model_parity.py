"""Golden-tensor parity tests: our JAX model vs the torch reference.

The reference has no test suite (SURVEY.md §4); parity against its torch
modules at fp32 is our substitute for golden files. Reduced spatial/temporal
geometry keeps this tractable on one CPU core while exercising every module
(conv stacks, striding, pooling, attention, interpolation, artifact branches).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lipsync_tpu.models import (  # noqa: E402
    LipSyncModel,
    ModelConfig,
    torch_state_dict_to_variables,
)
from lipsync_tpu.utils import layout  # noqa: E402

# Small but structurally complete geometry: H=W=48 -> feature map 2x2;
# T=8 frames; mel 80x32 -> audio T'=4 (interpolated to 8 in fusion).
B, T, H, W, F, TA = 2, 8, 48, 48, 80, 32
TOL = 1e-3  # BASELINE.md parity bound; observed ~1e-6 at these scales.


@pytest.fixture(scope="module")
def torch_model(reference_on_path):
    if not reference_on_path:
        pytest.skip("reference repo not available")
    from app.models.lip_sync_model import LipSyncModel as TorchModel

    torch.manual_seed(0)
    return TorchModel().eval()


@pytest.fixture(scope="module")
def inputs(rng):
    vis = rng.rand(B, 3, T, H, W).astype(np.float32)
    aud = (rng.rand(B, 1, F, TA).astype(np.float32) * 80.0) - 80.0
    return vis, aud


def test_end_to_end_logit_parity(torch_model, inputs):
    vis, aud = inputs
    with torch.no_grad():
        t_logits = torch_model(
            torch.from_numpy(vis), torch.from_numpy(aud)
        ).numpy()

    variables = torch_state_dict_to_variables(torch_model.state_dict())
    jm = LipSyncModel(ModelConfig())
    with jax.default_matmul_precision("highest"):
        j_logits = np.asarray(
            jm.apply(
                variables,
                jnp.asarray(layout.visual_from_torch(vis)),
                jnp.asarray(layout.audio_from_torch(aud)),
            )
        )
    assert np.abs(t_logits - j_logits).max() < TOL


def test_intermediate_parity(torch_model, inputs):
    """Per-stage golden comparison via return_aux."""
    vis, aud = inputs
    with torch.no_grad():
        t_vfeat, t_vmap = torch_model.visual_encoder(
            torch.from_numpy(vis), return_map=True
        )
        t_afeat = torch_model.audio_encoder(torch.from_numpy(aud))
        t_vemb, t_aemb = torch_model.projection(t_vfeat, t_afeat)
        t_fused = torch_model.cross_modal(t_vemb, t_aemb)
        t_cls = torch_model.temporal(t_fused)

    variables = torch_state_dict_to_variables(torch_model.state_dict())
    jm = LipSyncModel(ModelConfig())
    with jax.default_matmul_precision("highest"):
        _, aux = jm.apply(
            variables,
            jnp.asarray(layout.visual_from_torch(vis)),
            jnp.asarray(layout.audio_from_torch(aud)),
            return_aux=True,
        )

    np.testing.assert_allclose(
        t_vemb.numpy(), np.asarray(aux["visual_tokens"]), atol=TOL
    )
    np.testing.assert_allclose(
        t_aemb.numpy(), np.asarray(aux["audio_tokens"]), atol=TOL
    )
    np.testing.assert_allclose(
        t_fused.numpy(), np.asarray(aux["fused_tokens"]), atol=TOL
    )
    np.testing.assert_allclose(
        t_cls.numpy(), np.asarray(aux["cls_output"]), atol=TOL
    )


def test_no_artifact_variant(torch_model, inputs, reference_on_path):
    """detect_artifacts=False path (classifier input = CLS only)."""
    from app.models.lip_sync_model import LipSyncModel as TorchModel

    torch.manual_seed(1)
    tm = TorchModel(detect_artifacts=False).eval()
    vis, aud = inputs
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(vis), torch.from_numpy(aud)).numpy()
    variables = torch_state_dict_to_variables(
        tm.state_dict(), detect_artifacts=False
    )
    jm = LipSyncModel(ModelConfig(detect_artifacts=False))
    with jax.default_matmul_precision("highest"):
        j_logits = np.asarray(
            jm.apply(
                variables,
                jnp.asarray(layout.visual_from_torch(vis)),
                jnp.asarray(layout.audio_from_torch(aud)),
            )
        )
    assert np.abs(t_logits - j_logits).max() < TOL


def test_converter_rejects_unknown_keys(torch_model):
    sd = dict(torch_model.state_dict())
    sd["bogus.weight"] = torch.zeros(1)
    with pytest.raises(ValueError, match="Unconverted"):
        torch_state_dict_to_variables(sd)
