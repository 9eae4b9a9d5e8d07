"""PyTorch checkpoint -> JAX variables converter for LipSyncModel.

Maps the reference model's state-dict keys
(`/root/reference/app/models/lip_sync_model.py` composition; torch
``nn.Sequential`` index naming) onto the flax param/batch_stats pytree of
:class:`lipsync_tpu.models.lip_sync_model.LipSyncModel`.

Layout rules:
  Conv3d (O,I,kT,kH,kW) -> (kT,kH,kW,I,O)
  Conv2d (O,I,kH,kW)    -> (kH,kW,I,O)
  Conv1d (O,I,k)        -> (k,I,O)
  Linear (O,I)          -> (I,O)
  MHA in_proj_weight (3D,D) -> split into q/k/v (D,D), transposed
  BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats

Accepts raw state dicts or the reference's checkpoint wrappers
(``model_state_dict`` / ``state_dict``, predictor.py:187-194).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

Array = np.ndarray
Tree = Dict[str, Any]


def _unwrap_state_dict(ckpt: Mapping[str, Any]) -> Mapping[str, Any]:
    for key in ("model_state_dict", "state_dict"):
        if key in ckpt:
            return ckpt[key]
    return ckpt


def _np(t) -> Array:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def _set(tree: Tree, path: Tuple[str, ...], value: Array) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Builder:
    def __init__(self, sd: Mapping[str, Any]):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.params: Tree = {}
        self.stats: Tree = {}
        self.used: set = set()

    def take(self, key: str) -> Array:
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    # --- primitive mappers -------------------------------------------------
    def conv(self, tkey: str, path: Tuple[str, ...]) -> None:
        w = self.take(tkey + ".weight")
        axes = tuple(range(2, w.ndim)) + (1, 0)
        _set(self.params, path + ("kernel",), np.transpose(w, axes))
        if self.has(tkey + ".bias"):
            _set(self.params, path + ("bias",), self.take(tkey + ".bias"))

    def bn(self, tkey: str, path: Tuple[str, ...]) -> None:
        _set(self.params, path + ("scale",), self.take(tkey + ".weight"))
        _set(self.params, path + ("bias",), self.take(tkey + ".bias"))
        _set(self.stats, path + ("mean",), self.take(tkey + ".running_mean"))
        _set(self.stats, path + ("var",), self.take(tkey + ".running_var"))
        self.used.add(tkey + ".num_batches_tracked")

    def linear(self, tkey: str, path: Tuple[str, ...]) -> None:
        _set(self.params, path + ("kernel",), self.take(tkey + ".weight").T)
        if self.has(tkey + ".bias"):
            _set(self.params, path + ("bias",), self.take(tkey + ".bias"))

    def layernorm(self, tkey: str, path: Tuple[str, ...]) -> None:
        _set(self.params, path + ("scale",), self.take(tkey + ".weight"))
        _set(self.params, path + ("bias",), self.take(tkey + ".bias"))

    def mha(self, tkey: str, path: Tuple[str, ...]) -> None:
        w = self.take(tkey + ".in_proj_weight")
        b = self.take(tkey + ".in_proj_bias")
        d = w.shape[1]
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(self.params, path + (name, "kernel"), w[i * d : (i + 1) * d].T)
            _set(self.params, path + (name, "bias"), b[i * d : (i + 1) * d])
        self.linear(tkey + ".out_proj", path + ("out_proj",))

    # --- composite mappers -------------------------------------------------
    def conv_bn(self, tconv: str, tbn: str, path: Tuple[str, ...]) -> None:
        self.conv(tconv, path + ("conv",))
        self.bn(tbn, path + ("bn",))

    def residual_block(self, tkey: str, path: Tuple[str, ...]) -> None:
        # conv1 is _Conv*BNReLU (Sequential idx 0=conv, 1=bn); conv2 is
        # Sequential(conv, bn); downsample Sequential(conv, bn) if present.
        self.conv_bn(tkey + ".conv1.0", tkey + ".conv1.1", path + ("conv1",))
        self.conv_bn(tkey + ".conv2.0", tkey + ".conv2.1", path + ("conv2",))
        if self.has(tkey + ".downsample.0.weight"):
            self.conv_bn(
                tkey + ".downsample.0", tkey + ".downsample.1", path + ("downsample",)
            )

    def encoder(self, tkey: str, path: Tuple[str, ...]) -> None:
        self.conv_bn(tkey + ".stem.0", tkey + ".stem.1", path + ("stem",))
        for i in range(1, 5):
            self.residual_block(tkey + f".layer{i}", path + (f"layer{i}",))

    def transformer_layer(self, tkey: str, path: Tuple[str, ...]) -> None:
        self.mha(tkey + ".self_attn", path + ("self_attn",))
        self.linear(tkey + ".linear1", path + ("linear1",))
        self.linear(tkey + ".linear2", path + ("linear2",))
        self.layernorm(tkey + ".norm1", path + ("norm1",))
        self.layernorm(tkey + ".norm2", path + ("norm2",))


def torch_state_dict_to_variables(
    ckpt: Mapping[str, Any],
    num_temporal_layers: int = 4,
    detect_artifacts: bool = True,
) -> Dict[str, Tree]:
    """Convert a reference checkpoint/state-dict into flax ``variables``."""
    sd = _unwrap_state_dict(ckpt)
    b = _Builder(sd)

    b.encoder("visual_encoder", ("visual_encoder",))
    b.encoder("audio_encoder", ("audio_encoder",))

    b.linear("projection.visual_proj", ("projection", "visual_proj"))
    b.linear("projection.audio_proj", ("projection", "audio_proj"))

    b.mha("cross_modal.v2a_attn", ("cross_modal", "v2a_attn"))
    b.mha("cross_modal.a2v_attn", ("cross_modal", "a2v_attn"))
    b.linear("cross_modal.gate.0", ("cross_modal", "gate_fc1"))
    b.linear("cross_modal.gate.2", ("cross_modal", "gate_fc2"))
    b.linear("cross_modal.fuse.0", ("cross_modal", "fuse_fc"))

    _set(b.params, ("temporal", "cls_token"), b.take("temporal.cls_token"))
    for k in (3, 5, 7):
        b.conv(f"temporal.branch_k{k}.0", ("temporal", f"branch_k{k}_conv"))
        b.bn(f"temporal.branch_k{k}.1", ("temporal", f"branch_k{k}_bn"))
    b.linear("temporal.pre_scale_proj", ("temporal", "pre_scale_proj"))
    for i in range(num_temporal_layers):
        b.transformer_layer(
            f"temporal.transformer.layers.{i}", ("temporal", f"layer_{i}")
        )

    if detect_artifacts:
        td = ("artifact_detector", "temporal_detector")
        b.conv_bn(
            "artifact_detector.temporal_detector.temporal_conv.0",
            "artifact_detector.temporal_detector.temporal_conv.1",
            td + ("conv1",),
        )
        b.conv_bn(
            "artifact_detector.temporal_detector.temporal_conv.3",
            "artifact_detector.temporal_detector.temporal_conv.4",
            td + ("conv2",),
        )
        hf = ("artifact_detector", "high_freq_detector")
        b.conv("artifact_detector.high_freq_detector.laplacian", hf + ("laplacian",))
        b.conv_bn(
            "artifact_detector.high_freq_detector.conv3d.0",
            "artifact_detector.high_freq_detector.conv3d.1",
            hf + ("conv1",),
        )
        b.conv_bn(
            "artifact_detector.high_freq_detector.conv3d.3",
            "artifact_detector.high_freq_detector.conv3d.4",
            hf + ("conv2",),
        )
        b.linear(
            "artifact_detector.artifact_fusion.0", ("artifact_detector", "fusion_fc1")
        )
        b.linear(
            "artifact_detector.artifact_fusion.2", ("artifact_detector", "fusion_fc2")
        )

    # ClassificationHead: Sequential(Linear, GELU, Dropout, LayerNorm, Linear).
    b.linear("classifier.net.0", ("classifier", "fc1"))
    b.layernorm("classifier.net.3", ("classifier", "norm"))
    b.linear("classifier.net.4", ("classifier", "fc2"))

    unused = set(b.sd) - b.used
    unused = {k for k in unused if not k.endswith("num_batches_tracked")}
    if unused:
        raise ValueError(f"Unconverted reference parameters: {sorted(unused)[:10]}")

    import jax.numpy as jnp  # local import keeps this module torch/numpy-only

    to_jnp = lambda tree: {
        k: to_jnp(v) if isinstance(v, dict) else jnp.asarray(v)
        for k, v in tree.items()
    }
    return {"params": to_jnp(b.params), "batch_stats": to_jnp(b.stats)}


def load_torch_checkpoint(path: str, **kwargs) -> Dict[str, Tree]:
    """Load a ``.pth`` checkpoint file and convert it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return torch_state_dict_to_variables(ckpt, **kwargs)
