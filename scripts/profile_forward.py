"""Per-submodule timing of the flagship forward (SURVEY §7.8 follow-up).

The round-1 question left open (VERDICT weak #7): is any op group slow
enough to justify a hand-written Pallas kernel? This times each stage of
the model standalone at the production batch/precision and compares the
sum against the fused full-model forward, and reports each stage's MFU
from XLA's compiled cost analysis. Decision rule from the VERDICT: write
a kernel only for a stage measurably below ~40% MFU that also dominates
wall time; otherwise record the numbers and stop.

Usage:  python scripts/profile_forward.py [--batch 512]
Writes one JSON report to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lipsync_tpu.models import ModelConfig  # noqa: E402
from lipsync_tpu.models.audio_encoder import AudioEncoder  # noqa: E402
from lipsync_tpu.models.artifact import ArtifactDetector  # noqa: E402
from lipsync_tpu.models.classifier import ClassificationHead  # noqa: E402
from lipsync_tpu.models.fusion import (  # noqa: E402
    CrossModalAttention,
    FeatureProjection,
)
from lipsync_tpu.models.lip_sync_model import LipSyncModel  # noqa: E402
from lipsync_tpu.models.temporal import TemporalTransformer  # noqa: E402
from lipsync_tpu.models.visual_encoder import VisualEncoder  # noqa: E402

PEAK = {"tpu": 197e12, "cpu": 1e11}


def _time(fn, *args, iters=10):
    """Median seconds per call, completion forced by a scalar readback.

    ``jax.block_until_ready`` is NOT a reliable completion barrier on the
    remote axon runtime — a 905 MB conv "completed" in 50 us under it
    (measured 2026-08-18) while a readback-forced timing of the same
    program took ~21 ms + RTT. Summing to a scalar and pulling it to the
    host forces real completion at the cost of one fused reduction; the
    ~23-25 ms tunnel round-trip floor rides on every sample (reported
    separately as ``rtt_floor_ms`` so readers can subtract it — stages
    near the floor are dispatch-bound, not compute-bound).
    """
    def run():
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))

    run()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _flops(jitted, *args):
    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_module(module, *inputs, rngs=None, iters=10, **apply_kw):
    # Init at batch-1 on the host CPU (param shapes are batch-independent);
    # pass variables as a jit ARGUMENT, not a closure — closed-over arrays
    # are embedded as compile-time constants, which exhausts device memory
    # for the larger modules at batch 512.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        small = [x[:1] for x in inputs]
        variables = module.init(jax.random.PRNGKey(0), *small, **apply_kw)
    variables = jax.device_put(variables, jax.devices()[0])
    fn = jax.jit(lambda vs, *a: module.apply(vs, *a, **apply_kw))
    t = _time(fn, variables, *inputs, iters=iters)
    f = _flops(fn, variables, *inputs)
    return t, f


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--artifact-detail", action="store_true",
                   help="additionally profile the artifact branch's "
                        "sub-stages (temporal detector, Laplacian conv, "
                        "HF conv1/conv2) to localize its low MFU "
                        "(SURVEY §7.8: Laplacian+Conv3d is a Pallas "
                        "candidate)")
    args = p.parse_args()

    cfg = ModelConfig()
    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    peak = PEAK.get(platform, 0.0)
    b = args.batch if on_tpu else 2
    rng = np.random.RandomState(0)

    visual = jnp.asarray(
        rng.rand(b, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3),
        jnp.float32,
    )
    audio = jnp.asarray(
        rng.rand(b, cfg.mel_bins, cfg.audio_frames, 1) * 80 - 80, jnp.float32
    )
    t_tokens = cfg.video_frames
    tokens = jnp.asarray(rng.rand(b, t_tokens, cfg.embed_dim), dtype)
    v_feat = jnp.asarray(rng.rand(b, cfg.visual_feature_dim, t_tokens), dtype)
    a_feat = jnp.asarray(rng.rand(b, cfg.audio_feature_dim, t_tokens), dtype)
    v_map = jnp.asarray(
        rng.rand(b, t_tokens, 3, 3, cfg.visual_feature_dim), dtype
    )
    cls_vec = jnp.asarray(rng.rand(b, cfg.embed_dim), dtype)
    combined = jnp.asarray(rng.rand(b, cfg.embed_dim + 128), dtype)

    stages = {}

    def add(name, module, *inputs, **kw):
        # Stream each stage to stderr as it lands: remote compiles cost
        # minutes per stage, so a bounded run killed mid-way still leaves
        # every completed row on record.
        print(f"[profile] {name}...", file=sys.stderr, flush=True)
        t, f = bench_module(module, *inputs, iters=args.iters, **kw)
        stages[name] = {
            "ms": round(t * 1e3, 2),
            "gflops": round(f / 1e9, 1),
            "mfu": round(f / t / peak, 4) if peak and f else None,
        }
        print(f"[profile] {name}: {json.dumps(stages[name])}",
              file=sys.stderr, flush=True)

    add("visual_encoder",
        VisualEncoder(feature_dim=cfg.visual_feature_dim, dtype=dtype),
        visual, return_map=True)
    add("audio_encoder",
        AudioEncoder(feature_dim=cfg.audio_feature_dim,
                     preserve_audio_temporal=True, dtype=dtype),
        audio)
    add("projection",
        FeatureProjection(embed_dim=cfg.embed_dim, dtype=dtype),
        v_feat, a_feat)
    add("cross_modal",
        CrossModalAttention(embed_dim=cfg.embed_dim,
                            num_heads=cfg.cross_modal_heads, dtype=dtype),
        tokens, tokens)
    add("temporal",
        TemporalTransformer(embed_dim=cfg.embed_dim,
                            num_heads=cfg.temporal_heads,
                            num_layers=cfg.temporal_layers, dtype=dtype),
        tokens)
    add("artifact",
        ArtifactDetector(visual_feature_dim=cfg.visual_feature_dim,
                         embed_dim=cfg.embed_dim, dtype=dtype),
        v_map, cls_vec, visual.astype(dtype))
    add("classifier",
        ClassificationHead(hidden_dim=128, dtype=dtype), combined)

    if args.artifact_detail:
        from flax import linen as fl_nn

        from lipsync_tpu.models.artifact import (
            HighFrequencyDetector,
            TemporalInconsistencyDetector,
            _laplacian_kernel_3ch,
        )
        from lipsync_tpu.models.layers import ConvBNAct

        vid = visual.astype(dtype)
        add("artifact/temporal_detector",
            TemporalInconsistencyDetector(cfg.visual_feature_dim,
                                          dtype=dtype), v_map)
        add("artifact/high_freq", HighFrequencyDetector(64, dtype=dtype),
            vid)
        frames = vid.reshape(-1, cfg.crop_size, cfg.crop_size, 3)
        add("artifact/hf_laplacian",
            fl_nn.Conv(3, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                       use_bias=False,
                       kernel_init=lambda *_:
                       jnp.asarray(_laplacian_kernel_3ch()),
                       dtype=dtype),
            frames)
        add("artifact/hf_conv1",
            ConvBNAct(32, kernel_size=(3, 3, 3), strides=(1, 2, 2),
                      padding=((1, 1),) * 3, use_bias=True, dtype=dtype),
            vid)
        hf1 = jnp.asarray(
            rng.rand(b, cfg.video_frames, cfg.crop_size // 2,
                     cfg.crop_size // 2, 32), dtype)
        add("artifact/hf_conv2",
            ConvBNAct(64, kernel_size=(3, 3, 3), strides=(1, 2, 2),
                      padding=((1, 1),) * 3, use_bias=True, dtype=dtype),
            hf1)

    model = LipSyncModel(cfg, dtype=dtype)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0),
                               np.asarray(visual[:1]), np.asarray(audio[:1]))
    variables = jax.device_put(variables, jax.devices()[0])
    full = jax.jit(lambda vs, v, a: model.apply(vs, v, a))
    t_full = _time(full, variables, visual, audio, iters=args.iters)
    f_full = _flops(full, variables, visual, audio)

    # Dispatch/readback floor of this host<->device link: a trivial
    # program timed the same way. Stage rows within ~a few ms of this are
    # dispatch-bound; subtract it when comparing stage costs.
    rtt_floor = _time(jax.jit(lambda v: v[:1, :1, :1, :1] * 1.0), visual,
                      iters=args.iters)

    total_stage_ms = sum(s["ms"] for s in stages.values())
    report = {
        "batch": b,
        "platform": platform,
        "dtype": str(dtype.__name__),
        "rtt_floor_ms": round(rtt_floor * 1e3, 2),
        "stages": stages,
        "full_forward_ms": round(t_full * 1e3, 2),
        "full_gflops": round(f_full / 1e9, 1),
        "full_mfu": round(f_full / t_full / peak, 4) if peak and f_full else None,
        "sum_of_stages_ms": round(total_stage_ms, 2),
        "fusion_gain_ms": round(total_stage_ms - t_full * 1e3, 2),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
