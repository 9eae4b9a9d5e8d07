"""Benchmark driver: windows/sec/chip on the flagship model.

Measurements (VERDICT r1 asked for the production path and MFU, not just
the bare forward):

1. **Model path** (headline `value`) — the jitted batched bf16 forward on
   pre-staged device arrays: on-chip throughput, comparable across rounds
   and to the BASELINE.json 100 windows/sec/chip north star.
2. **Engine path** — ``ScoringEngine.score_logits`` from host numpy
   (uint8 windows in, fp32 logits out): host->device transfer + pad +
   forward + calibration + readback. On this dev box the accelerator sits
   behind a ~tens-of-MB/s tunnel, so this path is HOST-LINK-bound; the
   measured link bandwidth is reported (`host_link_mbps`) so the number
   can be interpreted (production PCIe is 100-1000x).
3. **Track-gather path** — ``score_track_logits``: a whole track's crops
   upload once as uint8 and 75%-overlapping windows gather on device
   (0.27 MB/window transferred vs 0.88 for materialized windows).
4. **Train step** (round 4) — the fused jitted training step (two
   forwards + three losses + phase-3 optimizer + on-device augmentation,
   the production `--device-cache` recipe) at the canonical batch 32:
   device-resident feed (what device-cache achieves) vs host-fed per step.

ENGINE PROBE CONTRACT (round-4 pin, r3 VERDICT item 5): the engine stage
ships EXACTLY 4 groups x 128 windows of (32,96,96,3) uint8 + (80,128)
float32 = ~474 MB/call, unchanged from round 3. Do not resize this payload
— absolute engine w/s is only comparable across rounds at fixed payload on
this drifting tunnel. The PRIMARY engine metric is
`engine_link_utilization` (measured throughput / same-minute link ceiling,
interleaved probe): ~1.0 certifies the path is link-saturated regardless
of what the link happens to sustain that minute. Absolute
`engine_windows_per_sec` is secondary, interpretable only against its
bracketing `engine_link_mbps_interleaved`.

Timing forces completion with a device->host readback (np.asarray): on the
experimental remote platform, block_until_ready alone has been observed to
return early for repeated identical dispatches.

MFU comes from XLA's compiled cost analysis vs the chip's bf16 peak
(v5e: 197 TFLOP/s, public spec). Prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.perf_counter()


def _progress(msg: str) -> None:
    """Phase markers on stderr (stdout carries only the one JSON line)."""
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


# bf16 peak FLOP/s per chip. v5e: 197e12 (public spec). CPU value is a
# nominal placeholder so the field stays populated in dev runs.
_PEAK_FLOPS = {"tpu": 197e12, "cpu": 1e11}


def _measure(fn, *args, iters=20):
    """Median seconds per call; completion forced via host readback."""
    np.asarray(fn(*args))  # compile/warm (+ finishes any async staging)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _compiled_flops(jitted, *args):
    """FLOPs of one call, from XLA's compiled cost analysis (0 if absent)."""
    try:
        compiled = jitted.lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return 0.0


def _probe_host_link(device) -> float:
    """MB/s of a 64 MB uint8 host->device transfer."""
    buf = np.zeros((64 * 1024 * 1024,), np.uint8)
    jax.block_until_ready(jax.device_put(buf[: 1024], device))  # warm path
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(buf, device))
    return 64.0 / (time.perf_counter() - t0)


def _accelerator_reachable(timeout_s: float = 180.0) -> bool:
    """Probe the configured accelerator platform in a THROWAWAY subprocess.

    The remote axon platform sits behind a tunnel; when that tunnel is
    down, the plugin's claim loop retries for many minutes before
    erroring, which would hang the driver's end-of-round bench run. A
    bounded subprocess probe keeps the parent's jax uninitialized so it
    can still fall back to an honest CPU measurement.
    """
    import subprocess

    try:
        rc = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        ).returncode
        return rc == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    import os

    from lipsync_tpu.inference.engine import ScoringEngine
    from lipsync_tpu.models import LipSyncModel, ModelConfig

    # Dev runs force CPU in-process via jax.config (env vars don't reflect
    # it — CLAUDE.md gotcha); only probe when an accelerator is requested.
    wants_accelerator = (
        (getattr(jax.config, "jax_platforms", None) or "") != "cpu"
        and os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
    )
    fell_back_to_cpu = False
    if wants_accelerator and not _accelerator_reachable():
        _progress("accelerator unreachable -> falling back to CPU")
        jax.config.update("jax_platforms", "cpu")
        fell_back_to_cpu = True

    # Persistent compile cache: every distinct program here costs minutes
    # through the remote compile service; cache hits make re-runs (and the
    # driver's end-of-round run) start in seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    cfg = ModelConfig()
    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = LipSyncModel(cfg, dtype=dtype)

    # 1024 measured 4.5% faster per window than 512 on v5e-1 (3,012 vs
    # 2,883 w/s) and fits HBM comfortably; both programs are in the
    # persistent cache.
    throughput_batch = 1024 if on_tpu else 2
    engine_batch = 128 if on_tpu else 2
    iters = 20 if on_tpu else 3
    rng = np.random.RandomState(0)

    def host_inputs(batch):
        v = rng.rand(batch, cfg.video_frames, cfg.crop_size, cfg.crop_size, 3)
        a = rng.rand(batch, cfg.mel_bins, cfg.audio_frames) * 80.0 - 80.0
        return v.astype(np.float32), a.astype(np.float32)

    v1h, a1h = host_inputs(1)
    # Init on the host CPU backend: parameter init is a one-off whose
    # remote-TPU compile costs minutes; params are tens of MB and
    # device_put to the accelerator afterwards.
    _progress("init params (cpu)")
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(v1h), jnp.asarray(a1h[..., None]),
        )
    variables = jax.device_put(variables, jax.devices()[0])
    fwd = jax.jit(lambda v, a: model.apply(variables, v, a))

    # ---- model path (pre-staged device arrays) ----------------------------
    _progress("single-window path")
    v1 = jnp.asarray(v1h)
    a1 = jnp.asarray(a1h[..., None])
    p50_single = _measure(fwd, v1, a1, iters=iters)
    vbh, abh = host_inputs(throughput_batch)
    _progress("batch path")
    vb = jnp.asarray(vbh)
    ab = jnp.asarray(abh[..., None])
    p50_batch = _measure(fwd, vb, ab, iters=iters)
    model_wps = throughput_batch / p50_batch

    _progress("cost analysis")
    flops_batch = _compiled_flops(fwd, vb, ab)
    flops_per_window = flops_batch / throughput_batch if flops_batch else 0.0
    peak = _PEAK_FLOPS.get(platform, 0.0)
    mfu = (flops_per_window * model_wps / peak) if peak and flops_batch else 0.0

    _progress("host link probe")
    link_mbps = _probe_host_link(jax.devices()[0]) if on_tpu else 0.0

    # ---- engine path (host numpy in, host numpy out) ----------------------
    # 4 max_batch groups so the double-buffered streaming in score_logits
    # (group k+1 uploads while group k computes, engine.max_in_flight) is
    # actually exercised — a single group has nothing to overlap with.
    _progress("engine path")
    engine = ScoringEngine(variables, cfg, max_batch=engine_batch)
    engine_windows = 4 * engine_batch
    veh, aeh = host_inputs(engine_windows)
    veh = (veh * 255.0).astype(np.uint8)
    engine_mb_per_call = veh.nbytes / 1e6 + aeh.nbytes / 1e6
    # The tunneled link's rate drifts up to 10x within minutes (measured
    # 27-425 MB/s on 2026-08-18), so a utilization computed against a
    # probe taken at a different moment can be skewed arbitrarily.
    # Interleave a raw upload probe with each engine iteration and take
    # the median per-iteration ratio (same design as
    # scripts/probe_link_engine.py, which measured median 1.19 — the
    # streamed path beating a blocking upload of the same bytes).
    np.asarray(engine.score_logits(veh, aeh))  # compile/warm
    eng_times, eng_utils, eng_rates = [], [], []
    # Probe with ONE ACTUAL ENGINE GROUP (113 MB random uint8), not the
    # generic 64 MB zeros buffer: the tunnel's sustained rate for large
    # incompressible payloads can differ several-fold from a short
    # probe's transient (measured 122 vs 45 MB/s in the same minute), so
    # only a same-shaped upload gives an apples-to-apples ceiling.
    group_mb = (veh[:engine_batch].nbytes + aeh[:engine_batch].nbytes) / 1e6
    for _ in range(max(3, iters // 4)):
        if on_tpu:
            t0 = time.perf_counter()
            jax.block_until_ready(jnp.asarray(veh[:engine_batch]))
            jax.block_until_ready(jnp.asarray(aeh[:engine_batch]))
            rate = group_mb / (time.perf_counter() - t0)
        else:
            rate = 0.0
        t0 = time.perf_counter()
        np.asarray(engine.score_logits(veh, aeh))
        dt = time.perf_counter() - t0
        eng_times.append(dt)
        if rate > 0:
            # Ceiling of this path on the just-measured link: with double
            # buffering, compute hides behind transfer, so the floor per
            # call is pure upload time. utilization ~1.0 certifies the
            # link is saturated (round-2 VERDICT item 5's alternative
            # "done" criterion).
            ceil_wps = engine_windows / (engine_mb_per_call / rate)
            eng_utils.append((engine_windows / dt) / ceil_wps)
            eng_rates.append(rate)
    p50_engine = float(np.median(eng_times))
    engine_wps = engine_windows / p50_engine
    engine_mfu = (
        (flops_per_window * engine_wps / peak) if peak and flops_batch else 0.0
    )
    link_mbps_eng = float(np.median(eng_rates)) if eng_rates else 0.0
    engine_link_ceiling_wps = (
        engine_windows / (engine_mb_per_call / link_mbps_eng)
        if link_mbps_eng > 0 else 0.0
    )
    engine_link_utilization = (
        float(np.median(eng_utils)) if eng_utils else 0.0
    )

    # ---- engine track path (uint8 single-upload + on-device gather) -------
    # A 32-window track at stride 8: 32*8+32=288 frames of crops uploaded
    # once as uint8; windows gathered inside the compiled program.
    n_windows = 32
    stride = 8  # long-video window stride (reference config.py:21-22)
    n_frames = (n_windows - 1) * stride + cfg.video_frames
    crops = (
        rng.rand(n_frames, cfg.crop_size, cfg.crop_size, 3) * 255
    ).astype(np.uint8)
    starts = [i * stride for i in range(n_windows)]
    audio_w = (rng.rand(n_windows, cfg.mel_bins, cfg.audio_frames) * 80 - 80
               ).astype(np.float32)
    _progress("track gather path")
    p50_track = _measure(
        engine.score_track_logits, crops, starts, audio_w,
        iters=max(3, iters // 2),
    )
    track_wps = n_windows / p50_track

    # ---- shared-track visual encoding (encode frames once, not 4x) --------
    _progress("track shared-encoding path")
    engine_shared = ScoringEngine(
        variables, cfg, max_batch=engine_batch, shared_visual_encoding=True
    )
    p50_track_shared = _measure(
        engine_shared.score_track_logits, crops, starts, audio_w,
        iters=max(3, iters // 2),
    )
    track_shared_wps = n_windows / p50_track_shared

    # ---- train step (r3 VERDICT item 4) ------------------------------------
    # The production TPU recipe: phase-3 optimizer (full unfreeze), device
    # augmentation, canonical batch 32 (the 5k-run recipe, BENCHMARKS.md).
    # Device-resident feed approximates --device-cache steady state (the
    # index gather is ~1% of step FLOPs); the host-fed variant ships the
    # uint8 batch every step, pricing the per-step link cost.
    _progress("train step")
    import optax  # noqa: F401  (transitively required by training.steps)

    from lipsync_tpu.ops.augment import AugmentConfig
    from lipsync_tpu.training.optimizers import make_phase_optimizer
    from lipsync_tpu.training.steps import TrainState, make_train_step

    train_batch = 32 if on_tpu else 2
    optimizer = make_phase_optimizer(3, lr_head=1e-4, lr_encoder=1e-4)
    # Reuse the already-initialized variables; only opt state is new.
    train_model = LipSyncModel(cfg, dtype=dtype)
    t_state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        rng=jax.random.PRNGKey(7),
    )
    train_step = jax.jit(
        make_train_step(train_model, optimizer, augment_cfg=AugmentConfig())
    )
    vth, ath = host_inputs(train_batch)
    vt_u8 = (vth * 255.0).astype(np.uint8)
    labels_h = (rng.rand(train_batch) > 0.5).astype(np.float32)
    batch_dev = {
        "visual": jnp.asarray(vt_u8),
        "audio": jnp.asarray(ath[..., None]),
        "label": jnp.asarray(labels_h),
    }

    def step_device(state):
        new_state, m = train_step(state, batch_dev)
        return m["loss"]

    def step_hostfed(state):
        b = {
            "visual": jnp.asarray(vt_u8),
            "audio": jnp.asarray(ath[..., None]),
            "label": jnp.asarray(labels_h),
        }
        new_state, m = train_step(state, b)
        return m["loss"]

    train_iters = max(5, iters // 2)
    p50_train = _measure(step_device, t_state, iters=train_iters)
    p50_train_hostfed = _measure(step_hostfed, t_state, iters=train_iters)
    train_cps = train_batch / p50_train
    train_flops = _compiled_flops(train_step, t_state, batch_dev)
    train_mfu = (train_flops / p50_train / peak) if peak and train_flops else 0.0

    target = 100.0  # BASELINE.json north star
    print(
        json.dumps(
            {
                "metric": "windows_per_sec_per_chip",
                "value": round(model_wps, 2),
                "unit": "2s-windows/sec",
                "vs_baseline": round(model_wps / target, 3),
                "mfu": round(mfu, 4),
                "flops_per_window": round(flops_per_window),
                # PRIMARY engine metric (see ENGINE PROBE CONTRACT above):
                # utilization of the same-minute link ceiling. Absolute w/s
                # is secondary, valid only against its bracketing rate.
                "engine_link_utilization": round(engine_link_utilization, 3),
                "engine_windows_per_sec": round(engine_wps, 2),
                "engine_mfu": round(engine_mfu, 4),
                "engine_transfer_mb_per_call": round(engine_mb_per_call, 1),
                "engine_probe_contract": "4x128 windows (32,96,96,3)u8+(80,128)f32, pinned r3",
                "host_link_mbps": round(link_mbps, 1),
                "engine_link_mbps_interleaved": round(link_mbps_eng, 1),
                "engine_link_ceiling_wps": round(engine_link_ceiling_wps, 2),
                "engine_transfer_bound": bool(
                    on_tpu
                    and link_mbps_eng > 0
                    and p50_engine
                    > 0.5 * (engine_mb_per_call / link_mbps_eng)
                ),
                "track_gather_windows_per_sec": round(track_wps, 2),
                "track_shared_windows_per_sec": round(track_shared_wps, 2),
                "train_step_ms": round(p50_train * 1e3, 2),
                "train_clips_per_sec": round(train_cps, 2),
                "train_mfu": round(train_mfu, 4),
                "train_step_hostfed_ms": round(p50_train_hostfed * 1e3, 2),
                "train_hostfed_clips_per_sec": round(
                    train_batch / p50_train_hostfed, 2
                ),
                "train_batch": train_batch,
                "p50_single_window_ms": round(p50_single * 1e3, 2),
                "p50_model_batch_ms": round(p50_batch * 1e3, 2),
                "p50_engine_batch_ms": round(p50_engine * 1e3, 2),
                "model_batch": throughput_batch,
                "engine_batch": engine_batch,
                "dtype": str(dtype.__name__),
                "platform": platform,
                **(
                    {
                        "note": "remote accelerator unreachable at run "
                        "time; CPU fallback — not comparable to "
                        "platform=tpu rounds"
                    }
                    if fell_back_to_cpu
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
