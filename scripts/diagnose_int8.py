"""Int8 root-cause diagnostic: why is the int8 conv lowering speed-neutral?

VERDICT r3 item 8 / r4 weak #1: `Int8Conv` targets the v5e MXU's int8
peak (2x bf16 FLOP/s), yet the end-to-end A/B (`scripts/bench_int8.py`,
docs/eval/int8_speed_tpu.json) measures 1.03x at batch 512 — an
unexplained 2x left on the table. This script isolates the three possible
sinks, cheapest-to-riskiest, and appends each stage's result to the
output JSON AS IT COMPLETES so a TPU-worker crash preserves the earlier
stages (a previous 4096^3 int8 GEMM probe crashed the axon worker —
CLAUDE.md; sizes here are capped at 2048 and the cap is a hard CLI
clamp).

  gemm   — raw int8xint8->int32 vs bf16 matmul TOP/s at 512..2048^3:
           does XLA reach the 2x int8 peak on plain dots at all?
  conv   — the model's actual encoder conv shapes, three ways:
           bf16 conv; int8 conv fed PRE-QUANTIZED tensors (pure conv
           cost); the full Int8Conv quantize->conv->dequantize. Separates
           "int8 convs don't hit the int8 MXU path" from "the quant ops
           eat the win".
  quant  — quantize/dequantize op cost alone at model activation sizes
           (abs-max reduction + scale + round + clip + cast).

RUN THIS LAST in a session (after anything you cannot afford to re-run):
the worker restarts after a crash but in-flight state on it is lost.

Usage:
    python scripts/diagnose_int8.py --out docs/eval/int8_diagnosis.json \
        [--stages gemm,conv,quant] [--batch 256] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _measure(fn, *args, iters=10):
    np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _flush(out_path: Path, result: dict) -> None:
    out_path.write_text(json.dumps(result, indent=1))


def stage_gemm(result: dict, args, out_path: Path) -> None:
    """Raw matmul peak: int8xint8->int32 vs bf16 at n^3, n<=2048."""
    rows = []
    rng = np.random.RandomState(0)
    for n in (512, 1024, 2048):
        if n > args.max_dim:
            continue
        a8 = rng.randint(-127, 128, size=(n, n)).astype(np.int8)
        b8 = rng.randint(-127, 128, size=(n, n)).astype(np.int8)
        abf = jnp.asarray(rng.randn(n, n), jnp.bfloat16)
        bbf = jnp.asarray(rng.randn(n, n), jnp.bfloat16)

        dot_i8 = jax.jit(functools.partial(
            jax.lax.dot, preferred_element_type=jnp.int32))
        dot_bf = jax.jit(functools.partial(
            jax.lax.dot, preferred_element_type=jnp.bfloat16))
        t_i8 = _measure(dot_i8, jnp.asarray(a8), jnp.asarray(b8),
                        iters=args.iters)
        t_bf = _measure(dot_bf, abf, bbf, iters=args.iters)
        flops = 2.0 * n ** 3
        row = {
            "n": n,
            "int8_tops": round(flops / t_i8 / 1e12, 2),
            "bf16_tops": round(flops / t_bf / 1e12, 2),
            "int8_over_bf16": round(t_bf / t_i8, 3),
        }
        print(f"[gemm] {row}", file=sys.stderr, flush=True)
        rows.append(row)
        result.setdefault("gemm", {})["rows"] = rows
        _flush(out_path, result)


# The encoder conv shapes that carry the model's conv FLOPs
# (models/visual.py stem + stages, models/audio.py stem + stages);
# (name, input NHWC/NDHWC shape sans batch, kernel, cin, cout, stride).
CONV_SHAPES = [
    ("v_stem", (32, 96, 96, 3), (3, 7, 7), 3, 64, (1, 2, 2)),
    ("v_l1", (32, 24, 24, 64), (3, 3, 3), 64, 64, (1, 1, 1)),
    ("v_l2", (32, 24, 24, 64), (3, 3, 3), 64, 128, (1, 2, 2)),
    ("v_l3", (32, 12, 12, 128), (3, 3, 3), 128, 256, (1, 2, 2)),
    ("v_l4", (32, 6, 6, 256), (3, 3, 3), 256, 256, (1, 1, 1)),
    ("a_stem", (80, 128, 1), (7, 7), 1, 64, (2, 2)),
    ("a_l2", (20, 32, 64), (3, 3), 64, 128, (2, 2)),
]


def _conv(x, k, strides, preferred):
    spatial = "DHW"[3 - (x.ndim - 2):]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
    pads = tuple((d // 2, d // 2) for d in k.shape[:-2])
    return jax.lax.conv_general_dilated(
        x, k, window_strides=strides, padding=pads,
        dimension_numbers=dn, preferred_element_type=preferred)


def stage_conv(result: dict, args, out_path: Path) -> None:
    """Per-shape conv cost: bf16 vs pre-quantized int8 vs full Int8Conv
    (quantize -> conv -> dequantize)."""
    rng = np.random.RandomState(1)
    rows = []
    shapes = CONV_SHAPES
    if args.shapes:
        keep = set(args.shapes.split(","))
        shapes = [s for s in CONV_SHAPES if s[0] in keep]
    for name, ishape, ks, cin, cout, strides in shapes:
        b = args.batch
        x = rng.randn(b, *ishape).astype(np.float32)
        k = rng.randn(*ks, cin, cout).astype(np.float32) * 0.05

        xbf = jnp.asarray(x, jnp.bfloat16)
        kbf = jnp.asarray(k, jnp.bfloat16)
        x8 = jnp.asarray(np.clip(np.round(x * 20), -127, 127), jnp.int8)
        k8 = jnp.asarray(np.clip(np.round(k * 500), -127, 127), jnp.int8)

        conv_bf = jax.jit(lambda a, w, s=strides: _conv(
            a, w, s, jnp.bfloat16))
        conv_i8 = jax.jit(lambda a, w, s=strides: _conv(
            a, w, s, jnp.int32))

        def full_int8(a, w, s=strides):
            # The Int8Conv recipe (models/layers.py): dynamic per-tensor
            # activation scale, per-channel weight scale, int8 conv,
            # fused dequant multiply.
            w32 = w.astype(jnp.float32)
            w_scale = jnp.maximum(jnp.max(
                jnp.abs(w32), axis=tuple(range(w32.ndim - 1))) / 127.0,
                1e-12)
            wq = jnp.clip(jnp.round(w32 / w_scale), -127, 127).astype(
                jnp.int8)
            a32 = a.astype(jnp.float32)
            a_scale = jnp.maximum(jnp.max(jnp.abs(a32)) / 127.0, 1e-12)
            aq = jnp.clip(jnp.round(a32 / a_scale), -127, 127).astype(
                jnp.int8)
            y = _conv(aq, wq, s, jnp.int32)
            return y.astype(jnp.float32) * (a_scale * w_scale)

        full_i8 = jax.jit(full_int8)

        t_bf = _measure(conv_bf, xbf, kbf, iters=args.iters)
        t_i8 = _measure(conv_i8, x8, k8, iters=args.iters)
        t_full = _measure(full_i8, xbf, kbf, iters=args.iters)
        # FLOPs: 2 * out_elems * cin * prod(ks)
        out_spatial = []
        for d, s_, kk in zip(ishape[:-1], strides, ks):
            out_spatial.append((d + s_ - 1) // s_)
        out_elems = b * int(np.prod(out_spatial)) * cout
        flops = 2.0 * out_elems * cin * int(np.prod(ks))
        row = {
            "shape": name,
            "bf16_ms": round(t_bf * 1e3, 2),
            "int8_prequant_ms": round(t_i8 * 1e3, 2),
            "int8_full_ms": round(t_full * 1e3, 2),
            "bf16_tops": round(flops / t_bf / 1e12, 2),
            "int8_prequant_tops": round(flops / t_i8 / 1e12, 2),
            "prequant_speedup_vs_bf16": round(t_bf / t_i8, 3),
            "full_speedup_vs_bf16": round(t_bf / t_full, 3),
            "quant_overhead_ms": round((t_full - t_i8) * 1e3, 2),
        }
        print(f"[conv] {row}", file=sys.stderr, flush=True)
        rows.append(row)
        result.setdefault("conv", {"batch": args.batch})["rows"] = rows
        _flush(out_path, result)


def stage_quant(result: dict, args, out_path: Path) -> None:
    """Quantize+dequantize cost alone at model activation sizes."""
    rng = np.random.RandomState(2)
    rows = []
    for name, ishape, *_ in CONV_SHAPES[:4]:
        x = jnp.asarray(rng.randn(args.batch, *ishape), jnp.bfloat16)

        def qdq(a):
            a32 = a.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(a32)) / 127.0, 1e-12)
            q = jnp.clip(jnp.round(a32 / s), -127, 127).astype(jnp.int8)
            return q.astype(jnp.float32) * s

        t = _measure(jax.jit(qdq), x, iters=args.iters)
        mb = float(np.prod(x.shape)) * 2 / 1e6
        row = {"shape": name, "qdq_ms": round(t * 1e3, 2),
               "activation_mb_bf16": round(mb, 1),
               "effective_gbps": round(mb / 1e3 / t, 1)}
        print(f"[quant] {row}", file=sys.stderr, flush=True)
        rows.append(row)
        result.setdefault("quant", {"batch": args.batch})["rows"] = rows
        _flush(out_path, result)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="gemm,conv,quant")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--max-dim", type=int, default=2048,
                   help="hard cap on GEMM size (4096 crashed the worker)")
    p.add_argument("--shapes", default=None,
                   help="comma list filtering the conv-stage shapes")
    p.add_argument("--out", type=Path,
                   default=Path("docs/eval/int8_diagnosis.json"))
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    args.max_dim = min(args.max_dim, 2048)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / "tests" / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    platform = jax.devices()[0].platform
    result = {"platform": platform, "batch": args.batch,
              "v5e_bf16_peak_tops": 197, "v5e_int8_peak_tops": 394}
    args.out.parent.mkdir(parents=True, exist_ok=True)
    for stage in args.stages.split(","):
        print(f"[diagnose_int8] stage {stage}", file=sys.stderr, flush=True)
        {"gemm": stage_gemm, "conv": stage_conv, "quant": stage_quant}[
            stage.strip()](result, args, args.out)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
