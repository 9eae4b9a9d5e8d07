"""Pallas TPU kernel: fused Laplacian + first high-frequency Conv3d.

The artifact branch's high-frequency stem
(`models/artifact.py` `HighFrequencyDetector`, re-designing reference
`app/models/artifact_detector.py:24-62`) opens with two 3-channel convs:

    lap   = Conv2d(3->3, 3x3, pad 1)           per frame (trainable,
                                               Laplacian-initialized)
    conv1 = Conv3d(3->32, 3x3x3, stride (1,2,2), pad 1) + BN + ReLU

Three input channels are hostile to the TPU conv emitter: operand
layouts pad the channel dim toward the 128-lane tile, so these two ops
run at 0.003 / 0.020 MFU isolated and the HF stem costs ~33 ms of a
179 ms batch-512 fused forward (BENCHMARKS.md round-3 profile — the
single worst stage group; SURVEY §7.8 names exactly this stem as the
hand-kernel candidate; an exact space-to-depth reformulation and an
im2col+matmul XLA variant both measured SLOWER, so the fix needs a
custom kernel, not a re-lowering).

Design:

- grid ``(B, T)``; the whole padded clip block ``(T+2, 3, 98, 98)``
  is indexed by the batch coordinate only, so pallas fetches it from
  HBM once per batch element and reuses it across the inner steps.
- The wrapper lays the clip out channel-planar, so W rides the 128-lane
  axis instead of the 3-wide channel axis (the root cause of the XLA
  path's layout padding).
- Each cell produces one output frame: it computes the Laplacian for
  its 3 contributing frames as 81 unrolled shifted-plane FMAs on the VPU
  (channel mixing is a 3x3 matrix — a dense contraction would waste
  97% of the MXU).
- Laplacian planes are de-interleaved once into four row/column parity
  planes, turning conv1's stride-2 window reads into contiguous
  slices (lane-strided gathers are the expensive operation this kernel
  exists to avoid).
- conv1 is one MXU matmul per cell: the 81 patch columns are stored as
  second-minor rows of a VMEM scratch ref (sublane-masked writes are
  cheap; lane scatters are not), minor-transposed once to put K on
  lanes, and contracted with the prepacked ``(128, 32)`` kernel.
  Inference BatchNorm and ReLU fold into the same pass.

Exactness: the kernel reorders summation but performs the same f32
arithmetic as the XLA reference path; tests pin max |diff| against
``lax.conv_general_dilated`` in f32 (interpret mode on CPU, compiled on
TPU).

**Measured outcome (2026-08-19, v5e-1, batch 256): the kernel LOSES to
XLA — 186 ms vs 48 ms — and is therefore NOT wired into the model.**
It is kept as the documented result of SURVEY §7.8's "hand-write if XLA
underperforms" pass, with the root cause: Mosaic's relayout rules (no
merges into the lane axis, no stride-2 vector slices, lane-scatter
stores masked over whole 128-lane tiles — the first attempt cost 760 ms
before switching to sublane stores) force the 81-column patch assembly
through VPU-heavy staging that swamps the stem's tiny 200 GFLOPs. XLA's
conv emitter, even at 0.02 MFU on channel-padded layouts, moves less
data. The XLA path stays; the measurements live in BENCHMARKS.md
("Pallas kernel pass, round 3").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KPAD = 128      # 81 patch columns padded to one lane tile
_NLAP = 3        # lap frames one output frame needs


def _make_kernel(t: int, hw: int):
    """Kernel closure over the static frame count and crop size."""
    _T, _HW, _HWO = t, hw, hw // 2

    def _hf_stem_kernel(xp_ref, wlap_ref, w1_ref, sc_ref, sh_ref,
                        out_ref, pt_ref):
        c = pl.program_id(1)
        wlap = wlap_ref[:]                         # (3, 3, 8, 8) f32 (dy,dx,ci,co)

        # frames [c, c+3) of the temporally padded clip = lap frames
        # [t-1, t+2) for output frame t=c (ref-level dynamic slice: Mosaic
        # lowers pl.ds on refs, not lax.dynamic_slice on values)
        xc = xp_ref[0, pl.ds(c, _NLAP)].astype(jnp.float32)

        # ── Laplacian: 81 shifted-plane FMAs on the VPU ────────────────────
        laps = []
        for co in range(3):
            acc = jnp.zeros((_NLAP, _HW, _HW), jnp.float32)
            for ci in range(3):
                plane = xc[:, ci]
                for dy in range(3):
                    for dx in range(3):
                        acc = acc + wlap[dy, dx, ci, co] * jax.lax.slice(
                            plane, (0, dy, dx), (_NLAP, dy + _HW, dx + _HW)
                        )
            laps.append(acc)

        # ── de-interleave into row/column parity planes ────────────────────
        # conv1's stride-2 windows over rows 2i+d (d in -1..1) touch only
        #   even[i] (d=0) and odd[i-1], odd[i] (d=-1, +1);
        # one zero guard block-row re-centers the offsets to {0, 1} and
        # doubles as conv1's spatial zero padding (lap row/col -1 and 96).
        # Mosaic has no stride-2 vector slice, so the parity split runs as
        # two matmuls against 0/1 selection matrices — idle-MXU work.
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (_HW, _HWO), 0)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (_HW, _HWO), 1)
        sel = [
            (iota_m == 2 * iota_j + p).astype(jnp.float32) for p in range(2)
        ]  # (96, 48) each
        par = {}
        for co in range(3):
            for pc in range(2):
                # columns: (N, 96, 96) @ (96, 48) -> (N, 96, 48)
                t_c = jax.lax.dot_general(
                    laps[co], sel[pc], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for pr in range(2):
                    # rows: contract dim 1 -> (N, 48cols, 48rows), then
                    # swap the two minor dims back
                    t_r = jax.lax.dot_general(
                        t_c, sel[pr], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    p = jnp.swapaxes(t_r, 1, 2)  # (N, 48r, 48c)
                    par[(co, pr, pc)] = jnp.pad(p, ((0, 0), (1, 1), (1, 1)))

        def tap_block(co, dt, dy, dx):
            # conv1 tap (dt,dy,dx): lap plane co at rows 2i+dy-1, cols
            # 2j+dx-1, local lap frame dt
            d_r, d_c = dy - 1, dx - 1
            pr, pc = d_r & 1, d_c & 1
            orow = (d_r - pr) // 2 + 1  # +1 for the zero guard
            ocol = (d_c - pc) // 2 + 1
            return jax.lax.slice(
                par[(co, pr, pc)],
                (dt, orow, ocol),
                (dt + 1, orow + _HWO, ocol + _HWO),
            ).reshape(_HWO, _HWO)  # (48i, 48j)

        # ── patch tensor via scratch-ref sublane stores + one MXU matmul ───
        # Mosaic cannot merge values INTO the lane axis, and single-LANE
        # scatter stores are masked over whole 128-lane tiles (measured 17x
        # slower than XLA). Storing each tap as a SECOND-MINOR row is
        # sublane-masked — cheap — and one supported minor-dim transpose
        # then puts K on lanes for the matmul; (i, j) sub-merge into M.
        # scratch is not zero-initialized; the pad rows must not hold NaNs
        # (NaN * 0-weight would poison the matmul)
        pt_ref[:, 81:, :] = jnp.zeros((_HWO, _KPAD - 81, _HWO), jnp.float32)
        k = 0
        for dt in range(3):
            for dy in range(3):
                for dx in range(3):
                    for co in range(3):
                        # K rows ordered (dt, dy, dx, ci) to match w1
                        pt_ref[:, k, :] = tap_block(co, dt, dy, dx)
                        k += 1
        pt = jnp.swapaxes(pt_ref[:], 1, 2).reshape(
            _HWO * _HWO, _KPAD
        )  # (2304, 128)
        y = jax.lax.dot_general(
            pt, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2304, 32)
        y = jnp.maximum(y * sc_ref[:] + sh_ref[:], 0.0)
        out_ref[0, 0] = y.reshape(_HWO, _HWO, 32).astype(out_ref.dtype)

    return _hf_stem_kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def hf_stem_fused(
    video: jnp.ndarray,
    wlap: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(BN(conv1(lap(video)))) for the HF stem, one fused kernel.

    video: (B, T, H, H, 3); wlap: (3,3,3,3) HWIO; w1: (3,3,3,3,32)
    THWIO; b1: (32,) conv bias; bn_*: inference BatchNorm parameters.
    Returns (B, T, H/2, H/2, 32) in ``video.dtype``.
    """
    b, t, hw = video.shape[:3]
    assert video.shape[3] == hw and hw % 2 == 0
    hwo = hw // 2

    # channel-planar + temporal/spatial halo pads (fused XLA ops)
    xp = jnp.pad(
        jnp.transpose(video, (0, 1, 4, 2, 3)),
        ((0, 0), (1, 1), (0, 0), (1, 1), (1, 1)),
    )  # (B, 34, 3, 98, 98)

    wlap_p = jnp.zeros((3, 3, 8, 8), jnp.float32)
    wlap_p = wlap_p.at[:, :, :3, :3].set(wlap.astype(jnp.float32))

    # K-major packed conv1 kernel, row order (dt, dy, dx, ci)
    w1f = w1.astype(jnp.float32).reshape(81, 32)
    w1p = jnp.zeros((_KPAD, 32), jnp.float32).at[:81].set(w1f)

    inv = jax.lax.rsqrt(bn_var.astype(jnp.float32) + eps)
    g = bn_scale.astype(jnp.float32)
    scale = (g * inv).reshape(1, 32)
    shift = (
        (b1.astype(jnp.float32) - bn_mean.astype(jnp.float32)) * inv * g
        + bn_bias.astype(jnp.float32)
    ).reshape(1, 32)

    return pl.pallas_call(
        _make_kernel(t, hw),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, t + 2, 3, hw + 2, hw + 2),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 8, 8), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_KPAD, 32), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hwo, hwo, 32),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, t, hwo, hwo, 32), video.dtype
        ),
        scratch_shapes=[pltpu.VMEM((hwo, _KPAD, hwo), jnp.float32)],
        # the defaults cap scoped VMEM at 16 MB; the whole-clip input
        # block (reused across the 32 inner grid steps) plus pipeline
        # double-buffering needs ~32 MB, well within v5e VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, wlap_p, w1p, scale, shift)
