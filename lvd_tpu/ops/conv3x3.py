"""Pallas 3x3 SAME conv for the L0-shaped spatial resnets.

Why: XLA's conv emitter runs the L0 zeroscope shapes (40x72 spatial) at
117-148 TF/s while the same emitter hits 195-205 TF/s at L1/L2
(tools/sweep_conv_gn.py, round 4) — ~10 ms/step of measured headroom. Every
XLA-level reshaping attack (spatial padding 40->48/72->80, H/W transpose,
Cin-split, tap-dots) was measured flat or worse (tools/sweep_conv_l0.py,
round 5), so this kernel expresses the conv as 9 resident-weight matmuls:

  grid (BF, H/bm); per instance an overlapping (bm+2, W+2, C) row window
  (pl.Element start index) of the once-padded input, 9 shifted
  (bm*(W+2), C) @ (C, N) dots accumulated in fp32, one (bm, W, N) store.

The W-axis shifts reuse the full padded width per dot (2.8% FLOP
overcompute at W=72) so every reshape is a contiguous leading-dim
collapse. The one-time XLA pad of the input costs one extra read+write of
the activation stream — priced into the sweep before routing anything
through this kernel (tools/sweep_conv_l0.py pallas rows).

MEASURED REJECTION (round 5, real v5e chip): this kernel runs 78-87 TF/s
at every L0 shape and block size (960->320: 8.74/8.83 ms at bm=8/10;
640->320: 6.46/6.55; 320->320: 3.02/3.04 at bm=8/20) vs XLA's emitter at
110-148 — the 9 per-tap fp32 value slices on the second-minor axis force
a Mosaic vector relayout each, and the alternatives (sublane-misaligned
row-shift accumulates, W-major layouts needing an input transpose) cost
as much as they save. NOT routed into the model; kept as the recorded
experiment with its interpret test and on-chip selfcheck. XLA's L0 conv
throughput stands as the measured floor (PERF.md round 5).

Reference counterpart: the spatial resnet convs inside the 3D UNet blocks
(reference models/unet_3d_blocks.py via diffusers ResnetBlock2D); there
they are cuDNN calls — on TPU the kernel-vs-emitter tradeoff is ours to
make per shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vma import pallas_call as vma_pallas_call


def _conv_kernel(x_ref, w_ref, o_ref, *, bm: int, w_dim: int):
    """x_ref: (1, bm+2, W+2, C); w_ref: (9, C, N); o_ref: (bm, W, N)."""
    acc = None
    for dy in range(3):
        v = x_ref[0, dy : dy + bm, :, :]  # (bm, W+2, C)
        vm = v.reshape(bm * (w_dim + 2), v.shape[-1])
        for dx in range(3):
            y = jax.lax.dot_general(
                vm, w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(bm, w_dim + 2, -1)[:, dx : dx + w_dim, :]
            acc = y if acc is None else acc + y
    o_ref[...] = acc.astype(o_ref.dtype)


def _conv3x3_pallas(x, w, *, bm: int = 8, interpret: bool = False):
    bf, h, wd, c = x.shape
    n = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.reshape(9, c, n)
    grid = (bf, pl.cdiv(h, bm))
    return vma_pallas_call(
        functools.partial(_conv_kernel, bm=bm, w_dim=wd),
        grid=grid,
        in_specs=[
            # Mosaic requires every dim to be Element once one is — the
            # overlapping row window (stride bm < size bm+2) forces
            # element-indexed starts on all four dims.
            pl.BlockSpec(
                (pl.Element(1), pl.Element(bm + 2), pl.Element(wd + 2),
                 pl.Element(c)),
                lambda b, i: (b, i * bm, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9, c, n), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), pl.Blocked(bm), pl.Blocked(wd), pl.Blocked(n)),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bf, h, wd, n), x.dtype),
        interpret=interpret,
    )(xp, w9)


def supported(x, w) -> bool:
    """Gate: TPU backend, NHWC bf16-friendly shapes, resident weights and
    one double-buffered halo window within the ~16 MB VMEM budget."""
    if jax.default_backend() != "tpu":
        return False
    if x.ndim != 4 or w.shape[:2] != (3, 3):
        return False
    bf, h, wd, c = x.shape
    n = w.shape[-1]
    if h % 8 or c % 64 or n % 64:
        return False
    bm = 8
    weights = 9 * c * n * x.dtype.itemsize
    window = 2 * (bm + 2) * (wd + 2) * c * x.dtype.itemsize  # double-buffer
    acc = bm * wd * n * 4
    out = 2 * bm * wd * n * x.dtype.itemsize
    return weights + window + acc + out <= 14 * 1024 * 1024


def conv3x3(x, w, *, interpret: bool = False):
    """3x3 stride-1 SAME NHWC conv: x (BF, H, W, C) * w (3, 3, C, N)."""
    if not (interpret or supported(x, w)):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _conv3x3_pallas(x, w, interpret=interpret)
