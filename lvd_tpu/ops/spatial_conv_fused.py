"""Fused GroupNorm-apply + SiLU + 3x3 spatial conv Pallas kernel (TPU).

Each ResnetBlock stage (reference: diffusers ResnetBlock2D used by
unet_3d_blocks.py) is GroupNorm -> SiLU -> Conv2d(3x3, SAME). Unfused, the
normalized/activated tensor makes a full HBM round-trip between the norm and
the conv, and XLA's conv op runs at 150-190 TF/s against a ~200 TF/s
tile-rounding ceiling (PERF.md round-3 profile: the conv2d family is the
largest in the CFG forward). Here the GroupNorm statistics stay an XLA
reduction (ops.basic.group_norm_coeffs) and one kernel pass applies the
per-channel affine + SiLU and the nine conv taps as row-shifted
(H*W, C) x (C, O) MXU matmuls on the flattened plane:

    y[r] = sum_{dy,dx} z[r + dy*W + dx] @ w[dy+1, dx+1]

with periodic column masks (row % W) zeroing the W-boundary wraps and zero
rows at the H edges — SAME padding exactly.

Each program owns one sample's full (H, W) plane (all UNet levels fit VMEM;
the gate routes anything bigger back to XLA) and a slice of output channels;
the activated plane z lives in a VMEM scratch computed once per sample and
reused across output-channel steps.

Backward recomputes the same shifted-dot formulation in XLA (custom VJP), so
neither the recompute nor the AD-transposed computation pays conv lowering
relayouts (the same trick as ops/temp_conv_fused._unfused_shifted).

MEASURED RESULT (tools/sweep_spatial_conv.py, v5e, round 3): XLA's NHWC conv
already runs the affine+SiLU+conv chain at 147-335 TF/s — the input
elementwise is fused into the conv and there is no separate z round-trip to
recover. This kernel ties XLA at L2 (1.61 vs 1.63 ms), loses slightly at L1
(1.65 vs 1.50) and badly at the tiny L3 plane (1.82 vs 0.19), and the
widest up-block concat shapes exhaust VMEM. It is therefore NOT routed by
default (see unet3d._gn_silu_conv: opt-in via LVD_ENABLE_FUSED_SC=1) and is
kept as the documented negative result for the conv2d family.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .vma import pallas_call as vma_pallas_call
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref, z_ref, *, wdim):
    ci = pl.program_id(1)
    hw, cin = z_ref.shape

    @pl.when(ci == 0)
    def _make_z():
        x = x_ref[0].reshape(hw, cin)
        z = (x.astype(jnp.float32) * a_ref[0, 0].astype(jnp.float32)
             + b_ref[0, 0].astype(jnp.float32))
        z_ref[...] = (z * jax.nn.sigmoid(z)).astype(z_ref.dtype)  # silu

    z = z_ref[...]
    col = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % wdim
    dn = (((1,), (0,)), ((), ()))
    co = o_ref.shape[-1]
    acc = None
    for dx in (-1, 0, 1):
        if dx == -1:
            zz = jnp.where(col != wdim - 1, z, 0)
        elif dx == 1:
            zz = jnp.where(col != 0, z, 0)
        else:
            zz = z
        for dy in (-1, 0, 1):
            s = dy * wdim + dx  # out row r reads input row r + s
            if s > 0:
                op = jnp.concatenate(
                    [zz[s:], jnp.zeros((s, cin), zz.dtype)], axis=0)
            elif s < 0:
                op = jnp.concatenate(
                    [jnp.zeros((-s, cin), zz.dtype), zz[:s]], axis=0)
            else:
                op = zz
            part = jax.lax.dot_general(
                op, w_ref[3 * (dy + 1) + (dx + 1)], dn,
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    acc += bias_ref[0, 0].astype(jnp.float32)[None, :]
    o_ref[0] = acc.reshape(o_ref.shape[1], o_ref.shape[2], co).astype(
        o_ref.dtype)


def _block_co_for(rows: int, cin: int, cout: int, itemsize: int) -> int:
    # Budget the co-dependent live buffers (w block, fp32 acc, out tile)
    # against what remains of ~12 MB after the co-invariant plane buffers
    # (x input + z scratch + one masked/shifted temp).
    fixed = rows * cin * itemsize * 3
    budget = 12 * 1024 * 1024 - fixed
    if budget <= 0:
        return 0
    # Mosaic requires the lane-dim block to be 128-divisible or the full
    # array width, so co candidates are cout itself and 128-multiples.
    for co in (cout, 512, 256, 128):
        if cout % co == 0 and (co == cout or co % 128 == 0) and (
                9 * cin * co * itemsize + 4 * rows * co + rows * co * itemsize
                <= budget):
            return co
    return 0


def _fused(x, a, b, w, bias, *, block_co: int = None, interpret: bool = False):
    """x: (N, H, W, Cin); a, b: (N, Cin) fp32; w: (9, Cin, Cout); bias: (Cout,)."""
    n, h, wdim, cin = x.shape
    cout = w.shape[-1]
    if block_co is None:
        block_co = _block_co_for(h * wdim, cin, cout, x.dtype.itemsize)
    grid = (n, cout // block_co)

    return vma_pallas_call(
        functools.partial(_kernel, wdim=wdim),
        grid=grid,
        scratch_shapes=[pltpu.VMEM((h * wdim, cin), x.dtype)],
        in_specs=[
            pl.BlockSpec((1, h, wdim, cin), lambda ni, ci: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda ni, ci: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda ni, ci: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, block_co), lambda ni, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_co), lambda ni, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, wdim, block_co), lambda ni, ci: (ni, 0, 0, ci),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wdim, cout), x.dtype),
        interpret=interpret,
    )(x, a[:, None, :], b[:, None, :], w, bias[None, None, :])


def _unfused(x, a, b, w, bias):
    """Reference chain: affine + SiLU + conv2d(3x3, SAME) via lax conv."""
    z = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    z = (z * jax.nn.sigmoid(z)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        z, w.reshape(3, 3, w.shape[-2], w.shape[-1]).astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(x.dtype)


def _unfused_shifted(x, a, b, w, bias):
    """Same function expressed as nine masked row-shifted (rows, Cin) dots in
    the native NHWC layout — the VJP recompute target, so the transposed
    computation AD derives stays free of conv-lowering relayouts."""
    n, h, wdim, cin = x.shape
    z = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    z = (z * jax.nn.sigmoid(z)).astype(x.dtype)
    z = z.reshape(n, h * wdim, cin)
    col = (jnp.arange(h * wdim, dtype=jnp.int32) % wdim)[None, :, None]
    wd = w.astype(x.dtype)
    dn = (((2,), (0,)), ((), ()))
    acc = None
    for dx in (-1, 0, 1):
        if dx == -1:
            zz = jnp.where(col != wdim - 1, z, 0)
        elif dx == 1:
            zz = jnp.where(col != 0, z, 0)
        else:
            zz = z
        for dy in (-1, 0, 1):
            s = dy * wdim + dx
            if s > 0:
                op = jnp.concatenate(
                    [zz[:, s:], jnp.zeros((n, s, cin), zz.dtype)], axis=1)
            elif s < 0:
                op = jnp.concatenate(
                    [jnp.zeros((n, -s, cin), zz.dtype), zz[:, :s]], axis=1)
            else:
                op = zz
            part = jax.lax.dot_general(
                op, wd[3 * (dy + 1) + (dx + 1)], dn,
                preferred_element_type=x.dtype)
            acc = part if acc is None else acc + part
    y = acc.reshape(n, h, wdim, -1)
    return y + bias.astype(x.dtype)


@jax.custom_vjp
def _stage(x, a, b, w, bias):
    return _fused(x, a, b, w, bias)


def _stage_fwd(x, a, b, w, bias):
    return _fused(x, a, b, w, bias), (x, a, b, w, bias)


def _stage_bwd(res, g):
    _, vjp = jax.vjp(_unfused_shifted, *res)
    return vjp(g)


_stage.defvjp(_stage_fwd, _stage_bwd)


def supported(x, w) -> bool:
    n, h, wdim, cin = x.shape
    cout = w.shape[-1]
    return (
        jax.default_backend() == "tpu"
        and x.dtype in (jnp.bfloat16, jnp.float32)
        and cin % 8 == 0
        and cout % 8 == 0
        and _block_co_for(h * wdim, cin, cout, x.dtype.itemsize) > 0
    )


def norm_silu_conv2d(x, a, b, conv_w, conv_b):
    """Fused GN-apply + SiLU + 3x3 SAME conv on (N, H, W, Cin); conv_w is the
    HWIO weight (3, 3, Cin, Cout) from the param pytree."""
    w = conv_w.reshape(9, conv_w.shape[-2], conv_w.shape[-1]).astype(x.dtype)
    return _stage(x, a, b, w, conv_b.astype(x.dtype))
