"""Fused GroupNorm-apply + SiLU + (3,1,1) temporal conv Pallas kernel (TPU).

Each TemporalConvLayer stage (reference: diffusers TemporalConvLayer, used by
unet_3d_blocks.py via `temp_convs`) is GroupNorm -> SiLU -> Conv3d((3,1,1)).
Unfused, the normalized/activated tensor makes a full HBM round-trip between
the norm and the conv. Here the GroupNorm statistics stay an XLA reduction
(one read of x; see ops.basic.group_norm_coeffs), and a single kernel pass
applies the per-channel affine + SiLU and the 3-tap temporal conv: each block
holds all F frames of a pixel tile, so the frame shifts are VMEM slices and
the conv is three (F*bp, C) x (C, C) MXU matmuls.

Backward recomputes the unfused formulation (custom VJP), preserving exact
unfused-gradient semantics for training and the guidance grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .vma import pallas_call as vma_pallas_call
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref, *, nb: int = 1):
    # nb > 1 splits the pixel tile into chunks and computes chunk k+1's
    # affine+SiLU (VPU) ahead of chunk k's 3 taps (MXU) in program order, so
    # Mosaic overlaps the units instead of serializing the silu pass with
    # the dots (measured L0: 0.70 -> 0.58 ms/instance at nb=4).
    x = x_ref[0]                      # (F, bp, C)
    f, bp, c = x.shape
    bpc = bp // nb
    a = a_ref[0, 0].astype(jnp.float32)  # (C,)
    b = b_ref[0, 0].astype(jnp.float32)

    def mk_z(k):
        xs = x[:, k * bpc:(k + 1) * bpc]
        z = xs.astype(jnp.float32) * a[None, None, :] + b[None, None, :]
        return (z * jax.nn.sigmoid(z)).astype(x.dtype)  # silu

    dn = (((1,), (0,)), ((), ()))
    cur = mk_z(0)
    for k in range(nb):
        nxt = mk_z(k + 1) if k + 1 < nb else None
        z = cur
        zero = jnp.zeros((1, bpc, c), z.dtype)
        zprev = jnp.concatenate([zero, z[:-1]], axis=0).reshape(f * bpc, c)
        znext = jnp.concatenate([z[1:], zero], axis=0).reshape(f * bpc, c)
        zf = z.reshape(f * bpc, c)
        acc = jax.lax.dot_general(zprev, w_ref[0], dn,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(zf, w_ref[1], dn,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(znext, w_ref[2], dn,
                                   preferred_element_type=jnp.float32)
        acc += bias_ref[0, 0].astype(jnp.float32)[None, :]
        # With output-channel blocking (C > 640) the out block is narrower.
        out = acc.reshape(f, bpc, o_ref.shape[-1]).astype(o_ref.dtype)
        if nb == 1:
            o_ref[0] = out
        else:
            o_ref[0, :, k * bpc:(k + 1) * bpc] = out
        cur = nxt


def _kernel_cat3(x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref, *, nb: int = 1):
    # Concatenated-taps variant: the three frame-shifted row blocks join on
    # the lane axis into one (rows, 3C) operand and the conv becomes a
    # single K=3C MXU dot — at C=320, K rounds 960->1024 (94% tile fill)
    # instead of three 320->384 (83%) contractions, and one dot amortizes
    # the per-dot MXU ramp. nb > 1 additionally pipelines chunk k+1's
    # silu+concat (VPU) ahead of chunk k's dot.
    x = x_ref[0]                      # (F, bp, C)
    f, bp, c = x.shape
    bpc = bp // nb
    a = a_ref[0, 0].astype(jnp.float32)
    b = b_ref[0, 0].astype(jnp.float32)
    w3 = w_ref[...].reshape(3 * c, w_ref.shape[-1])

    def mk_z3(k):
        xs = x[:, k * bpc:(k + 1) * bpc]
        z = xs.astype(jnp.float32) * a[None, None, :] + b[None, None, :]
        z = (z * jax.nn.sigmoid(z)).astype(x.dtype)
        zero = jnp.zeros((1, bpc, c), z.dtype)
        zprev = jnp.concatenate([zero, z[:-1]], axis=0)
        znext = jnp.concatenate([z[1:], zero], axis=0)
        return jnp.concatenate([zprev, z, znext], axis=-1).reshape(
            f * bpc, 3 * c)

    cur = mk_z3(0)
    for k in range(nb):
        nxt = mk_z3(k + 1) if k + 1 < nb else None
        acc = jax.lax.dot_general(
            cur, w3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[0, 0].astype(jnp.float32)[None, :]
        out = acc.reshape(f, bpc, o_ref.shape[-1]).astype(o_ref.dtype)
        if nb == 1:
            o_ref[0] = out
        else:
            o_ref[0, :, k * bpc:(k + 1) * bpc] = out
        cur = nxt


def _kernel_rowshift(x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref, acc_ref):
    # Row-shifted-taps variant: one silu pass, the prev/next taps realized
    # as shifted dots accumulated into an fp32 scratch — no zprev/znext
    # concat copies. Wins at the mid/wide levels (L1 0.27 -> 0.22 ms).
    x = x_ref[0]                      # (F, bp, C)
    f, bp, c = x.shape
    a = a_ref[0, 0].astype(jnp.float32)
    b = b_ref[0, 0].astype(jnp.float32)
    z = x.astype(jnp.float32) * a[None, None, :] + b[None, None, :]
    z = (z * jax.nn.sigmoid(z)).astype(x.dtype)
    zf = z.reshape(f * bp, c)

    dn = (((1,), (0,)), ((), ()))
    co = o_ref.shape[-1]
    acc_ref[...] = jax.lax.dot_general(
        zf, w_ref[1], dn, preferred_element_type=jnp.float32)
    # tap from the previous frame: out rows [bp:] accumulate z rows [:-bp]
    acc_ref[bp:, :] += jax.lax.dot_general(
        zf[: (f - 1) * bp], w_ref[0], dn, preferred_element_type=jnp.float32)
    # tap from the next frame: out rows [:-bp] accumulate z rows [bp:]
    acc_ref[: (f - 1) * bp, :] += jax.lax.dot_general(
        zf[bp:], w_ref[2], dn, preferred_element_type=jnp.float32)
    o_ref[0] = (
        acc_ref[...] + bias_ref[0, 0].astype(jnp.float32)[None, :]
    ).reshape(f, bp, co).astype(o_ref.dtype)


def _block_p_for(c: int) -> int:
    # The kernel keeps z (fp32 + bf16), two frame-shifted copies, and the
    # fp32 accumulator live per block: ~22 * F * block_p * C bytes. 64/32/16
    # keeps that under the 16 MB scoped-VMEM limit at F=24.
    return 64 if c <= 384 else (32 if c <= 640 else 16)


def _block_co_for(c: int) -> int:
    # Weight block is 3 * C * block_co bf16; cap it at ~2 MB so the wide
    # (C=1280) levels fit VMEM alongside the activation tile.
    if c <= 640:
        return c
    for co in (256, 128, 64):
        if c % co == 0:
            return co
    return 0


def _fused(x, a, b, w, bias, *, block_p: int = None, interpret: bool = False,
           variant: str = None, nb: int = None):
    """x: (B, F, P, C); a, b: (B, C) fp32; w: (3, C, C); bias: (C,).
    ``variant``/``nb`` override the measured per-level routing (sweeps)."""
    bsz, f, p, c = x.shape
    if block_p is None:
        block_p = _block_p_for(c)
    block_p = min(block_p, p)
    block_co = _block_co_for(c)
    grid = (bsz, pl.cdiv(p, block_p), c // block_co)

    # Variant selection (measured per-level on v5e, see kernel docstrings):
    # narrow levels overlap VPU/MXU via chunked pipelining; mid levels win
    # with the scratch-accumulate row-shift form; wide levels keep the
    # simple single-pass kernel.
    if variant is None:
        # Round-4 sweep (tools/sweep_temp_conv.py, real chip): L0 cat3
        # 0.783-0.788 ms vs taps-nb4 0.848 (the K=3C contraction fills
        # 960->1024 MXU tiles instead of three 320->384 ones); L1 keeps
        # rowshift (0.438 vs cat3 0.448); L2 keeps plain taps (~tie).
        if c <= 384 and block_p % 2 == 0:
            variant, nb = "cat3", 2
        elif c <= 640:
            variant = "rowshift"
        else:
            variant = "taps"
    if variant == "cat3":
        kernel = functools.partial(_kernel_cat3, nb=nb or 1)
        scratch = []
    elif variant == "taps":
        kernel = functools.partial(_kernel, nb=nb or 1)
        scratch = []
    else:
        kernel = _kernel_rowshift
        scratch = [pltpu.VMEM((f * block_p, block_co), jnp.float32)]

    return vma_pallas_call(
        kernel,
        grid=grid,
        scratch_shapes=scratch,
        in_specs=[
            # x/a/b blocks are co-invariant: Pallas re-fetches nothing when
            # only the innermost (co) grid index advances.
            pl.BlockSpec((1, f, block_p, c), lambda bi, pi, ci: (bi, 0, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, pi, ci: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, pi, ci: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c, block_co), lambda bi, pi, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_co), lambda bi, pi, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, f, block_p, block_co), lambda bi, pi, ci: (bi, 0, pi, ci),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, f, p, c), x.dtype),
        interpret=interpret,
    )(x, a[:, None, :], b[:, None, :], w, bias[None, None, :])


def _unfused(x, a, b, w, bias):
    z = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    z = (z * jax.nn.sigmoid(z)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        z[:, :, :, None, :], w[:, None, None].astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=((1, 1), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[:, :, :, 0, :]
    return y + bias.astype(x.dtype)


def _unfused_shifted(x, a, b, w, bias):
    """Same function as ``_unfused``, expressed as three frame-shifted
    (rows, C) matmuls in the native (B, F, P, C) layout. The conv3d form's
    NDHWC lowering forces {4,2,1,3,0}->{4,0,3,2,1} relayouts of every
    activation AND of every cotangent under `jax.vjp` — ~1.7 ms each at the
    L0 shape, the single largest family in the guided-update device trace.
    The shifted-dot form keeps all operands (and thus the whole transposed
    computation AD derives from it) in the layout the surrounding ops use:
    y[f] = z[f-1] @ w[0] + z[f] @ w[1] + z[f+1] @ w[2]  (SAME padding)."""
    z = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    z = (z * jax.nn.sigmoid(z)).astype(x.dtype)
    wd = w.astype(x.dtype)
    dn = (((3,), (0,)), ((), ()))
    y = jax.lax.dot_general(z, wd[1], dn, preferred_element_type=x.dtype)
    prev = jax.lax.dot_general(z[:, :-1], wd[0], dn,
                               preferred_element_type=x.dtype)
    nxt = jax.lax.dot_general(z[:, 1:], wd[2], dn,
                              preferred_element_type=x.dtype)
    zrow = jnp.zeros_like(prev[:, :1])
    y = y + jnp.concatenate([zrow, prev], axis=1)
    y = y + jnp.concatenate([nxt, zrow], axis=1)
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


def supported(x) -> bool:
    bsz, f, p, c = x.shape
    return (
        jax.default_backend() == "tpu"
        and x.dtype in (jnp.bfloat16, jnp.float32)
        and c % 8 == 0
        and _block_co_for(c) > 0
        and f * min(p, _block_p_for(c)) * c * x.dtype.itemsize
            <= 4 * 1024 * 1024
    )


def norm_silu_temporal_conv(x, a, b, conv_w, conv_b):
    """Fused GN-apply + SiLU + (3,1,1) conv on (B, F, P, C); conv_w is the
    conv3d HWIO-style weight (3, 1, 1, C, C) from the param pytree."""
    w = conv_w.reshape(3, conv_w.shape[-2], conv_w.shape[-1]).astype(x.dtype)
    return _stage(x, a, b, w, conv_b.astype(x.dtype))
