"""Fused temporal double-self-attention Pallas kernel (TPU).

The temporal BasicTransformerBlock (reference transformer_temporal.py:143-158
+ models/attention.py: two self-attentions over the frame axis) is tiny-matmul
work: per pixel, an (F, F) attention with F = 24 frames — batched dots whose
24-wide operands use a few percent of the MXU tile, plus LayerNorms, per-head
concat and output projection, each a full HBM round-trip of the (B, P, F, C)
stream.

This kernel processes G pixels per program as one (G*F, C) row block and runs
LN1 -> attn1 -> +res -> LN2 -> attn2 -> +res entirely in VMEM:

- Frame attention rides the MXU as a (G*F, G*F) block-diagonal matmul: the
  q/k dot computes all pixel pairs of the tile and a -inf mask keeps only the
  per-pixel (F, F) blocks. G*F = 120 rows ≈ one full MXU tile; the G-fold
  FLOP overhead is far below the win from full-depth contractions.
- Heads are never lane-sliced: the projection weights are passed pre-split as
  (H, C, 64) / (H, 64, C), so per-head access is leading-dim ref indexing
  (free) and every dot is 2D with a 64- or C-wide minor.
- The output projection accumulates per head into an fp32 (G*F, C) scratch
  value: sum_h o_h @ Wo[h] == concat(o) @ Wo.

Backward: custom VJP recomputes through the unfused XLA formulation
(`_pair_ref`), keeping gradient semantics identical to the non-kernel path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634


def _ln(x, s_ref, b_ref, eps: float):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * s_ref[...].astype(jnp.float32)
            + b_ref[...].astype(jnp.float32)).astype(x.dtype)


def _one_attn(x, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, mask,
              num_heads: int, scale: float):
    acc = None
    for h in range(num_heads):
        q = jax.lax.dot_general(
            x, wq_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * _LOG2E)
        k = jax.lax.dot_general(
            x, wk_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v = jax.lax.dot_general(
            x, wv_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        s = jax.lax.dot_general(
            q.astype(x.dtype), k.astype(x.dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        s = s + mask                                    # (R, R)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)                               # (R, 64)
        part = jax.lax.dot_general(
            o, wo_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (R, C) fp32
        acc = part if acc is None else acc + part
    return (acc + bo_ref[...].astype(jnp.float32)).astype(x.dtype)


def _tattn_kernel(y_ref,
                  ln1s_ref, ln1b_ref, wq1_ref, wk1_ref, wv1_ref, wo1_ref, bo1_ref,
                  ln2s_ref, ln2b_ref, wq2_ref, wk2_ref, wv2_ref, wo2_ref, bo2_ref,
                  o_ref, *, g: int, f: int, num_heads: int, eps: float):
    r = g * f
    c = y_ref.shape[-1]
    x = y_ref[0].reshape(r, c)
    # Block-diagonal mask: row i attends to col j iff same pixel (i//F == j//F).
    row = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    mask = jnp.where((row // f) == (col // f), 0.0, -jnp.inf).astype(jnp.float32)
    scale = (wq1_ref.shape[-1]) ** -0.5

    x = x + _one_attn(_ln(x, ln1s_ref, ln1b_ref, eps),
                      wq1_ref, wk1_ref, wv1_ref, wo1_ref, bo1_ref,
                      mask, num_heads, scale)
    x = x + _one_attn(_ln(x, ln2s_ref, ln2b_ref, eps),
                      wq2_ref, wk2_ref, wv2_ref, wo2_ref, bo2_ref,
                      mask, num_heads, scale)
    o_ref[0] = x.reshape(g, f, c)


def _split_heads_w(w, num_heads: int):
    """(C, C') -> (H, C, 64) per-head input projections."""
    c, cp = w.shape
    d = cp // num_heads
    return w.reshape(c, num_heads, d).transpose(1, 0, 2)


def _split_heads_wo(w, num_heads: int):
    """(C', C) -> (H, 64, C) per-head output projections."""
    cp, c = w.shape
    d = cp // num_heads
    return w.reshape(num_heads, d, c)


def _attn_inputs(pa, num_heads, dtype):
    return (
        _split_heads_w(pa["to_q"]["w"].astype(dtype), num_heads),
        _split_heads_w(pa["to_k"]["w"].astype(dtype), num_heads),
        _split_heads_w(pa["to_v"]["w"].astype(dtype), num_heads),
        _split_heads_wo(pa["to_out"]["w"].astype(dtype), num_heads),
        pa["to_out"]["b"].astype(jnp.float32)[None, :],
    )


def _pallas_pair(p, y, num_heads: int, g: int, eps: float,
                 interpret: bool = False):
    """y: (B, P, F, C) pixels-major; runs both self-attentions fused."""
    b, pdim, f, c = y.shape
    n_tiles = pdim // g
    dt = y.dtype

    ln1 = p["norm1"]
    ln2 = p["norm2"]
    inputs = (
        y,
        ln1["scale"].astype(jnp.float32)[None, :],
        ln1["bias"].astype(jnp.float32)[None, :],
        *_attn_inputs(p["attn1"], num_heads, dt),
        ln2["scale"].astype(jnp.float32)[None, :],
        ln2["bias"].astype(jnp.float32)[None, :],
        *_attn_inputs(p["attn2"], num_heads, dt),
    )
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    specs = [pl.BlockSpec((1, g, f, c), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)]
    specs += [const() for _ in range(14)]
    return pl.pallas_call(
        functools.partial(_tattn_kernel, g=g, f=f, num_heads=num_heads, eps=eps),
        grid=(b, n_tiles),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, g, f, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(y.shape, dt),
        interpret=interpret,
    )(*inputs)


def _ref_ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _ref_attn(pa, y, num_heads):
    """Unfused formulation on (B, P, F, C); mirrors
    models/unet3d._temporal_attention_block's attn (same math as the fused
    kernel; used for the VJP recompute and numerics tests)."""
    d = y.shape[-1] // num_heads
    qw, kw, vw = (pa[k]["w"].astype(y.dtype) for k in ("to_q", "to_k", "to_v"))
    q = jnp.dot(y, qw, preferred_element_type=y.dtype)
    k = jnp.dot(y, kw, preferred_element_type=y.dtype)
    v = jnp.dot(y, vw, preferred_element_type=y.dtype)
    outs = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[..., sl], k[..., sl], (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(d ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(y.dtype)
        outs.append(
            jax.lax.dot_general(
                probs, v[..., sl], (((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            ).astype(y.dtype)
        )
    o = jnp.concatenate(outs, axis=-1)
    return (jnp.dot(o, pa["to_out"]["w"].astype(y.dtype),
                    preferred_element_type=jnp.float32)
            + pa["to_out"]["b"].astype(jnp.float32)).astype(y.dtype)


def _pair_ref(p, y, num_heads, eps):
    y = y + _ref_attn(p["attn1"], _ref_ln(p["norm1"], y, eps), num_heads)
    y = y + _ref_attn(p["attn2"], _ref_ln(p["norm2"], y, eps), num_heads)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_pair(p, y, num_heads, g, eps):
    return _pallas_pair(p, y, num_heads, g, eps)


def _fused_pair_fwd(p, y, num_heads, g, eps):
    return _pallas_pair(p, y, num_heads, g, eps), (p, y)


def _fused_pair_bwd(num_heads, g, eps, res, ct):
    p, y = res
    _, vjp = jax.vjp(lambda p, y: _pair_ref(p, y, num_heads, eps), p, y)
    return vjp(ct)


_fused_pair.defvjp(_fused_pair_fwd, _fused_pair_bwd)


def _pick_g(pdim: int) -> int:
    # Largest measured-good tile (G=16 at L0: 5.4 vs 7.8 ms for the XLA
    # path; G=5 was slower than XLA — too many tiny dependent dots per
    # program). Smaller divisors keep the kernel available for sharded
    # pixel counts (e.g. P_local=360 under 8-way frame sharding).
    for g in (16, 12, 10, 8, 6, 5, 4):
        if pdim % g == 0:
            return g
    return 0


def supported(y, num_heads: int) -> bool:
    b, pdim, f, c = y.shape
    d = c // num_heads
    # Measured: the kernel wins at the pixel-heavy C<=512 levels and loses
    # at C=640 (more heads -> more tiny dependent dots per program, fewer
    # pixels for XLA to be bad at). C=1280 would also blow the VMEM weight
    # budget (26 MB).
    return (
        jax.default_backend() == "tpu"
        and y.dtype in (jnp.bfloat16, jnp.float32)
        and d == 64
        and c <= 512
        and _pick_g(pdim) > 0
    )


def temporal_attention_pair(p, y, num_heads: int, eps: float = 1e-5):
    """Both self-attentions of a temporal BasicTransformerBlock on
    (B, P, F, C) input. Fused Pallas kernel on TPU, unfused XLA elsewhere.
    The FF stage stays outside (ops.geglu_fused handles it)."""
    if supported(y, num_heads):
        return _fused_pair(p, y, num_heads, _pick_g(y.shape[1]), eps)
    return _pair_ref(p, y, num_heads, eps)
