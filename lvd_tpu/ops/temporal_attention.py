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
  q/k dot computes all pixel pairs of the tile and a 0/1 mask (multiplied
  into the exp2'd logits — no -inf add, no row-max pass) keeps only the
  per-pixel (F, F) blocks. The G-fold FLOP overhead is far below the win
  from full-depth contractions.
- q/k/v project in ONE (R, C) x (C, 3C) dot per attention (full C-deep MXU
  contraction); heads are lane-sliced from the fp32 result in VMEM.
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

from .vma import pallas_call as vma_pallas_call
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634


def _ln(x, s_ref, b_ref, eps: float):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * s_ref[...].astype(jnp.float32)
            + b_ref[...].astype(jnp.float32)).astype(x.dtype)


def _head_probs(qkv, h, c, d, mask01, scale, dt):
    """Recompute head h's (R, R) block-diag softmax probs from the fused
    qkv projection (fp32), exactly as the forward kernel forms them."""
    q = qkv[:, h * d:(h + 1) * d] * (scale * _LOG2E)
    k = qkv[:, c + h * d:c + (h + 1) * d]
    s = jax.lax.dot_general(
        q.astype(dt), k.astype(dt),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    p = jnp.exp2(jnp.minimum(s, 80.0)) * mask01
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _attn_core(qkv, wo_ref, bo_ref, mask01, num_heads: int, scale: float,
               dt, c: int):
    """Per-head attention + output projection from the fused (R, 3C) qkv."""
    d = c // num_heads
    acc = None
    for h in range(num_heads):
        p = _head_probs(qkv, h, c, d, mask01, scale, dt)
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d].astype(dt)
        o = jax.lax.dot_general(
            p.astype(dt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)                                    # (R, 64)
        part = jax.lax.dot_general(
            o, wo_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (R, C) fp32
        acc = part if acc is None else acc + part
    return (acc + bo_ref[...].astype(jnp.float32)).astype(dt)


def _one_attn(x, wqkv_ref, wo_ref, bo_ref, mask01, num_heads: int,
              scale: float):
    """One self-attention on an (R, C) row block.

    The q/k/v projections run as a single (R, C) x (C, 3C) MXU dot (a full
    C-deep contraction, vs three 64-wide per-head dots) and heads are
    lane-sliced out of the fp32 result in VMEM. The softmax skips the row-max
    pass: logits are bounded far below f32's exp2 range, a static clamp
    guards the tail, and the block-diagonal mask multiplies (0/1) instead of
    adding -inf — measured 5.45 -> 3.69 ms per L0 instance for the pair.
    """
    c = x.shape[-1]
    qkv = jax.lax.dot_general(
        x, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (R, 3C) fp32
    return _attn_core(qkv, wo_ref, bo_ref, mask01, num_heads, scale,
                      x.dtype, c)


def _tattn_kernel(y_ref,
                  ln1s_ref, ln1b_ref, wqkv1_ref, wo1_ref, bo1_ref,
                  ln2s_ref, ln2b_ref, wqkv2_ref, wo2_ref, bo2_ref,
                  o_ref, *, g: int, f: int, num_heads: int, eps: float,
                  frames_major: bool = False):
    r = g * f
    c = y_ref.shape[-1]
    x = y_ref[0]
    if frames_major:
        # (F, g, C) tile straight out of the frames-major HBM stream; the
        # pixel-major permutation happens on the VMEM tile (245 KB at L0)
        # instead of as a (B, P, F, C) relayout of the whole activation.
        x = x.transpose(1, 0, 2)
    x = x.reshape(r, c)
    # Block-diagonal 0/1 mask: row i attends to col j iff same pixel
    # (i//F == j//F); applied multiplicatively after exp2.
    row = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    mask01 = ((row // f) == (col // f)).astype(jnp.float32)
    scale = (c // num_heads) ** -0.5

    x = x + _one_attn(_ln(x, ln1s_ref, ln1b_ref, eps),
                      wqkv1_ref, wo1_ref, bo1_ref, mask01, num_heads, scale)
    x = x + _one_attn(_ln(x, ln2s_ref, ln2b_ref, eps),
                      wqkv2_ref, wo2_ref, bo2_ref, mask01, num_heads, scale)
    out = x.reshape(g, f, c)
    if frames_major:
        out = out.transpose(1, 0, 2)
    o_ref[0] = out


def _ln_fwd_stats(x, s_ref, b_ref, eps: float):
    """LayerNorm forward keeping (xhat, rstd) for the backward."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean,
                      0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    z = (xhat * s_ref[...].astype(jnp.float32)
         + b_ref[...].astype(jnp.float32)).astype(x.dtype)
    return z, xhat, rstd


def _ln_bwd(dz, xhat, rstd, s_ref):
    """Input gradient of LayerNorm: dz (R, C) fp32 -> dx (R, C) fp32."""
    g = dz * s_ref[...].astype(jnp.float32)
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    return rstd * (g - m1 - xhat * m2)


def _attn_dz(u, qkv, wqkv_ref, wo_ref, mask01, num_heads: int, scale: float,
             dt, c: int):
    """Input gradient of one self-attention at its (normalized) input z.

    u: (R, C) fp32 cotangent of the attention output (pre-residual);
    qkv: (R, 3C) fp32 = z @ Wqkv (recomputed). Per head: recompute the
    block-diag probs, run the standard softmax/attention VJP as full (R, R)
    MXU dots, then fold dq/dk/dv back through the fused projection with one
    (R, 3C) x (3C, C) dot — nothing touches HBM.
    """
    d = c // num_heads
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        p = _head_probs(qkv, h, c, d, mask01, scale, dt)
        q = qkv[:, h * d:(h + 1) * d]
        k = qkv[:, c + h * d:c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        do = jax.lax.dot_general(                       # u @ Wo[h]^T
            u.astype(dt), wo_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (R, 64)
        pd = p.astype(dt)
        dod = do.astype(dt)
        dvs.append(jax.lax.dot_general(                 # p^T @ do
            pd, dod, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        dp = jax.lax.dot_general(                       # do @ v^T
            dod, v.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (R, R)
        tmp = dp * p
        dl = (tmp - p * jnp.sum(tmp, axis=-1, keepdims=True)) * scale
        dld = dl.astype(dt)
        dqs.append(jax.lax.dot_general(                 # dl @ k
            dld, k.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        dks.append(jax.lax.dot_general(                 # dl^T @ q
            dld, q.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    dqkv = jnp.concatenate(
        [jnp.concatenate(dqs, axis=1), jnp.concatenate(dks, axis=1),
         jnp.concatenate(dvs, axis=1)], axis=1,
    )                                                   # (R, 3C) fp32
    return jax.lax.dot_general(                         # dqkv @ Wqkv^T
        dqkv.astype(dt), wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tattn_bwd_kernel(y_ref, ct_ref,
                      ln1s_ref, ln1b_ref, wqkv1_ref, wo1_ref, bo1_ref,
                      ln2s_ref, ln2b_ref, wqkv2_ref, wo2_ref, bo2_ref,
                      dy_ref, *, g: int, f: int, num_heads: int, eps: float,
                      frames_major: bool = False):
    """dy-only backward of the fused pair: per tile, recompute the forward
    (LN1 -> attn1 -> +res -> LN2, qkv2) in VMEM, then chain the attention
    and LayerNorm input-VJPs — the recompute VJP's 4 whole-stream HBM
    relayouts and per-pixel F=24 mini-dots (40.1 ms/guided-iter, PERF.md
    round-3 wave-2 table) become full-depth (R, R)/(R, 3C) MXU work.

    Weight/bias gradients are NOT computed here; the caller's unfused
    recompute branch provides them (dead code under the latent-only
    guidance grad)."""
    r = g * f
    c = y_ref.shape[-1]
    dt = y_ref.dtype
    x0 = y_ref[0]
    ct = ct_ref[0]
    if frames_major:
        x0 = x0.transpose(1, 0, 2)
        ct = ct.transpose(1, 0, 2)
    x0 = x0.reshape(r, c)
    u2 = ct.reshape(r, c).astype(jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    mask01 = ((row // f) == (col // f)).astype(jnp.float32)
    scale = (c // num_heads) ** -0.5

    # forward recompute
    z1, xhat1, rstd1 = _ln_fwd_stats(x0, ln1s_ref, ln1b_ref, eps)
    qkv1 = jax.lax.dot_general(
        z1, wqkv1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a1 = _attn_core(qkv1, wo1_ref, bo1_ref, mask01, num_heads, scale, dt, c)
    x1 = x0 + a1
    z2, xhat2, rstd2 = _ln_fwd_stats(x1, ln2s_ref, ln2b_ref, eps)
    qkv2 = jax.lax.dot_general(
        z2, wqkv2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # backward chain (x2 = x1 + A2(LN2(x1)); x1 = x0 + A1(LN1(x0)))
    dz2 = _attn_dz(u2, qkv2, wqkv2_ref, wo2_ref, mask01, num_heads, scale,
                   dt, c)
    dx1 = u2 + _ln_bwd(dz2, xhat2, rstd2, ln2s_ref)
    dz1 = _attn_dz(dx1, qkv1, wqkv1_ref, wo1_ref, mask01, num_heads, scale,
                   dt, c)
    dx0 = dx1 + _ln_bwd(dz1, xhat1, rstd1, ln1s_ref)

    out = dx0.astype(dt).reshape(g, f, c)
    if frames_major:
        out = out.transpose(1, 0, 2)
    dy_ref[0] = out


def _split_heads_wo(w, num_heads: int):
    """(C', C) -> (H, 64, C) per-head output projections."""
    cp, c = w.shape
    d = cp // num_heads
    return w.reshape(num_heads, d, c)


def _attn_inputs(pa, num_heads, dtype):
    return (
        jnp.concatenate(
            [pa["to_q"]["w"], pa["to_k"]["w"], pa["to_v"]["w"]], axis=1
        ).astype(dtype),
        _split_heads_wo(pa["to_out"]["w"].astype(dtype), num_heads),
        pa["to_out"]["b"].astype(jnp.float32)[None, :],
    )


def _pallas_pair(p, y, num_heads: int, g: int, eps: float,
                 frames_major: bool = False, interpret: bool = False):
    """y: (B, P, F, C) pixels-major — or (B, F, P, C) when ``frames_major``
    (the kernel permutes each VMEM tile instead of the caller relayouting
    the whole stream in HBM); runs both self-attentions fused."""
    if frames_major:
        b, f, pdim, c = y.shape
    else:
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
    if frames_major:
        tile = pl.BlockSpec((1, f, g, c), lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)
    else:
        tile = pl.BlockSpec((1, g, f, c), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    specs = [tile]
    specs += [const() for _ in range(10)]
    return vma_pallas_call(
        functools.partial(_tattn_kernel, g=g, f=f, num_heads=num_heads,
                          eps=eps, frames_major=frames_major),
        grid=(b, n_tiles),
        in_specs=specs,
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(y.shape, dt),
        interpret=interpret,
    )(*inputs)


def _pick_g_bwd(pdim: int, c: int, frames_major: bool = False) -> int:
    # The backward holds the (R, 3C) qkv blocks + dqkv + per-head (R, R)
    # transients alongside both attentions' weights. Round-4 sweep
    # (tools/sweep_pair_g.py, real chip): at C=320 g=10 is fastest
    # pixels-major (3.84 ms vs 4.37 at g=16, energy shape — the dense
    # block-diag (R, R) dots charge G-fold FLOPs, so mid G wins). In the
    # frames-major layout the tile is (1, F, g, C), and Pallas requires the
    # second-minor block dim to be a multiple of 8 — g is restricted to
    # 8/16 there. At C=640 the fp32-qkv form hit 17.34M scoped VMEM inside
    # the guided-update fusion at g=8; qkv/dqkv now stay bf16, halving that.
    if frames_major:
        # C=640 frames-major exhausts scoped VMEM at every legal g (g=8 hit
        # 17.34M/16.62M inside the guided-update fusion even with leaner
        # buffers) — those instances keep the recompute VJP.
        order = (8, 16) if c <= 384 else ()
    else:
        order = (10, 16, 12, 8, 6, 5, 4) if c <= 384 else (6, 5, 4)
    for g in order:
        if pdim % g == 0:
            return g
    return 0


def _pallas_pair_bwd(p, y, ct, num_heads: int, g: int, eps: float,
                     frames_major: bool = False, interpret: bool = False):
    """dy of the fused pair. y/ct: (B, P, F, C) — or (B, F, P, C) when
    ``frames_major`` (tiles permuted in VMEM, matching the forward)."""
    if frames_major:
        b, f, pdim, c = y.shape
    else:
        b, pdim, f, c = y.shape
    n_tiles = pdim // g
    dt = y.dtype

    ln1 = p["norm1"]
    ln2 = p["norm2"]
    inputs = (
        y, ct.astype(dt),
        ln1["scale"].astype(jnp.float32)[None, :],
        ln1["bias"].astype(jnp.float32)[None, :],
        *_attn_inputs(p["attn1"], num_heads, dt),
        ln2["scale"].astype(jnp.float32)[None, :],
        ln2["bias"].astype(jnp.float32)[None, :],
        *_attn_inputs(p["attn2"], num_heads, dt),
    )
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    if frames_major:
        tile = pl.BlockSpec((1, f, g, c), lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)
    else:
        tile = pl.BlockSpec((1, g, f, c), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    specs = [tile, tile]
    specs += [const() for _ in range(10)]
    return vma_pallas_call(
        functools.partial(_tattn_bwd_kernel, g=g, f=f, num_heads=num_heads,
                          eps=eps, frames_major=frames_major),
        grid=(b, n_tiles),
        in_specs=specs,
        out_specs=tile,
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


def _pair_ref_fm(p, y, num_heads, eps):
    """Frames-major reference: transpose wrappers around `_pair_ref` (the
    transposes are gradient-transparent, so VJP semantics stay the unfused
    pixels-major formulation exactly)."""
    yt = y.transpose(0, 2, 1, 3)
    return _pair_ref(p, yt, num_heads, eps).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_pair(p, y, num_heads, g, eps, frames_major):
    return _pallas_pair(p, y, num_heads, g, eps, frames_major=frames_major)


def _fused_pair_fwd(p, y, num_heads, g, eps, frames_major):
    return _pallas_pair(p, y, num_heads, g, eps,
                        frames_major=frames_major), (p, y)


def _fused_pair_bwd(num_heads, g, eps, frames_major, res, ct):
    p, y = res
    ref = _pair_ref_fm if frames_major else _pair_ref
    _, vjp = jax.vjp(lambda p, y: ref(p, y, num_heads, eps), p, y)
    dp, dy = vjp(ct)
    # On TPU, dy comes from the Pallas backward kernel instead — the unfused
    # dy chain (and in the latent-only guidance grad, the entire recompute
    # above) is dead code XLA removes. Param grads keep exact unfused
    # recompute semantics for training.
    pdim = y.shape[2] if frames_major else y.shape[1]
    c = y.shape[-1]
    g_bwd = _pick_g_bwd(pdim, c, frames_major)
    if jax.default_backend() == "tpu":
        if g_bwd > 0:
            dy = _pallas_pair_bwd(p, y, ct, num_heads, g_bwd, eps,
                                  frames_major=frames_major)
        elif frames_major and _pick_g_bwd(pdim, c, False) > 0:
            # No legal frames-major tile (C=640: g must be 8/16 and both
            # blow scoped VMEM) but the pixels-major kernel fits at g=6 —
            # two whole-stream transposes (~0.2 ms at the L1 energy shape)
            # buy a 4.8 -> 3.1 ms backward.
            tr = lambda t: t.transpose(0, 2, 1, 3)
            dy = tr(_pallas_pair_bwd(
                p, tr(y), tr(ct), num_heads, _pick_g_bwd(pdim, c, False),
                eps, frames_major=False))
    return dp, dy


_fused_pair.defvjp(_fused_pair_fwd, _fused_pair_bwd)


def _pick_g(pdim: int, frames_major: bool = False) -> int:
    # Largest measured-good tile (G=16 at L0: 5.4 vs 7.8 ms for the XLA
    # path; G=5 was slower than XLA — too many tiny dependent dots per
    # program). Smaller divisors keep the kernel available for sharded
    # pixel counts (e.g. P_local=360 under 8-way frame sharding after the
    # temporal all_to_all). Frames-major tiles are (1, F, g, C): Pallas
    # requires the second-minor block dim to be a multiple of 8 (or equal
    # the full array dim), so only g=16/8 — or g=pdim itself — are legal
    # there (a g=12 block at P_local=360 fails to lower on real TPU).
    order = (16, 8) if frames_major else (16, 12, 10, 8, 6, 5, 4)
    for g in order:
        if pdim % g == 0:
            return g
    if frames_major and pdim <= 16:
        return pdim  # whole-array block: always legal
    return 0


def _supported(pdim: int, c: int, num_heads: int, dtype,
               frames_major: bool = False) -> bool:
    d = c // num_heads
    # Measured: with the fused-qkv projection the kernel wins through C=640
    # (g=16: 2.07 vs 2.50 ms XLA at L1). C=1280 would blow the VMEM weight
    # budget (26 MB of projection weights per pair).
    return (
        jax.default_backend() == "tpu"
        and dtype in (jnp.bfloat16, jnp.float32)
        and d == 64
        and c <= 640
        and _pick_g(pdim, frames_major) > 0
    )


def supported(y, num_heads: int) -> bool:
    b, pdim, f, c = y.shape
    return _supported(pdim, c, num_heads, y.dtype)


def supported_frames_major(y, num_heads: int) -> bool:
    """Same kernel gate for (B, F, P, C) input."""
    b, f, pdim, c = y.shape
    return _supported(pdim, c, num_heads, y.dtype, frames_major=True)


def temporal_attention_pair(p, y, num_heads: int, eps: float = 1e-5,
                            frames_major: bool = False):
    """Both self-attentions of a temporal BasicTransformerBlock on
    (B, P, F, C) input — or (B, F, P, C) with ``frames_major``, which skips
    the caller-side HBM relayout by permuting each VMEM tile in-kernel.
    Fused Pallas kernel on TPU, unfused XLA elsewhere. The FF stage stays
    outside (ops.geglu_fused handles it)."""
    if frames_major:
        if supported_frames_major(y, num_heads):
            return _fused_pair(p, y, num_heads,
                               _pick_g(y.shape[2], frames_major=True),
                               eps, True)
        return _pair_ref_fm(p, y, num_heads, eps)
    if supported(y, num_heads):
        return _fused_pair(p, y, num_heads, _pick_g(y.shape[1]), eps, False)
    return _pair_ref(p, y, num_heads, eps)
