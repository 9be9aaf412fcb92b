"""Pallas TPU attention kernel + chunked JAX fallback.

The reference leans on torch SDPA's fused flash kernels
(attention_processor.py:406-408); this is the TPU-native equivalent. The
workload's sequence lengths are modest (spatial tokens <= 64*64 = 4096, text
77, frames <= 24) but the *batch* is large (frames/pixels folded in), so the
kernel keeps full K/V per (batch, head) in VMEM (4096 x 64 bf16 = 512 KB)
and tiles queries — no online-softmax bookkeeping needed, one MXU matmul
pair per tile, softmax in fp32 on the VPU.

Differentiability: `flash_attention` carries a custom VJP whose backward
recomputes probabilities per query block (`_chunked_sdpa`), so the guidance
pass (`jax.grad` through the UNet) never materializes an (S, S) probability
tensor either.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .vma import pallas_call as vma_pallas_call
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634


def _attn_kernel(q_ref, k_ref, v_ref, scale_smem, o_ref):
    # VPU-lean softmax: the scale folds into q (a (BQ, D) multiply instead
    # of (BQ, S)), exp2 replaces exp, and the row normalization is applied
    # to the (BQ, D) output of the PV matmul instead of the (BQ, S) probs.
    # No row-max pass: f32 exp2 is exact over the attainable logit range
    # (|q.k|*scale*log2e << 127); a static clamp guards the upper tail, so
    # the (BQ, S) max-reduce (a full extra VPU pass) disappears. Measured
    # 5.76 -> 5.10 ms per L0 instance, one-bf16-ulp output difference.
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (S, D)
    v = v_ref[0]
    scale = scale_smem[0] * _LOG2E
    qs = q.astype(jnp.float32) * scale
    logits = jax.lax.dot_general(
        qs.astype(q.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp2(jnp.minimum(logits, 80.0))
    s = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / s).astype(o_ref.dtype)


def _attn_kernel_heads(q_ref, k_ref, v_ref, scale_smem, o_ref, *, num_heads,
                       pipelined: bool = False):
    # Heads-inside variant: blocks carry the full packed channel dim
    # (C = H*D) and the per-head 64-wide slices happen in VMEM, so the
    # caller never pays the (B, S, H*D) -> (B*H, S, D) relayout of
    # q/k/v/out in HBM (measured 7.8 -> 6.2 ms per L0 spatial attention).
    #
    # pipelined: compute head h+1's QK logits before head h's softmax+PV so
    # the MXU runs ahead of the VPU (two f32 logits tiles live at once —
    # only used when they fit VMEM; 1.07 -> 0.89 ms per L1 instance,
    # bit-identical). At L0 the extra tile forces block_q <= 192, which
    # costs more than the overlap wins (5.42 -> 5.76 ms) — stay serial.
    c = q_ref.shape[-1]
    d = c // num_heads
    scale = scale_smem[0] * _LOG2E

    def logits_of(h):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        return jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    logits = logits_of(0) if pipelined else None
    for h in range(num_heads):
        if pipelined:
            cur = logits
            logits = logits_of(h + 1) if h + 1 < num_heads else None
        else:
            cur = logits_of(h)
        sl = slice(h * d, (h + 1) * d)
        # Clamped no-max softmax (see _attn_kernel).
        p = jnp.exp2(jnp.minimum(cur, 80.0))
        s = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / s).astype(o_ref.dtype)


def _default_block_q(s_q: int, s_k: int) -> int:
    """Largest query tile whose fp32 logits block fits comfortably in VMEM
    (~9 MB for logits; K/V + double-buffering take the rest of 16 MB)."""
    cap = (9 * 1024 * 1024) // (4 * s_k)
    return max(128, min(s_q, (cap // 8) * 8, 1024))


def _pallas_attention(q, k, v, scale: float, block_q: int = None):
    """q, k, v: (BH, S_q, D), (BH, S_k, D); returns (BH, S_q, D)."""
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    block_q = min(block_q or _default_block_q(s_q, s_k), s_q)
    grid = (bh, pl.cdiv(s_q, block_q))
    scale_arr = jnp.full((1,), scale, jnp.float32)

    return vma_pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
    )(q, k, v, scale_arr)


def _pallas_attention_heads(q, k, v, scale: float, num_heads: int,
                            block_q: int = None):
    """q, k, v: (B, S_q, C), (B, S_k, C) with C = num_heads * D packed;
    returns (B, S_q, C). Mosaic requires the lane-dim block to be 128-aligned
    or the full array width, so blocks carry all heads and slice in VMEM."""
    b, s_q, c = q.shape
    s_k = k.shape[1]
    if block_q is None:
        # Measured sweet spot (see PERF.md): the unrolled per-head loop keeps
        # one fp32 logits tile (4 * block_q * s_k) live per head, and Mosaic's
        # stack allocator does not always reuse across unrolled iterations —
        # 320 fits every UNet level (5.11 vs 5.59 ms at 256 for the L0
        # instance with the no-max softmax); >=384 exceeds scoped VMEM.
        block_q = 320
    block_q = min(block_q, s_q)
    # Pipelined head loop (prefetch next head's logits) when the second live
    # f32 logits tile still fits VMEM — i.e. moderate key counts (the L1
    # 720-token level: 1.07 -> 0.89 ms, bit-identical). The ~2x-longer L0
    # keys would force block_q down to 192, a net loss.
    pipelined = 2 * 4 * block_q * s_k <= 4 * 1024 * 1024
    grid = (b, pl.cdiv(s_q, block_q))
    scale_arr = jnp.full((1,), scale, jnp.float32)

    return vma_pallas_call(
        functools.partial(_attn_kernel_heads, num_heads=num_heads,
                          pipelined=pipelined),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_k, c), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_k, c), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_q, c), q.dtype),
    )(q, k, v, scale_arr)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, scale_smem,
                     dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, nq, s_q):
    # FlashAttention-style backward (non-causal, no mask): per q-tile,
    # recompute the softmax, then
    #   dV += P^T dO;  dS = P * (dO V^T - rowsum(dO*O)) * scale;
    #   dQ = dS K;     dK += dS^T Q.
    # dK/dV accumulate in fp32 scratch across the q-tile grid axis.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[0]            # (S, D)
    v = v_ref[0]
    o = o_ref[0]
    scale = scale_smem[0]
    bq = q_ref.shape[1]
    # Rows past s_q are block padding with unspecified contents; zero them
    # before ANY dot that contracts over rows (0 * garbage-NaN = NaN).
    valid = (i * bq + jax.lax.iota(jnp.int32, bq))[:, None] < s_q
    q = jnp.where(valid, q_ref[0], 0.0).astype(q_ref.dtype)   # (BQ, D)
    do = jnp.where(valid, do_ref[0], 0.0).astype(do_ref.dtype)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * (scale * _LOG2E)                                 # (BQ, S)
    # Clamped no-max softmax recompute (see _attn_kernel).
    p = jnp.exp2(jnp.minimum(s, 80.0))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = jnp.where(valid, p, 0.0)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)              # (BQ, 1)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                                    # (BQ, S)
    ds = p * (dp - delta) * scale
    ds = jnp.where(valid, ds, 0.0).astype(q.dtype)

    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )                                                    # (S, D)
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == nq - 1)
    def _done():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _pallas_attention_bwd(q, k, v, o, do, scale: float, block_q: int = 256,
                          interpret: bool = False):
    """(BH, S_q, D) flash backward; returns (dq, dk, dv)."""
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    block_q = min(block_q, s_q)
    nq = pl.cdiv(s_q, block_q)
    scale_arr = jnp.full((1,), scale, jnp.float32)

    tile = lambda: pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    return vma_pallas_call(
        functools.partial(_attn_bwd_kernel, nq=nq, s_q=s_q),
        grid=(bh, nq),
        in_specs=[tile(), full(), full(), tile(), tile(),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[tile(), full(), full()],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, s_k, d), k.dtype),
            jax.ShapeDtypeStruct((bh, s_k, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_k, d), jnp.float32),
            pltpu.VMEM((s_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, o, do, scale_arr)


def _attn_bwd_kernel_heads(q_ref, k_ref, v_ref, o_ref, do_ref, scale_smem,
                           dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                           nq, s_q, num_heads):
    # Head-packed flash backward: blocks carry the full packed channel dim
    # (C = H*D) and the per-head 64-wide slices happen in VMEM — the packed
    # layout's (B,S,C) <-> (B*H,S,D) HBM relayouts (8 per instance in
    # _flash_heads_bwd's transpose wrappers, 28.2 ms per guided iteration
    # in the round-3 device trace) disappear. Same math as _attn_bwd_kernel,
    # per head.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    c = q_ref.shape[-1]
    d = c // num_heads
    scale = scale_smem[0]
    bq = q_ref.shape[1]
    valid = (i * bq + jax.lax.iota(jnp.int32, bq))[:, None] < s_q
    q = jnp.where(valid, q_ref[0], 0.0).astype(q_ref.dtype)
    do = jnp.where(valid, do_ref[0], 0.0).astype(do_ref.dtype)
    o = o_ref[0]

    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        qh, doh, oh = q[:, sl], do[:, sl], o[:, sl]
        kh, vh = k_ref[0, :, sl], v_ref[0, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * _LOG2E)                             # (BQ, S)
        p = jnp.exp2(jnp.minimum(s, 80.0))
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p = jnp.where(valid, p, 0.0)
        delta = jnp.sum(doh.astype(jnp.float32) * oh.astype(jnp.float32),
                        axis=-1, keepdims=True)          # (BQ, 1)
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (BQ, S)
        ds = p * (dp - delta) * scale
        ds = jnp.where(valid, ds, 0.0).astype(q.dtype)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_acc[:, sl] += jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (S, D)
        dv_acc[:, sl] += jax.lax.dot_general(
            p.astype(doh.dtype), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == nq - 1)
    def _done():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_heads_vmem(s_k: int, c: int, bq: int) -> int:
    # Live per program: two fp32 (S, C) scratches, the bf16 K/V blocks
    # (double-buffered across b), per head one fp32 (BQ, S) logits tile plus
    # its (BQ, S) dp tile, and the four double-buffered (BQ, C) io tiles.
    return (2 * 4 * s_k * c + 2 * 2 * 2 * s_k * c
            + 2 * 4 * bq * s_k + 8 * 2 * bq * c)


def _bwd_heads_fits(s_k: int, c: int) -> bool:
    # Mosaic's real allocation runs above this estimate (the unrolled head
    # loop keeps extra logits tiles live): on v5e, bq=128 compiles at the
    # L1 (720, 640) and L2 (180, 1280) shapes (est 9.4 / 6.5 MB) but bq=192
    # at L1 (est 10.5 MB) and everything at the L0 (2880, 320) shape
    # (est >= 16.8 MB) exhaust VMEM — hence the 10 MB routing cap
    # (tools/sweep_heads_bwd.py, PERF.md round-3 wave 3).
    return _bwd_heads_vmem(s_k, c, 128) <= 10 * 1024 * 1024


def _pallas_attention_bwd_heads(q, k, v, o, do, scale: float,
                                num_heads: int, block_q: int = None,
                                interpret: bool = False):
    """(B, S_q, C)-packed flash backward; returns (dq, dk, dv) packed."""
    b, s_q, c = q.shape
    s_k = k.shape[1]
    block_q = min(block_q or 128, s_q)
    nq = pl.cdiv(s_q, block_q)
    scale_arr = jnp.full((1,), scale, jnp.float32)

    tile = lambda: pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec((1, s_k, c), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    return vma_pallas_call(
        functools.partial(_attn_bwd_kernel_heads, nq=nq, s_q=s_q,
                          num_heads=num_heads),
        grid=(b, nq),
        in_specs=[tile(), full(), full(), tile(), tile(),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[tile(), full(), full()],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_q, c), q.dtype),
            jax.ShapeDtypeStruct((b, s_k, c), k.dtype),
            jax.ShapeDtypeStruct((b, s_k, c), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_k, c), jnp.float32),
            pltpu.VMEM((s_k, c), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, o, do, scale_arr)


def _chunked_sdpa(q, k, v, scale: float, block_q: int = 512):
    """Memory-light pure-JAX attention: scan over query blocks, each block
    rematerialized in the backward pass. (BH, S, D) layout."""
    bh, s_q, d = q.shape
    block_q = min(block_q, s_q)
    pad = (-s_q) % block_q
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0))) if pad else q
    nblocks = qp.shape[1] // block_q
    qb = qp.reshape(bh, nblocks, block_q, d).transpose(1, 0, 2, 3)

    @jax.checkpoint
    def one_block(q_block):
        logits = jnp.einsum(
            "bqd,bkd->bqk", q_block, k, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bqk,bkd->bqd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)

    out = jax.lax.map(one_block, qb)  # (nblocks, BH, BQ, D)
    out = out.transpose(1, 0, 2, 3).reshape(bh, nblocks * block_q, d)
    return out[:, :s_q]


def _supported(q, k) -> bool:
    # Pallas path constraints: TPU backend, head dim aligned to VPU lanes.
    if jax.default_backend() not in ("tpu",):
        return False
    d = q.shape[-1]
    return d % 64 == 0 and q.dtype in (jnp.float32, jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    return _pallas_attention(q, k, v, scale)


def _flash_fwd(q, k, v, scale):
    o = _pallas_attention(q, k, v, scale)
    return o, (q, k, v, o)


def _flash_bwd(scale, res, g):
    q, k, v, o = res
    # Flash backward kernel: recomputes the softmax per q-tile and
    # accumulates dK/dV in VMEM. The previous chunked-recompute vjp
    # (lax.map over jax.vjp of blocks) spent ~70 ms per guided step in
    # scan stacking and gradient-accumulation fusions.
    return _pallas_attention_bwd(q, k, v, o, g, scale)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _heads_chunked(q, k, v, scale: float, num_heads: int):
    """Chunked SDPA on packed (B, S, C) tensors (backward/fallback path)."""
    b, s_q, c = q.shape
    d = c // num_heads

    def to_bh(t):
        s = t.shape[1]
        return (
            t.reshape(b, s, num_heads, d)
            .transpose(0, 2, 1, 3)
            .reshape(b * num_heads, s, d)
        )

    o = _chunked_sdpa(to_bh(q), to_bh(k), to_bh(v), scale)
    return (
        o.reshape(b, num_heads, s_q, d)
        .transpose(0, 2, 1, 3)
        .reshape(b, s_q, c)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_heads(q, k, v, scale, num_heads):
    return _pallas_attention_heads(q, k, v, scale, num_heads)


def _flash_heads_fwd(q, k, v, scale, num_heads):
    o = _pallas_attention_heads(q, k, v, scale, num_heads)
    return o, (q, k, v, o)


def _flash_heads_bwd(scale, num_heads, res, g):
    q, k, v, o = res
    b, s_q, c = q.shape
    d = c // num_heads
    # Head-packed backward kernel when the scratch accumulators fit VMEM —
    # no HBM relayout at all (L1: 1.40 vs 1.70 ms, L2: 0.45 vs 0.56 per
    # instance). The L0 (2880, 320) shape exhausts VMEM and keeps the
    # relayout + (BH,S,D)-kernel path below.
    if _bwd_heads_fits(k.shape[1], c):
        return _pallas_attention_bwd_heads(q, k, v, o, g, scale, num_heads)

    def to_bh(t):
        s = t.shape[1]
        return (t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
                .reshape(b * num_heads, s, d))

    def from_bh(t, s):
        return (t.reshape(b, num_heads, s, d).transpose(0, 2, 1, 3)
                .reshape(b, s, c))

    dq, dk, dv = _pallas_attention_bwd(
        to_bh(q), to_bh(k), to_bh(v), to_bh(o), to_bh(g), scale
    )
    s_k = k.shape[1]
    return from_bh(dq, s_q), from_bh(dk, s_k), from_bh(dv, s_k)


_flash_heads.defvjp(_flash_heads_fwd, _flash_heads_bwd)


def _cross_kernel(q_ref, k_ref, v_ref, scale_smem, o_ref, *,
                  num_heads: int, s_k: int):
    # Short-key attention (cross-attention over 77 text tokens, low-res
    # self-attention): K/V sit fully in VMEM zero-padded to a lane-aligned
    # row count; a 0/1 column mask multiplies the exp2'd logits. Per-head
    # lane slicing as in _attn_kernel_heads. The whole op is one pass over
    # q/out — the XLA einsum path materializes (B, H, S_q, S_k) f32 probs
    # in HBM instead (213 MB per L0 cross-attention instance).
    c = q_ref.shape[-1]
    d = c // num_heads
    kp = k_ref[0]                        # (SKP, C), rows >= s_k are zero
    skp = kp.shape[0]
    colmask = (jax.lax.iota(jnp.int32, skp)[None, :] < s_k).astype(jnp.float32)
    scale = scale_smem[0] * _LOG2E

    def logits_of(h):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        return jax.lax.dot_general(
            qs, kp[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                # (BQ, SKP)

    # Prefetch the next head's logits before this head's softmax+PV (the
    # tiles are small at <=256 keys, so the extra live tile is free VMEM-wise
    # and the MXU runs ahead of the VPU).
    logits = logits_of(0)
    for h in range(num_heads):
        cur = logits
        logits = logits_of(h + 1) if h + 1 < num_heads else None
        sl = slice(h * d, (h + 1) * d)
        p = jnp.exp2(jnp.minimum(cur, 80.0)) * colmask
        s = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / s).astype(o_ref.dtype)


def _pallas_attention_shortkey(q, k, v, scale: float, num_heads: int,
                               block_q: int = 512, interpret: bool = False):
    """(B, S_q, C) x (B, S_k<=256, C) head-packed attention; K/V padded to a
    128-multiple of rows and kept VMEM-resident."""
    b, s_q, c = q.shape
    s_k = k.shape[1]
    skp = ((s_k + 127) // 128) * 128
    if skp != s_k:
        pad = ((0, 0), (0, skp - s_k), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    block_q = min(block_q, s_q)
    grid = (b, pl.cdiv(s_q, block_q))
    scale_arr = jnp.full((1,), scale, jnp.float32)
    return vma_pallas_call(
        functools.partial(_cross_kernel, num_heads=num_heads, s_k=s_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp, c), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp, c), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_q, c), q.dtype),
        interpret=interpret,
    )(q, k, v, scale_arr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_heads_short(q, k, v, scale, num_heads):
    return _pallas_attention_shortkey(q, k, v, scale, num_heads)


def _flash_heads_short_fwd(q, k, v, scale, num_heads):
    return _pallas_attention_shortkey(q, k, v, scale, num_heads), (q, k, v)


def _flash_heads_short_bwd(scale, num_heads, res, g):
    # Short keys: the materialized-probs einsum backward is small (S_k<=256);
    # recompute through _heads_chunked for exact unfused gradients.
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _heads_chunked(q, k, v, scale, num_heads), q, k, v
    )
    return vjp(g)


_flash_heads_short.defvjp(_flash_heads_short_fwd, _flash_heads_short_bwd)


def attention_packed(q, k, v, scale: float, num_heads: int):
    """Attention on head-packed (B, S, C = H*D) tensors — no (B*H, S, D)
    relayout in HBM. Pallas kernel on TPU (with a flash/recompute VJP),
    chunked JAX attention elsewhere. Always differentiable.

    Short keys (S_k <= 256: text cross-attention, low-res self-attention)
    use the VMEM-resident padded-K/V kernel; long keys tile queries against
    the full K/V block."""
    d = q.shape[-1] // num_heads
    s_k, c = k.shape[1], k.shape[2]
    pallas_ok = (
        jax.default_backend() == "tpu"
        and d % 64 == 0
        and q.dtype in (jnp.float32, jnp.bfloat16)
        # full K/V (+ q/o tiles) must fit VMEM comfortably
        and 2 * s_k * c * q.dtype.itemsize <= 8 * 1024 * 1024
    )
    if pallas_ok and s_k <= 256:
        return _flash_heads_short(q, k, v, scale, num_heads)
    if pallas_ok:
        return _flash_heads(q, k, v, scale, num_heads)
    return _heads_chunked(q, k, v, scale, num_heads)


def attention_bh(q, k, v, scale: float):
    """Dispatcher on (B, H, S, D) tensors: Pallas flash kernel on TPU,
    chunked JAX attention elsewhere. Always differentiable."""
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    qf = q.reshape(b * h, s_q, d)
    kf = k.reshape(b * h, s_k, d)
    vf = v.reshape(b * h, s_k, d)
    if _supported(q, k):
        out = _flash(qf, kf, vf, scale)
    else:
        out = _chunked_sdpa(qf, kf, vf, scale)
    return out.reshape(b, h, s_q, d)


