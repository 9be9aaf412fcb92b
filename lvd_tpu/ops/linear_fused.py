"""Pallas resident-weights linear (+bias) for Pallas-adjacent projections.

Why this exists (round-4 HLO census, PERF.md): XLA's layout assignment
prefers transposed-LHS layouts ({1,0,2}) for the big UNet projection dots,
while every Pallas custom-call boundary pins the default {2,1,0} — each
disagreement materializes an 88.5 MB relayout copy of the L0 activation
stream (~1.9 GB/forward attributed to `basic.py:27`). A Pallas matmul emits
the default layout directly, so projections that FEED or ARE FED BY Pallas
kernels (qkv/out around the attention kernels, FF-adjacent linears) skip
the copy; the kernel itself runs at the same K/N tile-rounding ceiling the
GEGLU kernel measured (~173 TF/s at K=N=320).

Used only where `supported()` says the weights fit the VMEM budget and the
shapes tile; everything else stays on `jnp.dot` (reference hot path:
attention_processor.py:241-247 baddbmm — here the equivalent projection
matmuls around the SDPA sites).

MEASURED REJECTION as the default route (round 5, real v5e): with the
attention projections routed through this kernel the flagship bench is
17.893 s/video vs 17.599 without — removing ~2 GB/fwd of boundary
relayout copies (census-verified) does not pay for the kernel's per-site
deficit vs the XLA dot (tools/sweep_linear_layout.py: L0-shaped 0.354 vs
0.282 ms standalone) plus its custom-VJP backward in the guided update.
Opt-in via LVD_FUSED_LINEAR=1 (ops/attention.py); the kernel stays
selfchecked on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vma import pallas_call as vma_pallas_call


def _linear_kernel(x_ref, w_ref, b_ref, o_ref):
    y = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (y + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _linear_kernel_nobias(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _block_m_for(r: int, c: int, n: int, itemsize: int) -> int:
    """Largest row block whose working set fits the ~16 MB scoped-VMEM
    stack: double-buffered x and out tiles, the resident weights, and the
    kernel's fp32 dot accumulator (the piece that blew the limit at
    C=N=1280 with a fixed 1024 block: 16.46M > 16.00M)."""
    weights = c * n * itemsize
    per_row = 2 * c * itemsize + 2 * n * itemsize + 4 * n
    budget = 14 * 1024 * 1024 - weights
    bm = 1024
    while bm > 128 and bm * per_row > budget:
        bm //= 2
    return min(bm, r)


def _fused_rows(x, w, b=None, *, block_m: int = None, interpret: bool = False):
    """x: (R, C) @ w: (C, N) (+ b: (N,)) -> (R, N), default layout in/out."""
    r, c = x.shape
    n = w.shape[1]
    if block_m is None:
        block_m = _block_m_for(r, c, n, x.dtype.itemsize)
    block_m = min(block_m, r)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full((c, n)),
    ]
    args = [x, w]
    kernel = _linear_kernel_nobias
    if b is not None:
        in_specs.append(full((1, n)))
        args.append(b[None, :])
        kernel = _linear_kernel
    return vma_pallas_call(
        kernel,
        grid=(pl.cdiv(r, block_m),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        interpret=interpret,
    )(*args)


def supported(w, x) -> bool:
    """Resident weights + one fp32 accumulator row-block must fit VMEM."""
    if jax.default_backend() != "tpu":
        return False
    c, n = w.shape
    itemsize = x.dtype.itemsize
    return (
        x.ndim >= 2
        and x.shape[-1] == c
        and c % 128 == 0
        and n % 128 == 0
        and c * n * itemsize <= 6 * 1024 * 1024
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _linear_core(x2d, w, b):
    return _fused_rows(x2d, w, b)


def _linear_core_fwd(x2d, w, b):
    return _fused_rows(x2d, w, b), (x2d, w)


def _linear_core_bwd(res, dy):
    # dx via the same resident kernel (dy @ w^T keeps the default layout on
    # both sides); weight/bias grads in plain XLA (training path only — the
    # guidance latent-grad DCEs them).
    x2d, w = res
    dx = _fused_rows(dy, jnp.transpose(w)) if supported(
        jnp.transpose(w), dy) else dy @ jnp.transpose(w).astype(dy.dtype)
    dw = jax.lax.dot_general(
        x2d, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    db = dy.sum(0).astype(w.dtype)
    return dx, dw, db


_linear_core.defvjp(_linear_core_fwd, _linear_core_bwd)


def linear(p, x):
    """Drop-in for ops.basic.linear on supported shapes: flattens leading
    dims, runs the resident-weights kernel, restores the shape."""
    w = p["w"].astype(x.dtype)
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    b = p.get("b")
    if b is None:
        b = jnp.zeros((w.shape[1],), x.dtype)
    y = _linear_core(x2d, w, b.astype(x.dtype))
    return y.reshape(lead + (w.shape[1],))


def maybe_linear(p, x):
    """linear() when this weight/input pair fits the kernel, else the plain
    XLA dot (per-weight check: cross-attention k/v project from C_enc)."""
    if supported(p["w"], x):
        return linear(p, x)
    from .basic import linear as base_linear

    return base_linear(p, x)
