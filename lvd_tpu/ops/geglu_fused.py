"""Fused GEGLU MLP Pallas kernel (TPU).

The BasicTransformerBlock feed-forward (reference models/attention.py:279-328:
Linear(dim -> 2*inner) -> split -> h * gelu(gate) -> Linear(inner -> dim)) is
bandwidth-bound on TPU: the inner activation (4x wider than the residual
stream, e.g. 354 MB at zeroscope L0 shapes) makes two full HBM round-trips
between the matmuls. This kernel streams inner chunks through VMEM instead:
for each row tile, every k-chunk computes h/gate slices of the first matmul,
gates them, and accumulates the second matmul into an fp32 scratch — the
inner activation never touches HBM.

Backward falls back to the unfused formulation via recompute (custom VJP), so
training and the guidance `jax.grad` keep exact unfused-gradient semantics.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .vma import pallas_call as vma_pallas_call
from jax.experimental.pallas import tpu as pltpu

# GELU formulation for the gate. "exact" is the erf form the reference uses
# (torch F.gelu default, models/attention.py:305); "tanh" is the standard
# tanh approximation — max abs error ~3e-3, at/below bf16 rounding of the
# O(1) activations, and ~half the VPU ops (one short polynomial + exp
# instead of sign/abs/5-term poly/exp). Both the Pallas kernel and the
# unfused/backward path follow this switch so every backend computes the
# same function. Measured on the full CFG forward (real v5e chip,
# interleaved A/B): 419.1 -> 407.5 ms. Set LVD_GELU_FORM=exact to restore
# the reference's erf form bit-for-bit.
GELU_FORM = os.environ.get("LVD_GELU_FORM", "tanh")


def _erf_poly(x):
    # Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — far below bf16
    # resolution); Mosaic has no erf primitive, exp it has.
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
             + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    # Erf-form GELU, matching jax.nn.gelu(approximate=False) in fp32 to 1e-7.
    return x * 0.5 * (1.0 + _erf_poly(x * (2.0 ** -0.5)))


def _gelu_tanh(x):
    # Tanh-form GELU, matching jax.nn.gelu(approximate=True); tanh written
    # via exp2 (the TPU transcendental unit's native base, and Mosaic has no
    # tanh): x*0.5*(1+tanh(z)) = x*sigmoid(2z) = x/(1+2^(-2*log2(e)*z)).
    z = x + 0.044715 * x * x * x
    return x / (1.0 + jnp.exp2(-2.302208563834158 * z))


def _gate(h, g, form: str):
    return h * (_gelu_tanh(g) if form == "tanh" else _gelu_exact(g))


def _gelu_val_grad(g, form: str):
    """(gelu(g), gelu'(g)) in fp32, closed form (both GELU_FORM variants).
    The tanh form is algebraically identical to AD through _gelu_tanh; the
    exact form pairs the A&S polynomial erf CDF with the *true* Gaussian
    pdf, so it matches AD through _gelu_exact (which differentiates the
    polynomial) to ~1e-4, not bit-for-bit."""
    if form == "tanh":
        # u = g * sigmoid(a*z), z = g + 0.044715 g^3, a = 2*sqrt(2/pi)
        a = 1.5957691216057308
        z = g + 0.044715 * g * g * g
        sig = 1.0 / (1.0 + jnp.exp2(-2.302208563834158 * z))
        dz = 1.0 + 3.0 * 0.044715 * g * g
        return g * sig, sig + g * sig * (1.0 - sig) * a * dz
    phi_c = 0.3989422804014327  # 1/sqrt(2*pi)
    cdf = 0.5 * (1.0 + _erf_poly(g * (2.0 ** -0.5)))
    pdf = phi_c * jnp.exp(-0.5 * g * g)
    return g * cdf, cdf + g * pdf


def _geglu_kernel(x_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref, w2_ref, b2_ref,
                  o_ref, acc_ref, *, nk, form):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1h_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1h_ref[...].astype(jnp.float32)
    g = jax.lax.dot_general(
        x, w1g_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1g_ref[...].astype(jnp.float32)
    inner = _gate(h, g, form).astype(x.dtype)
    acc_ref[...] += jax.lax.dot_general(
        inner, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _done():
        o_ref[...] = (
            acc_ref[...] + b2_ref[...].astype(jnp.float32)
        ).astype(o_ref.dtype)


def _geglu_kernel_resident(x_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref, w2_ref,
                           b2_ref, o_ref, *, nk, form):
    # Weights live in VMEM as constant-index blocks (fetched once for the
    # whole grid); only x/out stream. The k-grid variant refetches every
    # weight chunk at each row-block transition — ~660 MB of pure weight
    # traffic per L0 instance (2.51 -> 2.02 ms measured standalone).
    #
    # Software-pipelined chunk loop (nk > 1): chunk k+1's h/g MXU dots are
    # issued before chunk k's VPU gelu gate + second dot, so the MXU never
    # stalls on the transcendental pass (L1 1.643 -> 1.533 ms standalone).
    x = x_ref[...]
    inner = w2_ref.shape[0]
    bk = inner // nk

    def hg(k):
        sl = slice(k * bk, (k + 1) * bk)
        h = jax.lax.dot_general(
            x, w1h_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1h_ref[0, sl].astype(jnp.float32)
        g = jax.lax.dot_general(
            x, w1g_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1g_ref[0, sl].astype(jnp.float32)
        return h, g

    acc = None
    cur = hg(0)
    for k in range(nk):
        nxt = hg(k + 1) if k + 1 < nk else None
        h, g = cur
        inner_act = _gate(h, g, form).astype(x.dtype)
        part = jax.lax.dot_general(
            inner_act, w2_ref[slice(k * bk, (k + 1) * bk)],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
        cur = nxt
    o_ref[...] = (acc + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _fused_rows_resident(x, w1, b1, w2, b2, *, block_m: int, nk: int,
                         interpret: bool = False):
    r, c = x.shape
    inner = w2.shape[0]
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h, b1g = b1[None, :inner], b1[None, inner:]
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return vma_pallas_call(
        functools.partial(_geglu_kernel_resident, nk=nk, form=GELU_FORM),
        grid=(pl.cdiv(r, block_m),),
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full((c, inner)), full((c, inner)),
            full((1, inner)), full((1, inner)),
            full((inner, c)), full((1, c)),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=interpret,
    )(x, w1h, w1g, b1h, b1g, w2, b2[None, :])


def _resident_form_ok(c, inner, itemsize, chunk_mod):
    """Single source of truth for the resident-weights routing gate: w1h +
    w1g + w2 (3 * C * inner elements) must fit the ~10 MB VMEM weight
    budget alongside the row blocks, and the inner dim must chunk evenly
    (forward pipelines in 4s, backward in 8s). Shared by supported(),
    _fused_rows, and _fused_bwd so the constants cannot silently diverge."""
    return (3 * c * inner * itemsize <= 10 * 1024 * 1024
            and inner % chunk_mod == 0)


def _fused_rows(x, w1, b1, w2, b2, *, block_m: int = None, block_k: int = None,
                interpret: bool = False):
    """x: (R, C); w1: (C, 2*inner); w2: (inner, C). Returns (R, C)."""
    r, c = x.shape
    inner = w2.shape[0]
    # Resident-weights path when w1+w2 fit VMEM alongside the row blocks
    # (<= ~10 MB: the C=320 and C=640 UNet levels). Measured (standalone,
    # v5e): L0 2.51 -> 2.02 ms, L1 2.08 -> 1.56 ms.
    w_bytes = 3 * c * inner * x.dtype.itemsize
    if block_k is None and _resident_form_ok(c, inner, x.dtype.itemsize, 4):
        if w_bytes <= 3 * 1024 * 1024:
            # Round-4 sweep (tools/sweep_geglu.py, real chip, L0 shape):
            # bm=1536/nk=2 1.664 ms vs bm=1024/nk=1 1.763, bm=512/nk=1 1.747.
            bm, nk = 1536, 2
        else:
            # L1 shape, round-4 sweep: bm=256/nk=1 1.223 ms vs bm=512/nk=1
            # 1.284 (bm=768/nk=2 was 1.204 but its fp32 h/g chunks push the
            # scoped-VMEM budget over 16 MB in the energy-walk fusion
            # context — the bm=512 form already OOM'd there at 16.41 MB).
            bm, nk = 256, 1
        return _fused_rows_resident(
            x, w1, b1, w2, b2, block_m=min(bm, r), nk=nk, interpret=interpret)
    if block_k is None:
        # Largest measured-good chunk that tiles the inner dim exactly.
        block_k = 512 if inner % 512 == 0 else 256
    if block_m is None:
        # fp32 accumulator is (block_m, C); stay well under the 16 MB scoped
        # VMEM even with surrounding context (in-UNet compiles OOM'd at
        # block_m=512, C=1280 although the standalone kernel fit).
        block_m = 512 if c <= 640 else 256
    if inner % block_k:
        raise ValueError(f"inner={inner} not divisible by block_k={block_k}")
    nk = inner // block_k
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h, b1g = b1[None, :inner], b1[None, inner:]

    return vma_pallas_call(
        functools.partial(_geglu_kernel, nk=nk, form=GELU_FORM),
        grid=(pl.cdiv(r, block_m), nk),
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_k), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_k), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, c), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, c), jnp.float32)],
        interpret=interpret,
    )(x, w1h, w1g, b1h, b1g, w2, b2[None, :])


def _geglu_bwd_kernel_resident(x_ref, dy_ref, w1h_ref, w1g_ref, b1h_ref,
                               b1g_ref, w2_ref, dx_ref, *, nk, form):
    # dx-only backward with resident weights: per row tile, each inner chunk
    # recomputes h/g, forms d_inner = dy @ w2[sl]^T, gates it, and
    # accumulates dx += dh @ w1h[:,sl]^T + dg @ w1g[:,sl]^T — the 4x-wide
    # inner activation (and its cotangent) never touch HBM. Weight/bias
    # gradients are NOT computed here; the caller derives them from the
    # unfused recompute branch, which XLA dead-code-eliminates entirely in
    # the latent-only guidance grad.
    x = x_ref[...]
    dy = dy_ref[...]
    inner = w2_ref.shape[0]
    bk = inner // nk
    acc = None
    for k in range(nk):
        sl = slice(k * bk, (k + 1) * bk)
        h = jax.lax.dot_general(
            x, w1h_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1h_ref[0, sl].astype(jnp.float32)
        g = jax.lax.dot_general(
            x, w1g_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1g_ref[0, sl].astype(jnp.float32)
        d_inner = jax.lax.dot_general(
            dy, w2_ref[sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (bm, bk)
        u, du = _gelu_val_grad(g, form)
        dh = (d_inner * u).astype(x.dtype)
        dg = (d_inner * h * du).astype(x.dtype)
        part = jax.lax.dot_general(
            dh, w1h_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            dg, w1g_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    dx_ref[...] = acc.astype(dx_ref.dtype)


def _fused_rows_bwd_resident(x, dy, w1, b1, w2, *, block_m: int = None,
                             nk: int = None, interpret: bool = False):
    """dx of the GEGLU MLP on (R, C) rows; weights resident in VMEM."""
    r, c = x.shape
    inner = w2.shape[0]
    if nk is None:
        # Three live fp32 (bm, inner/nk) chunks: keep them ~<=4 MB total.
        nk = 1
        while (3 * 4 * 512 * (inner // nk) > 4 * 1024 * 1024
               and nk < 8 and inner % (2 * nk) == 0):
            nk *= 2
    if block_m is None:
        block_m = 512
    block_m = min(block_m, r)
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h, b1g = b1[None, :inner], b1[None, inner:]
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((block_m, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return vma_pallas_call(
        functools.partial(_geglu_bwd_kernel_resident, nk=nk, form=GELU_FORM),
        grid=(pl.cdiv(r, block_m),),
        in_specs=[
            tile, tile,
            full((c, inner)), full((c, inner)),
            full((1, inner)), full((1, inner)),
            full((inner, c)),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=interpret,
    )(x, dy, w1h, w1g, b1h, b1g, w2)


def _unfused(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1, preferred_element_type=x.dtype) + b1.astype(x.dtype)
    a, gate = jnp.split(h, 2, axis=-1)
    inner = a * jax.nn.gelu(gate, approximate=GELU_FORM == "tanh")
    return jnp.dot(inner, w2, preferred_element_type=x.dtype) + b2.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused(x, w1, b1, w2, b2):
    return _fused_rows(x, w1, b1, w2, b2)


def _fused_fwd(x, w1, b1, w2, b2):
    return _fused_rows(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _fused_bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_unfused, x, w1, b1, w2, b2)
    dx, dw1, db1, dw2, db2 = vjp(g)
    # On TPU, when the resident-weights form applies, compute dx with the
    # streaming Pallas kernel instead — the unfused dx chain (and, in the
    # latent-only guidance grad, the whole recompute above) is then dead
    # code XLA removes. Training grads (dw/db) still come from the unfused
    # recompute, keeping exact unfused weight-gradient semantics.
    c = x.shape[-1]
    inner = w2.shape[0]
    if (jax.default_backend() == "tpu"
            and _resident_form_ok(c, inner, x.dtype.itemsize, 8)):
        dx = _fused_rows_bwd_resident(x, g.astype(x.dtype), w1, b1, w2)
    return dx, dw1, db1, dw2, db2


_fused.defvjp(_fused_fwd, _fused_bwd)


def supported(w1, w2, x) -> bool:
    c = x.shape[-1]
    inner = w2.shape[0]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return (
        jax.default_backend() == "tpu"
        and x.dtype in (jnp.bfloat16, jnp.float32)
        and inner % 256 == 0
        and c % 8 == 0
        and rows >= 2048
        # Only where the resident-weights form applies (C<=640). At C=1280
        # the k-grid streaming variant measured *slower* than XLA's unfused
        # formulation at every swept block config (1.64-1.79 vs 1.56 ms,
        # tools/sweep_geglu.py round 3) — the weight refetch per row block
        # costs more than the saved inner-activation round-trip there.
        and _resident_form_ok(c, inner, x.dtype.itemsize, 8)
    )


def geglu_mlp(p, x):
    """Fused GEGLU feed-forward on (..., C) input; params are the standard
    ff dict {"proj": {w, b}, "out": {w, b}} (see ops.basic.feed_forward)."""
    w1 = p["proj"]["w"].astype(x.dtype)
    b1 = p["proj"]["b"].astype(x.dtype)
    w2 = p["out"]["w"].astype(x.dtype)
    b2 = p["out"]["b"].astype(x.dtype)
    lead = x.shape[:-1]
    c = x.shape[-1]
    rows = 1
    for s in lead:
        rows *= s
    out = _fused(x.reshape(rows, c), w1, b1, w2, b2)
    return out.reshape(*lead, c)
