"""Fused/chunked attention correctness (CPU: chunked path + interpreted
Pallas kernel; the real kernel is exercised on TPU by bench/graft entry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvd_tpu.ops import pallas_attention as pa
from lvd_tpu.ops.attention import sdpa


def _ref_attention(q, k, v, scale):
    logits = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)


@pytest.mark.parametrize("s_q,s_k", [(180, 180), (720, 77), (333, 77)])
def test_chunked_matches_reference(s_q, s_k):
    rng = np.random.default_rng(0)
    d = 64
    q = jnp.asarray(rng.standard_normal((4, s_q, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((4, s_k, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((4, s_k, d)), jnp.float32)
    scale = d ** -0.5
    got = pa._chunked_sdpa(q, k, v, scale, block_q=128)
    want = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_chunked_gradients_match_reference():
    rng = np.random.default_rng(1)
    d = 32
    q = jnp.asarray(rng.standard_normal((2, 96, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 40, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 40, d)), jnp.float32)
    scale = d ** -0.5

    def loss_chunked(q, k, v):
        return jnp.sum(pa._chunked_sdpa(q, k, v, scale, block_q=32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, scale) ** 2)

    g_c = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_c, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_pallas_kernel_interpret_mode():
    """Run the actual kernel body through the Pallas interpreter on CPU."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    bh, s, d = 3, 256, 64
    q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    scale = jnp.full((1,), d ** -0.5, jnp.float32)

    block_q = 128
    out = pl.pallas_call(
        pa._attn_kernel,
        grid=(bh, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        interpret=True,
    )(q, k, v, scale)

    want = _ref_attention(q, k, v, float(d ** -0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_packed_heads_matches_split(monkeypatch):
    """attention_packed (head-packed (B, S, C) layout) must equal split-head
    attention, values and gradients, including the in-kernel head slicing
    (interpreted Pallas on CPU; the compiled kernel is bit-checked on TPU)."""
    rng = np.random.default_rng(4)
    b, s, h, d = 2, 288, 5, 64
    c = h * d
    q = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    scale = d ** -0.5

    def split(t):
        return t.reshape(b, s, h, d).transpose(0, 2, 1, 3).reshape(b * h, s, d)

    want = _ref_attention(split(q), split(k), split(v), scale)
    want = want.reshape(b, h, s, d).transpose(0, 2, 1, 3).reshape(b, s, c)

    got = pa.attention_packed(q, k, v, scale, h)  # chunked fallback on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)

    g_p = jax.grad(lambda q: jnp.sum(pa.attention_packed(q, k, v, scale, h) ** 2))(q)
    g_r = jax.grad(
        lambda q: jnp.sum(
            (_ref_attention(split(q), split(k), split(v), scale)) ** 2
        )
    )(q)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), rtol=5e-4, atol=5e-5)

    # The heads kernel body itself, through the interpreter.
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(pa._attn_kernel_heads, num_heads=h),
        grid=(b, s // 144),
        in_specs=[
            pl.BlockSpec((1, 144, c), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s, c), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s, c), lambda b, i: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 144, c), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
        interpret=True,
    )(q, k, v, jnp.full((1,), scale, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_shortkey_kernel_matches_reference():
    """The padded-K/V short-key kernel (interpret mode) must equal reference
    attention on a 77-token key (cross-attention shape), incl. the column
    mask over the 77->128 zero padding; its VJP must match the unfused
    gradients."""
    import functools
    rng = np.random.default_rng(7)
    b, s_q, s_k, h, d = 2, 160, 77, 5, 64
    c = h * d
    q = jnp.asarray(rng.standard_normal((b, s_q, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s_k, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s_k, c)), jnp.float32)
    scale = d ** -0.5

    def split(t):
        s = t.shape[1]
        return t.reshape(b, s, h, d).transpose(0, 2, 1, 3).reshape(b * h, s, d)

    want = _ref_attention(split(q), split(k), split(v), scale)
    want = want.reshape(b, h, s_q, d).transpose(0, 2, 1, 3).reshape(b, s_q, c)

    got = pa._pallas_attention_shortkey(q, k, v, scale, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    g_got = pa._flash_heads_short_bwd(
        scale, h, (q, k, v),
        2.0 * pa._heads_chunked(q, k, v, scale, h))
    g_want = jax.grad(
        lambda q, k, v: jnp.sum(pa._heads_chunked(q, k, v, scale, h) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=5e-4, atol=5e-5)


def test_flash_backward_kernel_matches_reference():
    """The Pallas flash-backward kernel (interpret mode) must reproduce the
    analytic attention gradients, including masking of the padded rows of a
    non-divisible final q-tile."""
    rng = np.random.default_rng(5)
    bh, s, d = 3, 200, 64  # 200 % 128 != 0: exercises the padded-tile mask
    q = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)
    scale = d ** -0.5
    cot = jnp.asarray(rng.standard_normal((bh, s, d)), jnp.float32)

    o, vjp = jax.vjp(lambda q, k, v: _ref_attention(q, k, v, scale), q, k, v)
    want = vjp(cot)
    got = pa._pallas_attention_bwd(q, k, v, o, cot, scale, block_q=128,
                                   interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_sdpa_dispatch_consistency():
    """sdpa with and without the fused path must agree (B, H, S, D layout)."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 4, 400, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 4, 400, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 4, 400, 64)), jnp.float32)
    out_fused, _ = sdpa(q, k, v)  # dispatches chunked on CPU (>256*256)
    out_probs, probs = sdpa(q, k, v, return_probs=True)
    assert probs is not None
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_probs), rtol=2e-4, atol=2e-5
    )


def test_bwd_heads_kernel_matches_reference():
    """Head-packed flash backward kernel (interpret mode) vs AD through the
    reference attention, including q-row padding (s_q not a tile multiple)."""
    rng = np.random.default_rng(7)
    b, s_q, s_k, h, d = 2, 112, 96, 3, 64
    c = h * d
    scale = d ** -0.5
    q = jnp.asarray(rng.standard_normal((b, s_q, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s_k, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s_k, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s_q, c)), jnp.float32)

    def ref_packed(q, k, v):
        def one(h_):
            sl = slice(h_ * d, (h_ + 1) * d)
            return _ref_attention(q[..., sl], k[..., sl], v[..., sl], scale)
        return jnp.concatenate([one(i) for i in range(h)], axis=-1)

    o, vjp = jax.vjp(ref_packed, q, k, v)
    want = vjp(g)
    got = pa._pallas_attention_bwd_heads(
        q, k, v, o, g, scale, num_heads=h, block_q=64, interpret=True)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4)
