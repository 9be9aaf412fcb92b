"""Numerics tests: lvd_tpu ops vs torch reference ops (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from lvd_tpu.ops import attention as attn_ops
from lvd_tpu.ops import basic as ops

RTOL = 2e-4
ATOL = 2e-5


def _np(x):
    return np.asarray(x)


def test_group_norm_matches_torch_2d():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, 7, 32)).astype(np.float32)
    scale = rng.standard_normal(32).astype(np.float32)
    bias = rng.standard_normal(32).astype(np.float32)

    ours = ops.group_norm({"scale": jnp.array(scale), "bias": jnp.array(bias)},
                          jnp.array(x), num_groups=8, eps=1e-5)
    theirs = F.group_norm(
        torch.tensor(x).permute(0, 3, 1, 2), 8,
        torch.tensor(scale), torch.tensor(bias), eps=1e-5,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=RTOL, atol=ATOL)


def test_group_norm_matches_torch_video():
    """GroupNorm over (B, C, F, H, W) — the temporal-transformer entry norm."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 5, 6, 16)).astype(np.float32)  # (B,F,H,W,C)
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)

    ours = ops.group_norm({"scale": jnp.array(scale), "bias": jnp.array(bias)},
                          jnp.array(x), num_groups=4, eps=1e-6)
    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)  # (B,C,F,H,W)
    theirs = F.group_norm(xt, 4, torch.tensor(scale), torch.tensor(bias), eps=1e-6)
    theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=RTOL, atol=ATOL)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 9, 24)).astype(np.float32)
    scale = rng.standard_normal(24).astype(np.float32)
    bias = rng.standard_normal(24).astype(np.float32)
    ours = ops.layer_norm({"scale": jnp.array(scale), "bias": jnp.array(bias)},
                          jnp.array(x), eps=1e-5)
    theirs = F.layer_norm(torch.tensor(x), (24,), torch.tensor(scale),
                          torch.tensor(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=RTOL, atol=ATOL)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    ours = ops.conv2d({"w": jnp.array(w), "b": jnp.array(b)}, jnp.array(x))
    theirs = F.conv2d(
        torch.tensor(x).permute(0, 3, 1, 2),
        torch.tensor(w).permute(3, 2, 0, 1), torch.tensor(b), padding=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=RTOL, atol=1e-4)

    ours_s2 = ops.conv2d({"w": jnp.array(w), "b": jnp.array(b)}, jnp.array(x), stride=2)
    theirs_s2 = F.conv2d(
        torch.tensor(x).permute(0, 3, 1, 2),
        torch.tensor(w).permute(3, 2, 0, 1), torch.tensor(b), stride=2, padding=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(ours_s2), theirs_s2, rtol=RTOL, atol=1e-4)


def test_temporal_conv3d_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 4, 4, 3)).astype(np.float32)  # (B,F,H,W,C)
    w = rng.standard_normal((3, 1, 1, 3, 3)).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)
    ours = ops.conv3d({"w": jnp.array(w), "b": jnp.array(b)}, jnp.array(x))
    theirs = F.conv3d(
        torch.tensor(x).permute(0, 4, 1, 2, 3),
        torch.tensor(w).permute(4, 3, 0, 1, 2), torch.tensor(b),
        padding=(1, 0, 0),
    ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=RTOL, atol=1e-4)


def test_attention_matches_torch_sdpa():
    rng = np.random.default_rng(5)
    b, s_q, s_k, heads, dim = 2, 12, 7, 4, 32
    x = rng.standard_normal((b, s_q, dim)).astype(np.float32)
    ctx = rng.standard_normal((b, s_k, dim)).astype(np.float32)
    p = {
        name: {"w": jnp.array(rng.standard_normal((dim, dim)).astype(np.float32) * 0.1)}
        for name in ("to_q", "to_k", "to_v")
    }
    p["to_out"] = {
        "w": jnp.array(rng.standard_normal((dim, dim)).astype(np.float32) * 0.1),
        "b": jnp.array(rng.standard_normal(dim).astype(np.float32)),
    }

    ours, probs = attn_ops.attention(
        p, jnp.array(x), jnp.array(ctx), num_heads=heads, return_probs=True
    )

    def to_heads(t):
        return t.reshape(b, -1, heads, dim // heads).permute(0, 2, 1, 3)

    q = to_heads(torch.tensor(x) @ torch.tensor(_np(p["to_q"]["w"])))
    k = to_heads(torch.tensor(ctx) @ torch.tensor(_np(p["to_k"]["w"])))
    v = to_heads(torch.tensor(ctx) @ torch.tensor(_np(p["to_v"]["w"])))
    ref_out = F.scaled_dot_product_attention(q, k, v)
    ref_out = ref_out.permute(0, 2, 1, 3).reshape(b, s_q, dim)
    ref_out = ref_out @ torch.tensor(_np(p["to_out"]["w"])) + torch.tensor(
        _np(p["to_out"]["b"])
    )
    np.testing.assert_allclose(_np(ours), ref_out.numpy(), rtol=1e-3, atol=1e-4)

    # Probabilities are a proper softmax over keys.
    assert probs.shape == (b, heads, s_q, s_k)
    np.testing.assert_allclose(_np(probs.sum(-1)), 1.0, rtol=1e-5, atol=1e-5)

    ref_probs = torch.softmax((q @ k.transpose(-1, -2)) / (dim // heads) ** 0.5, -1)
    np.testing.assert_allclose(_np(probs), ref_probs.numpy(), rtol=1e-3, atol=1e-5)


def test_timestep_embedding_matches_diffusers_formula():
    # diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)
    t = np.array([0.0, 1.0, 500.0, 999.0], dtype=np.float32)
    dim = 320
    ours = _np(ops.timestep_embedding(jnp.array(t), dim))
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float32) / half
    emb = t[:, None] * np.exp(exponent)[None]
    theirs = np.concatenate([np.cos(emb), np.sin(emb)], axis=-1)
    # sin/cos at ~1000 rad are ill-conditioned in fp32: argument rounding of
    # a few ulps shows up as ~1e-3 output differences between libm
    # implementations. That is far below bf16 resolution downstream.
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=5e-3)


def test_geglu_matches_torch():
    """geglu must match torch's F.gelu of the SAME form as the active
    GELU_FORM switch (the default tanh form deviates from the reference's
    erf form by ~3e-3, documented in ops/geglu_fused.py)."""
    from lvd_tpu.ops import geglu_fused

    rng = np.random.default_rng(6)
    x = rng.standard_normal((3, 5, 8)).astype(np.float32)
    w = rng.standard_normal((8, 32)).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    ours = ops.geglu({"w": jnp.array(w), "b": jnp.array(b)}, jnp.array(x))
    proj = torch.tensor(x) @ torch.tensor(w) + torch.tensor(b)
    h, gate = proj.chunk(2, dim=-1)
    approx = "tanh" if geglu_fused.GELU_FORM == "tanh" else "none"
    theirs = (h * F.gelu(gate, approximate=approx)).numpy()
    np.testing.assert_allclose(_np(ours), theirs, rtol=1e-4, atol=1e-5)


def test_linear_fused_kernel_interpret():
    """Resident-weights Pallas linear (ops/linear_fused.py) must reproduce
    jnp.dot + bias exactly in interpret mode, with and without bias."""
    from lvd_tpu.ops import linear_fused as lf

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((300, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal(256).astype(np.float32)) * 0.1

    got = lf._fused_rows(x, w, b, block_m=128, interpret=True)
    want = x @ w + b
    np.testing.assert_allclose(_np(got), _np(want), rtol=2e-5, atol=2e-5)

    got_nb = lf._fused_rows(x, w, None, block_m=128, interpret=True)
    np.testing.assert_allclose(_np(got_nb), _np(x @ w), rtol=2e-5, atol=2e-5)


def test_linear_fused_block_sizing():
    """_block_m_for must keep the kernel's scoped-VMEM working set (double
    buffered x/out tiles + resident weights + fp32 accumulator) under the
    16 MB stack that the fixed 1024 block overflowed at C=N=1280."""
    from lvd_tpu.ops.linear_fused import _block_m_for

    for c, n in ((320, 320), (640, 640), (1280, 1280), (320, 2560)):
        bm = _block_m_for(10 ** 6, c, n, 2)
        working = bm * (2 * 2 * c + 2 * 2 * n + 4 * n) + c * n * 2
        assert working <= 14 * 1024 * 1024, (c, n, bm, working)
        assert bm >= 128
    assert _block_m_for(10 ** 6, 1280, 1280, 2) == 512
    assert _block_m_for(64, 320, 320, 2) == 64  # clamped to rows


def test_conv3x3_kernel_interpret():
    """Pallas 3x3 SAME conv (ops/conv3x3.py) must reproduce
    lax.conv_general_dilated, including the H-edge halo rows the
    overlapping pl.Element windows read from the pre-padded input."""
    from lvd_tpu.ops.conv3x3 import _conv3x3_pallas

    k = jax.random.split(jax.random.PRNGKey(3), 2)
    x = jax.random.normal(k[0], (2, 16, 12, 64), jnp.float32)
    w = jax.random.normal(k[1], (3, 3, 64, 128), jnp.float32) * 0.05
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = _conv3x3_pallas(x, w, interpret=True)
    np.testing.assert_allclose(_np(got), _np(want), rtol=1e-5, atol=1e-5)
