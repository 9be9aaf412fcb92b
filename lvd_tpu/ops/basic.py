"""Core functional ops (channels-last / NHWC, TPU-friendly).

These replace the implicit native kernels the reference leans on (cuDNN
convs, torch GroupNorm/LayerNorm, fused SDPA — see SURVEY.md §2). Everything
is a pure function of (params, inputs); params are plain dicts so the whole
model is a pytree that `jit`/`pjit`/`grad` can move through.

Conventions:
  linear params: {"w": (in, out), "b": (out,)?}
  conv2d params: {"w": (kh, kw, in, out), "b": (out,)?}         (HWIO)
  conv3d params: {"w": (kt, kh, kw, in, out), "b": (out,)?}
  norm params:   {"scale": (C,), "bias": (C,)}
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def linear(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d(p, x, stride: int = 1, padding: int = 1):
    """x: (N, H, W, C) -> (N, H', W', O)."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv3d(p, x, padding=((1, 1), (0, 0), (0, 0))):
    """x: (N, T, H, W, C); kernel (kt, kh, kw, in, out)."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def group_norm_coeffs(p, x, num_groups: int = 32, eps: float = 1e-5,
                      axis_name: str = None, count_override: int = None):
    """Per-channel affine GroupNorm coefficients (a, b), both (N, C) fp32,
    such that `y = x * a + b` — the statistics half of `group_norm`, exposed
    so fused kernels (ops/temp_conv_fused.py) can apply the normalization
    inside a single activation pass."""
    n = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    per_group = (x.size // n) // g

    xr = x.reshape(n, -1, c)
    onehot = (
        jnp.arange(c, dtype=jnp.int32)[:, None] // (c // g)
        == jnp.arange(g, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)

    # Per-channel sums/sumsqs with fp32 accumulation; the fp32 casts feed
    # reductions directly so no fp32 copy of x is ever materialized.
    # The sum-of-squares must be a plain reduce, NOT an einsum: einsum
    # lowers to a dot_general contracting the (long) pixel axis, and XLA
    # layout assignment then wants pixels on lanes ({1,0,2}) — relayouting
    # the whole activation stream at every GroupNorm site (round-4 HLO
    # census: 88.5 MB {1,0,2} copies per L0 norm).
    s1c = jnp.sum(xr, axis=1, dtype=jnp.float32)  # (n, c)
    x32 = xr.astype(jnp.float32)
    s2c = jnp.sum(x32 * x32, axis=1)
    s1 = s1c @ onehot  # (n, g)
    s2 = s2c @ onehot
    if axis_name is not None:
        # Sharded statistics (e.g. frames split across the mesh): reduce the
        # group sums over the axis; the per-group count scales accordingly.
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        per_group = per_group * jax.lax.axis_size(axis_name)
    if count_override is not None:
        # Exact element count when the shard carries zero padding (padded
        # elements contribute nothing to the sums, only to the count).
        per_group = count_override
    mean_g = s1 / per_group
    var_g = jnp.maximum(s2 / per_group - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)

    # Per-channel affine folded with the group statistics:
    #   y = (x - mean) * inv * scale + bias = x * a + b
    scale = p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32)
    inv_c = inv_g @ onehot.T  # (n, c)
    mean_c = mean_g @ onehot.T
    a = inv_c * scale[None, :]
    b = bias[None, :] - mean_c * a
    return a, b


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-5,
               axis_name: str = None, count_override: int = None):
    """GroupNorm over channels-last input of any rank >= 2.

    Statistics are computed per (batch, group) over all non-batch axes —
    matching torch.nn.GroupNorm where for input (N, C, *spatial) the
    normalization covers (C/G, *spatial).

    TPU note: reshaping channels into (G, C/G) puts C/G (e.g. 10) on the
    lane dimension — a relayout of every activation, twice, per norm.
    Instead, group sums are taken with a one-hot (C, G) matmul (MXU does the
    reduction) and the normalization stays in the native (..., C) layout.
    """
    orig_dtype = x.dtype
    orig_shape = x.shape
    n = x.shape[0]
    c = x.shape[-1]
    a, b = group_norm_coeffs(
        p, x, num_groups, eps, axis_name=axis_name,
        count_override=count_override,
    )
    xr = x.reshape(n, -1, c)
    # Apply in the input dtype: the coefficients carry the f32 statistics,
    # and the output is rounded to orig_dtype either way — but an f32
    # elementwise apply makes XLA materialize (and often copy-relayout) an
    # f32 tensor 2x the activation size between this op and the consumer
    # (measured 45 x 59 MB copies per CFG forward at the 1280-ch levels).
    y = xr * a[:, None, :].astype(orig_dtype) + b[:, None, :].astype(orig_dtype)
    return y.reshape(orig_shape)


def layer_norm(p: Optional[dict], x, eps: float = 1e-5):
    orig_dtype = x.dtype
    # fp32 statistics via accumulating reductions (no fp32 copy of x).
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(
        x.astype(jnp.float32) * x.astype(jnp.float32), axis=-1, keepdims=True
    )
    var = jnp.maximum(m2 - mean * mean, 0.0)
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def silu(x):
    return jax.nn.silu(x)


def geglu(p, x):
    """GEGLU projection: Linear(dim -> 2*inner), gated with GELU. The GELU
    form follows ops.geglu_fused.GELU_FORM so the fused kernel, the unfused
    fallback, and this path all compute the same function."""
    from . import geglu_fused

    h = linear(p, x)
    h, gate = jnp.split(h, 2, axis=-1)
    return h * jax.nn.gelu(gate, approximate=geglu_fused.GELU_FORM == "tanh")


def feed_forward(p, x):
    """BasicTransformerBlock FF: GEGLU -> Linear (reference models/attention.py:279-328).

    On TPU the fused Pallas kernel streams the 4x-wide inner activation
    through VMEM instead of round-tripping it via HBM (ops/geglu_fused.py)."""
    import os

    if os.environ.get("LVD_DISABLE_FUSED_FF") != "1":
        from . import geglu_fused

        if geglu_fused.supported(p["proj"]["w"], p["out"]["w"], x):
            return geglu_fused.geglu_mlp(p, x)
    return linear(p["out"], geglu(p["proj"], x))


def timestep_embedding(timesteps, dim: int, flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0, max_period: float = 10000.0):
    """Sinusoidal timestep embedding (diffusers `Timesteps`). timesteps: (N,)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def time_embedding_mlp(p, t_emb):
    """diffusers `TimestepEmbedding`: linear -> silu -> linear."""
    return linear(p["linear_2"], silu(linear(p["linear_1"], t_emb)))


def upsample_nearest_2x(x):
    """(N, H, W, C) -> (N, 2H, 2W, C) nearest-neighbour."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)
