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


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over channels-last input of any rank >= 2.

    Statistics are computed per (batch, group) over all non-batch axes —
    matching torch.nn.GroupNorm where for input (N, C, *spatial) the
    normalization covers (C/G, *spatial).
    """
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    n = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    g = num_groups
    xg = x.reshape(n, -1, g, c // g)  # (N, prod(spatial), G, C/G)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(n, *spatial, c)
    x = x * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return x.astype(orig_dtype)


def layer_norm(p: Optional[dict], x, eps: float = 1e-5):
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        x = x * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return x.astype(orig_dtype)


def silu(x):
    return jax.nn.silu(x)


def geglu(p, x):
    """GEGLU projection: Linear(dim -> 2*inner), gate with exact GELU."""
    h = linear(p, x)
    h, gate = jnp.split(h, 2, axis=-1)
    return h * jax.nn.gelu(gate, approximate=False)


def feed_forward(p, x):
    """BasicTransformerBlock FF: GEGLU -> Linear (reference models/attention.py:279-328)."""
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
