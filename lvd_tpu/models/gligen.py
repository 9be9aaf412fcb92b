"""GLIGEN grounding components: Fourier box embedder, PositionNet, and the
gated self-attention fuser.

Parity targets: /root/reference/models/unet_3d_condition.py:47-179
(`FourierEmbedder`, `PositionNet`) and /root/reference/models/attention.py:26-60
(`GatedSelfAttentionDense`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.basic import feed_forward, layer_norm, linear, silu


def fourier_embed(x, num_freqs: int = 8, temperature: float = 100.0):
    """(..., 4) boxes -> (..., num_freqs * 2 * 4) Fourier features.

    Feature ordering matches the reference FourierEmbedder: frequency-major,
    then (sin, cos), then coordinate.
    """
    freqs = temperature ** (
        jnp.arange(num_freqs, dtype=jnp.float32) / num_freqs
    )
    ang = x[..., None].astype(jnp.float32) * freqs  # (..., 4, num_freqs)
    emb = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # (..., 4, F, 2)
    emb = jnp.moveaxis(emb, -3, -1)  # (..., F, 2, 4)
    return emb.reshape(*x.shape[:-1], num_freqs * 2 * 4).astype(x.dtype)


def init_position_net(rng, positive_len: int, out_dim: int, fourier_freqs: int = 8):
    position_dim = fourier_freqs * 2 * 4
    k = jax.random.split(rng, 3)

    def lin(key, din, dout):
        return {
            "w": jax.random.normal(key, (din, dout), jnp.float32)
            * (din ** -0.5),
            "b": jnp.zeros((dout,), jnp.float32),
        }

    return {
        "linears_0": lin(k[0], positive_len + position_dim, 512),
        "linears_1": lin(k[1], 512, 512),
        "linears_2": lin(k[2], 512, out_dim),
        "null_positive_feature": jnp.zeros((positive_len,), jnp.float32),
        "null_position_feature": jnp.zeros((position_dim,), jnp.float32),
    }


def apply_position_net(p, boxes, masks, positive_embeddings, fourier_freqs: int = 8):
    """boxes (N, M, 4), masks (N, M), positive_embeddings (N, M, positive_len)
    -> grounding tokens (N, M, out_dim). Padded slots are replaced with
    learnable null embeddings."""
    masks = masks[..., None].astype(boxes.dtype)
    xyxy = fourier_embed(boxes, fourier_freqs)
    xyxy = xyxy * masks + (1.0 - masks) * p["null_position_feature"].astype(boxes.dtype)
    pos = positive_embeddings * masks + (1.0 - masks) * p[
        "null_positive_feature"
    ].astype(boxes.dtype)
    h = jnp.concatenate([pos, xyxy], axis=-1)
    h = silu(linear(p["linears_0"], h))
    h = silu(linear(p["linears_1"], h))
    return linear(p["linears_2"], h)


def apply_gated_self_attention(p, x, objs, num_heads: int):
    """GLIGEN fuser: visual tokens attend over [visual; grounding] tokens,
    residual-added through learned tanh gates (zero at init / when untrained).

    x: (N, S, C); objs: (N, M, context_dim).
    """
    n_visual = x.shape[1]
    objs = linear(p["linear"], objs)
    h = jnp.concatenate([x, objs], axis=1)
    attn_out, _ = attention(p["attn"], layer_norm(p["norm1"], h), None, num_heads)
    x = x + jnp.tanh(p["alpha_attn"]).astype(x.dtype) * attn_out[:, :n_visual]
    x = x + jnp.tanh(p["alpha_dense"]).astype(x.dtype) * feed_forward(
        p["ff"], layer_norm(p["norm2"], x)
    )
    return x
