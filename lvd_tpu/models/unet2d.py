"""Functional 2D conditional UNet (Stable-Diffusion architecture) for the
LMD-era image path.

Parity target: /root/reference/models/unet_2d_condition.py and
unet_2d_blocks.py — the reference keeps an instrumented SD UNet fork (same
attn_key addressing + GLIGEN gated attention) for LMD-style 2D image
generation. Built from the same functional blocks as the 3D UNet, minus the
temporal layers; spatial transformers have `layers_per_transformer` blocks
(SD uses 1).

Config differences vs the video UNet: cross_attention_dim 768 (CLIP ViT-L),
a fixed 8 heads per attention (SD1.x convention) expressed via
attention_head_dim = channels/8 per block.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.basic import (
    conv2d,
    group_norm,
    silu,
    time_embedding_mlp,
    timestep_embedding,
    upsample_nearest_2x,
)
from . import unet3d as u3
from .gligen import apply_position_net, init_position_net


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # SD1.x: 8 heads at every block (head dim varies with width).
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    # Which down blocks carry cross-attention (up mirrors the reverse) and
    # how many transformer blocks per attention layer. SD1.x: attn on the
    # first three, depth 1. SDXL-refiner: attn on the middle blocks, depth 4.
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    transformer_depth: Tuple[int, ...] = (1, 1, 1, 0)
    mid_transformer_depth: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    transformer_norm_eps: float = 1e-6
    attention_type: str = "default"
    gligen_positive_len: int = 768
    gligen_fourier_freqs: int = 8
    # SDXL "text_time" additional conditioning: pooled text embedding +
    # Fourier-embedded time_ids, projected into the time embedding.
    addition_embed_type: str = ""  # "" | "text_time"
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 0

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def num_blocks(self) -> int:
        return len(self.block_out_channels)


def sdxl_refiner_config() -> "UNet2DConfig":
    """stabilityai/stable-diffusion-xl-refiner-1.0 UNet layout (used by the
    per-frame upsampler, reference scripts/upsample.py:160-177). Conditions
    on OpenCLIP-bigG hidden states (1280) plus pooled text + (size, crop,
    aesthetic-score) time ids."""
    return UNet2DConfig(
        block_out_channels=(384, 768, 1536, 1536),
        layers_per_block=2,
        cross_attention_dim=1280,
        num_heads=(6, 12, 24, 24),
        down_block_has_attn=(False, True, True, False),
        transformer_depth=(0, 4, 4, 0),
        mid_transformer_depth=4,
        addition_embed_type="text_time",
        addition_time_embed_dim=256,
        # pooled (1280) + 5 time ids x 256 (orig size, crop, aesthetic score)
        projection_class_embeddings_input_dim=2560,
    )


def tiny_unet2d_config(attention_type: str = "default") -> UNet2DConfig:
    return UNet2DConfig(
        block_out_channels=(32, 64, 64, 64),
        cross_attention_dim=64,
        num_heads=(2, 2, 2, 2),
        norm_num_groups=8,
        attention_type=attention_type,
        gligen_positive_len=64,
    )


def init_unet2d(rng, cfg: UNet2DConfig):
    return _init_unet2d_jit(rng, cfg)


@functools.partial(jax.jit, static_argnums=1)
def _init_unet2d_jit(rng, cfg: UNet2DConfig):
    boc = cfg.block_out_channels
    gated = cfg.attention_type == "gated"
    keys = iter(jax.random.split(rng, 256))

    params = {
        "conv_in": u3._init_conv(next(keys), 3, 3, cfg.in_channels, boc[0]),
        "time_embedding": {
            "linear_1": u3._init_linear(next(keys), boc[0], cfg.time_embed_dim),
            "linear_2": u3._init_linear(
                next(keys), cfg.time_embed_dim, cfg.time_embed_dim
            ),
        },
    }
    if cfg.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "linear_1": u3._init_linear(
                next(keys),
                cfg.projection_class_embeddings_input_dim,
                cfg.time_embed_dim,
            ),
            "linear_2": u3._init_linear(
                next(keys), cfg.time_embed_dim, cfg.time_embed_dim
            ),
        }

    def layer(cin, cout, with_attn, depth):
        p = {"resnet": u3._init_resnet(next(keys), cin, cout, cfg.time_embed_dim)}
        if with_attn:
            p["attn"] = u3._init_spatial_transformer(
                next(keys), cout, cfg.cross_attention_dim, gated=gated,
                depth=depth,
            )
        return p

    down = []
    ch = boc[0]
    for i, cout in enumerate(boc):
        has_attn = cfg.down_block_has_attn[i]
        block = {
            "layers": [
                layer(ch if j == 0 else cout, cout, has_attn, cfg.transformer_depth[i])
                for j in range(cfg.layers_per_block)
            ]
        }
        if i < len(boc) - 1:
            block["downsample"] = u3._init_conv(next(keys), 3, 3, cout, cout)
        down.append(block)
        ch = cout
    params["down_blocks"] = down

    params["mid_block"] = {
        "resnet_in": u3._init_resnet(next(keys), boc[-1], boc[-1], cfg.time_embed_dim),
        "layers": [layer(boc[-1], boc[-1], True, cfg.mid_transformer_depth)],
    }

    up = []
    rev = list(reversed(boc))
    rev_attn = list(reversed(cfg.down_block_has_attn))
    rev_depth = list(reversed(cfg.transformer_depth))
    prev = rev[0]
    for i, cout in enumerate(rev):
        is_final = i == len(boc) - 1
        skip_source = rev[min(i + 1, len(boc) - 1)]
        layers = []
        for j in range(cfg.layers_per_block + 1):
            skip_ch = skip_source if j == cfg.layers_per_block else cout
            cin = (prev if j == 0 else cout) + skip_ch
            layers.append(layer(cin, cout, rev_attn[i], rev_depth[i]))
        block = {"layers": layers}
        if not is_final:
            block["upsample"] = u3._init_conv(next(keys), 3, 3, cout, cout)
        up.append(block)
        prev = cout
    params["up_blocks"] = up

    params["conv_norm_out"] = u3._init_norm(boc[0])
    params["conv_out"] = u3._init_conv(next(keys), 3, 3, boc[0], cfg.out_channels)

    if gated:
        params["position_net"] = init_position_net(
            next(keys),
            cfg.gligen_positive_len,
            cfg.cross_attention_dim,
            cfg.gligen_fourier_freqs,
        )
    return params


def apply_unet2d(
    params,
    cfg: UNet2DConfig,
    sample,                  # (B, H, W, C_in)
    timesteps,
    encoder_hidden_states,   # (B, L, D)
    *,
    gligen=None,             # {boxes (B,M,4), masks (B,M), positive_embeddings}
    added_cond=None,         # SDXL: {"text_embeds": (B, D_pool), "time_ids": (B, K)}
    capture_keys: Sequence[tuple] = (),
    remat: bool = False,
):
    """Returns (noise_pred (B,H,W,C_out), aux {key: (B, heads, HW, L)}).

    Uses the same ("down", i, j, 0)-style capture addresses as the 3D UNet /
    reference 2D fork.
    """
    capture_keys = tuple(tuple(k) for k in capture_keys)
    b = sample.shape[0]
    boc = cfg.block_out_channels

    timesteps = jnp.asarray(timesteps)
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (b,))
    t_emb = timestep_embedding(timesteps, boc[0]).astype(sample.dtype)
    temb = time_embedding_mlp(params["time_embedding"], t_emb)
    if cfg.addition_embed_type == "text_time":
        # SDXL conditioning: Fourier-embed each time id, concat with the
        # pooled text embedding, and add through a 2-layer MLP.
        tid = added_cond["time_ids"].astype(jnp.float32).reshape(-1)
        tid_emb = timestep_embedding(
            tid, cfg.addition_time_embed_dim
        ).reshape(b, -1)
        add = jnp.concatenate(
            [added_cond["text_embeds"].astype(jnp.float32), tid_emb], axis=-1
        ).astype(sample.dtype)
        temb = temb + time_embedding_mlp(params["add_embedding"], add)
    context = encoder_hidden_states.astype(sample.dtype)

    gligen_objs = None
    if gligen is not None:
        gligen_objs = apply_position_net(
            params["position_net"],
            gligen["boxes"].astype(sample.dtype),
            gligen["masks"].astype(sample.dtype),
            gligen["positive_embeddings"].astype(sample.dtype),
            cfg.gligen_fourier_freqs,
        )

    aux: dict = {}
    x = conv2d(params["conv_in"], sample)

    def run_layer(lp, x, *, key, with_attn, num_heads):
        def fn(lp, x, temb, context):
            local_aux: dict = {}
            y = u3._resnet(lp["resnet"], x, temb, cfg)
            if with_attn:
                y = u3._spatial_transformer(
                    lp["attn"], y, context, num_heads, cfg,
                    key=key, capture_keys=capture_keys, aux=local_aux,
                    gligen_objs=gligen_objs,
                )
            return y, tuple(local_aux[k] for k in capture_keys if k in local_aux)

        if remat:
            fn = jax.checkpoint(fn)
        y, captured = fn(lp, x, temb, context)
        for k, v in zip([k for k in capture_keys if tuple(k[:3]) == key], captured):
            aux[k] = v
        return y

    res_stack = [x]
    for i, block in enumerate(params["down_blocks"]):
        for j, lp in enumerate(block["layers"]):
            x = run_layer(
                lp, x, key=("down", i, j), with_attn=cfg.down_block_has_attn[i],
                num_heads=cfg.num_heads[i],
            )
            res_stack.append(x)
        if "downsample" in block:
            x = conv2d(block["downsample"], x, stride=2)
            res_stack.append(x)

    mid = params["mid_block"]
    x = u3._resnet(mid["resnet_in"], x, temb, cfg)
    for j, lp in enumerate(mid["layers"]):
        x = u3._spatial_transformer(
            lp["attn"], x, context, cfg.num_heads[-1], cfg,
            key=("mid", 0, j), capture_keys=capture_keys, aux=aux,
            gligen_objs=gligen_objs,
        )
        x = u3._resnet(lp["resnet"], x, temb, cfg)

    rev = list(reversed(boc))
    rev_heads = list(reversed(cfg.num_heads))
    rev_attn = list(reversed(cfg.down_block_has_attn))
    for i, block in enumerate(params["up_blocks"]):
        for j, lp in enumerate(block["layers"]):
            skip = res_stack.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = run_layer(
                lp, x, key=("up", i, j), with_attn=rev_attn[i],
                num_heads=rev_heads[i],
            )
        if "upsample" in block:
            y = upsample_nearest_2x(x)
            if res_stack:
                th, tw = res_stack[-1].shape[1], res_stack[-1].shape[2]
                if (th, tw) != (y.shape[1], y.shape[2]):
                    y = jax.image.resize(
                        x, (x.shape[0], th, tw, x.shape[3]), method="nearest"
                    )
            x = conv2d(block["upsample"], y)

    x = group_norm(params["conv_norm_out"], x, cfg.norm_num_groups, cfg.norm_eps)
    return conv2d(params["conv_out"], silu(x)), aux
