"""Functional SD AutoencoderKL (encoder + decoder), channels-last.

The stage-2 pipeline decodes latents frame-batched (reference
controllable_pipeline:374-400); the Zeroscope-XL vid2vid upsampler also needs
the encoder (scripts/upsample.py). GroupNorm(32)/SiLU resnets without time
embedding, one single-head self-attention block in the mid stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import VAEConfig
from ..ops.basic import conv2d, group_norm, linear, silu, upsample_nearest_2x


def _init_conv(rng, kh, kw, din, dout):
    fan_in = kh * kw * din
    return {
        "w": jax.random.normal(rng, (kh, kw, din, dout), jnp.float32) * fan_in ** -0.5,
        "b": jnp.zeros((dout,), jnp.float32),
    }


def _init_linear(rng, din, dout):
    return {
        "w": jax.random.normal(rng, (din, dout), jnp.float32) * din ** -0.5,
        "b": jnp.zeros((dout,), jnp.float32),
    }


def _init_norm(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _init_resnet(rng, cin, cout):
    k = jax.random.split(rng, 3)
    p = {
        "norm1": _init_norm(cin),
        "conv1": _init_conv(k[0], 3, 3, cin, cout),
        "norm2": _init_norm(cout),
        "conv2": _init_conv(k[1], 3, 3, cout, cout),
    }
    if cin != cout:
        p["conv_shortcut"] = _init_conv(k[2], 1, 1, cin, cout)
    return p


def _resnet(p, x, groups, eps=1e-6):
    h = conv2d(p["conv1"], silu(group_norm(p["norm1"], x, groups, eps)))
    h = conv2d(p["conv2"], silu(group_norm(p["norm2"], h, groups, eps)))
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _init_attn(rng, c):
    k = jax.random.split(rng, 4)
    return {
        "norm": _init_norm(c),
        "to_q": _init_linear(k[0], c, c),
        "to_k": _init_linear(k[1], c, c),
        "to_v": _init_linear(k[2], c, c),
        "to_out": _init_linear(k[3], c, c),
    }


def _attn(p, x, groups, eps=1e-6):
    n, h, w, c = x.shape
    y = group_norm(p["norm"], x, groups, eps).reshape(n, h * w, c)
    q, k, v = linear(p["to_q"], y), linear(p["to_k"], y), linear(p["to_v"], y)
    logits = jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * jnp.float32(c ** -0.5), axis=-1).astype(v.dtype)
    y = jnp.einsum("nqk,nkc->nqc", probs, v)
    y = linear(p["to_out"], y).reshape(n, h, w, c)
    return x + y


def init_vae(rng, cfg: VAEConfig):
    boc = cfg.block_out_channels
    keys = iter(jax.random.split(rng, 128))

    # Encoder
    enc = {"conv_in": _init_conv(next(keys), 3, 3, cfg.in_channels, boc[0])}
    blocks = []
    ch = boc[0]
    for i, cout in enumerate(boc):
        block = {
            "resnets": [
                _init_resnet(next(keys), ch if j == 0 else cout, cout)
                for j in range(cfg.layers_per_block)
            ]
        }
        if i < len(boc) - 1:
            block["downsample"] = _init_conv(next(keys), 3, 3, cout, cout)
        blocks.append(block)
        ch = cout
    enc["down_blocks"] = blocks
    enc["mid"] = {
        "resnet_1": _init_resnet(next(keys), boc[-1], boc[-1]),
        "attn": _init_attn(next(keys), boc[-1]),
        "resnet_2": _init_resnet(next(keys), boc[-1], boc[-1]),
    }
    enc["conv_norm_out"] = _init_norm(boc[-1])
    enc["conv_out"] = _init_conv(next(keys), 3, 3, boc[-1], 2 * cfg.latent_channels)

    # Decoder
    dec = {"conv_in": _init_conv(next(keys), 3, 3, cfg.latent_channels, boc[-1])}
    dec["mid"] = {
        "resnet_1": _init_resnet(next(keys), boc[-1], boc[-1]),
        "attn": _init_attn(next(keys), boc[-1]),
        "resnet_2": _init_resnet(next(keys), boc[-1], boc[-1]),
    }
    blocks = []
    rev = list(reversed(boc))
    ch = rev[0]
    for i, cout in enumerate(rev):
        block = {
            "resnets": [
                _init_resnet(next(keys), ch if j == 0 else cout, cout)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if i < len(boc) - 1:
            block["upsample"] = _init_conv(next(keys), 3, 3, cout, cout)
        blocks.append(block)
        ch = cout
    dec["up_blocks"] = blocks
    dec["conv_norm_out"] = _init_norm(boc[0])
    dec["conv_out"] = _init_conv(next(keys), 3, 3, boc[0], cfg.out_channels)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _init_conv(
            next(keys), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels
        ),
        "post_quant_conv": _init_conv(
            next(keys), 1, 1, cfg.latent_channels, cfg.latent_channels
        ),
    }


def encode(params, cfg: VAEConfig, images):
    """images (N, H, W, 3) in [-1, 1] -> (mean, logvar) each
    (N, H/8, W/8, latent_channels). Sample + multiply by cfg.scaling_factor
    to get pipeline latents."""
    g = cfg.norm_num_groups
    enc = params["encoder"]
    x = conv2d(enc["conv_in"], images)
    for block in enc["down_blocks"]:
        for rp in block["resnets"]:
            x = _resnet(rp, x, g)
        if "downsample" in block:
            # diffusers encoder downsample pads asymmetrically (0,1,0,1)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = jax.lax.conv_general_dilated(
                x, block["downsample"]["w"].astype(x.dtype), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + block["downsample"]["b"].astype(x.dtype)
    x = _resnet(enc["mid"]["resnet_1"], x, g)
    x = _attn(enc["mid"]["attn"], x, g)
    x = _resnet(enc["mid"]["resnet_2"], x, g)
    x = conv2d(enc["conv_out"], silu(group_norm(enc["conv_norm_out"], x, g, 1e-6)))
    x = conv2d(params["quant_conv"], x, padding=0)
    mean, logvar = jnp.split(x, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def decode(params, cfg: VAEConfig, latents):
    """latents (N, h, w, latent_channels), already divided by scaling_factor
    -> images (N, 8h, 8w, 3) in [-1, 1]."""
    g = cfg.norm_num_groups
    dec = params["decoder"]
    x = conv2d(params["post_quant_conv"], latents, padding=0)
    x = conv2d(dec["conv_in"], x)
    x = _resnet(dec["mid"]["resnet_1"], x, g)
    x = _attn(dec["mid"]["attn"], x, g)
    x = _resnet(dec["mid"]["resnet_2"], x, g)
    for block in dec["up_blocks"]:
        for rp in block["resnets"]:
            x = _resnet(rp, x, g)
        if "upsample" in block:
            x = conv2d(block["upsample"], upsample_nearest_2x(x))
    x = conv2d(dec["conv_out"], silu(group_norm(dec["conv_norm_out"], x, g, 1e-6)))
    return x
