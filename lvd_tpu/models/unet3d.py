"""Functional 3D UNet (ModelScope/Zeroscope architecture), TPU-first.

Parity targets: /root/reference/models/unet_3d_condition.py (UNet3DConditionModel),
unet_3d_blocks.py, transformer_2d.py, transformer_temporal.py, attention.py.

Design departures from the torch reference (deliberate, see SURVEY.md §7):

* **Pure function of a param pytree** — no modules, no registered processors.
  `apply_unet3d(params, cfg, ...) -> (noise_pred, aux)`.
* **Attention capture is a functional output.** The reference mutates
  `save_attn_to_dict[attn_key]` inside an attention processor
  (attention_processor.py:580-586). Here, callers pass `capture_keys`
  (tuples like ("down", 1, 0, 0) — the same hierarchical addresses) and the
  softmax probabilities of those spatial cross-attention sites come back in
  `aux`. This makes `jax.grad` through the cross-attention energy natural.
* **Channels-last (NHWC)** throughout — the conv layout TPUs like.
* **Frames fold into batch** for all 2D ops ((B, F, H, W, C) -> (B*F, H, W, C)),
  and pixels fold into batch for temporal attention ((B*H*W, F, C)): the same
  folding the reference uses (unet_3d_condition.py:726, transformer_temporal.py:143),
  kept because those mega-batch dims shard trivially across a device mesh.
* Optional `remat` wraps each (resnet, temp-conv, spatial-attn, temporal-attn)
  layer in `jax.checkpoint`, trading FLOPs for HBM during the guidance
  backward pass.

Topology (block_out_channels = (c0, c1, c2, c3), layers_per_block = 2):
  conv_in -> temporal transformer stem ->
  down: 3x CrossAttnDownBlock3D + DownBlock3D (downsample after first three) ->
  mid: resnet/temp-conv + (spatial attn, temporal attn, resnet, temp-conv) ->
  up:  UpBlock3D + 3x CrossAttnUpBlock3D (upsample after first three, skip concat) ->
  groupnorm -> silu -> conv_out
Every cross-attn layer = ResnetBlock2D -> TemporalConv -> spatial transformer
-> temporal transformer.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..config import UNet3DConfig
from ..ops.attention import attention
from ..ops.temporal_attention import (
    supported_frames_major as ta_supported_frames_major,
    temporal_attention_pair,
)
from ..ops.basic import (
    conv2d,
    conv3d,
    feed_forward,
    group_norm,
    group_norm_coeffs,
    layer_norm,
    linear,
    silu,
    time_embedding_mlp,
    timestep_embedding,
    upsample_nearest_2x,
)
from .gligen import apply_gated_self_attention, apply_position_net, init_position_net

# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_linear(rng, din, dout, bias=True, scale=None):
    w = jax.random.normal(rng, (din, dout), jnp.float32) * (
        scale if scale is not None else din ** -0.5
    )
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((dout,), jnp.float32)
    return p


def _init_conv(rng, kh, kw, din, dout, zero=False):
    fan_in = kh * kw * din
    w = (
        jnp.zeros((kh, kw, din, dout), jnp.float32)
        if zero
        else jax.random.normal(rng, (kh, kw, din, dout), jnp.float32) * fan_in ** -0.5
    )
    return {"w": w, "b": jnp.zeros((dout,), jnp.float32)}


def _init_conv3d(rng, kt, din, dout, zero=False):
    fan_in = kt * din
    w = (
        jnp.zeros((kt, 1, 1, din, dout), jnp.float32)
        if zero
        else jax.random.normal(rng, (kt, 1, 1, din, dout), jnp.float32)
        * fan_in ** -0.5
    )
    return {"w": w, "b": jnp.zeros((dout,), jnp.float32)}


def _init_norm(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _init_attention(rng, query_dim, context_dim, inner_dim):
    k = jax.random.split(rng, 4)
    return {
        "to_q": _init_linear(k[0], query_dim, inner_dim, bias=False),
        "to_k": _init_linear(k[1], context_dim, inner_dim, bias=False),
        "to_v": _init_linear(k[2], context_dim, inner_dim, bias=False),
        "to_out": _init_linear(k[3], inner_dim, query_dim),
    }


def _init_ff(rng, dim, mult=4):
    k = jax.random.split(rng, 2)
    inner = dim * mult
    return {
        "proj": _init_linear(k[0], dim, inner * 2),
        "out": _init_linear(k[1], inner, dim),
    }


def _init_btb(rng, dim, context_dim, *, double_self_attention=False, fuser_context=None):
    """BasicTransformerBlock params (attn1 self, attn2 cross-or-self, FF)."""
    k = jax.random.split(rng, 4)
    p = {
        "norm1": _init_norm(dim),
        "attn1": _init_attention(k[0], dim, dim, dim),
        "norm2": _init_norm(dim),
        "attn2": _init_attention(
            k[1], dim, dim if double_self_attention else context_dim, dim
        ),
        "norm3": _init_norm(dim),
        "ff": _init_ff(k[2], dim),
    }
    if fuser_context is not None:
        fk = jax.random.split(k[3], 3)
        p["fuser"] = {
            "linear": _init_linear(fk[0], fuser_context, dim),
            "attn": _init_attention(fk[1], dim, dim, dim),
            "ff": _init_ff(fk[2], dim),
            "norm1": _init_norm(dim),
            "norm2": _init_norm(dim),
            "alpha_attn": jnp.zeros((), jnp.float32),
            "alpha_dense": jnp.zeros((), jnp.float32),
        }
    return p


def _init_spatial_transformer(rng, channels, context_dim, *, gated, depth: int = 1):
    k = jax.random.split(rng, 2 + depth)
    return {
        "norm": _init_norm(channels),
        "proj_in": _init_linear(k[0], channels, channels),
        "blocks": [
            _init_btb(
                k[2 + i],
                channels,
                context_dim,
                fuser_context=context_dim if gated else None,
            )
            for i in range(depth)
        ],
        "proj_out": _init_linear(k[1], channels, channels, scale=1e-5),
    }


def _init_temporal_transformer(rng, channels, inner_dim):
    k = jax.random.split(rng, 3)
    return {
        "norm": _init_norm(channels),
        "proj_in": _init_linear(k[0], channels, inner_dim),
        "blocks": [_init_btb(k[1], inner_dim, None, double_self_attention=True)],
        "proj_out": _init_linear(k[2], inner_dim, channels, scale=1e-5),
    }


def _init_resnet(rng, cin, cout, temb_dim):
    k = jax.random.split(rng, 4)
    p = {
        "norm1": _init_norm(cin),
        "conv1": _init_conv(k[0], 3, 3, cin, cout),
        "time_emb_proj": _init_linear(k[1], temb_dim, cout),
        "norm2": _init_norm(cout),
        "conv2": _init_conv(k[2], 3, 3, cout, cout, zero=False),
    }
    if cin != cout:
        p["conv_shortcut"] = _init_conv(k[3], 1, 1, cin, cout)
    return p


def _init_temp_conv(rng, channels):
    k = jax.random.split(rng, 4)
    return {
        f"conv{i + 1}": {
            "norm": _init_norm(channels),
            "conv": _init_conv3d(k[i], 3, channels, channels, zero=(i == 3)),
        }
        for i in range(4)
    }


def init_unet3d(rng, cfg: UNet3DConfig):
    """Random-init UNet params (jitted: eager init of ~700 tensors is slow)."""
    return _init_unet3d_jit(rng, cfg)


@functools.partial(jax.jit, static_argnums=1)
def _init_unet3d_jit(rng, cfg: UNet3DConfig):
    boc = cfg.block_out_channels
    gated = cfg.attention_type == "gated"

    # Unbounded key stream (fold_in a counter) — a fixed-size split would
    # silently exhaust into StopIteration at trace time for deeper configs.
    counter = [0]

    def _next_key():
        counter[0] += 1
        return jax.random.fold_in(rng, counter[0])

    class _Keys:
        def __next__(self):
            return _next_key()

    keys = _Keys()

    params: dict = {
        "conv_in": _init_conv(next(keys), 3, 3, cfg.in_channels, boc[0]),
        "time_embedding": {
            "linear_1": _init_linear(next(keys), boc[0], cfg.time_embed_dim),
            "linear_2": _init_linear(next(keys), cfg.time_embed_dim, cfg.time_embed_dim),
        },
        "transformer_in": _init_temporal_transformer(
            next(keys), boc[0], cfg.transformer_in_num_heads * cfg.attention_head_dim
        ),
    }

    def layer(cin, cout, with_attn):
        p = {
            "resnet": _init_resnet(next(keys), cin, cout, cfg.time_embed_dim),
            "temp_conv": _init_temp_conv(next(keys), cout),
        }
        if with_attn:
            p["attn"] = _init_spatial_transformer(
                next(keys), cout, cfg.cross_attention_dim, gated=gated
            )
            p["temp_attn"] = _init_temporal_transformer(next(keys), cout, cout)
        return p

    # Down blocks.
    down = []
    ch = boc[0]
    for i, cout in enumerate(boc):
        is_final = i == len(boc) - 1
        block = {
            "layers": [
                layer(ch if j == 0 else cout, cout, with_attn=not is_final)
                for j in range(cfg.layers_per_block)
            ]
        }
        if not is_final:
            block["downsample"] = _init_conv(next(keys), 3, 3, cout, cout)
        down.append(block)
        ch = cout
    params["down_blocks"] = down

    # Mid block.
    params["mid_block"] = {
        "resnet_in": _init_resnet(next(keys), boc[-1], boc[-1], cfg.time_embed_dim),
        "temp_conv_in": _init_temp_conv(next(keys), boc[-1]),
        "layers": [layer(boc[-1], boc[-1], with_attn=True)],
    }

    # Up blocks.
    up = []
    rev = list(reversed(boc))
    prev = rev[0]
    for i, cout in enumerate(rev):
        is_final = i == len(boc) - 1
        skip_source = rev[min(i + 1, len(boc) - 1)]
        layers = []
        for j in range(cfg.layers_per_block + 1):
            skip_ch = skip_source if j == cfg.layers_per_block else cout
            cin = (prev if j == 0 else cout) + skip_ch
            layers.append(layer(cin, cout, with_attn=i > 0))
        block = {"layers": layers}
        if not is_final:
            block["upsample"] = _init_conv(next(keys), 3, 3, cout, cout)
        up.append(block)
        prev = cout
    params["up_blocks"] = up

    params["conv_norm_out"] = _init_norm(boc[0])
    params["conv_out"] = _init_conv(next(keys), 3, 3, boc[0], cfg.out_channels, zero=False)

    if gated:
        params["position_net"] = init_position_net(
            next(keys),
            cfg.gligen_positive_len,
            cfg.cross_attention_dim,
            cfg.gligen_fourier_freqs,
        )
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _btb_apply(
    p,
    x,
    context,
    num_heads,
    *,
    key=None,
    capture: bool = False,
    double_self_attention: bool = False,
    gligen_objs=None,
    ln_eps: float = 1e-5,
    probs_transform=None,
):
    h, _ = attention(p["attn1"], layer_norm(p["norm1"], x, ln_eps), None, num_heads)
    x = x + checkpoint_name(h, "attn_out")
    if gligen_objs is not None and "fuser" in p:
        x = apply_gated_self_attention(p["fuser"], x, gligen_objs, num_heads)
    ctx = None if double_self_attention else context
    # probs_transform edits only the cross-attention, as the reference's
    # attn_process_fn does (attention_processor.py:520-522).
    h, probs = attention(
        p["attn2"], layer_norm(p["norm2"], x, ln_eps), ctx, num_heads,
        return_probs=capture,
        probs_transform=None if double_self_attention else probs_transform,
    )
    x = x + checkpoint_name(h, "attn_out")
    x = x + checkpoint_name(
        feed_forward(p["ff"], layer_norm(p["norm3"], x, ln_eps)), "ff_out"
    )
    return x, probs


def _spatial_transformer(p, x, context, num_heads, cfg, *, key, capture_keys, aux,
                         gligen_objs=None, probs_transform=None):
    n, h, w, c = x.shape
    residual = x
    y = group_norm(p["norm"], x, cfg.norm_num_groups, cfg.transformer_norm_eps)
    y = y.reshape(n, h * w, c)
    y = linear(p["proj_in"], y)
    for bi, block in enumerate(p["blocks"]):
        full_key = key + (bi,)
        capture = full_key in capture_keys
        y, probs = _btb_apply(
            block, y, context, num_heads,
            capture=capture, gligen_objs=gligen_objs,
            probs_transform=(
                None if probs_transform is None
                else functools.partial(probs_transform, full_key)
            ),
        )
        if capture:
            aux[full_key] = probs
    y = linear(p["proj_out"], y)
    return y.reshape(n, h, w, c) + residual


def _temporal_attention_block(p, y, num_heads, ln_eps: float = 1e-5,
                              frames_major: bool = False):
    """One double-self-attention BasicTransformerBlock over the frame axis,
    computed in a pixels-major (B, P, F, C) layout — or directly on the
    frames-major (B, F, P, C) stream when the Pallas kernel is available
    (``frames_major``), which permutes each VMEM tile in-kernel instead.

    The reference transposes pixels into the batch dim ((B*H*W, F, C),
    transformer_temporal.py:143-158) around EVERY attention; here the caller
    transposes at most once per temporal transformer, and on TPU both
    LN+attention stages run inside one Pallas kernel that packs G pixels per
    program into a block-diagonal (G*F, G*F) frame attention
    (ops/temporal_attention.py) — the stream makes one HBM round trip per
    attention pair instead of ~10 (LN/qkv/concat/out per attention). The FF
    stays on the fused GEGLU kernel (layout-agnostic: per-row over C).
    """
    y = checkpoint_name(
        temporal_attention_pair(p, y, num_heads, ln_eps,
                                frames_major=frames_major), "attn_out"
    )
    y = y + checkpoint_name(
        feed_forward(p["ff"], layer_norm(p["norm3"], y, ln_eps)), "ff_out"
    )
    return y


def _a2a_frames_to_pixels(y, axis_name):
    """(B, F_local, P, C) -> (B, F, P_local_padded, C) over the mesh axis.
    Returns (transposed, original P) — pixels are zero-padded to divide."""
    n = jax.lax.axis_size(axis_name)
    p = y.shape[2]
    pad = (-p) % n
    if pad:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, pad), (0, 0)))
    y = jax.lax.all_to_all(y, axis_name, split_axis=2, concat_axis=1, tiled=True)
    return y, p


def _a2a_pixels_to_frames(y, axis_name, orig_p):
    """Inverse of _a2a_frames_to_pixels; drops pixel padding."""
    y = jax.lax.all_to_all(y, axis_name, split_axis=1, concat_axis=2, tiled=True)
    return y[:, :, :orig_p]


def _temporal_transformer(p, x, num_frames, num_heads, cfg, spmd_axis=None):
    """Temporal transformer over frames.

    Sharded mode (``spmd_axis``): x carries a frame shard; statistics psum
    over the axis and an all_to_all re-shards frames->pixels around the
    attention (Ulysses-style sequence parallelism: the folded pixel dim is
    the embarrassingly-parallel one during temporal mixing).
    """
    n, h, w, c = x.shape
    b = n // num_frames
    residual = x
    y = x.reshape(b, num_frames, h * w, c)  # contiguous reshape, no relayout
    y = group_norm(
        p["norm"], y, cfg.norm_num_groups, cfg.transformer_norm_eps,
        axis_name=spmd_axis,
    )
    y = linear(p["proj_in"], y)
    if spmd_axis is not None:
        y, orig_p = _a2a_frames_to_pixels(y, spmd_axis)
    # When the fused pair kernel is available it consumes the frames-major
    # stream directly (in-VMEM tile permutation); otherwise one
    # (B, F, P, C) -> (B, P, F, C) relayout per temporal transformer and the
    # blocks run pixels-major (see _temporal_attention_block).
    fm = ta_supported_frames_major(y, num_heads)
    if not fm:
        y = y.transpose(0, 2, 1, 3)
    for block in p["blocks"]:
        y = _temporal_attention_block(block, y, num_heads, frames_major=fm)
    if not fm:
        y = y.transpose(0, 2, 1, 3)
    if spmd_axis is not None:
        y = _a2a_pixels_to_frames(y, spmd_axis, orig_p)
    y = linear(p["proj_out"], y)
    return y.reshape(n, h, w, c) + residual


def _gn_silu_conv(norm_p, conv_p, x, cfg):
    """GroupNorm -> SiLU -> 3x3 conv. Opt-in fused Pallas pass on TPU
    (ops/spatial_conv_fused) — measured SLOWER than or equal to XLA's conv
    at every zeroscope level (tools/sweep_spatial_conv.py: XLA runs the
    silu+conv chain at 147-335 TF/s, i.e. the input elementwise is already
    fused into the conv), so the default is the XLA chain; the kernel stays
    as the measured negative result and for future hardware revisits."""
    import os

    from ..ops import spatial_conv_fused as scf

    if (os.environ.get("LVD_ENABLE_FUSED_SC") == "1"
            and conv_p["w"].shape[:2] == (3, 3)
            and scf.supported(x, conv_p["w"])):
        a, b = group_norm_coeffs(
            norm_p, x, cfg.norm_num_groups, cfg.norm_eps)
        bias = conv_p.get("b")
        if bias is None:  # conv2d treats bias as optional; mirror that here
            bias = jnp.zeros((conv_p["w"].shape[-1],), conv_p["w"].dtype)
        return scf.norm_silu_conv2d(x, a, b, conv_p["w"], bias)
    h = group_norm(norm_p, x, cfg.norm_num_groups, cfg.norm_eps)
    return conv2d(conv_p, silu(h))


def _resnet(p, x, temb, cfg):
    h = checkpoint_name(_gn_silu_conv(p["norm1"], p["conv1"], x, cfg),
                        "conv_out")
    t = linear(p["time_emb_proj"], silu(temb))
    h = h + t[:, None, None, :]
    h = checkpoint_name(_gn_silu_conv(p["norm2"], p["conv2"], h, cfg),
                        "conv_out")
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _halo_conv3d_frames(conv_params, y, axis_name):
    """(3,1,1) temporal conv on frame-sharded (B, F_local, P, C) input via a
    one-frame halo exchange: each shard ppermutes its boundary frame to the
    neighbour instead of resharding the whole activation (the all_to_all this
    replaces moved every element twice per temp-conv). Shards at the global
    edges receive ppermute's zero fill — exactly the conv's SAME padding."""
    n = jax.lax.axis_size(axis_name)
    prev = jax.lax.ppermute(
        y[:, -1:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    nxt = jax.lax.ppermute(
        y[:, :1], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    ext = jnp.concatenate([prev, y, nxt], axis=1)  # (B, F_local + 2, P, C)
    out = conv3d(
        conv_params, ext[:, :, :, None, :],
        padding=((0, 0), (0, 0), (0, 0)),
    )
    return out[:, :, :, 0, :]


def _temp_conv(p, x, num_frames, cfg, spmd_axis=None):
    import os

    n, h, w, c = x.shape
    b = n // num_frames
    if spmd_axis is None:
        from ..ops import temp_conv_fused as tcf

        y4 = x.reshape(b, num_frames, h * w, c)
        if (
            os.environ.get("LVD_DISABLE_FUSED_TC") != "1"
            and tcf.supported(y4)
        ):
            # Fused path: GN statistics stay an XLA reduction (one read);
            # the affine+SiLU+3-tap conv run in one Pallas pass.
            identity = y4
            for name in ("conv1", "conv2", "conv3", "conv4"):
                blk = p[name]
                a, bc = group_norm_coeffs(
                    blk["norm"], y4, cfg.norm_num_groups, 1e-5
                )
                y4 = checkpoint_name(
                    tcf.norm_silu_temporal_conv(
                        y4, a, bc, blk["conv"]["w"], blk["conv"]["b"]
                    ),
                    "conv_out",
                )
            return (identity + y4).reshape(n, h, w, c)
        y = x.reshape(b, num_frames, h, w, c)
        identity = y
        for name in ("conv1", "conv2", "conv3", "conv4"):
            blk = p[name]
            y = group_norm(blk["norm"], y, cfg.norm_num_groups, 1e-5)
            y = checkpoint_name(conv3d(blk["conv"], silu(y)), "conv_out")
        return (identity + y).reshape(n, h, w, c)

    # Sharded: frames stay local (the (3,1,1) kernel only needs one halo
    # frame per side per conv); GroupNorm statistics psum over the axis.
    y = x.reshape(b, num_frames, h * w, c)
    identity = y
    for name in ("conv1", "conv2", "conv3", "conv4"):
        blk = p[name]
        y = group_norm(
            blk["norm"], y, cfg.norm_num_groups, 1e-5, axis_name=spmd_axis
        )
        y = _halo_conv3d_frames(blk["conv"], silu(y), spmd_axis)
    return (identity + y).reshape(n, h, w, c)


def _cross_attn_layer(p, x, temb, context, num_frames, num_heads, cfg, *,
                      key, capture_keys, aux, gligen_objs, spmd_axis=None,
                      probs_transform=None):
    x = _resnet(p["resnet"], x, temb, cfg)
    x = _temp_conv(p["temp_conv"], x, num_frames, cfg, spmd_axis=spmd_axis)
    x = _spatial_transformer(
        p["attn"], x, context, num_heads, cfg,
        key=key, capture_keys=capture_keys, aux=aux, gligen_objs=gligen_objs,
        probs_transform=probs_transform,
    )
    x = _temporal_transformer(
        p["temp_attn"], x, num_frames, num_heads, cfg, spmd_axis=spmd_axis
    )
    return x


def apply_unet3d(
    params,
    cfg: UNet3DConfig,
    sample,
    timesteps,
    encoder_hidden_states,
    *,
    gligen=None,
    capture_keys: Sequence[tuple] = (),
    capture_only: bool = False,
    remat: bool = False,
    spmd_axis=None,
    probs_transform=None,
):
    """Run the UNet.

    Args:
      sample: (B, F, H, W, C_in) noisy latents, channels-last.
      timesteps: scalar or (B,) diffusion timestep(s).
      encoder_hidden_states: (B, L, D_text) or (2B, L, D) CLIP hidden states
        (if leading dim equals 2B the CFG pair convention is the caller's).
      gligen: optional dict with keys ``boxes`` (B*F, M, 4), ``masks``
        (B*F, M), ``positive_embeddings`` (B*F, M, positive_len) — the
        per-frame grounding inputs, already flattened into the B*F batch
        (reference controllable_pipeline:806-814).
      capture_keys: static tuple of hierarchical attention addresses, e.g.
        ("down", 1, 0, 0), whose cross-attention probabilities are returned.
      capture_only: stop the walk (statically) once every capture key has
        been collected and return ``(None, aux)`` — the guidance energy only
        consumes the attention maps, so the layers past the last captured
        site (up block 3 + conv_out for the standard key set) are never
        traced, in the backward either. The reference always pays the full
        cond forward here (models/pipelines.py:78-83).
      remat: checkpoint each UNet layer (for differentiating the guidance
        energy under HBM limits).
      probs_transform: optional fn ``(attn_key, probs) -> probs`` editing the
        cross-attention probabilities of every spatial transformer block
        in-flight, before the PV contraction — the functional counterpart of
        the reference's ``attn_process_fn`` hook
        (attention_processor.py:441, 521-532). Captured aux maps stay
        PRE-transform, matching the reference. Setting it routes every
        spatial cross-attention through the materializing path; it is a
        research/debugging hook, not a hot-path feature.
      spmd_axis: mesh axis name when called inside shard_map with frames
        sharded along it (sequence-parallel inference). Temporal modules
        all_to_all between frame- and pixel-sharding; norms psum their
        statistics. Compatible with capture_keys (each shard returns the
        probs of its local frames) and with gligen (whose (B*F_local, ...)
        inputs must be frame-sharded consistently) — see
        pipeline._make_sharded_sample and tests/test_parallel.py.

    Returns:
      (noise_pred (B, F, H, W, C_out), aux dict {key: (B*F, heads, HW, L)});
      noise_pred is None when ``capture_only`` short-circuits the walk.
    """
    capture_keys = tuple(tuple(k) for k in capture_keys)
    if capture_only and not capture_keys:
        raise ValueError("capture_only requires capture_keys")
    b, f, h, w, _ = sample.shape
    boc = cfg.block_out_channels

    timesteps = jnp.asarray(timesteps)
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (b,))
    t_emb = timestep_embedding(timesteps, boc[0]).astype(sample.dtype)
    temb = time_embedding_mlp(params["time_embedding"], t_emb)
    temb = jnp.repeat(temb, f, axis=0)  # (B*F, time_embed_dim)

    context = jnp.repeat(encoder_hidden_states.astype(sample.dtype), f, axis=0)

    x = sample.reshape(b * f, h, w, sample.shape[-1])
    x = conv2d(params["conv_in"], x)

    x = _temporal_transformer(
        params["transformer_in"], x, f, cfg.transformer_in_num_heads, cfg,
        spmd_axis=spmd_axis,
    )

    gligen_objs = None
    if gligen is not None:
        gligen_objs = apply_position_net(
            params["position_net"],
            gligen["boxes"].astype(x.dtype),
            gligen["masks"].astype(x.dtype),
            gligen["positive_embeddings"].astype(x.dtype),
            cfg.gligen_fourier_freqs,
        )

    aux: dict = {}

    def run_layer(layer_params, x, *, key, with_attn, num_heads):
        # Remat trades FLOPs for HBM; at the deep levels (channels ==
        # boc[-1]) activations are small (<=11 MB/tensor at zeroscope
        # shapes), so saving them outright skips their recompute in the
        # guidance backward at negligible memory cost. Where we do
        # checkpoint, the MXU-heavy intermediates (attention outputs,
        # resnet/temp-conv conv outputs) are still saved by name — the
        # backward replay then recomputes only the cheap elementwise/norm
        # chains between them instead of re-running every matmul/conv
        # (VERDICT round-1 lead: "save attention outputs, recompute convs").
        channels = num_heads * cfg.attention_head_dim
        do_remat = remat and channels < boc[-1]

        def fn(lp, x, temb, context):
            local_aux: dict = {}
            if with_attn:
                y = _cross_attn_layer(
                    lp, x, temb, context, f, num_heads, cfg,
                    key=key, capture_keys=capture_keys, aux=local_aux,
                    gligen_objs=gligen_objs, spmd_axis=spmd_axis,
                    probs_transform=probs_transform,
                )
            else:
                y = _resnet(lp["resnet"], x, temb, cfg)
                y = _temp_conv(lp["temp_conv"], y, f, cfg, spmd_axis=spmd_axis)
            # Return captured probs as explicit outputs so jax.checkpoint can
            # rematerialize through them.
            return y, tuple(local_aux[k] for k in capture_keys if k in local_aux)

        if do_remat:
            fn = jax.checkpoint(
                fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "conv_out", "ff_out"
                ),
            )
        y, captured = fn(layer_params, x, temb, context)
        # Keys captured inside this layer, in capture_keys order (a layer's
        # spatial transformer owns keys whose first 3 address elements match).
        layer_keys = [k for k in capture_keys if tuple(k[:3]) == key]
        for k, v in zip(layer_keys, captured):
            aux[k] = v
        return y

    def _have_all_keys():
        # aux is a Python dict at trace time; with static capture_keys this
        # makes the truncation a trace-time decision, not a runtime branch.
        return capture_only and len(aux) == len(capture_keys)

    # -- down ----------------------------------------------------------------
    res_stack = [x]
    for i, block in enumerate(params["down_blocks"]):
        is_final = i == len(boc) - 1
        num_heads = cfg.num_heads(boc[i])
        for j, lp in enumerate(block["layers"]):
            x = run_layer(
                lp, x, key=("down", i, j), with_attn=not is_final, num_heads=num_heads
            )
            if _have_all_keys():
                return None, aux
            res_stack.append(x)
        if "downsample" in block:
            x = conv2d(block["downsample"], x, stride=2)
            res_stack.append(x)

    # -- mid -----------------------------------------------------------------
    mid = params["mid_block"]
    num_heads = cfg.num_heads(boc[-1])
    x = _resnet(mid["resnet_in"], x, temb, cfg)
    x = _temp_conv(mid["temp_conv_in"], x, f, cfg, spmd_axis=spmd_axis)
    for j, lp in enumerate(mid["layers"]):
        x = _spatial_transformer(
            lp["attn"], x, context, num_heads, cfg,
            key=("mid", 0, j), capture_keys=capture_keys, aux=aux,
            gligen_objs=gligen_objs, probs_transform=probs_transform,
        )
        if _have_all_keys():
            return None, aux
        x = _temporal_transformer(
            lp["temp_attn"], x, f, num_heads, cfg, spmd_axis=spmd_axis
        )
        x = _resnet(lp["resnet"], x, temb, cfg)
        x = _temp_conv(lp["temp_conv"], x, f, cfg, spmd_axis=spmd_axis)

    # -- up ------------------------------------------------------------------
    rev = list(reversed(boc))
    for i, block in enumerate(params["up_blocks"]):
        num_heads = cfg.num_heads(rev[i])
        for j, lp in enumerate(block["layers"]):
            skip = res_stack.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = run_layer(
                lp, x, key=("up", i, j), with_attn=i > 0, num_heads=num_heads
            )
            if _have_all_keys():
                return None, aux
        if "upsample" in block:
            y = upsample_nearest_2x(x)
            if res_stack:
                # Odd spatial dims don't round-trip through stride-2 conv +
                # 2x upsample; resize to the next skip's exact size
                # (reference unet_3d_condition.py:814-817 forward_upsample_size).
                th, tw = res_stack[-1].shape[1], res_stack[-1].shape[2]
                if (th, tw) != (y.shape[1], y.shape[2]):
                    y = jax.image.resize(
                        x, (x.shape[0], th, tw, x.shape[3]), method="nearest"
                    )
            x = conv2d(block["upsample"], y)

    # -- out -----------------------------------------------------------------
    x = group_norm(params["conv_norm_out"], x, cfg.norm_num_groups, cfg.norm_eps)
    x = conv2d(params["conv_out"], silu(x))
    out = x.reshape(b, f, h, w, cfg.out_channels)
    return out, aux
