"""Static expected-key manifests for the real checkpoints.

The HF module/key names of every checkpoint the framework consumes are fully
determined by the reference source (attribute names in
/root/reference/models/unet_3d_condition.py:195-859 and unet_3d_blocks.py,
plus the unforked diffusers pieces it imports: ResnetBlock2D,
TemporalConvLayer, Downsample2D/Upsample2D — unet_3d_blocks.py:21-26 — and
AutoencoderKL). These tests enumerate those key sets *forward* from the
module structure (independently of the converter's own key strings and of
tests/test_convert.py's inverse mapping) and require models/convert.py to
consume exactly that set — so converter naming drift fails loudly today, not
at the first real conversion.

Each manifest entry carries the torch tensor's ndim, which is all the
converter's layout transposes depend on; zero-size dummies make the
real-config (1.4B-param) manifests run in milliseconds.
"""

import numpy as np
import pytest

from lvd_tpu.config import (
    UNet3DConfig,
    VAEConfig,
    tiny_unet_config,
    tiny_vae_config,
)
from lvd_tpu.models import convert


# ---------------------------------------------------------------------------
# Manifest generators (authored from the reference module structure)
# ---------------------------------------------------------------------------


def _linear(m, prefix, bias=True):
    m[f"{prefix}.weight"] = 2
    if bias:
        m[f"{prefix}.bias"] = 1


def _conv2d(m, prefix):
    m[f"{prefix}.weight"] = 4
    m[f"{prefix}.bias"] = 1


def _conv3d(m, prefix):
    m[f"{prefix}.weight"] = 5
    m[f"{prefix}.bias"] = 1


def _norm(m, prefix):
    m[f"{prefix}.weight"] = 1
    m[f"{prefix}.bias"] = 1


def _attention(m, prefix, qkv_bias=False):
    # diffusers Attention: bias-free q/k/v in transformer blocks; the VAE
    # mid-block attention (former AttnBlock) passes bias=True.
    # to_out = ModuleList([Linear, Dropout]).
    _linear(m, f"{prefix}.to_q", bias=qkv_bias)
    _linear(m, f"{prefix}.to_k", bias=qkv_bias)
    _linear(m, f"{prefix}.to_v", bias=qkv_bias)
    _linear(m, f"{prefix}.to_out.0")


def _feed_forward(m, prefix):
    # diffusers FeedForward: net = [GEGLU(proj), Dropout, Linear]
    _linear(m, f"{prefix}.net.0.proj")
    _linear(m, f"{prefix}.net.2")


def _basic_transformer_block(m, prefix, gated):
    # reference models/attention.py:64-276 (+ GatedSelfAttentionDense :26-60)
    _norm(m, f"{prefix}.norm1")
    _attention(m, f"{prefix}.attn1")
    _norm(m, f"{prefix}.norm2")
    _attention(m, f"{prefix}.attn2")
    _norm(m, f"{prefix}.norm3")
    _feed_forward(m, f"{prefix}.ff")
    if gated:
        _linear(m, f"{prefix}.fuser.linear")
        _attention(m, f"{prefix}.fuser.attn")
        _feed_forward(m, f"{prefix}.fuser.ff")
        _norm(m, f"{prefix}.fuser.norm1")
        _norm(m, f"{prefix}.fuser.norm2")
        m[f"{prefix}.fuser.alpha_attn"] = 0
        m[f"{prefix}.fuser.alpha_dense"] = 0


def _spatial_transformer(m, prefix, gated):
    # Transformer2DModel with use_linear_projection=True (the 3D blocks pass
    # the get_down_block/get_up_block default, unet_3d_blocks.py:45,106,167)
    _norm(m, f"{prefix}.norm")
    _linear(m, f"{prefix}.proj_in")
    _basic_transformer_block(m, f"{prefix}.transformer_blocks.0", gated)
    _linear(m, f"{prefix}.proj_out")


def _temporal_transformer(m, prefix):
    # TransformerTemporalModel (transformer_temporal.py:39-189): ungated,
    # double self-attention
    _norm(m, f"{prefix}.norm")
    _linear(m, f"{prefix}.proj_in")
    _basic_transformer_block(m, f"{prefix}.transformer_blocks.0", gated=False)
    _linear(m, f"{prefix}.proj_out")


def _resnet(m, prefix, shortcut, temb=True):
    # diffusers ResnetBlock2D
    _norm(m, f"{prefix}.norm1")
    _conv2d(m, f"{prefix}.conv1")
    if temb:
        _linear(m, f"{prefix}.time_emb_proj")
    _norm(m, f"{prefix}.norm2")
    _conv2d(m, f"{prefix}.conv2")
    if shortcut:
        _conv2d(m, f"{prefix}.conv_shortcut")


def _temp_conv(m, prefix):
    # diffusers TemporalConvLayer: conv1 = Seq[GN, SiLU, Conv3d];
    # conv2..4 = Seq[GN, SiLU, Dropout, Conv3d]
    for i in range(1, 5):
        _norm(m, f"{prefix}.conv{i}.0")
        _conv3d(m, f"{prefix}.conv{i}.{2 if i == 1 else 3}")


def unet3d_manifest(cfg: UNet3DConfig) -> dict:
    """{torch key: ndim} for UNet3DConditionModel
    (unet_3d_condition.py:195-859, unet_3d_blocks.py:151-745)."""
    gated = cfg.attention_type == "gated"
    boc = cfg.block_out_channels
    n = len(boc)
    m: dict = {}

    _conv2d(m, "conv_in")
    _linear(m, "time_embedding.linear_1")
    _linear(m, "time_embedding.linear_2")
    _temporal_transformer(m, "transformer_in")

    # down: CrossAttnDownBlock3D x3 + DownBlock3D (unet_3d_condition.py:330-352)
    ch = boc[0]
    for i in range(n):
        is_final = i == n - 1
        for j in range(cfg.layers_per_block):
            cin = ch if j == 0 else boc[i]
            _resnet(m, f"down_blocks.{i}.resnets.{j}", shortcut=cin != boc[i])
            _temp_conv(m, f"down_blocks.{i}.temp_convs.{j}")
            if not is_final:
                _spatial_transformer(m, f"down_blocks.{i}.attentions.{j}", gated)
                _temporal_transformer(m, f"down_blocks.{i}.temp_attentions.{j}")
        if not is_final:
            _conv2d(m, f"down_blocks.{i}.downsamplers.0.conv")
        ch = boc[i]

    # mid: UNetMidBlock3DCrossAttn (unet_3d_blocks.py:151-291)
    _resnet(m, "mid_block.resnets.0", shortcut=False)
    _temp_conv(m, "mid_block.temp_convs.0")
    _spatial_transformer(m, "mid_block.attentions.0", gated)
    _temporal_transformer(m, "mid_block.temp_attentions.0")
    _resnet(m, "mid_block.resnets.1", shortcut=False)
    _temp_conv(m, "mid_block.temp_convs.1")

    # up: UpBlock3D + CrossAttnUpBlock3D x3, skip-concat inputs
    # (unet_3d_condition.py:372-410: in/out/prev channel wiring)
    rev = list(reversed(boc))
    prev = rev[0]
    for i in range(n):
        is_final = i == n - 1
        cout = rev[i]
        skip_source = rev[min(i + 1, n - 1)]
        for j in range(cfg.layers_per_block + 1):
            skip_ch = skip_source if j == cfg.layers_per_block else cout
            cin = (prev if j == 0 else cout) + skip_ch
            _resnet(m, f"up_blocks.{i}.resnets.{j}", shortcut=cin != cout)
            _temp_conv(m, f"up_blocks.{i}.temp_convs.{j}")
            if i > 0:
                _spatial_transformer(m, f"up_blocks.{i}.attentions.{j}", gated)
                _temporal_transformer(m, f"up_blocks.{i}.temp_attentions.{j}")
        if not is_final:
            _conv2d(m, f"up_blocks.{i}.upsamplers.0.conv")
        prev = cout

    _norm(m, "conv_norm_out")
    _conv2d(m, "conv_out")

    if gated:
        # PositionNet (unet_3d_condition.py:67-179): Sequential
        # [Linear, SiLU, Linear, SiLU, Linear] -> indices 0/2/4
        _linear(m, "position_net.linears.0")
        _linear(m, "position_net.linears.2")
        _linear(m, "position_net.linears.4")
        m["position_net.null_positive_feature"] = 1
        m["position_net.null_position_feature"] = 1
    return m


def vae_manifest(cfg: VAEConfig) -> dict:
    """{torch key: ndim} for diffusers AutoencoderKL (SD VAE)."""
    boc = cfg.block_out_channels
    n = len(boc)
    m: dict = {}

    def mid(side):
        _resnet(m, f"{side}.mid_block.resnets.0", shortcut=False, temb=False)
        _norm(m, f"{side}.mid_block.attentions.0.group_norm")
        _attention(m, f"{side}.mid_block.attentions.0", qkv_bias=True)
        _resnet(m, f"{side}.mid_block.resnets.1", shortcut=False, temb=False)

    _conv2d(m, "encoder.conv_in")
    ch = boc[0]
    for i in range(n):
        for j in range(cfg.layers_per_block):
            cin = ch if j == 0 else boc[i]
            _resnet(
                m, f"encoder.down_blocks.{i}.resnets.{j}",
                shortcut=cin != boc[i], temb=False,
            )
        if i < n - 1:
            _conv2d(m, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        ch = boc[i]
    mid("encoder")
    _norm(m, "encoder.conv_norm_out")
    _conv2d(m, "encoder.conv_out")

    _conv2d(m, "decoder.conv_in")
    mid("decoder")
    rev = list(reversed(boc))
    ch = rev[0]
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            cin = ch if j == 0 else rev[i]
            _resnet(
                m, f"decoder.up_blocks.{i}.resnets.{j}",
                shortcut=cin != rev[i], temb=False,
            )
        if i < n - 1:
            _conv2d(m, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        ch = rev[i]
    _norm(m, "decoder.conv_norm_out")
    _conv2d(m, "decoder.conv_out")

    _conv2d(m, "quant_conv")
    _conv2d(m, "post_quant_conv")
    return m


# ---------------------------------------------------------------------------
# Assertions
# ---------------------------------------------------------------------------


class RecordingDict(dict):
    """State dict that records which keys the converter consumed."""

    def __init__(self, data):
        super().__init__(data)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)


def _dummy_sd(manifest: dict) -> RecordingDict:
    return RecordingDict(
        {k: np.zeros((1,) * ndim, np.float32) for k, ndim in manifest.items()}
    )


def _assert_consumed_exactly(sd: RecordingDict, manifest: dict, name: str):
    missing = set(manifest) - sd.used  # manifest keys the converter ignored
    extra = sd.used - set(manifest)
    assert not missing and not extra, (
        name,
        sorted(missing)[:8],
        sorted(extra)[:8],
    )


@pytest.mark.parametrize(
    "cfg,name",
    [
        (UNet3DConfig(), "zeroscope/modelscope (default)"),
        (UNet3DConfig(attention_type="gated"), "lvd-gligen (gated)"),
        (tiny_unet_config(), "tiny"),
        (tiny_unet_config(attention_type="gated"), "tiny-gated"),
    ],
)
def test_unet3d_converter_consumes_exact_manifest(cfg, name):
    manifest = unet3d_manifest(cfg)
    sd = _dummy_sd(manifest)
    convert.convert_unet3d(sd, cfg)
    _assert_consumed_exactly(sd, manifest, name)


def test_unet3d_real_manifest_tensor_count():
    """The real checkpoint tensor counts, pinned. UNet3DConditionModel at
    (320,640,1280,1280)x2 has 1480 tensors; the GLIGEN variant adds 17 fuser
    tensors x 16 gated spatial-attention sites + 8 position_net tensors."""
    assert len(unet3d_manifest(UNet3DConfig())) == 1480
    gated = unet3d_manifest(UNet3DConfig(attention_type="gated"))
    assert len(gated) == 1480 + 17 * 16 + 8


def test_unet3d_manifest_matches_roundtrip_synthesis():
    """The forward manifest and test_convert.py's inverse mapping must agree
    on the exact key set (two independent derivations of the naming)."""
    import jax

    from lvd_tpu.models import unet3d as unet_mod
    from lvd_tpu.models.loader import flatten_pytree
    from tests.test_convert import _synthesize, _torch_key_unet

    for cfg in (tiny_unet_config(), tiny_unet_config(attention_type="gated")):
        init = unet_mod.init_unet3d(jax.random.PRNGKey(0), cfg)
        sd = _synthesize(flatten_pytree(jax.device_get(init)), _torch_key_unet)
        manifest = unet3d_manifest(cfg)
        assert set(sd) == set(manifest), (
            sorted(set(sd) - set(manifest))[:8],
            sorted(set(manifest) - set(sd))[:8],
        )
        # ndims agree too (layout transposes depend on them)
        for k, arr in sd.items():
            assert arr.ndim == manifest[k], (k, arr.ndim, manifest[k])


@pytest.mark.parametrize(
    "cfg,name",
    [(VAEConfig(), "sd-vae (real)"), (tiny_vae_config(), "tiny")],
)
def test_vae_converter_consumes_exact_manifest(cfg, name):
    manifest = vae_manifest(cfg)
    sd = _dummy_sd(manifest)
    convert.convert_vae(sd, cfg)
    _assert_consumed_exactly(sd, manifest, name)


def test_vae_real_manifest_tensor_count():
    # AutoencoderKL (128,256,512,512)x2: 248 tensors in the standard SD VAE.
    assert len(vae_manifest(VAEConfig())) == 248


def test_vae_manifest_matches_roundtrip_synthesis():
    import jax

    from lvd_tpu.models import vae as vae_mod
    from lvd_tpu.models.loader import flatten_pytree
    from tests.test_convert import _synthesize, _torch_key_vae

    cfg = tiny_vae_config()
    init = vae_mod.init_vae(jax.random.PRNGKey(0), cfg)
    sd = _synthesize(flatten_pytree(jax.device_get(init)), _torch_key_vae)
    manifest = vae_manifest(cfg)
    assert set(sd) == set(manifest), (
        sorted(set(sd) - set(manifest))[:8],
        sorted(set(manifest) - set(sd))[:8],
    )
