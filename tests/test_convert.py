"""Weight-converter round-trip tests.

Strategy: synthesize an HF-keyed torch-layout state dict *from* a tiny
random-init pytree via an independent inverse key mapping, convert it with
models/convert.py, and require bit-identical recovery of the original
pytree. This pins both the key naming and every transpose.
"""

import numpy as np
import jax
import pytest

from lvd_tpu.config import tiny_clip_config, tiny_unet_config, tiny_vae_config
from lvd_tpu.models import clip as clip_mod
from lvd_tpu.models import convert
from lvd_tpu.models import unet3d as unet_mod
from lvd_tpu.models import vae as vae_mod
from lvd_tpu.models.loader import flatten_pytree


def _to_torch_leaf(path: str, arr: np.ndarray):
    """Inverse of the converter's tensor-layout transforms."""
    arr = np.asarray(arr)
    leaf = path.rsplit("/", 1)[-1]
    if leaf == "w":
        if arr.ndim == 2:
            return arr.T
        if arr.ndim == 4:  # HWIO -> OIHW
            return arr.transpose(3, 2, 0, 1)
        if arr.ndim == 5:  # DHWIO -> OIDHW
            return arr.transpose(4, 3, 0, 1, 2)
    return arr


def _torch_key_unet(path: str) -> str:
    """Map our pytree path to the HF diffusers UNet3DConditionModel key."""
    parts = path.split("/")

    def tail(ps):
        out = []
        i = 0
        while i < len(ps):
            p = ps[i]
            if p == "blocks":
                out.append(f"transformer_blocks.{ps[i + 1]}")
                i += 2
            elif p == "ff":
                nxt = ps[i + 1]
                out.append("ff.net.0.proj" if nxt == "proj" else "ff.net.2")
                i += 2
            elif p == "to_out":
                out.append("to_out.0")
                i += 1
            elif p == "w":
                out.append("weight")
                i += 1
            elif p == "b":
                out.append("bias")
                i += 1
            elif p == "scale":
                out.append("weight")
                i += 1
            elif p in ("conv1", "conv2", "conv3", "conv4") and i + 1 < len(ps) and ps[
                i + 1
            ] in ("norm", "conv"):
                idx = "0" if ps[i + 1] == "norm" else ("2" if p == "conv1" else "3")
                out.append(f"{p}.{idx}")
                i += 2
            else:
                out.append(p)
                i += 1
        return ".".join(out)

    if parts[0] in ("down_blocks", "up_blocks"):
        side, bi = parts[0], parts[1]
        if parts[2] == "downsample":
            return f"{side}.{bi}.downsamplers.0.conv." + tail(parts[3:])
        if parts[2] == "upsample":
            return f"{side}.{bi}.upsamplers.0.conv." + tail(parts[3:])
        li = parts[3]
        sub = parts[4]
        mapping = {
            "resnet": f"resnets.{li}",
            "temp_conv": f"temp_convs.{li}",
            "attn": f"attentions.{li}",
            "temp_attn": f"temp_attentions.{li}",
        }
        return f"{side}.{bi}.{mapping[sub]}." + tail(parts[5:])
    if parts[0] == "mid_block":
        if parts[1] == "resnet_in":
            return "mid_block.resnets.0." + tail(parts[2:])
        if parts[1] == "temp_conv_in":
            return "mid_block.temp_convs.0." + tail(parts[2:])
        sub = parts[3]
        mapping = {
            "resnet": "resnets.1",
            "temp_conv": "temp_convs.1",
            "attn": "attentions.0",
            "temp_attn": "temp_attentions.0",
        }
        return f"mid_block.{mapping[sub]}." + tail(parts[4:])
    if parts[0] == "position_net":
        if parts[1].startswith("linears_"):
            idx = int(parts[1].split("_")[1]) * 2
            return f"position_net.linears.{idx}." + tail(parts[2:])
        return "position_net." + parts[1]
    return tail(parts)


def _torch_key_clip(path: str) -> str:
    parts = path.split("/")
    rename = {"w": "weight", "b": "bias", "scale": "weight", "bias": "bias"}
    if parts[0] in ("token_embedding", "position_embedding"):
        return f"text_model.embeddings.{parts[0]}.weight"
    if parts[0] == "final_layer_norm":
        return f"text_model.final_layer_norm.{rename[parts[1]]}"
    if parts[0] == "layers":
        i, name, leaf = parts[1], parts[2], rename[parts[3]]
        if name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            return f"text_model.encoder.layers.{i}.self_attn.{name}.{leaf}"
        if name in ("fc1", "fc2"):
            return f"text_model.encoder.layers.{i}.mlp.{name}.{leaf}"
        return f"text_model.encoder.layers.{i}.{name}.{leaf}"
    raise KeyError(path)


def _torch_key_vae(path: str) -> str:
    parts = path.split("/")
    rename = {"w": "weight", "b": "bias", "scale": "weight", "bias": "bias"}

    def tail(ps):
        out = []
        for p in ps:
            if p == "to_out":
                out.append("to_out.0")
            elif p == "norm" and out and out[-1].startswith("attentions"):
                out.append("group_norm")
            else:
                out.append(rename.get(p, p))
        return ".".join(out)

    if parts[0] in ("encoder", "decoder"):
        side = parts[0]
        rest = parts[1:]
        if rest[0] in ("down_blocks", "up_blocks"):
            bi = rest[1]
            if rest[2] == "resnets":
                return f"{side}.{rest[0]}.{bi}.resnets.{rest[3]}." + tail(rest[4:])
            if rest[2] in ("downsample", "upsample"):
                kind = "downsamplers" if rest[2] == "downsample" else "upsamplers"
                return f"{side}.{rest[0]}.{bi}.{kind}.0.conv." + tail(rest[3:])
        if rest[0] == "mid":
            if rest[1] in ("resnet_1", "resnet_2"):
                idx = "0" if rest[1] == "resnet_1" else "1"
                return f"{side}.mid_block.resnets.{idx}." + tail(rest[2:])
            if rest[1] == "attn":
                return f"{side}.mid_block.attentions.0." + tail(["attentions"] + rest[2:]).replace("attentions.", "")
        return f"{side}." + tail(rest)
    return tail(parts)


def _synthesize(flat, key_fn):
    sd = {}
    for path, arr in flat.items():
        sd[key_fn(path)] = _to_torch_leaf(path, np.asarray(arr))
    return sd


def _assert_trees_equal(a, b):
    fa, fb = flatten_pytree(a), flatten_pytree(b)
    assert set(fa) == set(fb), (sorted(set(fa) - set(fb))[:5], sorted(set(fb) - set(fa))[:5])
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=k)


def test_unet_convert_roundtrip():
    cfg = tiny_unet_config()
    init = unet_mod.init_unet3d(jax.random.PRNGKey(0), cfg)
    sd = _synthesize(flatten_pytree(jax.device_get(init)), _torch_key_unet)
    converted = convert.convert_unet3d(sd, cfg)
    convert.validate_against_init(converted, init, "unet")
    _assert_trees_equal(converted, jax.device_get(init))


def test_unet_convert_roundtrip_gated():
    cfg = tiny_unet_config(attention_type="gated")
    init = unet_mod.init_unet3d(jax.random.PRNGKey(1), cfg)
    sd = _synthesize(flatten_pytree(jax.device_get(init)), _torch_key_unet)
    converted = convert.convert_unet3d(sd, cfg)
    convert.validate_against_init(converted, init, "unet-gated")
    _assert_trees_equal(converted, jax.device_get(init))


def test_clip_convert_roundtrip():
    cfg = tiny_clip_config()
    init = clip_mod.init_clip_text(jax.random.PRNGKey(2), cfg)
    sd = _synthesize(flatten_pytree(jax.device_get(init)), _torch_key_clip)
    converted = convert.convert_clip_text(sd, cfg)
    convert.validate_against_init(converted, init, "clip")
    _assert_trees_equal(converted, jax.device_get(init))


def test_vae_convert_roundtrip():
    cfg = tiny_vae_config()
    init = vae_mod.init_vae(jax.random.PRNGKey(3), cfg)
    sd = _synthesize(flatten_pytree(jax.device_get(init)), _torch_key_vae)
    converted = convert.convert_vae(sd, cfg)
    convert.validate_against_init(converted, init, "vae")
    _assert_trees_equal(converted, jax.device_get(init))


def test_converted_linear_transpose_semantics():
    """A known torch Linear must act identically after conversion."""
    import torch

    from lvd_tpu.ops.basic import linear
    import jax.numpy as jnp

    torch.manual_seed(0)
    m = torch.nn.Linear(6, 3)
    x = torch.randn(2, 6)
    want = m(x).detach().numpy()

    sd = {f"m.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    p = convert.lin(sd, "m")
    got = np.asarray(linear(
        {"w": jnp.asarray(p["w"]), "b": jnp.asarray(p["b"])}, jnp.asarray(x.numpy())
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_verify_conversion_catches_unconsumed_and_mass():
    """--verify semantics: an unconsumed source tensor or a lost weight must
    fail loudly (the silent-drop failure mode a wrong key would cause)."""
    cfg = tiny_clip_config()
    init = clip_mod.init_clip_text(jax.random.PRNGKey(2), cfg)
    sd_plain = _synthesize(flatten_pytree(jax.device_get(init)), _torch_key_clip)

    # Clean conversion passes (position_ids buffers are ignorable).
    sd = convert.RecordingStateDict(
        dict(sd_plain, **{"text_model.embeddings.position_ids": np.zeros((1, 77))})
    )
    converted = convert.convert_clip_text(sd, cfg)
    convert.verify_conversion(sd, converted, "clip")

    # An extra real tensor the converter never reads -> hard error.
    sd = convert.RecordingStateDict(
        dict(sd_plain, **{"text_model.encoder.layers.99.bogus.weight": np.ones((3, 3))})
    )
    converted = convert.convert_clip_text(sd, cfg)
    with pytest.raises(ValueError, match="NOT consumed"):
        convert.verify_conversion(sd, converted, "clip")


def test_check_sdxl_unet_config():
    from lvd_tpu.models.unet2d import sdxl_refiner_config

    cfg = sdxl_refiner_config()
    good = {
        "in_channels": 4,
        "out_channels": 4,
        "block_out_channels": [384, 768, 1536, 1536],
        "layers_per_block": 2,
        "cross_attention_dim": 1280,
        "norm_num_groups": 32,
        "attention_head_dim": [6, 12, 24, 24],
        "down_block_types": [
            "DownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "DownBlock2D",
        ],
        "transformer_layers_per_block": 4,
        "addition_embed_type": "text_time",
        "addition_time_embed_dim": 256,
        "projection_class_embeddings_input_dim": 2560,
    }
    convert.check_sdxl_unet_config(good, cfg)  # must not raise

    bad = dict(good, block_out_channels=[320, 640, 1280], cross_attention_dim=2048)
    with pytest.raises(ValueError) as e:
        convert.check_sdxl_unet_config(bad, cfg)
    assert "block_out_channels" in str(e.value)
    assert "cross_attention_dim" in str(e.value)

    with pytest.raises(ValueError, match="attention heads"):
        convert.check_sdxl_unet_config(dict(good, attention_head_dim=[5, 10, 20, 20]), cfg)
    with pytest.raises(ValueError, match="attention placement"):
        convert.check_sdxl_unet_config(
            dict(good, down_block_types=["CrossAttnDownBlock2D"] * 4), cfg
        )


def test_unet2d_sdxl_convert_roundtrip():
    from lvd_tpu.models import unet2d as unet2d_mod
    from tests.test_sdxl_refiner import _tiny_sdxl_cfg

    cfg = _tiny_sdxl_cfg()
    init = unet2d_mod.init_unet2d(jax.random.PRNGKey(4), cfg)
    sd = _synthesize(flatten_pytree(jax.device_get(init)), _torch_key_unet)
    converted = convert.convert_unet2d(sd, cfg)
    convert.validate_against_init(converted, init, "unet2d-sdxl")
    _assert_trees_equal(converted, jax.device_get(init))
