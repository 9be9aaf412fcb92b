"""SDXL-refiner path: config-driven 2D UNet with text_time conditioning,
projected CLIP, per-frame img2img."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lvd_tpu.config import CLIPTextConfig
from lvd_tpu.models.clip import apply_clip_text, init_clip_text
from lvd_tpu.models.unet2d import UNet2DConfig, apply_unet2d, init_unet2d


def _tiny_sdxl_cfg():
    return UNet2DConfig(
        block_out_channels=(16, 32, 32, 32),
        cross_attention_dim=32,
        num_heads=(2, 2, 2, 2),
        down_block_has_attn=(False, True, True, False),
        transformer_depth=(0, 2, 2, 0),
        mid_transformer_depth=2,
        norm_num_groups=8,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=32 + 5 * 8,
    )


def test_sdxl_style_unet_forward():
    cfg = _tiny_sdxl_cfg()
    params = init_unet2d(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 24, 4), jnp.float32)
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 32), jnp.float32)
    added = {
        "text_embeds": jax.random.normal(jax.random.PRNGKey(3), (2, 32), jnp.float32),
        "time_ids": jnp.asarray([[64, 96, 0, 0, 2.5], [64, 96, 0, 0, 6.0]], jnp.float32),
    }
    out, aux = jax.jit(
        lambda p, x, t, c, a: apply_unet2d(p, cfg, x, t, c, added_cond=a)
    )(params, x, jnp.int32(400), text, added)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))

    # additional conditioning must matter
    added2 = dict(added, text_embeds=added["text_embeds"] + 1.0)
    out2, _ = jax.jit(
        lambda p, x, t, c, a: apply_unet2d(p, cfg, x, t, c, added_cond=a)
    )(params, x, jnp.int32(400), text, added2)
    assert float(jnp.abs(out2 - out).max()) > 1e-4

    # depth-2 transformer blocks exist where configured, none elsewhere
    assert len(params["down_blocks"][1]["layers"][0]["attn"]["blocks"]) == 2
    assert "attn" not in params["down_blocks"][0]["layers"][0]


def test_clip_projection_and_penultimate():
    cfg = CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, projection_dim=16,
    )
    params = init_clip_text(jax.random.PRNGKey(0), cfg, with_projection=True)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (2, 12)), jnp.int32)
    ids = ids.at[:, -1].set(49407)
    out = apply_clip_text(params, cfg, ids, return_penultimate=True)
    assert out["last_hidden_state"].shape == (2, 12, 32)
    assert out["penultimate_hidden_state"].shape == (2, 12, 32)
    assert out["text_embeds"].shape == (2, 16)
    # penultimate differs from final (a whole layer + final LN apart)
    assert float(
        jnp.abs(out["penultimate_hidden_state"] - out["last_hidden_state"]).max()
    ) > 1e-4


def test_sdxl_refiner_img2img_tiny(monkeypatch):
    monkeypatch.setenv("LVD_TINY", "1")
    import lvd_tpu.cli.upsample as up

    up._sdxl_pipe = None  # reset singleton
    video = np.random.default_rng(0).random((2, 32, 48, 3)).astype(np.float32)
    out = up.upsample_video_sdxl(
        video, "a bear in a forest", strength=0.5, num_inference_steps=4
    )
    assert out.shape == (2, 64, 96, 3)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1
