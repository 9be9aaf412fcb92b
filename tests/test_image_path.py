"""LMD-era 2D image path: UNet2D, semantic guidance, latent composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvd_tpu.config import SchedulerConfig
from lvd_tpu.diffusion.guidance import GuidanceConfig
from lvd_tpu.layout import latents as lat
from lvd_tpu.models.unet2d import apply_unet2d, init_unet2d, tiny_unet2d_config
from lvd_tpu.pipeline2d import (
    build_image_guidance,
    generate_semantic_guidance,
)

KEYS = (("down", 1, 0, 0), ("up", 1, 0, 0))


@pytest.fixture(scope="module")
def tiny2d():
    cfg = tiny_unet2d_config()
    params = init_unet2d(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_unet2d_forward_and_capture(tiny2d):
    cfg, params = tiny2d
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 24, 4), jnp.float32)
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 64), jnp.float32)
    out, aux = jax.jit(
        lambda p, x, t, c: apply_unet2d(p, cfg, x, t, c, capture_keys=KEYS)
    )(params, x, jnp.int32(500), text)
    assert out.shape == x.shape
    assert set(aux) == set(KEYS)
    heads = cfg.num_heads[1]
    assert aux[("down", 1, 0, 0)].shape == (2, heads, 8 * 12, 77)
    np.testing.assert_allclose(
        np.asarray(aux[("down", 1, 0, 0)].sum(-1)), 1.0, rtol=1e-4
    )


def test_generate_semantic_guidance_runs(tiny2d):
    cfg, params = tiny2d
    g_cfg = GuidanceConfig(max_index_step=2, max_iter=1, loss_scale=2.0)
    guidance = build_image_guidance(
        boxes=[[0.1, 0.1, 0.5, 0.6]],
        object_positions=[[2]],
        guidance_attn_keys=KEYS,
        latent_hw=(16, 24),
        g_cfg=g_cfg,
    )
    latents = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 24, 4), jnp.float32)
    text = jax.random.normal(jax.random.PRNGKey(4), (2, 77, 64), jnp.float32)
    sched = SchedulerConfig()

    final, all_latents = jax.jit(
        lambda p, l, t: generate_semantic_guidance(
            p, cfg, l, t, sched, num_inference_steps=5,
            guidance=guidance, guidance_cfg=g_cfg, guidance_attn_keys=KEYS,
            save_all_latents=True,
        )
    )(params, latents, text)
    assert final.shape == latents.shape
    assert all_latents.shape == (6, 1, 16, 24, 4)
    assert bool(jnp.all(jnp.isfinite(final)))
    np.testing.assert_allclose(
        np.asarray(all_latents[0]), np.asarray(latents), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(all_latents[-1]), np.asarray(final), rtol=1e-6
    )


def test_fast_schedule_path(tiny2d):
    cfg, params = tiny2d
    latents = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 24, 4), jnp.float32)
    text = jax.random.normal(jax.random.PRNGKey(6), (2, 77, 64), jnp.float32)
    out = generate_semantic_guidance(
        params, cfg, latents, text, SchedulerConfig(),
        num_inference_steps=8, fast_after_steps=4, fast_rate=2,
    )
    assert out.shape == latents.shape and bool(jnp.all(jnp.isfinite(out)))


def test_blend_and_compose_latents():
    key = jax.random.PRNGKey(0)
    bg = jax.random.normal(key, (1, 8, 12, 4))
    fg = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 12, 4))
    mask = lat.proportion_to_mask([0.25, 0.25, 0.75, 0.75], 8, 12)

    blended = lat.blend_latents(bg, fg, mask, fg_blending_ratio=0.5)
    outside = np.asarray((1 - mask)[None, :, :, None] * (blended - bg))
    np.testing.assert_allclose(outside, 0.0, atol=1e-6)
    inside_delta = np.abs(np.asarray(mask[None, :, :, None] * (blended - bg))).max()
    assert inside_delta > 0.1

    # Compose two object histories over a background.
    t_steps = 3
    hist1 = jnp.ones((t_steps + 1, 1, 8, 12, 4)) * 1.0
    hist2 = jnp.ones((t_steps + 1, 1, 8, 12, 4)) * 2.0
    m1 = lat.proportion_to_mask([0.0, 0.0, 0.5, 1.0], 8, 12)   # left half (larger)
    m2 = lat.proportion_to_mask([0.5, 0.5, 1.0, 1.0], 8, 12)   # bottom right
    composed, fg_idx = lat.compose_latents(
        [hist1, hist2], [m1, m2], bg, compose_box_to_bg=False
    )
    assert composed.shape == (t_steps + 1, 1, 8, 12, 4)
    fg_idx = np.asarray(fg_idx)
    assert fg_idx[4, 0] == 1        # left half -> object 1
    assert fg_idx[6, 11] == 2       # bottom-right -> object 2
    assert fg_idx[0, 11] == 0       # top-right -> background
    # Later steps carry only masked content (zeros in background).
    step1 = np.asarray(composed[1])[0]
    assert step1[0, 11].sum() == 0.0
    assert step1[4, 0, 0] == 1.0 and step1[6, 11, 0] == 2.0


def test_align_with_bboxes_shifts_to_target():
    hist = jnp.zeros((2, 1, 8, 12, 4)).at[:, :, 2:4, 2:4, :].set(1.0)
    mask = jnp.zeros((8, 12)).at[2:4, 2:4].set(1.0)
    target_box = [0.5, 0.5, 1.0, 1.0]  # center (0.75, 0.75)
    new_hist, new_masks, offsets = lat.align_with_bboxes([hist], [mask], [target_box])
    x_c, y_c = lat.binary_mask_to_center(new_masks[0])
    assert abs(x_c - 0.75) < 0.15 and abs(y_c - 0.75) < 0.15
    assert float(new_hist[0].sum()) == float(hist.sum())


def test_get_input_latents_list():
    out, bg = lat.get_input_latents_list(
        in_channels=4, bg_seed=0, fg_seed_start=100, fg_blending_ratio=0.1,
        height=64, width=96, so_boxes=[[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]],
    )
    assert len(out) == 2 and bg.shape == (1, 8, 12, 4)
    for latents in out:
        assert latents.shape == (1, 8, 12, 4)
    # fg seeds differ per object -> different latents inside their boxes
    assert float(jnp.abs(out[0] - out[1]).max()) > 0
