"""Runner-level coverage: the combined GLIGEN + cross-attention-guidance
path (lvd_plus) and the scan-segmentation logic behind it.

Parity targets: /root/reference/generation/lvd_plus.py:75-210 (combined
mechanisms) and controllable_pipeline:816-839 (scheduled sampling beta).
"""

import jax.numpy as jnp
import numpy as np

from lvd_tpu.diffusion.guidance import GuidanceConfig
from lvd_tpu.diffusion.sampler import segment_boundaries
from lvd_tpu.models.loader import tiny_pipeline_models
from lvd_tpu.pipeline import TextToVideoPipeline


def test_segment_boundaries():
    # guided for 10 steps, GLIGEN for 16 of 40: three segments
    assert segment_boundaries(40, 10, 16) == [0, 10, 16, 40]
    # mechanisms end together: two segments
    assert segment_boundaries(40, 10, 10) == [0, 10, 40]
    # guidance only
    assert segment_boundaries(40, 10, 0) == [0, 10, 40]
    # no mechanism
    assert segment_boundaries(40, 0, 0) == [0, 40]
    # mechanism outlives the schedule (beta=1.0)
    assert segment_boundaries(8, 2, 8) == [0, 2, 8]


def _run(pipe, *, guided: bool, gligen: bool, steps=4, frames=4):
    boxes = [[[0.1, 0.2, 0.5, 0.7]] * frames]
    kwargs = {}
    if guided:
        kwargs["backward_guidance"] = {
            "boxes": boxes,
            "object_positions": [[2]],
            "config": GuidanceConfig(
                max_index_step=2, max_iter=1, loss_scale=2.0, loss_threshold=1e-6
            ),
            "attn_keys": (("down", 1, 0, 0), ("up", 1, 0, 0)),
        }
    if gligen:
        kwargs["gligen_boxes"] = [boxes[0][f : f + 1] for f in range(frames)]
        kwargs["gligen_phrases"] = [["ball"] for _ in range(frames)]
        # beta=0.5 of 4 steps -> fuser active for 2 steps; with guidance
        # ending at step 2 as well this exercises the segment overlap, and
        # beta boundary != guidance boundary is covered below.
        kwargs["gligen_scheduled_sampling_beta"] = 0.75
    return pipe(
        "a red ball",
        num_frames=frames,
        num_inference_steps=steps,
        seed=0,
        output_type="latent",
        **kwargs,
    )


def _open_fuser_gates(params, value=0.5):
    """Fresh GLIGEN adapters have zero alpha gates (inert by design,
    reference models/attention.py:42-46); open them so the fuser path has an
    observable effect."""
    import jax.numpy as jnp

    def walk(node):
        if isinstance(node, dict):
            if "alpha_attn" in node:
                node["alpha_attn"] = jnp.float32(value)
                node["alpha_dense"] = jnp.float32(value)
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(params)


def test_lvd_plus_combines_both_mechanisms():
    """Guided+GLIGEN sampling must (a) run the 3-segment scan, (b) produce
    finite latents, and (c) differ from either mechanism alone — the
    reference's lvd_plus semantics (generation/lvd_plus.py:172-188)."""
    models = tiny_pipeline_models(attention_type="gated")
    _open_fuser_gates(models.unet_params)
    pipe = TextToVideoPipeline(models, dtype=jnp.float32)

    both = np.asarray(_run(pipe, guided=True, gligen=True))
    guided_only = np.asarray(_run(pipe, guided=True, gligen=False))
    gligen_only = np.asarray(_run(pipe, guided=False, gligen=True))
    neither = np.asarray(_run(pipe, guided=False, gligen=False))

    for out in (both, guided_only, gligen_only, neither):
        assert np.isfinite(out).all()

    # Guidance moves the latents; the (randomly-initialized but nonzero after
    # PositionNet) GLIGEN fuser path moves them too; combined differs from both.
    assert np.abs(both - guided_only).max() > 1e-6
    assert np.abs(both - gligen_only).max() > 1e-6
    assert np.abs(guided_only - neither).max() > 1e-6


def test_lvd_plus_runner_module(tmp_path, monkeypatch):
    """Drive the lvd_plus runner through its module contract
    (version/init/run) in tiny mode, asserting gif+joblib outputs."""
    monkeypatch.setenv("LVD_TINY", "1")
    from lvd_tpu.runners import base, lvd_plus

    assert lvd_plus.version == "lvd-plus"
    h, w = lvd_plus.init("modelscope256")
    assert (h, w) == (64, 96)  # tiny preset geometry

    monkeypatch.setattr(base, "img_dir", str(tmp_path))
    layout = {
        "Prompt": "a red ball rolls right",
        **{
            f"Frame {i + 1}": [
                {"id": 0, "name": "red ball", "box": [40 + 60 * i, 200, 120, 120]}
            ]
            for i in range(6)
        },
        "Background keyword": "grass",
    }
    lvd_plus.run(
        layout,
        seed=0,
        num_inference_steps=3,
        num_frames=4,
        max_index_step=2,
        max_iter=1,
        gligen_scheduled_sampling_beta=0.75,
        repeat_ind=0,
    )
    assert (tmp_path / "video_0.gif").exists()
    assert (tmp_path / "video_0.joblib").exists()

    # Second call with the same output path must skip (resume semantics).
    lvd_plus.run(layout, seed=0, num_inference_steps=3, num_frames=4, repeat_ind=0)


def test_baseline_runner_modules(tmp_path, monkeypatch):
    """modelscope_dpm / zeroscope_dpm baselines: plain T2V, no grounding."""
    monkeypatch.setenv("LVD_TINY", "1")
    from lvd_tpu.runners import base, modelscope_dpm, zeroscope_dpm

    layout = {"Prompt": "a calm lake", "Background keyword": "mountain"}

    assert modelscope_dpm.version == "modelscope"
    modelscope_dpm.init("256")
    monkeypatch.setattr(base, "img_dir", str(tmp_path / "ms"))
    (tmp_path / "ms").mkdir()
    modelscope_dpm.run(layout, seed=1, num_inference_steps=2, num_frames=2,
                       repeat_ind=0)
    assert (tmp_path / "ms" / "video_0.gif").exists()
    assert (tmp_path / "ms" / "video_0.joblib").exists()

    assert zeroscope_dpm.version == "zeroscope"
    zeroscope_dpm.init("")
    monkeypatch.setattr(base, "img_dir", str(tmp_path / "zs"))
    (tmp_path / "zs").mkdir()
    zeroscope_dpm.run(layout, seed=2, num_inference_steps=2, num_frames=2,
                      repeat_ind=0)
    assert (tmp_path / "zs" / "video_0.gif").exists()
