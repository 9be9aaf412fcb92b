"""Benchmark: seconds per Zeroscope LVD video on the current accelerator.

Measures the reference's flagship configuration (BASELINE.md): Zeroscope
576x320, 24 frames, 40-step DPM-Solver++ with CFG, plus cross-attention
guidance (max_iter 1 over the first 10 steps) — i.e. 80 CFG UNet forwards +
10 guidance forward+backward passes + VAE decode of 24 frames. Weights are
random (identical FLOPs/memory traffic to trained weights).

Prints ONE JSON line (stderr carries kernel-numerics certification lines):
  {"metric": "sec_per_video", "value": N, "unit": "s", "vs_baseline": 10/N}
vs_baseline is relative to the 10 s/video north-star (BASELINE.json, v5e-8);
values > 1.0 beat the target.

Env knobs: LVD_BENCH_TINY=1 (CPU smoke), LVD_BENCH_STEPS, LVD_BENCH_FRAMES,
LVD_BENCH_MODE=gligen (measure the lvd-gligen_zeroscope path: scheduled-
sampling GLIGEN grounding, beta=0.4, NO backward guidance — the reference's
"significantly faster" configuration, README.md:80), LVD_BENCH_SKIP_SELFCHECK=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from lvd_tpu.diffusion.guidance import GuidanceConfig
    from lvd_tpu.models.loader import tiny_pipeline_models
    from lvd_tpu.pipeline import TextToVideoPipeline
    from lvd_tpu.runners.base import OVERALL_GUIDANCE_ATTN_KEYS
    from lvd_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    tiny = os.environ.get("LVD_BENCH_TINY") == "1"
    gligen = os.environ.get("LVD_BENCH_MODE") == "gligen"
    if tiny:
        jax.config.update("jax_platforms", "cpu")

    if tiny:
        models = tiny_pipeline_models(
            attention_type="gated" if gligen else "default"
        )
        steps = int(os.environ.get("LVD_BENCH_STEPS", 6))
        frames = int(os.environ.get("LVD_BENCH_FRAMES", 4))
        dtype = jnp.float32
    else:
        from lvd_tpu.config import PRESETS
        from lvd_tpu.models import clip as clip_mod
        from lvd_tpu.models import unet3d as unet_mod
        from lvd_tpu.models import vae as vae_mod
        from lvd_tpu.pipeline import PipelineModels
        from lvd_tpu.text.tokenizer import load_tokenizer

        preset = PRESETS["lvd-gligen_zeroscope" if gligen else "zeroscope"]
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        tokenizer = load_tokenizer(None)
        print(f"bench tokenizer: {type(tokenizer).__name__}", file=sys.stderr)
        models = PipelineModels(
            preset=preset,
            unet_params=unet_mod.init_unet3d(k[0], preset.unet),
            clip_params=clip_mod.init_clip_text(k[1], preset.clip),
            vae_params=vae_mod.init_vae(k[2], preset.vae),
            tokenizer=tokenizer,
        )
        steps = int(os.environ.get("LVD_BENCH_STEPS", 40))
        frames = int(os.environ.get("LVD_BENCH_FRAMES", 24))
        dtype = jnp.bfloat16

        # Certify Pallas-kernel numerics on this chip before measuring
        # (one JSON line per kernel on stderr; VERDICT r2 item 6).
        if os.environ.get("LVD_BENCH_SKIP_SELFCHECK") != "1":
            from lvd_tpu.ops.selfcheck import run_all

            assert run_all(out=lambda s: print(s, file=sys.stderr)), (
                "kernel selfcheck failed — see stderr lines above"
            )

    pipe = TextToVideoPipeline(models, dtype=dtype)

    # The reference zeroscope config (README.md:66-69).
    g_cfg = GuidanceConfig(
        loss_scale=2.5,
        loss_threshold=350.0,
        max_iter=1,
        max_index_step=10,
        fg_top_p=0.25,
        bg_top_p=0.25,
        fg_weight=1.0,
        bg_weight=2.0,
    )

    prompt = "A bear walks from the left to the right, forest background"
    boxes = [
        [
            [0.05 + 0.8 * f / max(frames - 1, 1), 0.45,
             0.30 + 0.8 * f / max(frames - 1, 1), 0.80]
            for f in range(frames)
        ]
    ]
    backward_guidance = {
        "boxes": boxes,
        "object_positions": [[2]],
        "config": g_cfg,
        "attn_keys": OVERALL_GUIDANCE_ATTN_KEYS,
    }

    if gligen:
        # lvd-gligen flagship config: grounding via gated self-attention
        # with scheduled sampling beta=0.4, no backward guidance
        # (reference README.md:79-87, generation/lvd_gligen.py).
        kwargs = dict(
            gligen_boxes=[[b] for b in boxes[0]],
            gligen_phrases=[["bear"]] * frames,
            gligen_scheduled_sampling_beta=0.4,
        )
    else:
        kwargs = dict(backward_guidance=backward_guidance)

    def run(seed):
        # uint8_device: the decoded frames stay on-device so video i's
        # host transfer (12.7 MB over the tunnel) overlaps video i+1's
        # sampling — standard throughput pipelining; every video's bytes
        # still land on the host inside the timed region.
        return pipe(
            prompt,
            negative_prompt="dull, blurry",
            num_inference_steps=steps,
            num_frames=frames,
            seed=seed,
            output_type="uint8_device",
            **kwargs,
        )

    import numpy as np

    # Warmup: compile everything.
    np.asarray(run(0))

    n_trials = 1 if tiny else 3
    t0 = time.time()
    pending = None
    for i in range(n_trials):
        fut = run(i + 1)
        if pending is not None:
            np.asarray(pending)
        pending = fut
    np.asarray(pending)
    sec = (time.time() - t0) / n_trials

    print(
        json.dumps(
            {
                "metric": "sec_per_video_gligen" if gligen else "sec_per_video",
                "value": round(sec, 3),
                "unit": "s",
                "vs_baseline": round(10.0 / sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
