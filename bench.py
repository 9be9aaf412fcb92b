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
"significantly faster" configuration, README.md:80),
LVD_BENCH_MODE=multi (2-object multi-token-phrase guided prompt — the
500-prompt protocol's attribution/dynamic-task shape, so the guided-step
cost is measured at benchmark shapes, not the 1-object flagship minimum),
LVD_BENCH_MESH=data (frame-shard sampling over ALL visible devices via the
pipeline's mesh path; with one device this must reproduce the unsharded
number, on a real v5e-8 it IS the deliverable multi-chip measurement; adds
"mesh_devices" to the JSON line and prints the full-shape collective census
on stderr), LVD_BENCH_SKIP_SELFCHECK=1, LVD_BENCH_SKIP_CERTIFY=1.
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
    mode = os.environ.get("LVD_BENCH_MODE", "")
    gligen = mode == "gligen"
    multi = mode == "multi"
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

    mesh = None
    n_mesh = 0
    if os.environ.get("LVD_BENCH_MESH"):
        import numpy as _np
        from jax.sharding import Mesh

        devs = jax.devices()
        n_mesh = len(devs)
        frames_ = int(os.environ.get("LVD_BENCH_FRAMES", 4 if tiny else 24))
        while frames_ % n_mesh:
            n_mesh -= 1  # frames must shard evenly
        mesh = Mesh(_np.array(devs[:n_mesh]), ("data",))
        print(f"bench mesh: {n_mesh} x {devs[0].platform}", file=sys.stderr)

    pipe = TextToVideoPipeline(models, dtype=dtype, mesh=mesh)

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

    if multi:
        # Benchmark-protocol shape (eval/benchmark.py attribution/dynamic
        # tasks): two objects, multi-token phrases — the energy's (O, P)
        # tensors and top-k run at the sizes the 500-prompt run averages.
        prompt = ("A white fluffy cat walks toward a brown wooden chair, "
                  "living room background")
        move = lambda f: 0.55 * f / max(frames - 1, 1)
        boxes = [
            [[0.05 + move(f), 0.45, 0.30 + move(f), 0.80]
             for f in range(frames)],
            [[0.65, 0.40, 0.95, 0.85] for _ in range(frames)],
        ]
        object_positions = [[2, 3, 4], [9, 10, 11]]
    else:
        prompt = "A bear walks from the left to the right, forest background"
        boxes = [
            [
                [0.05 + 0.8 * f / max(frames - 1, 1), 0.45,
                 0.30 + 0.8 * f / max(frames - 1, 1), 0.80]
                for f in range(frames)
            ]
        ]
        object_positions = [[2]]
    backward_guidance = {
        "boxes": boxes,
        "object_positions": object_positions,
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

    # Guidance-effect certification (stderr, like the kernel selfcheck):
    # in-box attention-mass ratio and CoM distance before vs after guidance
    # updates at the first inference timestep, flagship shapes. gain > 1
    # certifies capture -> energy -> grad -> latent update moves attention
    # into the boxes (the offline stand-in for the env-blocked OWL-ViT
    # accuracy benchmark).
    if not gligen and os.environ.get("LVD_BENCH_SKIP_CERTIFY") != "1":
        from lvd_tpu.diffusion import dpm_solver as dpm
        from lvd_tpu.diffusion.certify import guidance_effect
        from lvd_tpu.diffusion.sampler import pack_to_arrays
        from lvd_tpu.layout.rasterize import make_guidance_pack

        preset_ = pipe.preset
        hl = preset_.height // preset_.vae.scale_factor
        wl = preset_.width // preset_.vae.scale_factor
        attn_keys = tuple(tuple(k) for k in OVERALL_GUIDANCE_ATTN_KEYS)
        pack = make_guidance_pack(
            boxes, object_positions, attn_keys, (hl, wl),
            fg_top_p=g_cfg.fg_top_p, bg_top_p=g_cfg.bg_top_p,
        )
        lat0 = (
            jax.random.normal(
                jax.random.PRNGKey(0), (1, frames, hl, wl, 4), jnp.float32
            ) * dpm.INIT_NOISE_SIGMA
        ).astype(dtype)
        cond_text = pipe.encode_prompt(prompt, "dull, blurry")[1:].astype(dtype)
        eff = guidance_effect(
            pipe.unet_params, preset_.unet, preset_.scheduler,
            lat0, cond_text, pack_to_arrays(pack), attn_keys, g_cfg,
            num_inference_steps=steps, n_iters=4 if tiny else 16,
        )
        print(json.dumps({
            "metric": "guidance_inbox_gain",
            "value": round(eff["gain"], 4),
            **{k: round(v, 5) if isinstance(v, float) else v
               for k, v in eff.items()},
        }), file=sys.stderr)
        # Tiny random-init models attenuate attention too much for a hard
        # gate; the real-chip flagship run must certify.
        if not tiny:
            assert eff["gain"] > 1.0, f"guidance certification failed: {eff}"

    if mesh is not None:
        # Full-shape per-device collective census of the frame-sharded CFG
        # forward (lowering only; the machine-checked ICI input to the
        # multi-chip projection in PERF.md).
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        from lvd_tpu.models.unet3d import apply_unet3d
        from lvd_tpu.parallel.audit import audit_collectives

        cfg_u = pipe.preset.unet
        hl = pipe.preset.height // pipe.preset.vae.scale_factor
        wl = pipe.preset.width // pipe.preset.vae.scale_factor
        lat_s = jnp.zeros((1, frames, hl, wl, 4), dtype)
        txt_s = jnp.zeros((2, cfg_u.max_text_len, cfg_u.cross_attention_dim),
                          dtype)

        def _fwd(p_, lat, txt):
            lat_in = jnp.concatenate([lat, lat], axis=0)
            eps, _ = apply_unet3d(p_, cfg_u, lat_in, 500, txt,
                                  spmd_axis="data")
            return eps

        census = audit_collectives(
            shard_map(_fwd, mesh=mesh,
                      in_specs=(P(), P(None, "data"), P()),
                      out_specs=P(None, "data"),
                      # On TPU the Pallas kernels engage; their out_shape
                      # ShapeDtypeStructs carry no vma annotation.
                      check_vma=False),
            pipe.unet_params, lat_s, txt_s, n_devices=n_mesh,
        )
        print(json.dumps({"collective_census_per_cfg_fwd": census}),
              file=sys.stderr)

    n_trials = 1 if tiny else 3
    t0 = time.time()
    pending = None
    dispatch = 0.0
    for i in range(n_trials):
        td = time.time()
        fut = run(i + 1)
        dispatch += time.time() - td
        if pending is not None:
            np.asarray(pending)
        pending = fut
    np.asarray(pending)
    sec = (time.time() - t0) / n_trials
    # Host-side serial cost per video (prompt encode, box rasterization,
    # guidance-pack transfers, dispatch) — the part device work can't hide.
    print(json.dumps({"metric": "host_dispatch_sec",
                      "value": round(dispatch / n_trials, 3)}),
          file=sys.stderr)

    metric = "sec_per_video"
    if gligen:
        metric = "sec_per_video_gligen"
    elif multi:
        metric = "sec_per_video_multi"
    out = {
        "metric": metric,
        "value": round(sec, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / sec, 3),
    }
    if mesh is not None:
        out["mesh_devices"] = n_mesh
    print(json.dumps(out))


if __name__ == "__main__":
    main()
