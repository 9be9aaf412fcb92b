"""LMD-era 2D image pipeline: semantic guidance + latent composition.

Parity target: /root/reference/models/pipelines.py:204-399
(`generate_semantic_guidance`) over the instrumented 2D SD UNet
(models/unet_2d_condition.py) with /root/reference/utils/latents.py
composition. Same structure as the video sampler: one `lax.scan` over
DPM-Solver++ coefficients, guidance as `jax.value_and_grad` through
functional attention outputs, segmented at the static guidance boundary.
Supports per-step latent histories (`save_all_latents`, the input to
compose_latents) and truncated fast schedules.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SchedulerConfig, VAEConfig
from .diffusion import dpm_solver as dpm
from .diffusion import schedule as schedule_mod
from .diffusion.guidance import GuidanceConfig, compute_ca_energy
from .diffusion.sampler import GuidanceArrays, pack_to_arrays
from .layout.rasterize import make_guidance_pack
from .models.unet2d import UNet2DConfig, apply_unet2d
from .models.vae import decode as vae_decode


def generate_semantic_guidance(
    unet_params,
    unet_cfg: UNet2DConfig,
    latents,                # (B, h, w, C) scaled initial latents
    text_pair,              # (2B, L, D): [uncond; cond]
    sched_cfg: SchedulerConfig,
    num_inference_steps: int,
    guidance_scale: float = 7.5,
    guidance: Optional[GuidanceArrays] = None,
    guidance_cfg: Optional[GuidanceConfig] = None,
    guidance_attn_keys: Sequence[Tuple] = (),
    gligen=None,            # {boxes (B,M,4), masks, positive_embeddings}
    num_grounding_steps: int = 0,
    save_all_latents: bool = False,
    fast_after_steps: Optional[int] = None,
    fast_rate: int = 2,
):
    """Pure function; jit whole. Returns final latents, or
    (final, all_latents (T+1, B, h, w, C)) with ``save_all_latents``."""
    timesteps = schedule_mod.inference_timesteps(sched_cfg, num_inference_steps)
    if fast_after_steps is not None:
        timesteps = schedule_mod.get_fast_schedule(
            timesteps, fast_after_steps, fast_rate
        )
    coeffs = dpm.make_coeffs(sched_cfg, timesteps=timesteps)
    n_steps = len(timesteps)

    g_cfg = guidance_cfg or GuidanceConfig()
    g_end = min(g_cfg.max_index_step, n_steps) if guidance is not None else 0
    gl_end = min(num_grounding_steps, n_steps) if gligen is not None else 0
    boundaries = sorted({0, g_end, gl_end, n_steps})
    segments = [(boundaries[i], boundaries[i + 1]) for i in range(len(boundaries) - 1)]

    keys = tuple(tuple(k) for k in guidance_attn_keys)
    b = latents.shape[0]
    cond_text = text_pair[b:]
    # fp32 latent carry (see diffusion/sampler.py): guidance updates round
    # away in a bf16 carry; the UNet still consumes the production dtype.
    model_dt = latents.dtype

    def make_step(with_guidance, with_gligen):
        def energy(lat32, t):
            _, aux = apply_unet2d(
                unet_params, unet_cfg, lat32.astype(model_dt), t, cond_text,
                capture_keys=keys, remat=True,
                gligen=gligen if with_gligen else None,
            )
            return compute_ca_energy(aux, guidance, keys, g_cfg) * g_cfg.loss_scale

        def step_fn(carry, c):
            lat, state, loss = carry
            if with_guidance:
                def g_body(val):
                    lat_i, _, it = val
                    l, grad = jax.value_and_grad(energy)(lat_i, c.timestep)
                    lat_i = lat_i - c.sqrt_one_minus_abar * grad
                    return lat_i, l, it + 1

                def g_cond(val):
                    _, l, it = val
                    return jnp.logical_and(
                        l / g_cfg.loss_scale > g_cfg.loss_threshold,
                        it < g_cfg.max_iter,
                    )

                lat, loss, _ = jax.lax.while_loop(
                    g_cond, g_body, (lat, loss, jnp.int32(0))
                )

            lat_in = jnp.concatenate([lat, lat], axis=0).astype(model_dt)
            g_pair = None
            if with_gligen:
                g_pair = {k: jnp.concatenate([v, v], 0) for k, v in gligen.items()}
                g_pair["masks"] = g_pair["masks"].at[:b].set(0.0)
            eps, _ = apply_unet2d(
                unet_params, unet_cfg, lat_in, c.timestep, text_pair, gligen=g_pair
            )
            eps_u, eps_c = eps[:b], eps[b:]
            eps_cfg = eps_u + guidance_scale * (eps_c - eps_u)
            state, lat = dpm.step(state, c, lat, eps_cfg)
            return (lat, state, loss), (
                lat.astype(model_dt) if save_all_latents else None)

        return step_fn

    lat32 = latents.astype(jnp.float32)
    state = dpm.init_state(latents.shape, jnp.float32)
    carry = (lat32, state, jnp.float32(1e10))
    history = [latents] if save_all_latents else None

    def _slice(coeffs, s, e):
        return dpm.SolverCoeffs(*[a[s:e] for a in coeffs])

    for start, end in segments:
        step_fn = make_step(
            guidance is not None and start < g_end,
            gligen is not None and start < gl_end,
        )
        carry, ys = jax.lax.scan(step_fn, carry, _slice(coeffs, start, end))
        if save_all_latents:
            history.append(ys)

    final = carry[0].astype(model_dt)
    if save_all_latents:
        all_latents = jnp.concatenate(
            [history[0][None]] + history[1:], axis=0
        )
        return final, all_latents
    return final


def decode_images(vae_params, vae_cfg: VAEConfig, latents):
    """(B, h, w, C) latents -> (B, H, W, 3) float [0,1]."""
    imgs = vae_decode(vae_params, vae_cfg, latents / vae_cfg.scaling_factor)
    return jnp.clip(imgs.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)


def build_image_guidance(
    boxes,                  # (O, 4) single-frame normalized xyxy
    object_positions,
    guidance_attn_keys,
    latent_hw,
    g_cfg: GuidanceConfig,
):
    """Single-frame GuidancePack (boxes get a frame axis of length 1)."""
    boxes_f = [[list(b)] for b in boxes]
    pack = make_guidance_pack(
        boxes_f,
        object_positions,
        guidance_attn_keys,
        latent_hw,
        fg_top_p=g_cfg.fg_top_p,
        bg_top_p=g_cfg.bg_top_p,
    )
    return pack_to_arrays(pack)
