"""The denoising loop: CFG + DPM-Solver++ + grounding, compiled end-to-end.

Parity target: /root/reference/models/controllable_pipeline_text_to_video_synth.py
:836-958 (the per-step Python loop) and models/pipelines.py:21-150
(`latent_backward_guidance`).

TPU-first structure (SURVEY.md §7):

* The 40-step loop is `lax.scan` over precomputed solver coefficients — one
  compilation, no host round-trips per step (the reference syncs `.item()`
  every guidance iteration).
* Step-index-dependent behaviour (cross-attention guidance for the first
  `max_index_step` steps, GLIGEN fuser for the first `beta * T` steps) is
  handled by *segmenting* the scan at those static boundaries, so each
  segment compiles exactly the work it does — no wasted fuser compute, no
  `lax.cond` over the whole UNet.
* The guidance inner loop is `lax.while_loop` gated on the carried loss
  (the reference's `while loss/scale > threshold and iter < max_iter`),
  with `jax.value_and_grad` through the UNet's functional attention outputs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.unet3d import apply_unet3d
from . import dpm_solver as dpm
from .guidance import GuidanceConfig, compute_ca_energy


class GuidanceArrays(NamedTuple):
    """Device-side pytree of rasterize.GuidancePack (static dict keys)."""

    masks: dict
    token_indices: jnp.ndarray
    token_mask: jnp.ndarray
    k_fg: dict
    k_bg: dict


def pack_to_arrays(pack) -> GuidanceArrays:
    return GuidanceArrays(
        masks={k: jnp.asarray(v) for k, v in pack.masks.items()},
        token_indices=jnp.asarray(pack.token_indices),
        token_mask=jnp.asarray(pack.token_mask),
        k_fg={k: jnp.asarray(v) for k, v in pack.k_fg.items()},
        k_bg={k: jnp.asarray(v) for k, v in pack.k_bg.items()},
    )


def _slice_coeffs(coeffs: dpm.SolverCoeffs, start: int, end: int):
    return dpm.SolverCoeffs(*[a[start:end] for a in coeffs])


def segment_boundaries(n_steps: int, guidance_end: int, gligen_end: int):
    """Static scan-segment boundaries: the denoise loop splits where the
    active mechanism set changes (guidance stops at ``guidance_end``
    = min(max_index_step, T); the GLIGEN fuser stops at ``gligen_end``
    = min(beta * T, T)), so each lax.scan segment compiles exactly the work
    it performs (reference keeps one Python loop with per-step conditionals,
    controllable_pipeline:816-839, 881-892)."""
    return sorted({0, guidance_end, gligen_end, n_steps})


def sample_video(
    unet_params,
    unet_cfg,
    latents,                 # (B, F, h, w, C) initial noise (sigma-scaled)
    text_pair,               # (2B, L, D): [uncond; cond]
    coeffs: dpm.SolverCoeffs,
    guidance_scale: float = 9.0,
    guidance: Optional[GuidanceArrays] = None,
    guidance_cfg: Optional[GuidanceConfig] = None,
    guidance_attn_keys: Sequence[Tuple] = (),
    gligen_pair=None,        # dict of (2B*F, M, ...) arrays or None
    num_grounding_steps: int = 0,
    spmd_axis=None,          # mesh axis when running inside shard_map with
                             # frames sharded; guidance arrays and gligen
                             # inputs must then be frame-sharded consistently
):
    """Run the full denoising loop; returns final latents.

    Pure function — jit it (or pjit it) whole. All Python-level flags and
    segment boundaries are static.
    """
    n_steps = int(coeffs.timestep.shape[0])
    b = latents.shape[0]
    f = latents.shape[1]

    g_cfg = guidance_cfg or GuidanceConfig()
    g_end = min(g_cfg.max_index_step, n_steps) if guidance is not None else 0
    gl_end = min(num_grounding_steps, n_steps) if gligen_pair is not None else 0

    boundaries = segment_boundaries(n_steps, g_end, gl_end)
    segments = [
        (boundaries[i], boundaries[i + 1]) for i in range(len(boundaries) - 1)
    ]

    keys = tuple(tuple(k) for k in guidance_attn_keys)
    cond_text = text_pair[b:]
    gligen_cond = None
    if gligen_pair is not None:
        # cond half of the flattened (2B*F, ...) grounding inputs
        gligen_cond = {k: v[b * f :] for k, v in gligen_pair.items()}

    # The latent carry runs in fp32 end-to-end (1 MB — free): guidance
    # updates are small relative to the unit-scale noise latent and sit
    # below the bf16 ulp (~7.8e-3 at 1.0), so a bf16 carry silently rounds
    # them away — measured in-box attention gain collapsed to 1.0007 with a
    # bf16 carry. The reference's fp16 latents (controllable_pipeline) have
    # 8x finer resolution and never hit this. The UNet still consumes the
    # production dtype (``model_dt``).
    model_dt = latents.dtype

    def make_step(with_guidance: bool, with_gligen: bool):
        def energy(lat32, t):
            # capture_only: the energy consumes attention maps, not the
            # noise prediction — the UNet walk stops at the last captured
            # site (skipping up block 3 + conv_out for the standard keys).
            _, aux = apply_unet3d(
                unet_params,
                unet_cfg,
                dpm.scale_model_input(lat32).astype(model_dt),
                t,
                cond_text,
                capture_keys=keys,
                capture_only=True,
                remat=g_cfg.energy_remat != "none",
                spmd_axis=spmd_axis,
            )
            return (
                compute_ca_energy(aux, guidance, keys, g_cfg, axis_name=spmd_axis)
                * g_cfg.loss_scale
            )

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
            eps, _ = apply_unet3d(
                unet_params,
                unet_cfg,
                dpm.scale_model_input(lat_in),
                c.timestep,
                text_pair,
                gligen=gligen_pair if with_gligen else None,
                spmd_axis=spmd_axis,
            )
            eps_u, eps_c = eps[:b], eps[b:]
            eps_cfg = eps_u + guidance_scale * (eps_c - eps_u)

            state, lat = dpm.step(state, c, lat, eps_cfg)
            return (lat, state, loss), None

        return step_fn

    lat32 = latents.astype(jnp.float32)
    state = dpm.init_state_like(lat32)
    loss = jnp.float32(1e10)  # "always guide on the first step"
    carry = (lat32, state, loss)

    for start, end in segments:
        step_fn = make_step(
            with_guidance=guidance is not None and start < g_end,
            with_gligen=gligen_pair is not None and start < gl_end,
        )
        carry, _ = jax.lax.scan(step_fn, carry, _slice_coeffs(coeffs, start, end))

    return carry[0].astype(model_dt)
