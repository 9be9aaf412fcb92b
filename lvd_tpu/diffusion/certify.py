"""Offline guidance-effect certification.

The reference's evidence that cross-attention guidance *works* is the
stage-2 OWL-ViT benchmark on real checkpoints (reference README.md:153-157)
— unreachable in a zero-egress environment. This module approximates that
certification on-device with random weights: at flagship shapes it measures
the physical quantity the energy optimizes — the fraction of each object
token's cross-attention mass that falls inside its box (and the distance of
the attention center-of-mass from the box center) — before and after
applying the guidance update (`diffusion/sampler.py` g_body: the same
`value_and_grad(energy)` + `sqrt(1-abar_t)`-scaled latent step that the
sampler's guided segment runs, reference models/pipelines.py:78-99).

`bench.py` prints the resulting JSON line at warmup next to the kernel
selfcheck; gain > 1 certifies the whole guidance stack (capture sites ->
token gather -> energy -> jax.grad through the UNet -> latent update) moves
attention into the boxes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.unet3d import apply_unet3d
from . import dpm_solver as dpm
from .guidance import GuidanceConfig, _center_of_mass, compute_ca_energy


def _key_metrics(attn, masks, token_indices, token_mask):
    """In-box attention-mass ratio and normalized CoM distance for one
    instrumented key.

    attn: (F, heads, HW, L) softmax probs (cond-only);
    masks: (O, F, Hk, Wk); token_indices/token_mask: (O, P).
    Returns (inbox_ratio, com_dist) scalars averaged over valid
    (object, token) pairs, frames and heads.
    """
    n_f, n_heads, hw, n_l = attn.shape
    n_obj, n_p = token_indices.shape
    hk, wk = masks.shape[2], masks.shape[3]

    a = attn.astype(jnp.float32)
    onehot = (
        token_indices.reshape(-1)[None, :] == jnp.arange(n_l)[:, None]
    ).astype(jnp.float32)                              # (L, O*P)
    g = (a @ onehot).reshape(n_f, n_heads, hw, n_obj, n_p)
    a = jnp.transpose(g, (3, 4, 0, 1, 2))              # (O, P, F, h, HW)

    m = masks.reshape(n_obj, 1, n_f, 1, hw)
    inside = (a * m).sum(-1)
    total = a.sum(-1) + 1e-12
    ratio = inside / total                             # (O, P, F, h)

    a2d = a.reshape(n_obj, n_p, n_f, n_heads, hk, wk)
    com_a_h, com_a_w = _center_of_mass(a2d)            # (O, P, F, h)
    com_m_h, com_m_w = _center_of_mass(masks)          # (O, F)
    diag = jnp.sqrt(jnp.float32(hk * hk + wk * wk))
    dist = jnp.sqrt(
        (com_a_h - com_m_h[:, None, :, None]) ** 2
        + (com_a_w - com_m_w[:, None, :, None]) ** 2
    ) / diag

    w = token_mask[:, :, None, None]                   # (O, P, 1, 1)
    denom = token_mask.sum() * n_f * n_heads + 1e-12
    return (ratio * w).sum() / denom, (dist * w).sum() / denom


def guidance_effect(
    unet_params,
    unet_cfg,
    scheduler_cfg,
    latents,            # (1, F, h, w, C) initial noise (sigma-scaled)
    cond_text,          # (1, L, D)
    guidance,           # sampler.GuidanceArrays
    attn_keys,
    g_cfg: GuidanceConfig,
    num_inference_steps: int = 40,
    n_iters: int = 5,
):
    """Measure in-box attention mass / CoM distance before vs after
    ``n_iters`` guidance updates at the first inference timestep.

    The update is exactly the sampler's guided-segment body (value_and_grad
    of the loss-scaled CA energy, latent -= sqrt(1-abar_t) * grad); running
    it a few times at one t approximates the cumulative effect of the
    max_iter-per-step schedule. Returns a dict of python floats.
    """
    keys = tuple(tuple(k) for k in attn_keys)
    coeffs = dpm.make_coeffs(scheduler_cfg, num_inference_steps)
    t = coeffs.timestep[0]
    s1ma = coeffs.sqrt_one_minus_abar[0]

    def energy(lat, params, txt, g):
        _, aux = apply_unet3d(
            params, unet_cfg, dpm.scale_model_input(lat), t, txt,
            capture_keys=keys, capture_only=True,
            remat=g_cfg.energy_remat != "none",
        )
        return compute_ca_energy(aux, g, keys, g_cfg) * g_cfg.loss_scale

    def metrics(lat, params, txt, g):
        _, aux = apply_unet3d(
            params, unet_cfg, dpm.scale_model_input(lat), t, txt,
            capture_keys=keys, capture_only=True,
        )
        ratios, dists = [], []
        for k in keys:
            r, d = _key_metrics(
                aux[k], g.masks[k], g.token_indices, g.token_mask,
            )
            ratios.append(r)
            dists.append(d)
        return jnp.stack(ratios).mean(), jnp.stack(dists).mean()

    # Params/text/guidance enter as jit ARGUMENTS — closing over them bakes
    # the full weight pytree into the lowering as constants (GBs).
    @jax.jit
    def run(lat, params, txt, g):
        dt = lat.dtype
        before = metrics(lat, params, txt, g)

        # The latent carry accumulates in fp32: per-iteration guidance
        # updates are small relative to the unit-scale noise latent, and a
        # bf16 carry quantizes them away (measured flagship gain collapsed
        # to 1.0007 with a bf16 carry vs the real effect). The UNet still
        # runs in the production dtype.
        def body(_, l):
            _, grad = jax.value_and_grad(
                lambda x: energy(x.astype(dt), params, txt, g))(l)
            return l - s1ma * grad

        lat2 = jax.lax.fori_loop(0, n_iters, body, lat.astype(jnp.float32))
        return before, metrics(lat2.astype(dt), params, txt, g)

    (r0, d0), (r1, d1) = jax.tree_util.tree_map(
        float, run(latents, unet_params, cond_text, guidance))
    return {
        "inbox_before": r0,
        "inbox_after": r1,
        "gain": r1 / max(r0, 1e-12),
        "com_dist_before": d0,
        "com_dist_after": d1,
        "n_iters": n_iters,
    }
