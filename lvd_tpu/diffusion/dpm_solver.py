"""DPM-Solver++ (2M) as a pure, scan-friendly function.

Replaces the stateful diffusers ``DPMSolverMultistepScheduler`` the reference
swaps in (generation/lvd.py:46) with a functional formulation: all per-step
coefficients are precomputed host-side into arrays, the solver state is an
explicit carry, and one step is `step(state, coeffs, x, model_eps) -> (state, x)`.
Matches diffusers defaults: algorithm dpmsolver++, solver_order=2, midpoint,
epsilon prediction, no Karras sigmas, thresholding off.

VP parameterization: alpha_t = sqrt(abar_t), sigma_t = sqrt(1 - abar_t),
lambda_t = log(alpha_t / sigma_t). For epsilon-prediction the data estimate is
x0 = (x - sigma_t * eps) / alpha_t, and the multistep updates are

  1st order:  x_prev = (sig_p / sig_c) x - alpha_p (e^{-h} - 1) x0
  2nd order (midpoint), with h = lam_p - lam_c, h0 = lam_c - lam_prev_c,
  r = h0 / h, D0 = x0_c, D1 = (x0_c - x0_prev) / r:
              x_prev = (sig_p / sig_c) x - alpha_p (e^{-h} - 1) (D0 + 0.5 D1)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig
from . import schedule


class SolverCoeffs(NamedTuple):
    """Per-step solver coefficients, each shaped (num_steps,)."""

    timestep: jnp.ndarray      # integer t fed to the UNet
    alpha_c: jnp.ndarray       # alpha at current t
    sigma_c: jnp.ndarray       # sigma at current t
    alpha_p: jnp.ndarray       # alpha at the step target
    sigma_p: jnp.ndarray       # sigma at the step target
    h: jnp.ndarray             # lambda_p - lambda_c
    r: jnp.ndarray             # h_prev / h (0 on the first step)
    use_second_order: jnp.ndarray  # bool per step
    sqrt_one_minus_abar: jnp.ndarray  # sqrt(1 - abar_t): guidance grad scale


class SolverState(NamedTuple):
    prev_x0: jnp.ndarray  # data prediction from the previous step


def init_state(latents_shape, dtype=jnp.float32) -> SolverState:
    return SolverState(prev_x0=jnp.zeros(latents_shape, dtype))


def init_state_like(latents) -> SolverState:
    """Zero state inheriting latents' sharding/varying-axes (required when
    the solver runs inside shard_map)."""
    return SolverState(prev_x0=jnp.zeros_like(latents))


def make_coeffs(
    cfg: SchedulerConfig,
    num_inference_steps: int = None,
    timesteps: np.ndarray = None,
    lower_order_final: bool = True,
    dtype=jnp.float32,
) -> SolverCoeffs:
    """Precompute per-step coefficients. Supply either ``num_inference_steps``
    or an explicit descending ``timesteps`` array (fast schedules)."""
    if timesteps is None:
        timesteps = schedule.inference_timesteps(cfg, num_inference_steps)
    timesteps = np.asarray(timesteps, dtype=np.int64)
    n = len(timesteps)

    abar = schedule.make_alphas_cumprod(cfg)
    alpha = np.sqrt(abar)
    sigma = np.sqrt(1.0 - abar)
    lam = np.log(alpha) - np.log(sigma)

    # Step targets: next timestep in the list, and 0-boundary for the last
    # step (diffusers uses sigma at "t=0" == prev_timestep 0 semantics:
    # alpha=alpha[0 - 1]... the final target is timestep 0's predecessor,
    # i.e. fully denoised -> alpha_prev from abar at t=prev where prev<0
    # maps to alpha=1, sigma=0 would blow up lambda; diffusers instead
    # appends sigma at t=0). Follow diffusers: final target = t=0 grid point.
    t_prev = np.concatenate([timesteps[1:], [0]])

    a_c, s_c, l_c = alpha[timesteps], sigma[timesteps], lam[timesteps]
    a_p, s_p, l_p = alpha[t_prev], sigma[t_prev], lam[t_prev]

    h = l_p - l_c
    h_prev = np.concatenate([[np.nan], h[:-1]])
    with np.errstate(invalid="ignore"):
        r = np.where(np.isnan(h_prev), 0.0, h_prev / h)

    use_second = np.ones(n, dtype=bool)
    use_second[0] = False  # no history yet
    if lower_order_final and n < 15:
        use_second[-1] = False  # diffusers lower_order_final heuristic

    return SolverCoeffs(
        timestep=jnp.asarray(timesteps),
        alpha_c=jnp.asarray(a_c, dtype),
        sigma_c=jnp.asarray(s_c, dtype),
        alpha_p=jnp.asarray(a_p, dtype),
        sigma_p=jnp.asarray(s_p, dtype),
        h=jnp.asarray(h, dtype),
        r=jnp.asarray(r, dtype),
        use_second_order=jnp.asarray(use_second),
        sqrt_one_minus_abar=jnp.asarray(sigma[timesteps], dtype),
    )


def step(state: SolverState, c, x, eps):
    """One DPM-Solver++ 2M step.

    ``c`` is a SolverCoeffs slice for this step (scalars). x and eps are the
    latents and the (CFG-combined) epsilon prediction in matching shape.
    Returns (new_state, x_prev).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    eps32 = eps.astype(jnp.float32)

    x0 = (x32 - c.sigma_c * eps32) / c.alpha_c

    ratio = c.sigma_p / c.sigma_c
    phi = jnp.exp(-c.h) - 1.0

    first = ratio * x32 - c.alpha_p * phi * x0

    d1 = (x0 - state.prev_x0.astype(jnp.float32)) / jnp.where(c.r == 0, 1.0, c.r)
    second = ratio * x32 - c.alpha_p * phi * (x0 + 0.5 * d1)

    x_prev = jnp.where(c.use_second_order, second, first)
    return SolverState(prev_x0=x0.astype(dtype)), x_prev.astype(dtype)


def scale_model_input(x, _t=None):
    """DPM-Solver++ works directly on x (identity), unlike e.g. EDM scalings."""
    return x


INIT_NOISE_SIGMA = 1.0
