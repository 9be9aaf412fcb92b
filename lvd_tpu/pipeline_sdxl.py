"""SDXL-refiner img2img pipeline (per-frame upsampling refinement).

Parity target: /root/reference/scripts/upsample.py:104-206 (`upsample_sdxl`
uses StableDiffusionXLImg2ImgPipeline at strength 0.1-0.35). The refiner is
a 2D UNet (models/unet2d.sdxl_refiner_config) conditioned on OpenCLIP-bigG
penultimate hidden states plus pooled text / size / crop / aesthetic-score
"text_time" embeddings.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .config import CLIPTextConfig, SchedulerConfig, VAEConfig
from .diffusion import dpm_solver as dpm
from .diffusion import schedule as schedule_mod
from .models.clip import apply_clip_text
from .models.unet2d import UNet2DConfig, apply_unet2d
from .models.vae import decode as vae_decode
from .models.vae import encode as vae_encode


@dataclasses.dataclass
class SDXLRefinerModels:
    unet_cfg: UNet2DConfig
    clip_cfg: CLIPTextConfig       # OpenCLIP bigG (hidden 1280, projected)
    vae_cfg: VAEConfig
    scheduler: SchedulerConfig
    unet_params: dict
    clip_params: dict
    vae_params: dict
    tokenizer: object


class SDXLRefinerPipeline:
    """img2img refinement: encode, renoise to `strength`, denoise the tail
    with aesthetic-score conditioning (positive 6.0 / negative 2.5)."""

    def __init__(self, models: SDXLRefinerModels, dtype=jnp.bfloat16):
        self.m = models
        self.dtype = dtype
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            t,
        )
        self.unet_params = cast(models.unet_params)
        self.clip_params = cast(models.clip_params)
        self.vae_params = cast(models.vae_params)
        models.unet_params = self.unet_params
        models.clip_params = self.clip_params
        models.vae_params = self.vae_params
        self._jits = {}

    def _encode_text(self, prompt: str, negative_prompt: str):
        tok = self.m.tokenizer
        ids = np.stack(
            [
                np.asarray(tok.encode_padded(negative_prompt), np.int32),
                np.asarray(tok.encode_padded(prompt), np.int32),
            ]
        )
        if "clip" not in self._jits:
            self._jits["clip"] = jax.jit(
                lambda p, i: apply_clip_text(
                    p, self.m.clip_cfg, i, return_penultimate=True
                )
            )
        out = self._jits["clip"](self.clip_params, jnp.asarray(ids))
        hidden = out["penultimate_hidden_state"]
        pooled = out.get("text_embeds", out["pooler_output"])
        return hidden.astype(self.dtype), pooled.astype(self.dtype)

    def __call__(
        self,
        prompt: str,
        image,                      # (H, W, 3) float [0, 1]
        negative_prompt: str = "",
        strength: float = 0.35,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        aesthetic_score: float = 6.0,
        negative_aesthetic_score: float = 2.5,
        seed: int = 0,
    ):
        image = np.asarray(image, np.float32)
        h, w = image.shape[:2]
        key = jax.random.PRNGKey(seed)

        # Encode to latents.
        img = jnp.asarray(image * 2.0 - 1.0, self.dtype)[None]
        mean, logvar = vae_encode(self.vae_params, self.m.vae_cfg, img)
        k1, k2 = jax.random.split(key)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            k1, mean.shape, mean.dtype
        )
        latents0 = (z * self.m.vae_cfg.scaling_factor).astype(jnp.float32)

        # Tail schedule.
        full_ts = schedule_mod.inference_timesteps(
            self.m.scheduler, num_inference_steps
        )
        start = max(num_inference_steps - int(num_inference_steps * strength), 0)
        tail_ts = full_ts[start:]
        coeffs = dpm.make_coeffs(self.m.scheduler, timesteps=tail_ts)
        abar = schedule_mod.make_alphas_cumprod(self.m.scheduler)
        t0 = int(tail_ts[0])
        noise = jax.random.normal(k2, latents0.shape, jnp.float32)
        latents = (
            float(np.sqrt(abar[t0])) * latents0 + float(np.sqrt(1 - abar[t0])) * noise
        ).astype(self.dtype)

        hidden, pooled = self._encode_text(prompt, negative_prompt)
        # time_ids: (orig_h, orig_w, crop_top, crop_left, aesthetic_score)
        time_ids = jnp.asarray(
            [
                [h, w, 0, 0, negative_aesthetic_score],
                [h, w, 0, 0, aesthetic_score],
            ],
            jnp.float32,
        )
        added = {"text_embeds": pooled, "time_ids": time_ids}

        n = len(tail_ts)
        if ("sample", n) not in self._jits:
            def fn(unet_params, latents, hidden, added, coeffs):
                def step(carry, c):
                    lat, state = carry
                    lat_in = jnp.concatenate([lat, lat], 0)
                    eps, _ = apply_unet2d(
                        unet_params, self.m.unet_cfg, lat_in, c.timestep,
                        hidden, added_cond=added,
                    )
                    eps_cfg = eps[:1] + guidance_scale * (eps[1:] - eps[:1])
                    state, lat = dpm.step(state, c, lat, eps_cfg)
                    return (lat, state), None

                state = dpm.init_state(latents.shape, latents.dtype)
                (lat, _), _ = jax.lax.scan(step, (latents, state), coeffs)
                return lat

            self._jits[("sample", n)] = jax.jit(fn)

        final = self._jits[("sample", n)](
            self.unet_params, latents, hidden, added, coeffs
        )
        out = vae_decode(
            self.vae_params, self.m.vae_cfg,
            final / self.m.vae_cfg.scaling_factor,
        )
        return np.asarray(
            jnp.clip(out.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
        )[0]
