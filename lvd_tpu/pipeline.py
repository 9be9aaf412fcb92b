"""TextToVideoPipeline: text encoder + 3D UNet + DPM-Solver++ + VAE, with
optional GLIGEN grounding and cross-attention guidance.

Parity target: /root/reference/models/controllable_pipeline_text_to_video_synth.py
(`TextToVideoSDPipeline`). Host-side work (tokenization, GLIGEN input
packing, box rasterization) happens here; everything device-side is one
jitted call per (shape, flags) signature, cached.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelPreset
from .diffusion import dpm_solver as dpm
from .diffusion import sampler as sampler_mod
from .diffusion.guidance import GuidanceConfig
from .layout.rasterize import make_guidance_pack
from .models.clip import apply_clip_text
from .models.vae import decode as vae_decode
from .utils.profiling import PhaseTimer, maybe_trace

MAX_GLIGEN_OBJS = 30  # reference controllable_pipeline:738


@dataclasses.dataclass
class PipelineModels:
    preset: ModelPreset
    unet_params: dict
    clip_params: dict
    vae_params: dict
    tokenizer: object


class TextToVideoPipeline:
    def __init__(self, models: PipelineModels, dtype=jnp.float32, mesh=None):
        """``mesh``: optional jax Mesh with a "data" axis — sampling then
        runs frame-sharded (sequence-parallel) across it via shard_map.
        This covers ALL paths: unguided, GLIGEN-grounded, and
        backward-guided (incl. the frame-coupled CoM/attn-sync energy
        terms, which ppermute their boundary frames) — equivalence vs the
        single-device result is tested in tests/test_parallel.py."""
        self.m = models
        self.preset = models.preset
        self.dtype = dtype
        self.mesh = mesh
        self._cast = lambda tree: jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )
        self.unet_params = self._cast(models.unet_params)
        self.clip_params = self._cast(models.clip_params)
        self.vae_params = self._cast(models.vae_params)
        # Drop the pre-cast references so the originals free device HBM
        # (a bf16 run must not keep a shadow fp32 copy of 1.4B params).
        models.unet_params = self.unet_params
        models.clip_params = self.clip_params
        models.vae_params = self.vae_params
        self._encode_jit = jax.jit(
            lambda p, ids: apply_clip_text(p, self.preset.clip, ids)
        )
        self._sample_jit_cache = {}
        self.timer = PhaseTimer()

    # -- text ------------------------------------------------------------
    def encode_prompt(self, prompt: str, negative_prompt: str = ""):
        """Returns the CFG pair (2, L, D): [uncond; cond] final hidden states."""
        tok = self.m.tokenizer
        ids = np.stack(
            [
                np.asarray(tok.encode_padded(negative_prompt), np.int32),
                np.asarray(tok.encode_padded(prompt), np.int32),
            ]
        )
        out = self._encode_jit(self.clip_params, jnp.asarray(ids))
        return out["last_hidden_state"]

    def encode_phrases_pooled(self, phrases: Sequence[str]):
        """Pooled CLIP embeddings of grounding phrases (GLIGEN PositionNet
        input; reference controllable_pipeline:756-763)."""
        tok = self.m.tokenizer
        ids = np.stack(
            [np.asarray(tok.encode_padded(p), np.int32) for p in phrases]
        )
        out = self._encode_jit(self.clip_params, jnp.asarray(ids))
        return out["pooler_output"]

    # -- GLIGEN input packing ---------------------------------------------
    def prepare_gligen_inputs(self, gligen_boxes, gligen_phrases, num_frames: int):
        """Per-frame boxes/phrases -> flattened (2*F, M, ...) arrays with the
        uncond half masked out (reference controllable_pipeline:736-814)."""
        d = self.preset.unet.gligen_positive_len
        boxes = np.zeros((num_frames, MAX_GLIGEN_OBJS, 4), np.float32)
        masks = np.zeros((num_frames, MAX_GLIGEN_OBJS), np.float32)
        embs = np.zeros((num_frames, MAX_GLIGEN_OBJS, d), np.float32)

        phrase_cache: dict = {}
        for f, (phrases_f, boxes_f) in enumerate(zip(gligen_phrases, gligen_boxes)):
            phrases_f = list(phrases_f)[:MAX_GLIGEN_OBJS]
            boxes_f = list(boxes_f)[:MAX_GLIGEN_OBJS]
            new = [p for p in phrases_f if p not in phrase_cache]
            if new:
                pooled = np.asarray(self.encode_phrases_pooled(new), np.float32)
                for p, e in zip(new, pooled):
                    phrase_cache[p] = e
            n = len(boxes_f)
            if n:
                boxes[f, :n] = np.asarray(boxes_f, np.float32)
                masks[f, :n] = 1.0
                embs[f, :n] = np.stack([phrase_cache[p] for p in phrases_f])

        # CFG pair: [uncond(F); cond(F)], uncond masks zeroed.
        pair = {
            "boxes": jnp.asarray(np.concatenate([boxes, boxes], 0), self.dtype),
            "masks": jnp.asarray(
                np.concatenate([np.zeros_like(masks), masks], 0), self.dtype
            ),
            "positive_embeddings": jnp.asarray(
                np.concatenate([embs, embs], 0), self.dtype
            ),
        }
        return pair

    # -- core sampling ------------------------------------------------------
    def _sample_fn(self, flags):
        if flags not in self._sample_jit_cache:
            (guided, keys, g_cfg, gligen_on, n_ground, scale, n_steps) = flags
            # All guidance variants shard: per-frame energy terms psum, and
            # the frame-coupled ones (attn-sync, CoM velocity) exchange their
            # boundary frame via ppermute (diffusion/guidance.py).
            use_mesh = self.mesh is not None

            def fn(unet_params, latents, text_pair, coeffs, guidance, gligen_pair):
                return sampler_mod.sample_video(
                    unet_params,
                    self.preset.unet,
                    latents,
                    text_pair,
                    coeffs,
                    guidance_scale=scale,
                    guidance=guidance if guided else None,
                    guidance_cfg=g_cfg,
                    guidance_attn_keys=keys,
                    gligen_pair=gligen_pair if gligen_on else None,
                    num_grounding_steps=n_ground,
                    spmd_axis="data" if use_mesh else None,
                )

            if use_mesh:
                self._sample_jit_cache[flags] = self._make_sharded_sample(fn, flags)
            else:
                self._sample_jit_cache[flags] = jax.jit(fn)
        return self._sample_jit_cache[flags]

    def _make_sharded_sample(self, fn, flags):
        """shard_map wrapper: frames sharded on the mesh "data" axis; the
        guidance pack's frame-indexed arrays and GLIGEN inputs shard along."""
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        (guided, keys, *_), gligen_on = flags[:3], flags[3]
        mesh = self.mesh
        frame_spec = P(None, "data")

        def inner(up, latents, text_pair, coeffs, guidance, gligen_5d):
            gligen_pair = None
            if gligen_5d is not None:
                # (2B, F_local, ...) -> (2B*F_local, ...)
                gligen_pair = {
                    k: v.reshape((-1,) + v.shape[2:]) for k, v in gligen_5d.items()
                }
            return fn(up, latents, text_pair, coeffs, guidance, gligen_pair)

        g_spec = None
        if guided:
            attn_keys = tuple(tuple(k) for k in keys)
            g_spec = sampler_mod.GuidanceArrays(
                masks={k: P(None, "data") for k in attn_keys},
                token_indices=P(),
                token_mask=P(),
                k_fg={k: P(None, "data") for k in attn_keys},
                k_bg={k: P(None, "data") for k in attn_keys},
            )
        gl_spec = None
        if gligen_on:
            gl_spec = {
                "boxes": P(None, "data"),
                "masks": P(None, "data"),
                "positive_embeddings": P(None, "data"),
            }

        sharded = jax.jit(
            shard_map(
                inner,
                mesh=mesh,
                in_specs=(P(), frame_spec, P(), P(), g_spec, gl_spec),
                out_specs=frame_spec,
                # check_vma must stay ON: disabling it changes shard_map's
                # transpose semantics for the psum'd guidance energy and
                # silently broke the guided mesh path (round-4 regression).
                # The Pallas kernels are made vma-legal on TPU by declaring
                # the mesh axis on their pallas_call outputs instead
                # (ops/vma.py).
            )
        )

        def wrapped(up, latents, text_pair, coeffs, guidance, gligen_pair):
            gligen_5d = None
            if gligen_pair is not None:
                f = latents.shape[1]
                gligen_5d = {
                    k: v.reshape((-1, f) + v.shape[1:]) for k, v in gligen_pair.items()
                }
            latents = jax.device_put(latents, NamedSharding(mesh, frame_spec))
            return sharded(up, latents, text_pair, coeffs, guidance, gligen_5d)

        return wrapped

    @functools.cached_property
    def _encode_image_jit(self):
        def fn(vae_params, images, key):
            from .models.vae import encode as vae_encode

            mean, logvar = vae_encode(vae_params, self.preset.vae, images)
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
            return z * self.preset.vae.scaling_factor

        return jax.jit(fn)

    def encode_video(self, video, seed: int = 0, chunk: int = 8):
        """(F, H, W, 3) float [0,1] -> (1, F, h, w, C) latents."""
        video = np.asarray(video, np.float32) * 2.0 - 1.0
        f = video.shape[0]
        outs = []
        key = jax.random.PRNGKey(seed)
        for i in range(0, f, chunk):
            key, sub = jax.random.split(key)
            outs.append(
                np.asarray(
                    self._encode_image_jit(
                        self.vae_params, jnp.asarray(video[i : i + chunk], self.dtype), sub
                    )
                )
            )
        latents = np.concatenate(outs, axis=0)
        return jnp.asarray(latents[None], self.dtype)

    def video_to_video(
        self,
        prompt: str,
        video,  # (F, H, W, 3) float [0, 1]
        strength: float = 0.6,
        negative_prompt: str = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 9.0,
        seed: int = 0,
        output_type: str = "np",
    ):
        """SDEdit-style vid2vid (the Zeroscope-XL refinement pass,
        reference scripts/upsample.py:14-64): encode, renoise to
        ``strength`` of the schedule, denoise the tail."""
        import numpy as _np

        from .diffusion import schedule as schedule_mod

        latents0 = self.encode_video(video, seed=seed)
        full_ts = schedule_mod.inference_timesteps(
            self.preset.scheduler, num_inference_steps
        )
        start = max(num_inference_steps - int(num_inference_steps * strength), 0)
        tail_ts = full_ts[start:]
        coeffs = dpm.make_coeffs(self.preset.scheduler, timesteps=tail_ts)

        abar = schedule_mod.make_alphas_cumprod(self.preset.scheduler)
        t0 = int(tail_ts[0])
        key = jax.random.PRNGKey(seed + 99991)
        noise = jax.random.normal(key, latents0.shape, jnp.float32)
        latents = (
            _np.sqrt(abar[t0]).astype(_np.float32) * latents0.astype(jnp.float32)
            + _np.sqrt(1 - abar[t0]).astype(_np.float32) * noise
        ).astype(self.dtype)

        text_pair = self.encode_prompt(prompt, negative_prompt).astype(self.dtype)
        flags = (False, (), None, False, 0, float(guidance_scale), len(tail_ts))
        sample = self._sample_fn(flags)
        final = sample(self.unet_params, latents, text_pair, coeffs, None, None)
        if output_type == "latent":
            return final
        return self.decode_latents(final)

    @functools.cached_property
    def _decode_jit(self):
        def fn(vae_params, latents):
            imgs = vae_decode(
                vae_params,
                self.preset.vae,
                latents / self.preset.vae.scaling_factor,
            )
            imgs = jnp.clip(imgs.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
            # uint8 on-device: 4x less host<->device transfer than fp32.
            return jnp.round(imgs * 255.0).astype(jnp.uint8)

        return jax.jit(fn)

    def decode_latents(self, latents, chunk: int = 24):
        """(B, F, h, w, C) latents -> (B, F, H, W, 3) float [0, 1]; frames
        decoded in chunks (the VAE-slicing equivalent,
        reference controllable_pipeline:374-400)."""
        b, f, h, w, c = latents.shape
        flat = latents.reshape(b * f, h, w, c)
        outs = []
        for i in range(0, b * f, chunk):
            outs.append(np.asarray(self._decode_jit(self.vae_params, flat[i : i + chunk])))
        imgs = np.concatenate(outs, axis=0).astype(np.float32) / 255.0
        return imgs.reshape(b, f, *imgs.shape[1:])

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_frames: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 9.0,
        seed: int = 0,
        latents=None,
        # cross-attention guidance
        backward_guidance: Optional[dict] = None,  # {boxes, object_positions, config, attn_keys}
        # GLIGEN
        gligen_boxes=None,
        gligen_phrases=None,
        gligen_scheduled_sampling_beta: float = 0.3,
        output_type: str = "np",
    ):
        preset = self.preset
        height = height or preset.height
        width = width or preset.width
        if height % 8 or width % 8:
            raise ValueError(f"height/width must be multiples of 8: {height}x{width}")
        h_lat, w_lat = height // preset.vae.scale_factor, width // preset.vae.scale_factor

        with self.timer.phase("encode_prompt"):
            text_pair = self.encode_prompt(prompt, negative_prompt).astype(self.dtype)

        key = jax.random.PRNGKey(seed)
        if latents is None:
            latents = (
                jax.random.normal(key, (1, num_frames, h_lat, w_lat, 4), jnp.float32)
                * dpm.INIT_NOISE_SIGMA
            ).astype(self.dtype)

        coeffs = dpm.make_coeffs(preset.scheduler, num_inference_steps)

        guided = backward_guidance is not None
        guidance_arrays = None
        g_cfg = None
        keys = ()
        if guided:
            g_cfg = backward_guidance.get("config") or GuidanceConfig()
            keys = tuple(tuple(k) for k in backward_guidance["attn_keys"])
            pack = backward_guidance.get("pack")
            if pack is None:
                pack = make_guidance_pack(
                    backward_guidance["boxes"],
                    backward_guidance["object_positions"],
                    keys,
                    (h_lat, w_lat),
                    fg_top_p=g_cfg.fg_top_p,
                    bg_top_p=g_cfg.bg_top_p,
                    upsample_scale=g_cfg.upsample_scale,
                )
            guidance_arrays = sampler_mod.pack_to_arrays(pack)

        gligen_on = bool(gligen_boxes)
        gligen_pair = None
        n_ground = 0
        if gligen_on:
            gligen_pair = self.prepare_gligen_inputs(
                gligen_boxes, gligen_phrases, num_frames
            )
            n_ground = int(gligen_scheduled_sampling_beta * num_inference_steps)

        flags = (
            guided,
            keys,
            g_cfg,
            gligen_on,
            n_ground,
            float(guidance_scale),
            num_inference_steps,
        )
        sample = self._sample_fn(flags)
        with self.timer.phase("sample"), maybe_trace("sample"):
            final = sample(
                self.unet_params, latents, text_pair, coeffs, guidance_arrays,
                gligen_pair,
            )
            if output_type != "uint8_device":
                # uint8_device is the async-pipelining path: the caller
                # overlaps video i's device->host transfer with video i+1's
                # host work + sampling, so nothing may block here.
                final.block_until_ready()

        if output_type == "latent":
            return final
        if output_type == "uint8_device":
            # Async pipelining hook: return the decoded uint8 frames as a
            # DEVICE array without forcing the host transfer, so a caller
            # generating several videos can overlap video i's device->host
            # transfer with video i+1's sampling (the transfer rides the
            # tunnel/PCIe while the chip computes). Convert with
            # np.asarray(...) when needed; /255 gives the float video.
            b, f, h_l, w_l, c = final.shape
            return self._decode_jit(
                self.vae_params, final.reshape(b * f, h_l, w_l, c)
            )
        with self.timer.phase("decode"):
            video = self.decode_latents(final)
        return video  # (B, F, H, W, 3) float32 in [0, 1]
