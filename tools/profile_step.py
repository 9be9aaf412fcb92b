"""Per-component step timing on the real chip (flagship zeroscope shapes).

Methodology (CLAUDE.md "Environment gotchas"): over the axon tunnel
``block_until_ready`` does not wait for data, so every measurement is an
in-graph ``lax.fori_loop`` whose body depends on the carry, closed by a
forced scalar transfer; per-iteration time = (t - RTT) / n.

Prints one JSON line per component: CFG forward, guided update (energy
value_and_grad + latent update), VAE decode, CLIP encode.

Usage: python tools/profile_step.py [n_iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    def want(name: str) -> bool:
        return only is None or name in only

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lvd_tpu.config import PRESETS
    from lvd_tpu.diffusion import dpm_solver as dpm
    from lvd_tpu.diffusion.guidance import GuidanceConfig, compute_ca_energy
    from lvd_tpu.diffusion.sampler import GuidanceArrays, pack_to_arrays
    from lvd_tpu.layout.rasterize import make_guidance_pack
    from lvd_tpu.models import clip as clip_mod
    from lvd_tpu.models import vae as vae_mod
    from lvd_tpu.models.unet3d import apply_unet3d, init_unet3d
    from lvd_tpu.runners.base import OVERALL_GUIDANCE_ATTN_KEYS
    from lvd_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    preset = PRESETS["zeroscope"]
    cfg = preset.unet
    keys3 = jax.random.split(jax.random.PRNGKey(0), 3)
    bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
    params = bf16(init_unet3d(keys3[0], cfg))

    b, f = 1, 24
    hl, wl = preset.height // 8, preset.width // 8
    lat = jax.random.normal(keys3[1], (b, f, hl, wl, 4), jnp.bfloat16)
    text = jax.random.normal(keys3[2], (2 * b, 77, cfg.cross_attention_dim),
                             jnp.bfloat16)
    cond_text = text[b:]

    g_cfg = GuidanceConfig(
        loss_scale=2.5, loss_threshold=350.0, max_iter=1, max_index_step=10,
        fg_top_p=0.25, bg_top_p=0.25, fg_weight=1.0, bg_weight=2.0,
    )
    attn_keys = tuple(tuple(k) for k in OVERALL_GUIDANCE_ATTN_KEYS)
    boxes = [[[0.05 + 0.8 * i / (f - 1), 0.45, 0.30 + 0.8 * i / (f - 1), 0.80]
              for i in range(f)]]
    pack = make_guidance_pack(boxes, [[2]], attn_keys, (hl, wl),
                              g_cfg.fg_top_p, g_cfg.bg_top_p)
    guidance = pack_to_arrays(pack)

    rtt = _measure_rtt()

    def timed_loop(name, body, init_carry, iters=n, operands=()):
        """body(carry, *operands) -> carry (same pytree). ``operands`` are
        passed as explicit jit arguments so big pytrees (model params) don't
        get baked into the lowering as constants."""
        def wrapped(carry, *ops):
            out = jax.lax.fori_loop(
                0, iters, lambda i, c: body(c, *ops), carry)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.astype(jnp.float32).sum(), out, jnp.float32(0)
            )
        copts = {
            kv.split("=", 1)[0]: kv.split("=", 1)[1]
            for kv in os.environ.get("LVD_COMPILER_OPTIONS", "").split(",")
            if "=" in kv
        } or None
        fn = jax.jit(wrapped, compiler_options=copts)
        float(fn(init_carry, *operands))  # compile + warm
        t0 = time.time()
        s = float(fn(init_carry, *operands))
        dt = (time.time() - t0 - rtt) / iters
        assert s == s, f"{name}: NaN"
        print(json.dumps({"component": name, "ms": round(dt * 1e3, 2),
                          "iters": iters}), flush=True)
        return dt

    # -- CFG forward -------------------------------------------------------
    def cfg_fwd(l, p, txt):
        lat_in = jnp.concatenate([l, l], axis=0)
        eps, _ = apply_unet3d(p, cfg, lat_in, 500, txt)
        eps_u, eps_c = eps[:b], eps[b:]
        e = eps_u + 9.0 * (eps_c - eps_u)
        return l - 0.001 * e.astype(l.dtype)

    if want("cfg_forward"):
        timed_loop("cfg_forward", cfg_fwd, lat, operands=(params, text))

    # -- energy forward only -------------------------------------------------
    def energy(l, p, txt, g):
        _, aux = apply_unet3d(
            p, cfg, l, 500, txt,
            capture_keys=attn_keys, capture_only=True,
            remat=g_cfg.energy_remat != "none",
        )
        return compute_ca_energy(aux, g, attn_keys, g_cfg) * g_cfg.loss_scale

    def energy_fwd_body(l, p, txt, g):
        e = energy(l, p, txt, g)
        return l - (0.0 * e).astype(l.dtype)

    if want("energy_forward"):
        timed_loop("energy_forward", energy_fwd_body, lat,
                   operands=(params, cond_text, guidance))

    # -- guided update (energy value_and_grad + latent step) ----------------
    def guided(l, p, txt, g):
        val, grad = jax.value_and_grad(energy)(l, p, txt, g)
        upd = 0.001 * grad.astype(jnp.float32) + 1e-12 * val
        return l - upd.astype(l.dtype)

    if want("guided_update"):
        timed_loop("guided_update", guided, lat,
                   operands=(params, cond_text, guidance))

    # -- VAE decode ----------------------------------------------------------
    vae_params = bf16(vae_mod.init_vae(jax.random.PRNGKey(3), preset.vae))

    def vae_body(z, vp):
        img = vae_mod.decode(vp, preset.vae, z.reshape(b * f, hl, wl, 4))
        # fold a reduction of the image back into the carry so the loop
        # can't be hoisted
        s = img.astype(jnp.float32).mean() * 1e-6
        return (z + s.astype(z.dtype) * 0 + s.astype(z.dtype)).reshape(z.shape)

    if want("vae_decode"):
        timed_loop("vae_decode_24f", vae_body, lat, iters=max(2, n // 3),
                   operands=(vae_params,))

    # -- CLIP encode ---------------------------------------------------------
    clip_params = bf16(clip_mod.init_clip_text(jax.random.PRNGKey(4), preset.clip))
    ids = jnp.zeros((2, 77), jnp.int32)

    def clip_body(c, cp):
        out = clip_mod.apply_clip_text(cp, preset.clip, ids)
        return c + out["last_hidden_state"].astype(jnp.float32).mean() * 0 + 1

    if want("clip_encode"):
        timed_loop("clip_encode", clip_body, jnp.float32(0), iters=max(2, n),
                   operands=(clip_params,))

    print(json.dumps({"rtt_ms": round(rtt * 1e3, 1),
                      "backend": jax.default_backend()}))


def _measure_rtt():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    float(f(jnp.float32(0)))
    t0 = time.time()
    for i in range(5):
        float(f(jnp.float32(i)))
    return (time.time() - t0) / 5


if __name__ == "__main__":
    main()
