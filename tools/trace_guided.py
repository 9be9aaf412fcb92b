"""Trace ONLY the warmed guided-update (or cfg-forward) loop execution.

Compile + warm outside ``jax.profiler.trace`` so the converted
trace.json.gz (capped at ~1M events) is not swamped by host-side
tracing/init events; then trace a single in-graph fori_loop call and
group device ops by repo source frame.

Usage: python tools/trace_guided.py [guided_update|cfg_forward|energy_forward] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    comp = sys.argv[1] if len(sys.argv) > 1 else "guided_update"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    trace_dir = f"/tmp/lvd_trace_{comp}"

    import jax
    import jax.numpy as jnp

    from lvd_tpu.config import PRESETS
    from lvd_tpu.diffusion.guidance import GuidanceConfig, compute_ca_energy
    from lvd_tpu.diffusion.sampler import pack_to_arrays
    from lvd_tpu.layout.rasterize import make_guidance_pack
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

    def energy(l, p, txt, g):
        _, aux = apply_unet3d(
            p, cfg, l, 500, txt,
            capture_keys=attn_keys, capture_only=True,
            remat=g_cfg.energy_remat != "none",
        )
        return compute_ca_energy(aux, g, attn_keys, g_cfg) * g_cfg.loss_scale

    def guided(l, p, txt, g):
        val, grad = jax.value_and_grad(energy)(l, p, txt, g)
        upd = 0.001 * grad.astype(jnp.float32) + 1e-12 * val
        return l - upd.astype(l.dtype)

    def energy_fwd(l, p, txt, g):
        e = energy(l, p, txt, g)
        return l - (0.0 * e).astype(l.dtype)

    def cfg_fwd(l, p, txt, g):
        lat_in = jnp.concatenate([l, l], axis=0)
        eps, _ = apply_unet3d(p, cfg, lat_in, 500, txt)
        eps_u, eps_c = eps[:b], eps[b:]
        e = eps_u + 9.0 * (eps_c - eps_u)
        return l - 0.001 * e.astype(l.dtype)

    body = {"guided_update": guided, "energy_forward": energy_fwd,
            "cfg_forward": cfg_fwd}[comp]

    def wrapped(carry, p, txt, g):
        out = jax.lax.fori_loop(0, iters, lambda i, c: body(c, p, txt, g),
                                carry)
        return out.astype(jnp.float32).sum()

    fn = jax.jit(wrapped)
    float(fn(lat, params, cond_text, guidance))  # compile + warm
    t0 = time.time()
    s = float(fn(lat, params, cond_text, guidance))
    dt = time.time() - t0
    print(json.dumps({"component": comp, "warm_total_ms": round(dt * 1e3, 1),
                      "iters": iters}), flush=True)
    assert s == s

    with jax.profiler.trace(trace_dir):
        float(fn(lat, params, cond_text, guidance))

    from tools.trace_component import summarize

    print(json.dumps({"note": f"totals cover {iters} loop iterations"}))
    summarize(trace_dir)


if __name__ == "__main__":
    main()
