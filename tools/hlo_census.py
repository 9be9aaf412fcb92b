"""Copy/transpose census of the compiled CFG forward (real chip).

The round-3 device trace attributed ~16 ms/step to layout copies but the
axon-tunnel profiler has stopped capturing device ops (PERF.md round 4).
This recovers the attribution statically: compile the flagship CFG UNet
forward, pull the optimized HLO, and rank every copy/transpose (standalone
op or fusion root) by bytes moved.

Usage: python tools/hlo_census.py [energy]
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SHAPE = re.compile(r"(bf16|f32|f16|s32|u8|pred|s8)\[([0-9,]*)\]")

_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u8": 1, "pred": 1, "s8": 1}


def shape_bytes(m):
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(",") if dims else []:
        n *= int(d)
    return n * _BYTES[dt]


def main():
    import jax
    import jax.numpy as jnp

    from lvd_tpu.config import PRESETS
    from lvd_tpu.models import unet3d as unet_mod
    from lvd_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    preset = PRESETS["zeroscope"]
    cfg = preset.unet
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        unet_mod.init_unet3d(jax.random.PRNGKey(0), cfg),
    )
    frames = 24
    hl, wl = preset.height // 8, preset.width // 8
    energy = len(sys.argv) > 1 and sys.argv[1] == "energy"
    b = 1 if energy else 2
    lat = jnp.zeros((b, frames, hl, wl, 4), jnp.bfloat16)
    txt = jnp.zeros((b, cfg.max_text_len, cfg.cross_attention_dim), jnp.bfloat16)

    def fwd(p, lat, txt):
        eps, _ = unet_mod.apply_unet3d(p, cfg, lat, 500, txt)
        return eps

    compiled = jax.jit(fwd).lower(params, lat, txt).compile()
    texts = [m.to_string() for m in compiled.runtime_executable().hlo_modules()] \
        if hasattr(compiled, "runtime_executable") else [compiled.as_text()]
    text = "\n".join(texts)
    print(f"optimized HLO: {len(text) / 1e6:.1f} MB", file=sys.stderr)

    by_kind = collections.Counter()
    by_site = collections.Counter()
    site_n = collections.Counter()
    rows = []
    src = re.compile(r'source_file="([^"]+)".*?source_line=(\d+)')
    for line in text.splitlines():
        s = line.strip()
        # fusion roots and standalone ops that are pure data movement
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (\S+) (copy|transpose|bitcast-convert)\(", s)
        kind = None
        if m:
            kind = m.group(2)
        elif re.search(r"= \S+ fusion\(", s) and "kLoop" in s and (
                "copy" in s or "transpose" in s):
            kind = "fusion?"
        if kind:
            sm = _SHAPE.search(s)
            if sm:
                byt = shape_bytes(sm)
                by_kind[kind] += byt
                lm = src.search(s)
                site = (lm.group(1).split("/")[-1] + ":" + lm.group(2)) if lm else "?"
                by_site[site] += byt
                site_n[site] += 1
                if byt >= 4 * 1024 * 1024:
                    rows.append((byt, kind, site, s[:120]))
    rows.sort(reverse=True)
    for byt, kind, site, s in rows[:20]:
        print(f"{byt/1e6:8.1f} MB  {kind:10s} {site:24s} {s}")
    print("\nby source site:")
    for site, byt in by_site.most_common(25):
        print(f"{byt/1e6:9.1f} MB  x{site_n[site]:<3d} {site}")
    total = sum(by_kind.values())
    print(f"\ntotals: {dict(by_kind)}  sum={total/1e6:.1f} MB "
          f"(~{total/700e9*1e3:.2f} ms at 700 GB/s, x2 for r+w)")


if __name__ == "__main__":
    main()
