"""Pixel-tile (G) sweep for the fused temporal-pair kernels (real chip).

The pair kernel packs G pixels per program into a block-diagonal
(G*F, G*F) frame attention: larger G gives bigger MXU operands but wastes
G-fold FLOPs on the masked off-diagonal blocks (the (R, R) dots are dense).
This times the forward and the dy-backward at the CFG and energy-walk
shapes across G, plus the recompute-VJP baseline for the backward.

Usage: python tools/sweep_pair_g.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from lvd_tpu.ops import temporal_attention as ta
    from lvd_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    def rtt():
        f = jax.jit(lambda x: x + 1)
        float(f(jnp.float32(0)))
        t0 = time.time()
        for i in range(5):
            float(f(jnp.float32(i)))
        return (time.time() - t0) / 5

    r0 = rtt()
    n = 30

    def timed(tag, fn, *args):
        def loop(y, *rest):
            def body(i, c):
                out = fn(c, *rest)
                return (c + 1e-6 * out).astype(c.dtype)

            out = jax.lax.fori_loop(0, n, body, y)
            return out.astype(jnp.float32).sum()

        j = jax.jit(loop)
        try:
            float(j(*args))
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": str(e)[:120]}), flush=True)
            return
        t0 = time.time()
        s = float(j(*args))
        ms = (time.time() - t0 - r0) / n * 1e3
        assert s == s
        print(json.dumps({"cfg": tag, "ms": round(ms, 3)}), flush=True)

    def params(c, key):
        ks = jax.random.split(key, 16)
        it = iter(ks)

        def lin(bias=True):
            d = {"w": jax.random.normal(next(it), (c, c), jnp.bfloat16) * 0.1}
            if bias:
                d["b"] = jnp.zeros((c,), jnp.bfloat16)
            return d

        attn = lambda: {"to_q": lin(False), "to_k": lin(False),
                        "to_v": lin(False), "to_out": lin()}
        norm = lambda: {"scale": jnp.ones((c,), jnp.bfloat16),
                        "bias": jnp.zeros((c,), jnp.bfloat16)}
        return {"norm1": norm(), "attn1": attn(),
                "norm2": norm(), "attn2": attn()}

    # (name, B, P, F, C, heads): CFG-forward and cond-only energy shapes.
    shapes = [
        ("L0cfg", 2, 2880, 24, 320, 5),
        ("L1cfg", 2, 720, 24, 640, 10),
        ("L0nrg", 1, 2880, 24, 320, 5),
    ]
    for name, b, pdim, f, c, nh in shapes:
        p = params(c, jax.random.PRNGKey(1))
        y = jax.random.normal(jax.random.PRNGKey(2), (b, pdim, f, c),
                              jnp.bfloat16)
        ct = jax.random.normal(jax.random.PRNGKey(3), (b, pdim, f, c),
                               jnp.bfloat16)
        for g in (4, 6, 8, 10, 12, 16):
            if pdim % g:
                continue
            timed(f"{name} fwd g={g}",
                  lambda y_, p_, g_=g: ta._pallas_pair(p_, y_, nh, g_, 1e-5),
                  y, p)
            timed(f"{name} bwd g={g}",
                  lambda y_, p_, ct_, g_=g: ta._pallas_pair_bwd(
                      p_, y_, ct_, nh, g_, 1e-5),
                  y, p, ct)
        # recompute-VJP baseline for the backward
        def vjp_ref(y_, p_, ct_):
            _, vjp = jax.vjp(lambda yy: ta._pair_ref(p_, yy, nh, 1e-5), y_)
            return vjp(ct_)[0]

        timed(f"{name} bwd recompute-vjp", vjp_ref, y, p, ct)
        timed(f"{name} fwd xla",
              lambda y_, p_: ta._pair_ref(p_, y_, nh, 1e-5), y, p)


if __name__ == "__main__":
    main()
