"""Standalone GEGLU kernel sweep on the real chip (block_m/block_k tuning).

Times `_fused_rows` at each UNet level's FF shape for several block
configurations, plus the XLA unfused formulation, using the in-graph
fori_loop methodology. One JSON line per (shape, config).

Usage: python tools/sweep_geglu.py
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

    from lvd_tpu.ops import geglu_fused as gf
    from lvd_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    # (name, rows, C): zeroscope CFG-forward FF shapes. Rows = B*S for
    # spatial FF and B*P*F for temporal FF — identical per level.
    shapes = [
        ("L0", 138240, 320),
        ("L1", 34560, 640),
        ("L2", 8640, 1280),
    ]

    def rtt():
        f = jax.jit(lambda x: x + 1)
        float(f(jnp.float32(0)))
        t0 = time.time()
        for i in range(5):
            float(f(jnp.float32(i)))
        return (time.time() - t0) / 5

    r0 = rtt()
    n = 30

    def timed(tag, fn, x, w1, b1, w2, b2):
        def loop(x, w1, b1, w2, b2):
            def body(i, c):
                y = fn(c, w1, b1, w2, b2)
                return (c + 1e-6 * y).astype(c.dtype)

            out = jax.lax.fori_loop(0, n, body, x)
            return out.astype(jnp.float32).sum()

        j = jax.jit(loop)
        try:
            float(j(x, w1, b1, w2, b2))
        except Exception as e:  # VMEM OOM etc.
            print(json.dumps({"cfg": tag, "error": str(e)[:120]}), flush=True)
            return
        t0 = time.time()
        s = float(j(x, w1, b1, w2, b2))
        ms = (time.time() - t0 - r0) / n * 1e3
        assert s == s
        print(json.dumps({"cfg": tag, "ms": round(ms, 3)}), flush=True)

    for name, rows, c in shapes:
        inner = 4 * c
        k = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jax.random.normal(k[0], (rows, c), jnp.bfloat16)
        w1 = jax.random.normal(k[1], (c, 2 * inner), jnp.bfloat16) * c ** -0.5
        b1 = jnp.zeros((2 * inner,), jnp.bfloat16)
        w2 = jax.random.normal(k[2], (inner, c), jnp.bfloat16) * inner ** -0.5
        b2 = jnp.zeros((c,), jnp.bfloat16)
        gb = 24 * rows * c * c / 1e9  # GFLOP at this shape (x2 for ms->TF/s)

        timed(f"{name} default", lambda *a: gf._fused_rows(*a), x, w1, b1, w2, b2)
        timed(f"{name} xla", gf._unfused, x, w1, b1, w2, b2)
        if c < 1280:
            for bm, nk in ((256, 1), (256, 2), (512, 1), (512, 2), (512, 4),
                           (768, 2), (1024, 1), (1024, 2), (1024, 4),
                           (1536, 2), (2048, 2), (2048, 4)):
                timed(
                    f"{name} res bm={bm} nk={nk}",
                    lambda x_, w1_, b1_, w2_, b2_, bm=bm, nk=nk:
                    gf._fused_rows_resident(
                        x_, w1_, b1_, w2_, b2_, block_m=bm, nk=nk),
                    x, w1, b1, w2, b2,
                )
        if c >= 1280:
            for bm, bk in ((256, 512), (512, 256), (384, 256), (512, 512),
                           (768, 256), (256, 256)):
                timed(
                    f"{name} bm={bm} bk={bk}",
                    lambda x_, w1_, b1_, w2_, b2_, bm=bm, bk=bk: gf._fused_rows(
                        x_, w1_, b1_, w2_, b2_, block_m=bm, block_k=bk),
                    x, w1, b1, w2, b2,
                )
        print(json.dumps({"shape": name, "gflop": round(gb, 1)}), flush=True)


if __name__ == "__main__":
    main()
