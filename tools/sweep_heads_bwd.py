"""Head-packed flash backward sweep (real chip).

Times `_pallas_attention_bwd_heads` (no HBM relayout; per-head VMEM slicing)
against the relayout path (`to_bh` transposes + `_pallas_attention_bwd`) at
the guided-energy-walk attention shapes, over candidate q-tile sizes.
The packed kernel's gradient is checked against the relayout path first.

Usage: python tools/sweep_heads_bwd.py
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

    from lvd_tpu.ops import pallas_attention as pa
    from lvd_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    def rtt():
        fj = jax.jit(lambda x: x + 1)
        float(fj(jnp.float32(0)))
        t0 = time.time()
        for i in range(5):
            float(fj(jnp.float32(i)))
        return (time.time() - t0) / 5

    r0 = rtt()
    n = 30

    # (label, B, S, C, H): cond-only energy-walk spatial attention shapes.
    shapes = [
        ("L0", 24, 2880, 320, 5),
        ("L1", 24, 720, 640, 10),
        ("L2", 24, 180, 1280, 20),
    ]

    for label, b, s, c, h in shapes:
        keys = jax.random.split(jax.random.PRNGKey(0), 5)
        mk = lambda k: jax.random.normal(k, (b, s, c), jnp.bfloat16)
        q, k_, v, o, do = (mk(kk) for kk in keys)
        scale = (c // h) ** -0.5
        d = c // h

        def relayout(qq, kk, vv, oo, gg):
            def to_bh(t):
                ss = t.shape[1]
                return (t.reshape(b, ss, h, d).transpose(0, 2, 1, 3)
                        .reshape(b * h, ss, d))

            def from_bh(t, ss):
                return (t.reshape(b, h, ss, d).transpose(0, 2, 1, 3)
                        .reshape(b, ss, c))

            dq, dk, dv = pa._pallas_attention_bwd(
                to_bh(qq), to_bh(kk), to_bh(vv), to_bh(oo), to_bh(gg), scale)
            return from_bh(dq, s), from_bh(dk, s), from_bh(dv, s)

        variants = {"relayout": relayout}
        for bq in (128, 192, 256, 384):
            if bq > s:
                continue
            variants[f"packed bq={bq}"] = (
                lambda qq, kk, vv, oo, gg, bq=bq: pa._pallas_attention_bwd_heads(
                    qq, kk, vv, oo, gg, scale, num_heads=h, block_q=bq))

        ref = None
        for name, fn in variants.items():
            def loop(qq, kk, vv, oo, gg):
                def bodyf(i, cr):
                    dq, dk, dv = fn(cr, kk, vv, oo, gg)
                    return (cr + 1e-6 * dq).astype(cr.dtype)
                out = jax.lax.fori_loop(0, n, bodyf, qq)
                return out.astype(jnp.float32).sum()

            j = jax.jit(loop)
            try:
                outs = jax.jit(fn)(q, k_, v, o, do)
                float(j(q, k_, v, o, do))
            except Exception as e:
                print(json.dumps({"shape": label, "variant": name,
                                  "error": str(e)[:160]}), flush=True)
                continue
            t0 = time.time()
            val = float(j(q, k_, v, o, do))
            ms = (time.time() - t0 - r0) / n * 1e3
            assert val == val
            diff = None
            if ref is None:
                ref = outs
            else:
                diff = float(max(
                    jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - r.astype(jnp.float32)))
                    for a, r in zip(outs, ref)))
            print(json.dumps({"shape": label, "variant": name,
                              "bwd_ms": round(ms, 3),
                              "max_abs_diff": diff}), flush=True)


if __name__ == "__main__":
    main()
