"""Temp-conv kernel variant sweep on the real chip.

Times `temp_conv_fused._fused` variants at each UNet level's shape:
  taps      three K=C frame-shifted dots (round-2 kernel; nb pipelines)
  cat3      one K=3C dot on the lane-concatenated shifted rows
  rowshift  single silu pass + scratch-accumulated shifted dots
against the XLA unfused formulation. One JSON line per (shape, variant).

Usage: python tools/sweep_temp_conv.py
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

    from lvd_tpu.ops import temp_conv_fused as tc
    from lvd_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    # (name, B, F, P, C): zeroscope CFG-forward temp-conv shapes.
    shapes = [
        ("L0", 2, 24, 2880, 320),
        ("L1", 2, 24, 720, 640),
        ("L2", 2, 24, 180, 1280),
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

    def timed(tag, fn, *args):
        def loop(x, *rest):
            def body(i, c):
                y = fn(c, *rest)
                return (c + 1e-6 * y).astype(c.dtype)

            out = jax.lax.fori_loop(0, n, body, x)
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

    for name, bsz, f, p, c in shapes:
        k = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jax.random.normal(k[0], (bsz, f, p, c), jnp.bfloat16)
        a = jax.random.normal(k[1], (bsz, c), jnp.float32) * 0.2 + 1.0
        b = jax.random.normal(k[2], (bsz, c), jnp.float32) * 0.1
        w = jax.random.normal(k[3], (3, c, c), jnp.bfloat16) * 0.05
        bias = jnp.zeros((c,), jnp.bfloat16)

        timed(f"{name} default", lambda x_, *r: tc._fused(x_, *r),
              x, a, b, w, bias)
        timed(f"{name} xla", tc._unfused, x, a, b, w, bias)
        for variant, nb in (("taps", 1), ("taps", 2), ("taps", 4),
                            ("cat3", 1), ("cat3", 2), ("cat3", 4),
                            ("rowshift", None)):
            timed(
                f"{name} {variant} nb={nb}",
                lambda x_, a_, b_, w_, bias_, v=variant, nb_=nb: tc._fused(
                    x_, a_, b_, w_, bias_, variant=v, nb=nb_),
                x, a, b, w, bias,
            )
        gflop = 2 * bsz * f * p * 3 * c * c / 1e9
        print(json.dumps({"shape": name, "gflop": round(gflop, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
