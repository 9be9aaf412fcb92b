"""Does XLA's conv<->GroupNorm-stats fusion slow the conv? (real chip)

The round-3 device trace showed the resnet 3x3 convs at 150-190 TF/s while
the standalone calibration puts identical conv shapes at 198-266 TF/s; the
trace also showed each conv "fused by XLA with the *next* GroupNorm's
statistics reductions". Hypothesis: the fused stats epilogue costs more conv
throughput than the ~0.1 ms re-read of the output it saves. This times, per
resnet conv shape:

  conv          the conv alone (throughput ceiling)
  conv+gn       conv -> GroupNorm of the output, fused as in the model
  conv|gn       same chain with an optimization_barrier between them, so the
                stats run as a separate pass that re-reads the output

Usage: python tools/sweep_conv_gn.py
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

    from lvd_tpu.ops import basic
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
    n_iter = 30

    # Resnet conv shapes of the zeroscope CFG forward (folded batch 48).
    shapes = [
        ("L0 320->320", 48, 40, 72, 320, 320),
        ("L0up 960->320", 48, 40, 72, 960, 320),
        ("L1 640->640", 48, 20, 36, 640, 640),
        ("L2 1280->1280", 48, 10, 18, 1280, 1280),
        ("L3 1280->1280", 48, 5, 9, 1280, 1280),
    ]

    for label, n, h, w, cin, cout in shapes:
        keys = jax.random.split(jax.random.PRNGKey(1), 3)
        x = jax.random.normal(keys[0], (n, h, w, cin), jnp.bfloat16)
        conv_p = {
            "w": jax.random.normal(keys[1], (3, 3, cin, cout), jnp.bfloat16)
            * (9 * cin) ** -0.5,
            "b": 0.1 * jax.random.normal(keys[2], (cout,), jnp.bfloat16),
        }
        norm_p = {"scale": jnp.ones((cout,), jnp.bfloat16),
                  "bias": jnp.zeros((cout,), jnp.bfloat16)}

        def conv_only(x_):
            return basic.conv2d(conv_p, x_)

        def conv_gn(x_, barrier: bool):
            y = basic.conv2d(conv_p, x_)
            if barrier:
                y = jax.lax.optimization_barrier(y)
            return basic.group_norm(norm_p, y)

        variants = {
            "conv": conv_only,
            "conv+gn": lambda x_: conv_gn(x_, False),
            "conv|gn": lambda x_: conv_gn(x_, True),
        }
        for name, fn in variants.items():
            def loop(x_, fn=fn):
                def body(i, cr):
                    y = fn(cr)
                    return cr + 1e-6 * y[..., :cin] if cout >= cin else (
                        cr + 1e-6 * jnp.pad(
                            y, [(0, 0)] * 3 + [(0, cin - cout)]))

                out = jax.lax.fori_loop(0, n_iter, body, x_)
                return out.astype(jnp.float32).sum()

            j = jax.jit(loop)
            try:
                float(j(x))
            except Exception as e:
                print(json.dumps({"shape": label, "variant": name,
                                  "error": str(e)[:160]}), flush=True)
                continue
            t0 = time.time()
            s = float(j(x))
            ms = (time.time() - t0 - r0) / n_iter * 1e3
            assert s == s
            tf = 2 * n * h * w * 9 * cin * cout / (ms * 1e-3) / 1e12
            print(json.dumps({"shape": label, "variant": name,
                              "ms": round(ms, 3), "tf_s": round(tf, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
