"""Fused GN-apply+SiLU+3x3-conv kernel sweep (real chip).

Times `spatial_conv_fused._fused` against XLA's conv chain (`_unfused`) at
every 3x3 conv shape in the zeroscope CFG forward (folded batch 48) and the
cond-only energy walk (batch 24). Numerics are checked per shape first.

Usage: python tools/sweep_spatial_conv.py [forward|grad]
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

    from lvd_tpu.ops import spatial_conv_fused as scf
    from lvd_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "forward"

    def rtt():
        fj = jax.jit(lambda x: x + 1)
        float(fj(jnp.float32(0)))
        t0 = time.time()
        for i in range(5):
            float(fj(jnp.float32(i)))
        return (time.time() - t0) / 5

    r0 = rtt()
    n_iter = 30

    # (label, N, H, W, Cin, Cout) — resnet conv1/conv2 instances per level,
    # including the up-block concat widths.
    shapes = [
        ("L0 320->320", 48, 40, 72, 320, 320),
        ("L0up 640->320", 48, 40, 72, 640, 320),
        ("L0up 960->320", 48, 40, 72, 960, 320),
        ("L1 640->640", 48, 20, 36, 640, 640),
        ("L1 320->640", 48, 20, 36, 320, 640),
        ("L1up 1280->640", 48, 20, 36, 1280, 640),
        ("L1up 960->640", 48, 20, 36, 960, 640),
        ("L2 1280->1280", 48, 10, 18, 1280, 1280),
        ("L2 640->1280", 48, 10, 18, 640, 1280),
        ("L2up 2560->1280", 48, 10, 18, 2560, 1280),
        ("L2up 1920->1280", 48, 10, 18, 1920, 1280),
        ("L3 1280->1280", 48, 5, 9, 1280, 1280),
        ("L3up 2560->1280", 48, 5, 9, 2560, 1280),
    ]

    for label, n, h, w, cin, cout in shapes:
        keys = jax.random.split(jax.random.PRNGKey(1), 5)
        x = jax.random.normal(keys[0], (n, h, w, cin), jnp.bfloat16)
        a = 1.0 + 0.1 * jax.random.normal(keys[1], (n, cin), jnp.float32)
        b = 0.1 * jax.random.normal(keys[2], (n, cin), jnp.float32)
        wk = (jax.random.normal(keys[3], (9, cin, cout), jnp.bfloat16)
              * (9 * cin) ** -0.5)
        bias = 0.1 * jax.random.normal(keys[4], (cout,), jnp.bfloat16)

        sup = scf.supported(x, wk)
        variants = {"xla": scf._unfused}
        if sup:
            variants["fused"] = scf._fused
        else:
            print(json.dumps({"shape": label, "fused": "unsupported"}),
                  flush=True)

        ref = None
        for name, fn in variants.items():
            if mode == "grad":
                base = fn

                def fn(x_, a_, b_, w_, bias_, base=base):
                    return jax.grad(lambda xx: jnp.sum(
                        base(xx, a_, b_, w_, bias_).astype(jnp.float32)
                        * 1e-3))(x_)

            def loop(x_, a_, b_, w_, bias_):
                def bodyf(i, cr):
                    y = fn(cr, a_, b_, w_, bias_)
                    return (cr + 1e-6 * y[..., :cin]
                            if y.shape[-1] >= cin else
                            cr + 1e-6 * jnp.pad(
                                y, [(0, 0)] * 3 + [(0, cin - y.shape[-1])]))
                out = jax.lax.fori_loop(0, n_iter, bodyf, x_)
                return out.astype(jnp.float32).sum()

            j = jax.jit(loop)
            try:
                val0 = jax.jit(fn)(x, a, b, wk, bias)
                float(j(x, a, b, wk, bias))
            except Exception as e:
                print(json.dumps({"shape": label, "variant": name,
                                  "error": str(e)[:160]}), flush=True)
                continue
            t0 = time.time()
            s = float(j(x, a, b, wk, bias))
            ms = (time.time() - t0 - r0) / n_iter * 1e3
            assert s == s
            diff = None
            if ref is None:
                ref = val0
            else:
                diff = float(jnp.max(jnp.abs(val0.astype(jnp.float32)
                                             - ref.astype(jnp.float32))))
            tf = 2 * n * h * w * 9 * cin * cout / (ms * 1e-3) / 1e12
            print(json.dumps({"shape": label, "variant": name,
                              "ms": round(ms, 3),
                              "tf_s": round(tf, 1),
                              "max_abs_diff": diff}), flush=True)


if __name__ == "__main__":
    main()
