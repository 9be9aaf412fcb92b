"""Does a Pallas resident linear kill the dot->Pallas boundary copy?

Round-4 census root cause (PERF.md): XLA computes the big projection dots
into the transposed {1,0,2} layout, then pays an 88.5 MB relayout copy at
every Pallas custom-call boundary (default {2,1,0} pinned). Four variants
per shape, timed with the in-graph fori_loop methodology, each ending in a
Pallas consumer (a trivial scale kernel) to force the boundary:

  xla+consumer     dot + bias (XLA) -> pallas consumer  [pays the copy?]
  kernel+consumer  ops/linear_fused -> pallas consumer  [no boundary]
  constraint       dot + bias + with_layout_constraint(default) -> consumer
  xla-alone        dot + bias -> XLA consumer            [control]

Usage: python tools/sweep_linear_layout.py
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lvd_tpu.ops import linear_fused as lf
    from lvd_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    def _scale_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def pallas_consumer(y):
        r, c = y.shape
        bm = min(1024, r)
        return pl.pallas_call(
            _scale_kernel,
            grid=(pl.cdiv(r, bm),),
            in_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r, c), y.dtype),
        )(y)

    def rtt():
        f = jax.jit(lambda x: x + 1)
        float(f(jnp.float32(0)))
        t0 = time.time()
        for i in range(5):
            float(f(jnp.float32(i)))
        return (time.time() - t0) / 5

    r0 = rtt()
    n = 30

    def timed(tag, fn, x, w, b):
        def loop(x, w, b):
            def body(i, c):
                y = fn(c, w, b)
                return (c + 1e-6 * y[:, : c.shape[1]]).astype(c.dtype)

            out = jax.lax.fori_loop(0, n, body, x)
            return out.astype(jnp.float32).sum()

        j = jax.jit(loop)
        try:
            float(j(x, w, b))
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": str(e)[:150]}), flush=True)
            return
        t0 = time.time()
        s = float(j(x, w, b))
        ms = (time.time() - t0 - r0) / n * 1e3
        assert s == s
        print(json.dumps({"cfg": tag, "ms": round(ms, 3)}), flush=True)

    from jax.experimental.layout import Format, Layout, with_layout_constraint

    shapes = [
        ("L0", 138240, 320, 320),
        ("L1", 34560, 640, 640),
        ("L0qkv-energy", 69120, 320, 320),
    ]
    for name, rows, c, nout in shapes:
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(k[0], (rows, c), jnp.bfloat16)
        w = jax.random.normal(k[1], (c, nout), jnp.bfloat16) * c ** -0.5
        b = jnp.zeros((nout,), jnp.bfloat16)
        gf = 2 * rows * c * nout / 1e9

        def xla_linear(xx, ww, bb):
            return jnp.dot(xx, ww, preferred_element_type=xx.dtype) + bb

        def v_xla_consumer(xx, ww, bb):
            return pallas_consumer(xla_linear(xx, ww, bb))

        def v_kernel_consumer(xx, ww, bb):
            return pallas_consumer(lf._fused_rows(xx, ww, bb))

        def v_constraint(xx, ww, bb):
            y = xla_linear(xx, ww, bb)
            y = with_layout_constraint(
                y, Format(Layout((1, 0)))
            )
            return pallas_consumer(y)

        def v_xla_alone(xx, ww, bb):
            return xla_linear(xx, ww, bb) * 2.0

        def v_kernel_alone(xx, ww, bb):
            return lf._fused_rows(xx, ww, bb) * 2.0

        print(f"# {name}: ({rows}, {c}) @ ({c}, {nout}) = {gf:.1f} GFLOP",
              flush=True)
        timed(f"{name} xla+consumer", v_xla_consumer, x, w, b)
        timed(f"{name} kernel+consumer", v_kernel_consumer, x, w, b)
        timed(f"{name} constraint+consumer", v_constraint, x, w, b)
        timed(f"{name} xla-alone", v_xla_alone, x, w, b)
        timed(f"{name} kernel-alone", v_kernel_alone, x, w, b)

    # ---- conv -> temporal-view boundary --------------------------------
    # The round-4 census's other big family: a 3x3 conv emits {3,0,2,1}
    # (batch-second-minor) and the (B, F, P, C) reshape feeding the
    # temp-conv Pallas kernel relayouts the stream (unet3d.py:513). The
    # {3,0,2,1} bytes of (BF, H, W, C) ARE the default-layout bytes of the
    # logical (H*W, BF, C) transpose — if XLA folds that transpose into a
    # bitcast, a pixels-major kernel reads the conv output copy-free.
    bf, hh, ww, c = 48, 40, 72, 320
    kk = jax.random.split(jax.random.PRNGKey(1), 2)
    xc = jax.random.normal(kk[0], (bf, hh, ww, c), jnp.bfloat16)
    wc = jax.random.normal(kk[1], (3, 3, c, c), jnp.bfloat16) * (9 * c) ** -0.5

    def conv(xx, ww_):
        return jax.lax.conv_general_dilated(
            xx, ww_, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def v_conv_frames_major(xx, ww_, _b):
        y = conv(xx, ww_)
        y4 = y.reshape(2, bf // 2, hh * ww, c)  # (B, F, P, C) — current form
        return pallas_consumer(y4.reshape(-1, c)).reshape(y4.shape)[:, :, :, :].reshape(bf, hh, ww, c)

    def v_conv_pixels_major(xx, ww_, _b):
        y = conv(xx, ww_)
        yp = jnp.transpose(y, (1, 2, 0, 3)).reshape(hh * ww, bf, c)
        out = pallas_consumer(yp.reshape(-1, c)).reshape(yp.shape)
        return jnp.transpose(out.reshape(hh, ww, bf, c), (2, 0, 1, 3))

    def v_conv_alone(xx, ww_, _b):
        return conv(xx, ww_) * 2.0

    def timed_conv(tag, fn):
        def loop(xx, ww_):
            def body(i, cst):
                y = fn(cst, ww_, None)
                return (cst + 1e-6 * y).astype(cst.dtype)

            return jax.lax.fori_loop(0, n, body, xx).astype(jnp.float32).sum()

        j = jax.jit(loop)
        try:
            float(j(xc, wc))
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": str(e)[:150]}), flush=True)
            return
        t0 = time.time()
        s = float(j(xc, wc))
        ms = (time.time() - t0 - r0) / n * 1e3
        assert s == s
        print(json.dumps({"cfg": tag, "ms": round(ms, 3)}), flush=True)

    print(f"# conv boundary: ({bf},{hh},{ww},{c}) 3x3", flush=True)
    timed_conv("conv frames-major+consumer", v_conv_frames_major)
    timed_conv("conv pixels-major+consumer", v_conv_pixels_major)
    timed_conv("conv alone", v_conv_alone)


if __name__ == "__main__":
    main()
