"""Attack the L0 conv-emitter gap (VERDICT r4 item 6; PERF.md round 4).

Measured: L0-shaped 3x3 convs run 125-150 TF/s while the same emitter hits
195-205 at L1/L2 — (48,40,72,960->320) is 6.0 ms vs a ~3.8 ms FLOP floor.
The round-4 sweep localized it to XLA's conv emitter at the 40x72 spatial
shape. Variants here keep the math identical (pad-then-slice or transpose)
and only change the shape the emitter sees:

  base          conv on (48,40,72,Cin) as-is
  padH48        rows padded 40->48 (zeros), output rows sliced back
  padW80        cols padded 72->80
  padHW         both pads
  swapHW        transpose to (48,72,40,Cin), conv, transpose back
  batchfold     fold BF into H: (1, 48*40, 72, C) with VALID-style zero
                seams is NOT math-identical for 3x3 -> measured anyway with
                seam rows inserted (48 -> adds 2 zero rows per image)
  tap-dots      9 shifted (P, Cin)@(Cin, Cout) dots on a pre-padded array

Padding FLOP overhead is priced in: a variant only wins if wall-clock
drops below base despite computing more.

Usage: python tools/sweep_conv_l0.py
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

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def timed(tag, fn, x, w, gf):
        def loop(x, w):
            def body(i, c):
                y = fn(c, w)
                # Feed y back into the first cout input channels so the
                # loop body depends on the carry (constant ~0.2 ms DUS
                # overhead, identical across variants).
                return c.at[..., : y.shape[-1]].add(
                    (1e-6 * y).astype(c.dtype))

            return jax.lax.fori_loop(0, n, body, x).astype(jnp.float32).sum()

        j = jax.jit(loop)
        try:
            float(j(x, w))
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": str(e)[:200]}), flush=True)
            return None
        t0 = time.time()
        s = float(j(x, w))
        ms = (time.time() - t0 - r0) / n * 1e3
        assert s == s
        print(json.dumps({"cfg": tag, "ms": round(ms, 3),
                          "tf_s": round(gf / ms, 1)}), flush=True)
        return ms

    for cin, cout in ((960, 320), (320, 320), (640, 320)):
        bf, hh, ww = 48, 40, 72
        k = jax.random.split(jax.random.PRNGKey(0), 2)
        x = jax.random.normal(k[0], (bf, hh, ww, cin), jnp.bfloat16)
        w = jax.random.normal(k[1], (3, 3, cin, cout), jnp.bfloat16)
        w = w * (9 * cin) ** -0.5
        gf = 2 * bf * hh * ww * cin * cout * 9 / 1e9  # GFLOP (base shape)

        def v_base(x, w):
            return conv(x, w)

        def v_padh(x, w):
            xp = jnp.pad(x, ((0, 0), (0, 8), (0, 0), (0, 0)))
            return conv(xp, w)[:, :hh]

        def v_padw(x, w):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 8), (0, 0)))
            return conv(xp, w)[:, :, :ww]

        def v_padhw(x, w):
            xp = jnp.pad(x, ((0, 0), (0, 8), (0, 8), (0, 0)))
            return conv(xp, w)[:, :hh, :ww]

        def v_swap(x, w):
            xt = jnp.transpose(x, (0, 2, 1, 3))
            wt = jnp.transpose(w, (1, 0, 2, 3))
            return jnp.transpose(conv(xt, wt), (0, 2, 1, 3))

        def v_cinsplit(x, w):
            # Sum of per-Cin-chunk convs at the chunk size whose emitter
            # throughput is known-good (320: 148 TF/s measured) — trades
            # one bad 960-deep conv for three good 320-deep ones plus a
            # fused elementwise sum.
            chunks = cin // 320
            acc = None
            for j in range(chunks):
                y = conv(x[..., j * 320:(j + 1) * 320],
                         w[:, :, j * 320:(j + 1) * 320])
                acc = y if acc is None else acc + y
            return acc

        def v_tapdots(x, w):
            # pre-pad once, then 9 static slices @ per-tap weights; the
            # slices feed dots directly (XLA may fuse the slice into the
            # dot's operand read).
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((bf, hh, ww, cout), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    win = jax.lax.slice(
                        xp, (0, dy, dx, 0), (bf, dy + hh, dx + ww, cin))
                    acc = acc + jax.lax.dot_general(
                        win.reshape(-1, cin), w[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(bf, hh, ww, cout)
            return acc.astype(x.dtype)

        print(f"# L0 conv ({bf},{hh},{ww},{cin})->{cout}: {gf:.1f} GFLOP",
              flush=True)
        timed(f"{cin}->{cout} base", v_base, x, w, gf)
        timed(f"{cin}->{cout} padH48", v_padh, x, w, gf)
        timed(f"{cin}->{cout} padW80", v_padw, x, w, gf)
        timed(f"{cin}->{cout} padHW", v_padhw, x, w, gf)
        def v_pallas(bm):
            from lvd_tpu.ops.conv3x3 import _conv3x3_pallas

            def f(x, w):
                return _conv3x3_pallas(x, w, bm=bm)

            return f

        timed(f"{cin}->{cout} swapHW", v_swap, x, w, gf)
        if cin > 320:
            timed(f"{cin}->{cout} cinsplit320", v_cinsplit, x, w, gf)
        if cin == 320:
            timed(f"{cin}->{cout} tap-dots", v_tapdots, x, w, gf)
        # bm must divide H=40 (Element windows have no partial-block
        # masking); VMEM ceiling: window(2x) + weights + fp32 acc + out(2x).
        bms = {960: (8, 10, 20), 640: (8, 10, 20), 320: (8, 20, 40)}[cin]
        for bm in bms:
            timed(f"{cin}->{cout} pallas-bm{bm}", v_pallas(bm), x, w, gf)


if __name__ == "__main__":
    main()
