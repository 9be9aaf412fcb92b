"""Temporal-pair backward formulation sweep (real chip).

The fused pair kernel's VJP recomputes via `_pair_ref_fm` (transpose ->
pixels-major unfused pair -> transpose). This times `jax.grad` of candidate
reformulations at the L0 energy-walk shape to find the cheapest backward:

  cur      transpose wrappers around the pixels-major reference
  native   frames-major dot_generals with batch dims (B, P) in place
  headbat  heads folded into the dot batch dims (one dot per attention)

One JSON line per variant; all variants are checked against `cur`'s
gradient first (max abs diff printed).

Usage: python tools/sweep_pair_bwd.py
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

    b, f, pdim, c, nh = 1, 24, 2880, 320, 5
    eps = 1e-5
    key = jax.random.split(jax.random.PRNGKey(0), 10)
    y = jax.random.normal(key[0], (b, f, pdim, c), jnp.bfloat16)

    def init_attn(k):
        ks = jax.random.split(k, 4)
        mk = lambda kk, din, dout: {
            "w": (jax.random.normal(kk, (din, dout), jnp.float32) * din ** -0.5
                  ).astype(jnp.bfloat16)}
        p = {
            "to_q": mk(ks[0], c, c), "to_k": mk(ks[1], c, c),
            "to_v": mk(ks[2], c, c),
            "to_out": {**mk(ks[3], c, c), "b": jnp.zeros((c,), jnp.bfloat16)},
        }
        return p

    p = {
        "norm1": {"scale": jnp.ones((c,), jnp.bfloat16),
                  "bias": jnp.zeros((c,), jnp.bfloat16)},
        "norm2": {"scale": jnp.ones((c,), jnp.bfloat16),
                  "bias": jnp.zeros((c,), jnp.bfloat16)},
        "attn1": init_attn(key[1]),
        "attn2": init_attn(key[2]),
    }

    # ---- variants ---------------------------------------------------------
    def attn_native2(pa, yn):
        d = c // nh
        qw, kw, vw = (pa[k]["w"].astype(yn.dtype)
                      for k in ("to_q", "to_k", "to_v"))
        q = jnp.dot(yn, qw, preferred_element_type=yn.dtype)
        k = jnp.dot(yn, kw, preferred_element_type=yn.dtype)
        v = jnp.dot(yn, vw, preferred_element_type=yn.dtype)
        outs = []
        for h in range(nh):
            sl = slice(h * d, (h + 1) * d)
            logits = jax.lax.dot_general(
                q[..., sl], k[..., sl], (((3,), (3,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.float32,
            ) * jnp.float32(d ** -0.5)
            probs = jax.nn.softmax(logits, axis=-1).astype(yn.dtype)
            o = jax.lax.dot_general(
                probs, v[..., sl], (((3,), (1,)), ((0, 1), (0, 2))),
                preferred_element_type=jnp.float32,
            ).astype(yn.dtype)
            outs.append(o)
        o = jnp.concatenate(outs, axis=-1).transpose(0, 2, 1, 3)
        return (jnp.dot(o, pa["to_out"]["w"].astype(yn.dtype),
                        preferred_element_type=jnp.float32)
                + pa["to_out"]["b"].astype(jnp.float32)).astype(yn.dtype)

    def attn_headbat(pa, yn):
        """One batched dot over (B, P, H): q (B,P,H,F,d)."""
        d = c // nh
        qw, kw, vw = (pa[k]["w"].astype(yn.dtype)
                      for k in ("to_q", "to_k", "to_v"))
        q = jnp.dot(yn, qw, preferred_element_type=yn.dtype)
        k = jnp.dot(yn, kw, preferred_element_type=yn.dtype)
        v = jnp.dot(yn, vw, preferred_element_type=yn.dtype)
        # (B, F, P, H, d) with batch dims (B, P, H)
        r = lambda t: t.reshape(b, f, pdim, nh, d)
        q, k, v = r(q), r(k), r(v)
        logits = jax.lax.dot_general(
            q, k, (((4,), (4,)), ((0, 2, 3), (0, 2, 3))),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(d ** -0.5)              # (B, P, H, F, F')
        probs = jax.nn.softmax(logits, axis=-1).astype(yn.dtype)
        o = jax.lax.dot_general(
            probs, v, (((4,), (1,)), ((0, 1, 2), (0, 2, 3))),
            preferred_element_type=jnp.float32,
        ).astype(yn.dtype)                      # (B, P, H, F, d)
        o = o.transpose(0, 3, 1, 2, 4).reshape(b, f, pdim, c)
        return (jnp.dot(o, pa["to_out"]["w"].astype(yn.dtype),
                        preferred_element_type=jnp.float32)
                + pa["to_out"]["b"].astype(jnp.float32)).astype(yn.dtype)

    def pair_of(attn):
        def pair(pp, yn):
            yn = yn + attn(pp["attn1"], ta._ref_ln(pp["norm1"], yn, eps))
            yn = yn + attn(pp["attn2"], ta._ref_ln(pp["norm2"], yn, eps))
            return yn
        return pair

    def pair_cur(pp, yn):
        return ta._pair_ref_fm(pp, yn, nh, eps)

    variants = {
        "cur": pair_cur,
        "native": pair_of(attn_native2),
        "headbat": pair_of(attn_headbat),
    }

    def rtt():
        fj = jax.jit(lambda x: x + 1)
        float(fj(jnp.float32(0)))
        t0 = time.time()
        for i in range(5):
            float(fj(jnp.float32(i)))
        return (time.time() - t0) / 5

    r0 = rtt()
    n = 20

    grads = {}
    for name, fn in variants.items():
        def loss(yy, pp):
            return jnp.sum(fn(pp, yy).astype(jnp.float32) * 1e-3)

        gfn = jax.jit(jax.grad(loss))

        def loop(yy, pp):
            def bodyf(i, cr):
                g = gfn(cr, pp)
                return (cr + 1e-6 * g).astype(cr.dtype)
            out = jax.lax.fori_loop(0, n, bodyf, yy)
            return out.astype(jnp.float32).sum()

        j = jax.jit(loop)
        try:
            grads[name] = jax.jit(jax.grad(loss))(y, p)
            float(j(y, p))
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:140]}),
                  flush=True)
            continue
        t0 = time.time()
        s = float(j(y, p))
        ms = (time.time() - t0 - r0) / n * 1e3
        assert s == s
        diff = None
        if name != "cur" and "cur" in grads:
            diff = float(jnp.max(jnp.abs(
                grads[name].astype(jnp.float32)
                - grads["cur"].astype(jnp.float32))))
        print(json.dumps({"variant": name, "grad_ms": round(ms, 3),
                          "max_abs_diff_vs_cur": diff}), flush=True)


if __name__ == "__main__":
    main()
