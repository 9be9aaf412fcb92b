"""Fused GEGLU MLP kernel correctness (interpret mode on CPU; the compiled
kernel is exercised by bench/forward probes on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from lvd_tpu.ops import geglu_fused as gf
from lvd_tpu.ops.basic import feed_forward


def _params(rng, c, inner):
    k1, k2 = rng.standard_normal((c, 2 * inner)), rng.standard_normal((inner, c))
    return {
        "proj": {"w": jnp.asarray(k1 * c ** -0.5, jnp.float32),
                 "b": jnp.asarray(rng.standard_normal(2 * inner) * 0.01, jnp.float32)},
        "out": {"w": jnp.asarray(k2 * inner ** -0.5, jnp.float32),
                "b": jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)},
    }


def test_fused_kernel_matches_unfused():
    rng = np.random.default_rng(0)
    c, inner, r = 320, 1280, 640  # r not a block_m multiple: exercises masking
    p = _params(rng, c, inner)
    x = jnp.asarray(rng.standard_normal((r, c)), jnp.float32)

    got = gf._fused_rows(
        x, p["proj"]["w"], p["proj"]["b"], p["out"]["w"], p["out"]["b"],
        block_m=256, block_k=256, interpret=True,
    )
    want = gf._unfused(
        x, p["proj"]["w"], p["proj"]["b"], p["out"]["w"], p["out"]["b"]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_feed_forward_dispatch_cpu_unchanged():
    """On CPU feed_forward must keep the unfused path (kernel is TPU-only)."""
    rng = np.random.default_rng(1)
    p = _params(rng, 64, 256)
    x = jnp.asarray(rng.standard_normal((2, 4096, 64)), jnp.float32)
    assert not gf.supported(p["proj"]["w"], p["out"]["w"], x)
    out = feed_forward(p, x)
    want = gf._unfused(
        x.reshape(-1, 64), p["proj"]["w"], p["proj"]["b"],
        p["out"]["w"], p["out"]["b"],
    ).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_unfused():
    """The custom VJP recomputes the unfused formulation: gradients must be
    exactly the unfused ones (interpret-mode fwd, analytic bwd)."""
    rng = np.random.default_rng(2)
    c, inner, r = 64, 256, 128
    p = _params(rng, c, inner)
    x = jnp.asarray(rng.standard_normal((r, c)), jnp.float32)
    args = (x, p["proj"]["w"], p["proj"]["b"], p["out"]["w"], p["out"]["b"])

    def loss_unfused(*a):
        return jnp.sum(gf._unfused(*a) ** 2)

    # The VJP residuals are the raw inputs (see _fused_fwd), so the bwd rule
    # can be exercised directly on CPU without running the compiled kernel.
    g_un = jax.grad(loss_unfused, argnums=(0, 1, 2, 3, 4))(*args)
    g_cot = 2.0 * gf._unfused(*args)
    g_f = gf._fused_bwd(args, g_cot)
    for a, b in zip(g_f, g_un):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
