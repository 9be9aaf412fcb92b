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


def test_gelu_forms_pinned():
    """Both kernel GELU polynomials must match their jax.nn.gelu
    counterparts (the tanh form is the default; LVD_GELU_FORM=exact restores
    the reference's erf form). The two forms differ by at most ~3e-3 — at
    bf16 rounding scale, which is why the swap is allowed at all."""
    x = jnp.linspace(-6.0, 6.0, 4097, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(gf._gelu_tanh(x)),
        np.asarray(jax.nn.gelu(x, approximate=True)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gf._gelu_exact(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)), rtol=1e-4, atol=2e-6)
    gap = np.abs(np.asarray(gf._gelu_tanh(x) - gf._gelu_exact(x)))
    assert gap.max() < 4e-3


def test_fused_kernel_matches_unfused_exact_form(monkeypatch):
    """The erf escape hatch must stay wired through the kernel."""
    monkeypatch.setattr(gf, "GELU_FORM", "exact")
    rng = np.random.default_rng(3)
    c, inner, r = 64, 256, 256
    p = _params(rng, c, inner)
    x = jnp.asarray(rng.standard_normal((r, c)), jnp.float32)
    got = gf._fused_rows(
        x, p["proj"]["w"], p["proj"]["b"], p["out"]["w"], p["out"]["b"],
        block_m=128, block_k=256, interpret=True,
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


def test_bwd_kernel_dx_matches_unfused():
    """The dx-only backward kernel (interpret mode) must match the unfused
    dx for both GELU forms, and _gelu_val_grad must match AD."""
    rng = np.random.default_rng(3)
    c, inner, r = 64, 256, 128
    p = _params(rng, c, inner)
    x = jnp.asarray(rng.standard_normal((r, c)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((r, c)), jnp.float32)
    args = (x, p["proj"]["w"], p["proj"]["b"], p["out"]["w"], p["out"]["b"])

    dx_un = jax.vjp(gf._unfused, *args)[1](dy)[0]
    dx_k = gf._fused_rows_bwd_resident(
        x, dy, p["proj"]["w"], p["proj"]["b"], p["out"]["w"],
        block_m=64, nk=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_un),
                               rtol=2e-4, atol=2e-4)

    g = jnp.linspace(-4.0, 4.0, 97, dtype=jnp.float32)
    for form in ("tanh", "exact"):
        val, grad = gf._gelu_val_grad(g, form)
        fn = lambda t: jnp.sum(
            gf._gelu_tanh(t) if form == "tanh" else gf._gelu_exact(t))
        want_val = gf._gelu_tanh(g) if form == "tanh" else gf._gelu_exact(g)
        want_grad = jax.grad(fn)(g)
        np.testing.assert_allclose(np.asarray(val), np.asarray(want_val),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad),
                                   rtol=1e-4, atol=1e-5)
