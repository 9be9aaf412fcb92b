"""Fused GN-apply+SiLU+(3,1,1)-conv kernel correctness (interpret mode on
CPU; the compiled kernel is exercised by bench/forward probes on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from lvd_tpu.ops import temp_conv_fused as tcf
from lvd_tpu.ops.basic import conv3d, group_norm, group_norm_coeffs, silu


def _inputs(b=2, f=4, p=48, c=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, f, p, c)), jnp.float32)
    norm = {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32),
            "bias": jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)}
    conv = {"w": jnp.asarray(rng.standard_normal((3, 1, 1, c, c)) * (3 * c) ** -0.5,
                             jnp.float32),
            "b": jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)}
    return x, norm, conv


def _reference_stage(x, norm, conv, groups=32):
    """The unfused chain exactly as models/unet3d._temp_conv runs it."""
    b, f, p, c = x.shape
    y = group_norm(norm, x, groups, 1e-5)
    return conv3d(conv, silu(y).reshape(b, f, p, 1, c)).reshape(b, f, p, c)


def test_fused_stage_matches_reference():
    x, norm, conv = _inputs()
    a, bc = group_norm_coeffs(norm, x, 32, 1e-5)
    w = conv["w"].reshape(3, x.shape[-1], x.shape[-1])
    got = tcf._fused(x, a, bc, w, conv["b"], interpret=True, block_p=16)
    want = _reference_stage(x, norm, conv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # Frame edges: the kernel's in-VMEM zero padding must equal SAME padding.
    got_edge = np.asarray(got)[:, [0, -1]]
    want_edge = np.asarray(want)[:, [0, -1]]
    np.testing.assert_allclose(got_edge, want_edge, rtol=2e-4, atol=2e-4)


def test_fused_stage_wide_channel_co_blocking():
    """C > 640 path: the kernel tiles output channels (block_co < C)."""
    x, norm, conv = _inputs(b=1, f=3, p=8, c=768, seed=3)
    assert tcf._block_co_for(768) == 256
    a, bc = group_norm_coeffs(norm, x, 32, 1e-5)
    w = conv["w"].reshape(3, x.shape[-1], x.shape[-1])
    got = tcf._fused(x, a, bc, w, conv["b"], interpret=True, block_p=8)
    want = _reference_stage(x, norm, conv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_stage_gradients_match_unfused():
    x, norm, conv = _inputs(b=1, f=3, p=16, c=128, seed=1)
    a, bc = group_norm_coeffs(norm, x, 32, 1e-5)
    w = conv["w"].reshape(3, x.shape[-1], x.shape[-1])

    g_un = jax.grad(
        lambda x: jnp.sum(tcf._unfused(x, a, bc, w, conv["b"]) ** 2)
    )(x)
    # VJP residuals are the raw inputs; exercise the bwd rule directly.
    cot = 2.0 * tcf._unfused(x, a, bc, w, conv["b"])
    g_f = tcf._stage_bwd((x, a, bc, w, conv["b"]), cot)[0]
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_un),
                               rtol=1e-5, atol=1e-5)


def test_shifted_form_matches_unfused():
    """The VJP recompute target (_unfused_shifted, frame-shifted matmuls)
    must compute the same function as the conv3d form, values and grads."""
    x, norm, conv = _inputs(b=1, f=5, p=16, c=128, seed=4)
    a, bc = group_norm_coeffs(norm, x, 32, 1e-5)
    w = conv["w"].reshape(3, x.shape[-1], x.shape[-1])
    got = tcf._unfused_shifted(x, a, bc, w, conv["b"])
    want = tcf._unfused(x, a, bc, w, conv["b"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    loss = lambda fn: lambda x_, w_: jnp.sum(fn(x_, a, bc, w_, conv["b"]) ** 2)
    gx_s, gw_s = jax.grad(loss(tcf._unfused_shifted), (0, 1))(x, w)
    gx_u, gw_u = jax.grad(loss(tcf._unfused), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_u),
                               rtol=1e-4, atol=1e-4)


def test_unfused_matches_reference_chain():
    """tcf._unfused (the VJP recompute target) must equal the original
    group_norm -> silu -> conv3d chain."""
    x, norm, conv = _inputs(seed=2)
    a, bc = group_norm_coeffs(norm, x, 32, 1e-5)
    w = conv["w"].reshape(3, x.shape[-1], x.shape[-1])
    got = tcf._unfused(x, a, bc, w, conv["b"])
    want = _reference_stage(x, norm, conv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_variants_match_unfused():
    """Every routable kernel variant (taps / cat3 / rowshift, pipelined and
    not) must reproduce the unfused formulation (interpret mode)."""
    x, norm, conv = _inputs(seed=3)
    a, bc = group_norm_coeffs(norm, x, 32, 1e-5)
    w = conv["w"].reshape(3, x.shape[-1], x.shape[-1])
    want = tcf._unfused(x, a, bc, w, conv["b"])
    for variant, nb in (("taps", 1), ("taps", 4), ("cat3", 1), ("cat3", 4),
                        ("rowshift", None)):
        got = tcf._fused(x, a, bc, w, conv["b"], interpret=True,
                         variant=variant, nb=nb, block_p=16)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5,
            err_msg=f"variant={variant} nb={nb}")
