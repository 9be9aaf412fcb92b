"""Fused temporal-attention kernel correctness (interpret mode on CPU; the
compiled kernel is exercised by bench/forward probes on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from lvd_tpu.ops import temporal_attention as ta


def _params(rng, c):
    def lin(cin, cout, bias=True):
        p = {"w": jnp.asarray(rng.standard_normal((cin, cout)) * cin ** -0.5,
                              jnp.float32)}
        if bias:
            p["b"] = jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.float32)
        return p

    def attn():
        return {
            "to_q": lin(c, c, bias=False),
            "to_k": lin(c, c, bias=False),
            "to_v": lin(c, c, bias=False),
            "to_out": lin(c, c),
        }

    def norm():
        return {"scale": jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32),
                "bias": jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)}

    return {"norm1": norm(), "attn1": attn(), "norm2": norm(), "attn2": attn()}


def test_kernel_matches_reference():
    """The block-diagonal packed kernel must reproduce the unfused pair,
    including independence across the G pixels packed into one program."""
    rng = np.random.default_rng(0)
    c, heads, g = 128, 2, 5
    b, pdim, f = 2, 10, 6
    p = _params(rng, c)
    y = jnp.asarray(rng.standard_normal((b, pdim, f, c)), jnp.float32)

    got = ta._pallas_pair(p, y, heads, g, 1e-5, interpret=True)
    want = ta._pair_ref(p, y, heads, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_frames_major_kernel_matches_reference():
    """The frames-major variant (in-VMEM tile permutation) must reproduce
    the pixels-major pair on the transposed input."""
    rng = np.random.default_rng(7)
    c, heads, g = 128, 2, 5
    b, pdim, f = 2, 10, 6
    p = _params(rng, c)
    y_fm = jnp.asarray(rng.standard_normal((b, f, pdim, c)), jnp.float32)

    got = ta._pallas_pair(p, y_fm, heads, g, 1e-5, frames_major=True,
                          interpret=True)
    want = ta._pair_ref(p, y_fm.transpose(0, 2, 1, 3), heads, 1e-5)
    np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 1, 3)),
                               np.asarray(want), rtol=2e-4, atol=2e-5)


def test_frames_major_gradients_are_reference_gradients():
    """Frames-major VJP must equal the reference gradients (transposes are
    gradient-transparent)."""
    rng = np.random.default_rng(8)
    c, heads = 128, 2
    p = _params(rng, c)
    y_fm = jnp.asarray(rng.standard_normal((1, 4, 5, c)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((1, 4, 5, c)), jnp.float32)
    _, vjp_ref = jax.vjp(
        lambda p, y: ta._pair_ref(
            p, y.transpose(0, 2, 1, 3), heads, 1e-5).transpose(0, 2, 1, 3),
        p, y_fm)
    want = vjp_ref(ct)
    got = ta._fused_pair_bwd(heads, 5, 1e-5, True, (p, y_fm), ct)
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_pixel_independence():
    """Changing one pixel's frames must not change any other pixel's output
    (the -inf mask must isolate the per-pixel blocks)."""
    rng = np.random.default_rng(1)
    c, heads, g = 128, 2, 5
    p = _params(rng, c)
    y = jnp.asarray(rng.standard_normal((1, 5, 4, c)), jnp.float32)
    base = np.asarray(ta._pallas_pair(p, y, heads, g, 1e-5, interpret=True))
    y2 = y.at[0, 2].add(3.0)
    pert = np.asarray(ta._pallas_pair(p, y2, heads, g, 1e-5, interpret=True))
    others = [0, 1, 3, 4]
    np.testing.assert_allclose(pert[:, others], base[:, others], rtol=1e-6, atol=1e-6)
    assert np.abs(pert[:, 2] - base[:, 2]).max() > 1e-3


def test_gradients_are_reference_gradients():
    """The custom VJP recomputes through the unfused formulation — gradients
    must be exactly the reference ones."""
    rng = np.random.default_rng(2)
    c, heads = 128, 2
    p = _params(rng, c)
    y = jnp.asarray(rng.standard_normal((1, 5, 4, c)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((1, 5, 4, c)), jnp.float32)
    _, vjp_ref = jax.vjp(lambda p, y: ta._pair_ref(p, y, heads, 1e-5), p, y)
    want = vjp_ref(ct)
    got = ta._fused_pair_bwd(heads, 5, 1e-5, False, (p, y), ct)
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_supported_gating():
    y_ok = jnp.zeros((2, 10, 6, 128), jnp.float32)
    assert not ta.supported(y_ok, 2)  # CPU backend -> unsupported
    # head dim != 64 and non-divisible pixel counts must be rejected even on
    # TPU; check the pure-shape conditions via the underlying predicate parts.
    assert y_ok.shape[1] % 5 == 0
    y_bad = jnp.zeros((2, 11, 6, 128), jnp.float32)
    assert y_bad.shape[1] % 5 != 0


def test_pallas_backward_matches_reference_dy():
    """The dy-only Pallas backward kernel must reproduce the unfused VJP's
    input gradient (pixels-major and frames-major), interpret mode."""
    rng = np.random.default_rng(11)
    c, heads, g = 128, 2, 5
    b, pdim, f = 2, 10, 4
    p = _params(rng, c)

    y = jnp.asarray(rng.standard_normal((b, pdim, f, c)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((b, pdim, f, c)), jnp.float32)
    _, vjp = jax.vjp(lambda y_: ta._pair_ref(p, y_, heads, 1e-5), y)
    (want,) = vjp(ct)
    got = ta._pallas_pair_bwd(p, y, ct, heads, g, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)

    y_fm = y.transpose(0, 2, 1, 3)
    ct_fm = ct.transpose(0, 2, 1, 3)
    got_fm = ta._pallas_pair_bwd(p, y_fm, ct_fm, heads, g, 1e-5,
                                 frames_major=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got_fm.transpose(0, 2, 1, 3)),
                               np.asarray(want), rtol=5e-4, atol=5e-5)


def test_pick_g_bwd():
    assert ta._pick_g_bwd(2880, 320) == 10  # sweep-fastest at C=320
    assert ta._pick_g_bwd(720, 640) == 6    # VMEM cap at wide channels
    assert ta._pick_g_bwd(7, 320) == 0      # no divisor
    # frames-major tiles are (1, F, g, C): Pallas wants g % 8 == 0, and
    # C=640 frames-major exceeds scoped VMEM at every legal g
    assert ta._pick_g_bwd(2880, 320, frames_major=True) in (8, 16)
    assert ta._pick_g_bwd(720, 640, frames_major=True) == 0
    assert ta._pick_g_bwd(20, 320, frames_major=True) == 0


def test_pick_g_frames_major_legal():
    """Forward tile legality: frames-major blocks are (1, F, g, C), so g
    must be a multiple of 8 (Pallas second-minor rule) — in particular at
    the sharded P_local=360 (8-way mesh after the temporal all_to_all),
    where the pixels-major picker would choose an illegal g=12."""
    assert ta._pick_g(360) == 12                      # pixels-major: fine
    assert ta._pick_g(360, frames_major=True) == 8    # 12 would not lower
    assert ta._pick_g(2880, frames_major=True) == 16
    assert ta._pick_g(20, frames_major=True) == 0
    assert ta._pick_g(15, frames_major=True) == 15    # whole-dim block
