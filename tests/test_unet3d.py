"""UNet3D structural tests on the tiny config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvd_tpu.config import tiny_unet_config
from lvd_tpu.models.unet3d import apply_unet3d, init_unet3d

GUIDANCE_KEYS = (
    ("down", 1, 0, 0),
    ("down", 2, 0, 0),
    ("down", 2, 1, 0),
    ("up", 1, 0, 0),
    ("up", 1, 1, 0),
    ("up", 2, 2, 0),
)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_unet_config()
    params = init_unet3d(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(cfg, b=1, f=4, h=16, w=24):
    rng = np.random.default_rng(0)
    sample = jnp.array(rng.standard_normal((b, f, h, w, 4)), jnp.float32)
    text = jnp.array(rng.standard_normal((b, 77, cfg.cross_attention_dim)), jnp.float32)
    return sample, jnp.array(500), text


def test_forward_shapes(tiny):
    cfg, params = tiny
    sample, t, text = _inputs(cfg)
    out, aux = jax.jit(
        lambda p, s, t, c: apply_unet3d(p, cfg, s, t, c)
    )(params, sample, t, text)
    assert out.shape == sample.shape
    assert aux == {}
    assert bool(jnp.all(jnp.isfinite(out)))


def test_capture_aux_shapes(tiny):
    cfg, params = tiny
    b, f, h, w = 1, 4, 16, 24
    sample, t, text = _inputs(cfg, b, f, h, w)
    out, aux = jax.jit(
        lambda p, s, t, c: apply_unet3d(p, cfg, s, t, c, capture_keys=GUIDANCE_KEYS)
    )(params, sample, t, text)
    assert set(aux) == set(GUIDANCE_KEYS)
    # ("down", 1, 0, 0) sits after one downsample: (h/2 * w/2) queries.
    heads1 = cfg.num_heads(cfg.block_out_channels[1])
    assert aux[("down", 1, 0, 0)].shape == (b * f, heads1, (h // 2) * (w // 2), 77)
    heads2 = cfg.num_heads(cfg.block_out_channels[2])
    assert aux[("down", 2, 0, 0)].shape == (b * f, heads2, (h // 4) * (w // 4), 77)
    # ("up", 2, 2, 0): third up block runs at the h/4 resolution... verify by
    # probs summing to one (valid softmax) and finiteness everywhere.
    for key, probs in aux.items():
        np.testing.assert_allclose(
            np.asarray(probs.sum(-1)), 1.0, rtol=1e-4, atol=1e-4
        )


def test_grad_through_captured_attention(tiny):
    """The core guidance requirement: d(energy(aux)) / d(latents) exists and
    is nonzero — functional replacement for torch.autograd.grad through
    save_attn_to_dict (reference models/pipelines.py:120)."""
    cfg, params = tiny
    sample, t, text = _inputs(cfg)
    keys = (("down", 1, 0, 0), ("up", 1, 0, 0))

    def energy(s):
        _, aux = apply_unet3d(
            params, cfg, s, t, text, capture_keys=keys, remat=True
        )
        return sum(jnp.sum(a[..., :3].astype(jnp.float32)) for a in aux.values())

    g = jax.jit(jax.grad(energy))(sample)
    assert g.shape == sample.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def test_gligen_gated_unet(tiny):
    cfg = tiny_unet_config(attention_type="gated")
    params = init_unet3d(jax.random.PRNGKey(1), cfg)
    b, f = 1, 4
    sample, t, text = _inputs(cfg, b, f)
    m = 5
    rng = np.random.default_rng(1)
    gligen = {
        "boxes": jnp.array(rng.random((b * f, m, 4)), jnp.float32),
        "masks": jnp.ones((b * f, m), jnp.float32).at[:, 3:].set(0.0),
        "positive_embeddings": jnp.array(
            rng.standard_normal((b * f, m, cfg.gligen_positive_len)), jnp.float32
        ),
    }
    fwd_g = jax.jit(lambda p, s, t, c, g: apply_unet3d(p, cfg, s, t, c, gligen=g))
    fwd_n = jax.jit(lambda p, s, t, c: apply_unet3d(p, cfg, s, t, c))
    out_g, _ = fwd_g(params, sample, t, text, gligen)
    out_n, _ = fwd_n(params, sample, t, text)
    assert out_g.shape == sample.shape
    # alpha gates are zero at init, so the fuser is exactly inert — matching
    # GLIGEN's tanh(0)=0 initialization (reference models/attention.py:39-40).
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_n), atol=1e-6)

    # With nonzero gates the grounding tokens must change the output.
    import jax.tree_util as jtu

    def bump(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "alpha_attn" in names or "alpha_dense" in names:
            return jnp.ones_like(leaf)
        return leaf

    params_hot = jtu.tree_map_with_path(bump, params)
    out_hot, _ = fwd_g(params_hot, sample, t, text, gligen)
    assert float(jnp.abs(out_hot - out_n).max()) > 1e-4


def test_capture_only_matches_full_walk(tiny):
    """capture_only truncates the UNet statically after the last captured
    site; the returned attention maps (and their latent gradients) must be
    identical to the full forward's."""
    cfg, params = tiny
    sample, t, text = _inputs(cfg)
    keys = (("down", 1, 0, 0), ("up", 1, 0, 0))

    out_full, aux_full = jax.jit(
        lambda s: apply_unet3d(params, cfg, s, t, text, capture_keys=keys)
    )(sample)
    out_trunc, aux_trunc = jax.jit(
        lambda s: apply_unet3d(
            params, cfg, s, t, text, capture_keys=keys, capture_only=True
        )
    )(sample)
    assert out_trunc is None
    assert set(aux_trunc) == set(aux_full)
    for k in aux_full:
        np.testing.assert_allclose(
            np.asarray(aux_trunc[k]), np.asarray(aux_full[k]), rtol=1e-6, atol=1e-6
        )

    def energy(s, capture_only):
        _, aux = apply_unet3d(
            params, cfg, s, t, text, capture_keys=keys,
            capture_only=capture_only, remat=True,
        )
        return sum(jnp.sum(a[..., :3].astype(jnp.float32)) for a in aux.values())

    g_full = jax.jit(jax.grad(lambda s: energy(s, False)))(sample)
    g_trunc = jax.jit(jax.grad(lambda s: energy(s, True)))(sample)
    np.testing.assert_allclose(
        np.asarray(g_trunc), np.asarray(g_full), rtol=1e-5, atol=1e-6
    )


def test_remat_grad_equivalence(tiny):
    """The selective remat policy (save attn/conv outputs by name, recompute
    the elementwise chains) must not change the guidance gradient: remat is a
    memory/time trade, never a numerics change."""
    cfg, params = tiny
    sample, t, text = _inputs(cfg)
    keys = (("down", 1, 0, 0), ("up", 1, 0, 0))

    def energy(s, remat):
        _, aux = apply_unet3d(
            params, cfg, s, t, text, capture_keys=keys, remat=remat
        )
        return sum(jnp.sum(a[..., :3].astype(jnp.float32)) for a in aux.values())

    g_remat = jax.jit(jax.grad(lambda s: energy(s, True)))(sample)
    g_plain = jax.jit(jax.grad(lambda s: energy(s, False)))(sample)
    np.testing.assert_allclose(
        np.asarray(g_remat), np.asarray(g_plain), rtol=1e-5, atol=1e-6
    )


def test_batch_and_cfg_pair(tiny):
    """Uncond/cond stacked on the batch axis (CFG) must not cross-talk."""
    cfg, params = tiny
    sample, t, text = _inputs(cfg, b=2)
    fwd = jax.jit(lambda p, s, t, c: apply_unet3d(p, cfg, s, t, c))
    out, _ = fwd(params, sample, t, text)
    out0, _ = fwd(params, sample[:1], t, text[:1])
    np.testing.assert_allclose(
        np.asarray(out[:1]), np.asarray(out0), rtol=2e-4, atol=2e-4
    )


def test_probs_transform_hook(tiny):
    """probs_transform mirrors the reference's attn_process_fn
    (attention_processor.py:441, 521-532): it edits cross-attention
    probabilities in-flight at every spatial transformer, receives the
    attn_key, changes the output, and — like the reference — the captured
    aux maps stay PRE-transform."""
    cfg, params = tiny
    sample, t, text = _inputs(cfg)
    keys = (("down", 1, 0, 0), ("up", 1, 0, 0))

    base_out, base_aux = jax.jit(
        lambda p, s, t, c: apply_unet3d(p, cfg, s, t, c, capture_keys=keys)
    )(params, sample, t, text)

    seen_keys = set()

    def identity(key, probs):
        seen_keys.add(key)
        return probs

    id_out, id_aux = jax.jit(
        lambda p, s, t, c: apply_unet3d(
            p, cfg, s, t, c, capture_keys=keys, probs_transform=identity
        )
    )(params, sample, t, text)
    # Hook fires at every spatial cross-attention, not just captured sites.
    assert set(keys) <= seen_keys and len(seen_keys) > len(keys)
    np.testing.assert_allclose(
        np.asarray(id_out), np.asarray(base_out), rtol=2e-5, atol=2e-5
    )

    def collapse(key, probs):
        # Drastic valid edit: every query attends only the first text token.
        return jnp.zeros_like(probs).at[..., 0].set(1.0)

    sh_out, sh_aux = jax.jit(
        lambda p, s, t, c: apply_unet3d(
            p, cfg, s, t, c, capture_keys=keys, probs_transform=collapse
        )
    )(params, sample, t, text)
    # Small in absolute terms (the tiny random-init model attenuates
    # attention contributions) but >10x the identity-path compile noise
    # asserted at 2e-5 above.
    assert float(jnp.abs(sh_out - base_out).max()) > 1e-4
    # Captured maps are PRE-transform (reference semantics): never the
    # collapsed one-hot. (Exact equality with base_aux only holds at the
    # first site — the edit changes activations flowing into later blocks.)
    for k in keys:
        probs = np.asarray(sh_aux[k])
        assert probs[..., 0].max() < 0.9  # collapse would make this 1.0
        assert probs[..., 1:].sum() > 1.0
