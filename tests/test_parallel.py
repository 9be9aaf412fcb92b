"""Mesh/sharding and training-step tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lvd_tpu.config import tiny_unet_config
from lvd_tpu.models.unet3d import apply_unet3d, init_unet3d
from lvd_tpu.parallel import mesh as mesh_mod
from lvd_tpu.training.train import Trainer, shard_batch


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_param_spec_rules():
    mesh = mesh_mod.make_mesh(8, model_parallel=2)
    cfg = tiny_unet_config()
    params = init_unet3d(jax.random.PRNGKey(0), cfg)
    shardings = mesh_mod.make_param_shardings(mesh, params)

    btb = shardings["down_blocks"][0]["layers"][0]["attn"]["blocks"][0]
    assert btb["attn1"]["to_q"]["w"].spec == P(None, "model")
    assert btb["attn1"]["to_out"]["w"].spec == P("model", None)
    assert btb["ff"]["proj"]["w"].spec == P(None, "model")
    assert btb["ff"]["out"]["w"].spec == P("model", None)
    # convs and norms replicated
    assert shardings["conv_in"]["w"].spec == P()
    assert btb["norm1"]["scale"].spec == P()


def _tiny_batch(cfg, b, f=2, h=8, w=8, m=3):
    rng = np.random.default_rng(0)
    return {
        "latents": jnp.asarray(rng.standard_normal((b, f, h, w, 4)), jnp.float32),
        "text": jnp.asarray(
            rng.standard_normal((b, 77, cfg.cross_attention_dim)), jnp.float32
        ),
    }


def test_train_step_runs_and_learns():
    cfg = tiny_unet_config()
    params = init_unet3d(jax.random.PRNGKey(0), cfg)
    trainer = Trainer(unet_cfg=cfg, learning_rate=1e-3)
    state = trainer.init(params)
    step = trainer.make_step(donate=False)
    batch = _tiny_batch(cfg, b=2)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(4):
        # Same rng every step: a learnable fixed target; loss must drop.
        state, loss = step(state, batch, rng)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_train_step_matches_single_device():
    cfg = tiny_unet_config()
    params = init_unet3d(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(cfg, b=4)
    rng = jax.random.PRNGKey(1)

    trainer = Trainer(unet_cfg=cfg)
    state_s = trainer.init(params)
    step_s = trainer.make_step(donate=False)
    _, loss_single = step_s(state_s, batch, rng)

    mesh = mesh_mod.make_mesh(8, model_parallel=2)
    trainer2 = Trainer(unet_cfg=cfg)
    with mesh:
        state_m = trainer2.init(params, mesh=mesh)
        step_m = trainer2.make_step(mesh=mesh, donate=False)
        sharded = shard_batch(mesh, batch)
        _, loss_mesh = step_m(state_m, sharded, rng)

    np.testing.assert_allclose(
        float(loss_single), float(loss_mesh), rtol=1e-4, atol=1e-5
    )


def test_adapter_only_training_freezes_base():
    cfg = tiny_unet_config(attention_type="gated")
    params = init_unet3d(jax.random.PRNGKey(0), cfg)
    trainer = Trainer(unet_cfg=cfg, adapter_only=True, learning_rate=1e-2)
    state = trainer.init(params)
    step = trainer.make_step(donate=False)
    b, f, m = 2, 2, 3
    rng = np.random.default_rng(0)
    batch = _tiny_batch(cfg, b=b, f=f)
    batch["gligen"] = {
        "boxes": jnp.asarray(rng.random((b * f, m, 4)), jnp.float32),
        "masks": jnp.ones((b * f, m), jnp.float32),
        "positive_embeddings": jnp.asarray(
            rng.standard_normal((b * f, m, cfg.gligen_positive_len)), jnp.float32
        ),
    }
    new_state, loss = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))

    conv_before = np.asarray(params["conv_in"]["w"])
    conv_after = np.asarray(new_state.params["conv_in"]["w"])
    np.testing.assert_array_equal(conv_before, conv_after)

    fuser_key = ["down_blocks", 0, "layers", 0, "attn", "blocks", 0, "fuser"]
    node_b, node_a = params, new_state.params
    for k in fuser_key:
        node_b, node_a = node_b[k], node_a[k]
    assert (
        np.abs(
            np.asarray(node_b["linear"]["w"]) - np.asarray(node_a["linear"]["w"])
        ).max()
        > 0
    )
