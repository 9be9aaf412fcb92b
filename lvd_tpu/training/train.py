"""Distributed diffusion training step (noise-prediction MSE).

The reference never trains (weights are only loaded, SURVEY.md §5), but its
GLIGEN checkpoints were produced by adapter finetuning; this module provides
the TPU-native training path: epsilon-prediction MSE over the DDPM forward
process, optax AdamW, pjit over a ("data", "model") mesh with Megatron-style
TP on the attention/MLP matmuls and batch sharding on "data".

Supports full finetuning and GLIGEN-adapter-only training (freeze everything
except fuser/position_net, the way lvd-gligen checkpoints are made).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import SchedulerConfig, UNet3DConfig
from ..diffusion import schedule
from ..models.unet3d import apply_unet3d
from ..parallel import mesh as mesh_mod


class TrainState(NamedTuple):
    params: dict
    opt_state: object
    step: jnp.ndarray


def _adapter_only_mask(params):
    """1.0 for GLIGEN adapter params (fuser + position_net), else 0.0."""

    def mark(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        trainable = "fuser" in names or "position_net" in names
        return jnp.float32(1.0 if trainable else 0.0)

    return jax.tree_util.tree_map_with_path(mark, params)


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-2,
    adapter_only: bool = False,
    params=None,
):
    if not adapter_only:
        return optax.adamw(learning_rate, weight_decay=weight_decay)
    if params is None:
        raise ValueError("adapter_only needs params to build the mask")
    labels = jax.tree_util.tree_map(
        lambda m: "train" if m > 0.5 else "freeze", _adapter_only_mask(params)
    )
    # AdamW on the GLIGEN adapters; everything else gets zero updates.
    return optax.multi_transform(
        {
            "train": optax.adamw(learning_rate, weight_decay=weight_decay),
            "freeze": optax.set_to_zero(),
        },
        param_labels=labels,
    )


def diffusion_loss(params, cfg: UNet3DConfig, sqrt_abar, sqrt_1m_abar, batch, rng):
    """Standard epsilon-prediction loss.

    batch: {"latents": (B, F, h, w, C) clean latents,
            "text": (B, L, D) encoder states,
            optional "gligen": grounding inputs}
    """
    b = batch["latents"].shape[0]
    t_rng, n_rng = jax.random.split(rng)
    t = jax.random.randint(t_rng, (b,), 0, sqrt_abar.shape[0])
    eps = jax.random.normal(n_rng, batch["latents"].shape, batch["latents"].dtype)

    a = sqrt_abar[t][:, None, None, None, None].astype(batch["latents"].dtype)
    s = sqrt_1m_abar[t][:, None, None, None, None].astype(batch["latents"].dtype)
    noisy = a * batch["latents"] + s * eps

    pred, _ = apply_unet3d(
        params, cfg, noisy, t, batch["text"], gligen=batch.get("gligen"), remat=True
    )
    return jnp.mean((pred.astype(jnp.float32) - eps.astype(jnp.float32)) ** 2)


@dataclasses.dataclass
class Trainer:
    """Builds a pjit-compiled train step over a mesh."""

    unet_cfg: UNet3DConfig
    sched_cfg: SchedulerConfig = SchedulerConfig()
    learning_rate: float = 1e-4
    adapter_only: bool = False

    def init(self, params, mesh=None):
        self.tx = make_optimizer(
            self.learning_rate, adapter_only=self.adapter_only, params=params
        )
        if mesh is not None:
            # Shard params first; optimizer moments inherit the sharding
            # because tx.init is jitted over the sharded params.
            shardings = mesh_mod.make_param_shardings(mesh, params)
            params = jax.device_put(params, shardings)
        opt_state = jax.jit(self.tx.init)(params)
        return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))

    def make_step(self, mesh=None, donate: bool = True):
        abar = schedule.make_alphas_cumprod(self.sched_cfg)
        sqrt_abar = jnp.asarray(abar ** 0.5, jnp.float32)
        sqrt_1m_abar = jnp.asarray((1.0 - abar) ** 0.5, jnp.float32)

        def step_fn(state: TrainState, batch, rng):
            loss, grads = jax.value_and_grad(diffusion_loss)(
                state.params, self.unet_cfg, sqrt_abar, sqrt_1m_abar, batch, rng
            )
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        # Input shardings come from the committed arrays (see shard_batch);
        # GSPMD propagates them through the step.
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def save_train_state(path: str, state: TrainState) -> None:
    """Persist params + optimizer state + step (flax msgpack — handles the
    optax NamedTuple states). The reference never checkpoints (weights are
    only loaded, SURVEY.md §5); training here is resumable."""
    import os

    from flax import serialization

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "train_state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by save_train_state. ``template`` provides
    the pytree structure (e.g. a freshly Trainer.init()-ed state)."""
    import os

    from flax import serialization

    with open(os.path.join(path, "train_state.msgpack"), "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return jax.tree_util.tree_map(jnp.asarray, restored)


def shard_batch(mesh, batch):
    """Commit batch arrays to the mesh, sharded on "data" along axis 0."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P("data")))

    return jax.tree_util.tree_map(put, batch)
