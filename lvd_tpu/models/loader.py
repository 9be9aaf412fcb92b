"""Model loading: converted checkpoints from disk, or explicit random init.

The reference pulls weights from the HF hub at runtime
(generation/lvd.py:39-44). Here, checkpoints are converted offline
(models/convert.py CLI) into flat .npz pytrees under a checkpoint root
(``$LVD_CHECKPOINT_ROOT/<preset-checkpoint-name>/{unet,clip,vae}.npz``), and
loaded without the network. Random initialization is an explicit opt-in for
smoke tests and benchmarking (the FLOPs don't care about the weights).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_mod
from ..pipeline import PipelineModels
from ..text.tokenizer import load_tokenizer
from . import clip as clip_mod
from . import unet3d as unet_mod
from . import vae as vae_mod


def flatten_pytree(tree, prefix=""):
    """dict/list pytree -> {path: np.ndarray} with '/'-joined paths."""
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
        return out
    for k, v in items:
        out.update(flatten_pytree(v, f"{prefix}{k}/"))
    return out


def unflatten_pytree(flat: dict):
    """Inverse of flatten_pytree; integer-keyed levels become lists."""
    root: dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


def save_params(path: str, params):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flatten_pytree(jax.device_get(params)))


def load_params(path: str):
    with np.load(path) as data:
        return unflatten_pytree({k: jnp.asarray(v) for k, v in data.items()})


@dataclasses.dataclass
class LoadOptions:
    checkpoint_root: Optional[str] = None
    allow_random_init: bool = False
    seed: int = 0


def _checkpoint_dir(preset: config_mod.ModelPreset, root: Optional[str]):
    root = root or os.environ.get("LVD_CHECKPOINT_ROOT", "")
    if not root or not preset.checkpoint:
        return None
    d = os.path.join(root, preset.checkpoint.replace("/", "--"))
    return d if os.path.isdir(d) else None


def load_pipeline_models(
    preset_name: str, options: Optional[LoadOptions] = None
) -> PipelineModels:
    options = options or LoadOptions(
        allow_random_init=os.environ.get("LVD_ALLOW_RANDOM_WEIGHTS") == "1"
    )
    preset = config_mod.PRESETS[preset_name]
    ckpt = _checkpoint_dir(preset, options.checkpoint_root)

    if ckpt is not None:
        unet_params = load_params(os.path.join(ckpt, "unet.npz"))
        clip_params = load_params(os.path.join(ckpt, "clip.npz"))
        vae_params = load_params(os.path.join(ckpt, "vae.npz"))
        tokenizer = load_tokenizer(ckpt)
    elif options.allow_random_init:
        print(
            f"[lvd_tpu] No checkpoint for {preset_name!r}; using RANDOM weights "
            "(LVD_ALLOW_RANDOM_WEIGHTS=1). Outputs will be noise."
        )
        k = jax.random.split(jax.random.PRNGKey(options.seed), 3)
        unet_params = unet_mod.init_unet3d(k[0], preset.unet)
        clip_params = clip_mod.init_clip_text(k[1], preset.clip)
        vae_params = vae_mod.init_vae(k[2], preset.vae)
        tokenizer = load_tokenizer(None)
    else:
        raise FileNotFoundError(
            f"No converted checkpoint for preset {preset_name!r} under "
            f"LVD_CHECKPOINT_ROOT; run `python -m lvd_tpu.models.convert` on the "
            "HF checkpoint first, or set LVD_ALLOW_RANDOM_WEIGHTS=1 for a "
            "weightless smoke run."
        )

    return PipelineModels(
        preset=preset,
        unet_params=unet_params,
        clip_params=clip_params,
        vae_params=vae_params,
        tokenizer=tokenizer,
    )


def tiny_pipeline_models(seed: int = 0, attention_type: str = "default") -> PipelineModels:
    """Miniature models for CPU tests / CI: full topology, tiny dims."""
    unet_cfg = config_mod.tiny_unet_config(attention_type)
    clip_cfg = config_mod.tiny_clip_config()
    vae_cfg = config_mod.tiny_vae_config()
    preset = config_mod.ModelPreset(
        name="tiny",
        unet=unet_cfg,
        clip=clip_cfg,
        vae=vae_cfg,
        scheduler=config_mod.SchedulerConfig(),
        height=64,
        width=96,
        default_num_frames=4,
        base_attn_dim=(8, 12),
    )
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    return PipelineModels(
        preset=preset,
        unet_params=unet_mod.init_unet3d(k[0], unet_cfg),
        clip_params=clip_mod.init_clip_text(k[1], clip_cfg),
        vae_params=vae_mod.init_vae(k[2], vae_cfg),
        tokenizer=load_tokenizer(None),
    )
