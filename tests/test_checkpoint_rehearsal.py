"""Real-weights-path dress rehearsal on a synthesized on-disk checkpoint.

tests/test_convert.py proves the converter's key mapping and transposes on
in-memory dicts; this file exercises the remaining, previously-untested
stretch of the real-weights path (VERDICT r2 item 4): actual `safetensors`
files in an HF-style checkpoint directory, consumed by the real
`python -m lvd_tpu.models.convert` CLI subprocess, then loaded back through
`loader.load_pipeline_models` — the exact flow RUNBOOK.md step 1 prescribes
for `cerspense/zeroscope_v2_576w` (reference weight load:
/root/reference/generation/lvd.py:39-44).
"""

import dataclasses
import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from lvd_tpu.config import (
    PRESETS,
    ModelPreset,
    SchedulerConfig,
    tiny_clip_config,
    tiny_vae_config,
    tiny_unet_config,
)
from lvd_tpu.models import clip as clip_mod
from lvd_tpu.models import unet3d as unet_mod
from lvd_tpu.models import vae as vae_mod
from lvd_tpu.models.loader import flatten_pytree, load_params

from test_convert import (
    _assert_trees_equal,
    _synthesize,
    _torch_key_clip,
    _torch_key_unet,
    _torch_key_vae,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_ckpt_configs():
    # The convert CLI reads model geometry from the HF config.json files;
    # transformer_in_num_heads is not an HF config field (the real
    # checkpoints all use 8), so the synthesized weights must use 8 too.
    unet_cfg = dataclasses.replace(tiny_unet_config(), transformer_in_num_heads=8)
    return unet_cfg, tiny_clip_config(), tiny_vae_config()


def _micro_bpe_files(dirpath):
    vocab = {}

    def add(tok):
        if tok not in vocab:
            vocab[tok] = len(vocab)

    for c in "abcdefghijklmnopqrstuvwxyz0123456789.,!?'-":
        add(c)
        add(c + "</w>")
    merges = [("t", "h"), ("th", "e</w>"), ("b", "e"), ("be", "a"),
              ("bea", "r</w>")]
    for a, b in merges:
        add(a + b)
    add("<|startoftext|>")
    add("<|endoftext|>")
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(dirpath, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")


def _write_checkpoint_dir(root):
    """Synthesize an HF-style checkpoint directory with REAL safetensors
    files (tiny geometry, correct keys/shapes/layouts). Returns the three
    init pytrees the converted output must reproduce bit-for-bit."""
    from safetensors.numpy import save_file

    unet_cfg, clip_cfg, vae_cfg = _tiny_ckpt_configs()
    k = jax.random.split(jax.random.PRNGKey(7), 3)
    unet = jax.device_get(unet_mod.init_unet3d(k[0], unet_cfg))
    clip = jax.device_get(clip_mod.init_clip_text(k[1], clip_cfg))
    vae = jax.device_get(vae_mod.init_vae(k[2], vae_cfg))

    def write(sub, tree, key_fn, weights_name, cfg_json):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        sd = _synthesize(flatten_pytree(tree), key_fn)
        sd = {k_: np.ascontiguousarray(np.asarray(v, np.float32))
              for k_, v in sd.items()}
        save_file(sd, os.path.join(d, weights_name))
        if cfg_json is not None:
            with open(os.path.join(d, "config.json"), "w") as f:
                json.dump(cfg_json, f)

    write("unet", unet, _torch_key_unet, "diffusion_pytorch_model.safetensors", {
        "in_channels": unet_cfg.in_channels,
        "out_channels": unet_cfg.out_channels,
        "block_out_channels": list(unet_cfg.block_out_channels),
        "layers_per_block": unet_cfg.layers_per_block,
        "cross_attention_dim": unet_cfg.cross_attention_dim,
        "attention_head_dim": unet_cfg.attention_head_dim,
        "norm_num_groups": unet_cfg.norm_num_groups,
    })
    write("text_encoder", clip, _torch_key_clip, "model.safetensors", {
        "vocab_size": clip_cfg.vocab_size,
        "hidden_size": clip_cfg.hidden_size,
        "intermediate_size": clip_cfg.intermediate_size,
        "num_hidden_layers": clip_cfg.num_hidden_layers,
        "num_attention_heads": clip_cfg.num_attention_heads,
        "hidden_act": clip_cfg.hidden_act,
    })
    write("vae", vae, _torch_key_vae, "diffusion_pytorch_model.safetensors", {
        "in_channels": vae_cfg.in_channels,
        "out_channels": vae_cfg.out_channels,
        "latent_channels": vae_cfg.latent_channels,
        "block_out_channels": list(vae_cfg.block_out_channels),
        "layers_per_block": vae_cfg.layers_per_block,
        "norm_num_groups": vae_cfg.norm_num_groups,
        "scaling_factor": vae_cfg.scaling_factor,
    })
    _micro_bpe_files(os.path.join(root, "tokenizer"))
    return unet, clip, vae


@pytest.fixture(scope="module")
def converted_checkpoint(tmp_path_factory):
    """Runs the REAL convert CLI subprocess once for the module."""
    tmp = tmp_path_factory.mktemp("ckpt_rehearsal")
    src = str(tmp / "hf_src")
    dst = str(tmp / "converted")
    trees = _write_checkpoint_dir(src)
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, "-m", "lvd_tpu.models.convert",
         "--src", src, "--dst", dst, "--verify"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert result.returncode == 0, result.stdout[-2000:] + result.stderr[-2000:]
    return src, dst, trees, result.stdout


def test_convert_cli_writes_complete_tree(converted_checkpoint):
    _, dst, _, stdout = converted_checkpoint
    for name in ("unet.npz", "clip.npz", "vae.npz", "lvd_tpu_config.json",
                 "vocab.json", "merges.txt"):
        assert os.path.exists(os.path.join(dst, name)), name
    # --verify prints the per-tensor norm audit lines (RUNBOOK step 1).
    assert "torch tensors converted" in stdout


def test_convert_cli_roundtrips_bit_exact(converted_checkpoint):
    _, dst, (unet, clip, vae), _ = converted_checkpoint
    _assert_trees_equal(load_params(os.path.join(dst, "unet.npz")), unet)
    _assert_trees_equal(load_params(os.path.join(dst, "clip.npz")), clip)
    _assert_trees_equal(load_params(os.path.join(dst, "vae.npz")), vae)


def test_convert_cli_config_json_matches(converted_checkpoint):
    _, dst, _, _ = converted_checkpoint
    unet_cfg, clip_cfg, vae_cfg = _tiny_ckpt_configs()
    cfg = json.load(open(os.path.join(dst, "lvd_tpu_config.json")))
    assert tuple(cfg["unet"]["block_out_channels"]) == unet_cfg.block_out_channels
    assert cfg["clip"]["hidden_size"] == clip_cfg.hidden_size
    assert tuple(cfg["vae"]["block_out_channels"]) == vae_cfg.block_out_channels
    assert cfg["vae"]["norm_num_groups"] == vae_cfg.norm_num_groups


def test_loader_consumes_converted_checkpoint(converted_checkpoint, monkeypatch):
    """loader.load_pipeline_models on the converted tree: real BPE tokenizer
    engaged, params identical to the synthesized source, and the loaded
    models drive a CLIP encode through the pipeline."""
    _, dst, (unet, clip, vae), _ = converted_checkpoint
    unet_cfg, clip_cfg, vae_cfg = _tiny_ckpt_configs()

    # Lay the converted tree out under a checkpoint root the loader scans.
    root = os.path.join(os.path.dirname(dst), "ckpt_root")
    target = os.path.join(root, "fake--tiny-rehearsal")
    os.makedirs(root, exist_ok=True)
    if not os.path.exists(target):
        os.symlink(dst, target)

    preset = ModelPreset(
        name="tiny-rehearsal", unet=unet_cfg, clip=clip_cfg, vae=vae_cfg,
        scheduler=SchedulerConfig(), height=64, width=96,
        default_num_frames=4, base_attn_dim=(8, 12),
        checkpoint="fake/tiny-rehearsal",
    )
    monkeypatch.setitem(PRESETS, "tiny-rehearsal", preset)
    monkeypatch.setenv("LVD_CHECKPOINT_ROOT", root)
    monkeypatch.delenv("LVD_ALLOW_RANDOM_WEIGHTS", raising=False)

    from lvd_tpu.models.loader import load_pipeline_models
    from lvd_tpu.text.tokenizer import ClipBpeTokenizer

    models = load_pipeline_models("tiny-rehearsal")
    assert isinstance(models.tokenizer, ClipBpeTokenizer)
    _assert_trees_equal(models.unet_params, unet)
    _assert_trees_equal(models.clip_params, clip)
    _assert_trees_equal(models.vae_params, vae)

    from lvd_tpu.pipeline import TextToVideoPipeline

    pipe = TextToVideoPipeline(models)
    emb = pipe.encode_prompt("the bear", negative_prompt="")
    assert emb.shape == (2, 77, clip_cfg.hidden_size)
    assert np.isfinite(np.asarray(emb)).all()
