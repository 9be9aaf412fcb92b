"""Prompt-encoding helpers.

Parity target: /root/reference/models/models.py:7-95 (`encode_prompts`,
`process_input_embeddings`, `attn_list_to_tensor`). These are thin
conveniences over the CLIP text encoder used by the LMD-era image path;
the video pipeline uses TextToVideoPipeline.encode_prompt directly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPTextConfig
from .clip import apply_clip_text


def encode_prompts(
    clip_params,
    clip_cfg: CLIPTextConfig,
    tokenizer,
    prompts: Sequence[str],
    negative_prompt: str = "",
    one_uncond_input_only: bool = False,
):
    """Returns (text_embeddings, uncond_embeddings, cond_embeddings) where
    text_embeddings = concat([uncond; cond]) — the CFG convention the
    reference's 2D path uses."""
    uncond_prompts = [negative_prompt] * (1 if one_uncond_input_only else len(prompts))
    ids = np.stack(
        [np.asarray(tokenizer.encode_padded(p), np.int32) for p in
         list(uncond_prompts) + list(prompts)]
    )
    out = apply_clip_text(clip_params, clip_cfg, jnp.asarray(ids))
    hidden = out["last_hidden_state"]
    n_uncond = len(uncond_prompts)
    uncond, cond = hidden[:n_uncond], hidden[n_uncond:]
    if one_uncond_input_only and len(prompts) > 1:
        uncond = jnp.broadcast_to(uncond, cond.shape)
    return jnp.concatenate([uncond, cond], axis=0), uncond, cond


def process_input_embeddings(input_embeddings):
    """Normalize either (text, uncond, cond) or a stacked [uncond; cond]
    tensor into the tuple form (reference models/models.py:42-71)."""
    if isinstance(input_embeddings, (tuple, list)):
        text, uncond, cond = input_embeddings
        return text, uncond, cond
    n = input_embeddings.shape[0]
    if n % 2:
        raise ValueError("Stacked embeddings must pair uncond/cond")
    uncond, cond = input_embeddings[: n // 2], input_embeddings[n // 2 :]
    return input_embeddings, uncond, cond


def attn_list_to_tensor(cross_attention_probs):
    """Recursively stack nested per-timestep/per-block attention-map lists
    into one array (reference models/models.py:74-86)."""
    if isinstance(cross_attention_probs, (list, tuple)):
        return np.stack([attn_list_to_tensor(x) for x in cross_attention_probs])
    return np.asarray(cross_attention_probs)
