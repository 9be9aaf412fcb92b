"""Functional CLIP text encoder (HF `CLIPTextModel` architecture).

The stage-2 models condition on the final hidden states of an OpenCLIP ViT-H
text tower (hidden 1024); GLIGEN phrase embeddings use the pooled output
(reference controllable_pipeline:756-763). Implemented as a pure function of
a param pytree, channels-last, causal-masked pre-LN transformer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CLIPTextConfig
from ..ops.basic import layer_norm, linear


def _init_linear(rng, din, dout):
    return {
        "w": jax.random.normal(rng, (din, dout), jnp.float32) * din ** -0.5,
        "b": jnp.zeros((dout,), jnp.float32),
    }


def _init_norm(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def init_clip_text(rng, cfg: CLIPTextConfig, with_projection: bool = False):
    keys = iter(jax.random.split(rng, 16 + 8 * cfg.num_hidden_layers))
    params = {
        "token_embedding": jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.hidden_size), jnp.float32
        )
        * 0.02,
        "position_embedding": jax.random.normal(
            next(keys), (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32
        )
        * 0.02,
        "final_layer_norm": _init_norm(cfg.hidden_size),
        "layers": [],
    }
    if with_projection:
        # CLIPTextModelWithProjection (SDXL text encoders): bias-free
        # projection of the pooled output.
        params["text_projection"] = {
            "w": jax.random.normal(
                next(keys), (cfg.hidden_size, cfg.projection_dim), jnp.float32
            )
            * cfg.hidden_size ** -0.5
        }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append(
            {
                "layer_norm1": _init_norm(cfg.hidden_size),
                "q_proj": _init_linear(next(keys), cfg.hidden_size, cfg.hidden_size),
                "k_proj": _init_linear(next(keys), cfg.hidden_size, cfg.hidden_size),
                "v_proj": _init_linear(next(keys), cfg.hidden_size, cfg.hidden_size),
                "out_proj": _init_linear(next(keys), cfg.hidden_size, cfg.hidden_size),
                "layer_norm2": _init_norm(cfg.hidden_size),
                "fc1": _init_linear(next(keys), cfg.hidden_size, cfg.intermediate_size),
                "fc2": _init_linear(next(keys), cfg.intermediate_size, cfg.hidden_size),
            }
        )
    return params


def _attn(p, x, num_heads, causal_bias):
    b, s, d = x.shape
    hd = d // num_heads

    def heads(t):
        return t.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)

    q = heads(linear(p["q_proj"], x))
    k = heads(linear(p["k_proj"], x))
    v = heads(linear(p["v_proj"], x))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * jnp.float32(hd ** -0.5) + causal_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    return linear(p["out_proj"], out)


def _act(x, kind: str):
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(kind)


def apply_clip_text(
    params,
    cfg: CLIPTextConfig,
    input_ids,
    eos_token_id: int = 49407,
    return_penultimate: bool = False,
):
    """input_ids: (B, L) int32 -> dict with last_hidden_state (B, L, D),
    pooler_output (B, D) (hidden state at the first eos position),
    optionally penultimate_hidden_state (SDXL conditions on it) and
    text_embeds (projected pooled output, when the params carry a
    text_projection)."""
    b, s = input_ids.shape
    x = params["token_embedding"][input_ids] + params["position_embedding"][None, :s]

    causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]

    penultimate = None
    for i, layer in enumerate(params["layers"]):
        if return_penultimate and i == len(params["layers"]) - 1:
            penultimate = x
        h = layer_norm(layer["layer_norm1"], x, cfg.layer_norm_eps)
        x = x + _attn(layer, h, cfg.num_attention_heads, causal)
        h = layer_norm(layer["layer_norm2"], x, cfg.layer_norm_eps)
        x = x + linear(layer["fc2"], _act(linear(layer["fc1"], h), cfg.hidden_act))

    x = layer_norm(params["final_layer_norm"], x, cfg.layer_norm_eps)

    # Pool at the first eos token (HF CLIPTextModel pooler semantics).
    is_eos = (input_ids == eos_token_id).astype(jnp.int32)
    # argmax returns the first maximal element -> first eos position.
    eos_pos = jnp.argmax(is_eos, axis=-1)
    pooled = x[jnp.arange(b), eos_pos]
    out = {"last_hidden_state": x, "pooler_output": pooled}
    if penultimate is not None:
        out["penultimate_hidden_state"] = penultimate
    if "text_projection" in params:
        out["text_embeds"] = linear(params["text_projection"], pooled)
    return out
