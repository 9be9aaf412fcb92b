"""Multi-head attention with an optional attention-probability output.

This is the TPU-native replacement for the reference's instrumented
`Attention`/`AttnProcessor` (models/attention_processor.py:333-593): instead
of mutating a `save_attn_to_dict` inside a processor object, attention maps
are *functional outputs* — callers request them and get them returned, which
is what makes `jax.grad` through the cross-attention energy trivial.

Two paths:
  * `attention(...)`: XLA einsum attention (flash-fused by Mosaic/XLA when
    profitable) or the Pallas flash kernel (ops/pallas_attention.py) when
    enabled and applicable.
  * `attention(..., return_probs=True)`: materializes softmax probabilities
    (needed only at the 6 instrumented guidance layers whose key-length is
    77 text tokens, so the materialized map is small: HW x 77 per head).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .basic import linear

import os

# Kill-switch for the fused/chunked attention paths (debugging).
_DISABLE_FUSED = os.environ.get("LVD_DISABLE_FLASH") == "1"
# Opt-in switch for the Pallas projection linears around the attention
# kernels (ops/linear_fused.py; routed only on TPU via supported()).
# MEASURED REJECTION as the default (round 5, flagship bench): ON 17.893
# s/video vs OFF 17.599 — the resident kernel removes ~2 GB/fwd of
# Pallas-boundary relayout copies (HLO census) but its per-site slowdown
# vs the XLA dot (tools/sweep_linear_layout.py: L0 0.354 vs 0.282 ms) and
# its custom-VJP backward in the guided update cost more than the copies
# save. Kept as an experiment switch.
_FUSED_LINEAR = os.environ.get("LVD_FUSED_LINEAR") == "1"

# The projected-attention entry points route every non-captured attention
# through the head-packed Pallas kernels: long keys (spatial self-attention,
# up to 4096 tokens) tile queries against VMEM-resident K/V — materializing
# (S, S) probs there is the reference's OOM — and short keys (77-token text
# cross-attention, low-res self-attention) use the padded-K/V kernel, whose
# XLA alternative writes (B, H, S_q, S_k) f32 probs to HBM. The raw-sdpa
# helper keeps the einsum path for short keys (it has no head-packed inputs).
_FUSED_MIN_KEY_LEN = 256
_PACKED_MAX_SHORT_KEY = 256


def _split_heads(x, num_heads: int):
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    x = x.transpose(0, 2, 1, 3)  # (B, S, H, D)
    return x.reshape(x.shape[0], x.shape[1], -1)


def sdpa(q, k, v, scale: Optional[float] = None, return_probs: bool = False,
         probs_transform=None):
    """Scaled dot-product attention over (B, H, S, D) tensors.

    Softmax statistics accumulate in float32 regardless of input dtype.

    ``probs_transform``: optional fn (B, H, S_q, S_k) probs -> probs applied
    between softmax and the PV contraction (forces the materializing path).
    The probs returned under ``return_probs`` are the PRE-transform maps,
    matching the reference's ``attention_probs_before_process``
    (attention_processor.py:521-534).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if (
        not return_probs
        and probs_transform is None
        and not _DISABLE_FUSED
        and k.shape[-2] >= _FUSED_MIN_KEY_LEN
    ):
        from . import pallas_attention

        return pallas_attention.attention_bh(q, k, v, scale), None
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    probs = jax.nn.softmax(logits, axis=-1)
    used = probs if probs_transform is None else probs_transform(probs)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", used.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    return out, (probs if return_probs else None)


def attention(
    p,
    hidden_states,
    encoder_hidden_states=None,
    num_heads: int = 8,
    return_probs: bool = False,
    probs_transform=None,
):
    """Projected multi-head attention (diffusers `Attention` semantics:
    bias-free q/k/v, output projection with bias).

    hidden_states: (B, S_q, C); encoder_hidden_states: (B, S_k, C_enc) or
    None for self-attention. Returns (out, probs|None) with probs
    (B, heads, S_q, S_k) in float32.

    ``probs_transform``: optional in-flight attention-probability edit (the
    reference's ``attn_process_fn`` hook, attention_processor.py:441,
    521-532): probs -> probs, applied before the PV contraction. Setting it
    routes this site through the materializing path; captured probs stay
    pre-transform (reference semantics).
    """
    context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
    short_key = context.shape[-2] < _FUSED_MIN_KEY_LEN
    fused_path = (
        not return_probs
        and probs_transform is None
        and not _DISABLE_FUSED
        # Long keys always use the fused/chunked path (the einsum would
        # materialize (S, S) probs — the reference's OOM). Short keys only
        # benefit from it on TPU (Pallas kernel); off-TPU the small einsum
        # is faster than the chunked scan.
        and (not short_key or jax.default_backend() == "tpu")
    )
    in_lin = linear
    if fused_path and _FUSED_LINEAR:
        # q/k/v feed the Pallas attention kernels directly; the resident
        # Pallas linear emits their pinned default layout without the
        # relayout copy XLA's preferred dot layout would force (PERF.md
        # round-4 census; see linear_fused.py). Engaged ONLY on the fused
        # path: the captured/probs einsum prefers XLA's own layouts.
        from . import linear_fused

        if linear_fused.supported(p["to_q"]["w"], hidden_states):
            in_lin = linear_fused.maybe_linear
    q = in_lin(p["to_q"], hidden_states)
    k = in_lin(p["to_k"], context)
    v = in_lin(p["to_v"], context)
    if fused_path:
        # Head-packed fused path: q/k/v stay (B, S, H*D) end to end — no
        # (B*H, S, D) relayouts in HBM around the kernel. attention_packed
        # picks the short-key (VMEM-resident padded K/V) or long-key
        # (query-tiled) kernel.
        from . import pallas_attention

        d = q.shape[-1] // num_heads
        out = pallas_attention.attention_packed(q, k, v, d ** -0.5, num_heads)
        out_lin = linear
        if _FUSED_LINEAR:
            # The out-projection sits directly on a Pallas boundary: XLA's
            # preferred {1,0,2} dot layout forces an 88.5 MB relayout copy
            # per L0 site against the kernel's pinned default layout
            # (round-4 HLO census, PERF.md). The resident-weights Pallas
            # linear emits the default layout natively.
            from . import linear_fused

            if linear_fused.supported(p["to_out"]["w"], out):
                out_lin = linear_fused.linear
        return out_lin(p["to_out"], out), None
    out, probs = sdpa(
        _split_heads(q, num_heads),
        _split_heads(k, num_heads),
        _split_heads(v, num_heads),
        return_probs=return_probs,
        probs_transform=probs_transform,
    )
    out = _merge_heads(out)
    return linear(p["to_out"], out), probs
