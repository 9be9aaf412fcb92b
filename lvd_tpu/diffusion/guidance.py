"""Cross-attention energy guidance, fully vectorized for TPU.

Parity target: /root/reference/utils/guidance.py:154-574
(`add_ca_loss_per_attn_map_to_loss`, `compute_ca_lossv3`) and
/root/reference/models/pipelines.py:21-150 (`latent_backward_guidance`).

Redesign for XLA (SURVEY.md §7): the reference loops in Python over
(key, object, frame, token) and calls `topk` with data-dependent k. Here the
loss is one tensor expression per instrumented key:

* box masks are pre-rasterized host-side (layout/rasterize.GuidancePack),
* token gathers use a padded (O, P) index matrix with a validity mask,
* "mean of top-k with per-(object, frame) k" is computed from a full
  descending sort with a rank < k weight — static shapes, differentiable,
* the guidance step itself is `latents -= sqrt(1-abar_t) * grad(energy)`,
  with the gradient obtained by `jax.grad` through the UNet's functional
  attention outputs.

Supported energy variants (same knobs as the reference): max-based (default),
ratio-based, CE/NLL, attn-sync temporal consistency, BoxDiff corner loss,
center-of-mass position+velocity loss.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Hyperparameters of the CA energy (reference generation/lvd.py:85-105
    keyword defaults; README-recommended values live in the runners)."""

    loss_scale: float = 5.0
    loss_threshold: float = 200.0
    max_iter: int = 5
    max_index_step: int = 10
    fg_top_p: float = 0.75
    bg_top_p: float = 0.75
    fg_weight: float = 1.0
    bg_weight: float = 4.0
    use_ratio_based_loss: bool = False
    use_max_based_loss: bool = True
    attn_sync_weight: float = 0.0
    boxdiff_loss_scale: float = 0.0
    boxdiff_normed: bool = True
    # Corner-band half-width of the BoxDiff loss (reference
    # utils/guidance.py:189,433-465: bands of width 2L+1 around each box
    # x/y extent).
    boxdiff_L: int = 1
    com_loss_scale: float = 0.0
    eps: float = 1e-2
    # Re-softmax of the captured maps over the real prompt tokens only
    # (reference utils/guidance.py:220-222): drop SOT and padding/EOT,
    # rescale by renorm_scale, softmax over the remaining token axis.
    # ``renorm_num_tokens`` is the prompt's true token count INCLUDING
    # SOT/EOT (static per video; the reference reads it from the token map).
    attn_renorm: bool = False
    renorm_scale: float = 2.0
    renorm_num_tokens: int = 0
    # Bilinear upsampling of per-token maps before the energy (reference
    # utils/guidance.py:297-310); masks must be rasterized at the upsampled
    # resolution (make_guidance_pack(upsample_scale=...)).
    upsample_scale: int = 1
    upsample_mode: str = "bilinear"
    # Gaussian smoothing of token attention maps before the energy. Unlike
    # the reference (which blurs over the flattened (HW, token) plane,
    # utils/guidance.py:210-218), smoothing here is applied spatially per
    # token map — the physically meaningful formulation.
    smooth_attn: bool = False
    smooth_kernel_size: int = 3
    smooth_sigma: float = 0.5
    # Rematerialization policy of the energy UNet walk for jax.grad:
    # "selective" checkpoints each layer keeping named attention/conv
    # outputs (lowest memory); "none" saves everything (fastest backward —
    # the cond-only truncated walk's activations fit v5e HBM comfortably).
    energy_remat: str = "none"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _topk_mean_core(values, kf, k_max: int):
    top = jax.lax.top_k(values, k_max)[0]
    ranks = jnp.arange(k_max, dtype=jnp.float32)
    w = (ranks[None] < kf[..., None]).astype(jnp.float32) / jnp.maximum(
        kf[..., None], 1.0
    )
    return (top * w).sum(-1)


def _topk_mean_core_fwd(values, kf, k_max: int):
    top = jax.lax.top_k(values, k_max)[0]
    ranks = jnp.arange(k_max, dtype=jnp.float32)
    w = (ranks[None] < kf[..., None]).astype(jnp.float32) / jnp.maximum(
        kf[..., None], 1.0
    )
    # Per-slice k-th largest value: the inclusion threshold for the backward.
    idx = jnp.clip(kf.astype(jnp.int32) - 1, 0, k_max - 1)
    thresh = jnp.take_along_axis(top, idx[..., None], axis=-1)[..., 0]
    return (top * w).sum(-1), (values, kf, thresh)


def _topk_mean_core_bwd(k_max: int, res, g):
    # d(mean of top-k)/d(values) = [value >= k-th largest] / k — an
    # elementwise compare instead of lax.top_k's scatter backward (which
    # dominated the guided-step profile at 9 ms per call). Ties at the
    # threshold over-select, but every caller feeds `attn * mask` products
    # whose tied entries are the masked-out zeros — their cotangent is
    # killed by the mask product immediately downstream.
    values, kf, thresh = res
    sel = (values >= thresh[..., None]).astype(jnp.float32)
    dv = (
        g[..., None]
        * sel
        / jnp.maximum(kf[..., None], 1.0)
        * (kf[..., None] > 0.0).astype(jnp.float32)
    )
    return dv, jnp.zeros_like(kf)


_topk_mean_core.defvjp(_topk_mean_core_fwd, _topk_mean_core_bwd)


def _topk_mean_desc(values, k, k_max: int = None):
    """Mean of the top-k entries along the last axis, with k a traced
    per-slice integer array broadcastable against values[..., 0].

    values: (..., N); k: broadcastable (...,) int. Returns (...,).

    ``k_max``: static upper bound on every entry of k. When it is smaller
    than N, `lax.top_k` to k_max replaces the full descending sort — cheaper
    forward (partial selection); the backward is a custom threshold rule
    (see _topk_mean_core_bwd), not a scatter.
    """
    n = values.shape[-1]
    k_max = n if k_max is None else min(int(k_max), n)
    kf = jnp.broadcast_to(
        k.astype(jnp.float32), values.shape[:-1]
    )
    return _topk_mean_core(values, kf, k_max)


def _roll_next_frames(x, frame_axis: int, axis_name):
    """x at frame f+1 along ``frame_axis``. The (meaningless) final-frame
    slot is filled with a duplicate of the last frame (unsharded) or zeros
    (sharded, no source shard) — callers must weight it out with
    `_frame_validity`.

    Sharded (axis_name set, frames split across the mesh axis in order): the
    cross-shard boundary frame is fetched from the next shard with one
    `ppermute` — the nearest-neighbour exchange that makes the frame-coupled
    energy terms (attn-sync, CoM velocity) shardable."""
    f = x.shape[frame_axis]
    rest = jax.lax.slice_in_dim(x, 1, f, axis=frame_axis)
    if axis_name is None:
        last = jax.lax.slice_in_dim(x, f - 1, f, axis=frame_axis)
        return jnp.concatenate([rest, last], axis=frame_axis)
    n = jax.lax.axis_size(axis_name)
    first = jax.lax.slice_in_dim(x, 0, 1, axis=frame_axis)
    boundary = jax.lax.ppermute(
        first, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([rest, boundary], axis=frame_axis)


def _frame_validity(n_f: int, axis_name):
    """(F_local,) float mask: 1.0 for frames that have a successor, i.e.
    everything but the *global* last frame."""
    if axis_name is None:
        idx = jnp.arange(n_f)
        total = n_f
    else:
        idx = jax.lax.axis_index(axis_name) * n_f + jnp.arange(n_f)
        total = n_f * jax.lax.axis_size(axis_name)
    return (idx < total - 1).astype(jnp.float32)


def _center_of_mass(x):
    """x: (..., H, W) nonnegative -> (com_h, com_w) each (...,)."""
    h = x.shape[-2]
    w = x.shape[-1]
    total = x.sum((-1, -2)) + 1e-12
    hr = jnp.arange(h, dtype=jnp.float32)
    wr = jnp.arange(w, dtype=jnp.float32)
    com_h = (x.sum(-1) * hr).sum(-1) / total
    com_w = (x.sum(-2) * wr).sum(-1) / total
    return com_h, com_w


def ca_energy_for_key(
    attn,          # (F, heads, HW, L) float32 softmax probs (cond-only)
    masks,         # (O, F, Hk, Wk) float32
    token_indices, # (O, P) int32
    token_mask,    # (O, P) float32
    k_fg,          # (O, F) int32
    k_bg,          # (O, F) int32
    cfg: GuidanceConfig,
    axis_name: str = None,
):
    """CA energy contribution of one instrumented attention layer.

    ``axis_name``: mesh axis when frames are sharded across it (shard_map);
    the frame-coupled terms then exchange their one boundary frame with a
    nearest-neighbour ppermute.

    Returns the scalar sum over objects of per-object losses, each already
    divided by the object's (valid) token count — matching
    add_ca_loss_per_attn_map_to_loss's `loss += obj_loss / len(positions)`.
    """
    n_f, n_heads, hw, _ = attn.shape
    n_obj, n_p = token_indices.shape
    hk, wk = masks.shape[2], masks.shape[3]
    s_up = int(cfg.upsample_scale)
    if s_up != 1:
        assert hk % s_up == 0 and wk % s_up == 0 and (
            (hk // s_up) * (wk // s_up) == hw
        ), f"mask grid {hk}x{wk} not {s_up}x the attn dim {hw}"
    else:
        assert hk * wk == hw, f"mask grid {hk}x{wk} != attn dim {hw}"

    attn = attn.astype(jnp.float32)
    if cfg.attn_renorm:
        # Reference utils/guidance.py:220-222: drop SOT and the tail at/after
        # EOT, rescale, re-softmax over the remaining token axis; gathers
        # below then address the sliced axis (token index - 1).
        nt = int(cfg.renorm_num_tokens)
        assert nt > 2, "attn_renorm needs renorm_num_tokens (prompt length)"
        attn = jax.nn.softmax(attn[..., 1 : nt - 1] * cfg.renorm_scale, axis=-1)
        token_indices = token_indices - 1
    # Gather object-token maps as a one-hot matmul: (F, heads, HW, L) @
    # (L, O*P) -> (F, heads, HW, O*P). jnp.take's backward is a scatter into
    # the full (F, h, HW, L) probs (9 ms per key in the guided-step
    # profile); the matmul's backward is another matmul. Out-of-range
    # indices (renorm shift) produce all-zero rows; token_mask kills them.
    n_l = attn.shape[-1]
    onehot = (
        token_indices.reshape(-1)[None, :] == jnp.arange(n_l)[:, None]
    ).astype(attn.dtype)  # (L, O*P)
    gathered = attn @ onehot
    gathered = gathered.reshape(n_f, n_heads, hw, n_obj, n_p)
    a = jnp.transpose(gathered, (3, 4, 0, 1, 2))  # (O, P, F, h, HW)
    if s_up != 1:
        # Per-token map upsampling (reference utils/guidance.py:297-310).
        method = {"bilinear": "bilinear", "nearest": "nearest"}[
            cfg.upsample_mode
        ]
        a = jax.image.resize(
            a.reshape(n_obj, n_p, n_f, n_heads, hk // s_up, wk // s_up),
            (n_obj, n_p, n_f, n_heads, hk, wk),
            method=method,
        ).reshape(n_obj, n_p, n_f, n_heads, hk * wk)
        hw = hk * wk

    if cfg.smooth_attn:
        from ..ops.smoothing import smooth_attn_maps

        a = smooth_attn_maps(
            a.reshape(n_obj, n_p, n_f, n_heads, hk, wk),
            cfg.smooth_kernel_size,
            cfg.smooth_sigma,
        ).reshape(n_obj, n_p, n_f, n_heads, hw)

    m = masks.reshape(n_obj, 1, n_f, 1, hw)  # (O, 1, F, 1, HW)

    obj_loss = jnp.zeros((n_obj, n_p, n_f), jnp.float32)

    # Static top-k bounds: host-side k values are int(area * top_p) with
    # area <= HW (rasterize.make_guidance_pack), so int(HW * top_p) + 1
    # bounds every traced k. lax.top_k to this bound replaces a full sort.
    kf_max = int(hw * cfg.fg_top_p) + 1
    kb_max = int(hw * cfg.bg_top_p) + 1

    if cfg.use_ratio_based_loss:
        inside = (a * m).sum(-1)                  # (O, P, F, h)
        ratio = inside / (a.sum(-1) + cfg.eps)
        obj_loss = obj_loss + ((1.0 - ratio) ** 2).mean(-1)
    elif cfg.use_max_based_loss:
        kf = jnp.broadcast_to(k_fg[:, None, :, None], a.shape[:-1])
        kb = jnp.broadcast_to(k_bg[:, None, :, None], a.shape[:-1])
        fg_mean = _topk_mean_desc(a * m, kf, kf_max)          # (O, P, F, h)
        bg_mean = _topk_mean_desc(a * (1.0 - m), kb, kb_max)
        obj_loss = obj_loss + cfg.fg_weight * (1.0 - fg_mean).sum(-1)
        obj_loss = obj_loss + cfg.bg_weight * bg_mean.sum(-1)
    else:
        # CE / NLL variant (utils/guidance.py:363-397)
        a_c = jnp.clip(a, cfg.eps, 1.0 - cfg.eps)
        kf = jnp.broadcast_to(k_fg[:, None, :, None], a.shape[:-1])
        kb = jnp.broadcast_to(k_bg[:, None, :, None], a.shape[:-1])
        fg = _topk_mean_via_log(a_c * m, kf, cfg.eps, kf_max)
        bg_mean = _topk_mean_desc(a_c * (1.0 - m), kb, kb_max)
        obj_loss = obj_loss + cfg.fg_weight * fg.sum(-1)
        obj_loss = obj_loss + cfg.bg_weight * (-jnp.log(1.0 - bg_mean)).sum(-1)

    # Temporal consistency between consecutive in-box maps
    # (utils/guidance.py:401-430): masked MSE between frame f and f+1 maps
    # over frame-f's box, averaged over box area.
    if cfg.attn_sync_weight != 0.0:
        a_next = _roll_next_frames(a, 2, axis_name)
        area = m.sum(-1) + 1e-6                  # (O, 1, F, 1)
        sync = (((a - a_next) ** 2) * m).sum(-1) / area
        sync = sync.sum(-1)                      # sum over heads -> (O, P, F)
        # the (globally) last frame has no successor
        obj_loss = obj_loss + cfg.attn_sync_weight * sync * _frame_validity(
            n_f, axis_name
        )

    if cfg.boxdiff_loss_scale > 0.0 or cfg.com_loss_scale > 0.0:
        a2d = a.reshape(n_obj, n_p, n_f, n_heads, hk, wk)
        m2d = masks[:, None, :, None]            # (O, 1, F, 1, Hk, Wk)

    if cfg.boxdiff_loss_scale > 0.0:
        # Corner constraint (BoxDiff, utils/guidance.py:433-465) with corner
        # bands of width 1 around box x/y extents.
        corner_x, corner_y = _corner_bands(
            masks, band=int(cfg.boxdiff_L)
        )  # (O, F, Wk), (O, F, Hk)
        ca_max_x = a2d.max(-2)                    # (O, P, F, h, Wk)
        ca_max_y = a2d.max(-1)                    # (O, P, F, h, Hk)
        m_max_x = m2d.max(-2)                     # (O, 1, F, 1, Wk)
        m_max_y = m2d.max(-1)
        dx = jnp.abs(ca_max_x - m_max_x) * corner_x[:, None, :, None]
        dy = jnp.abs(ca_max_y - m_max_y) * corner_y[:, None, :, None]
        if cfg.boxdiff_normed:
            cc = dx.mean((-1, -2)) + dy.mean((-1, -2))
        else:
            cc = dx.sum((-1, -2)) + dy.sum((-1, -2))
        obj_loss = obj_loss + cfg.boxdiff_loss_scale * cc

    if cfg.com_loss_scale > 0.0:
        # Center-of-mass position and velocity control
        # (utils/guidance.py:467-522).
        present = (masks.sum((-1, -2)) > 0).astype(jnp.float32)  # (O, F)
        com_a_h, com_a_w = _center_of_mass(a2d)       # (O, P, F, h)
        com_m_h, com_m_w = _center_of_mass(masks)     # (O, F)
        pos = (com_a_h - com_m_h[:, None, :, None]) ** 2 + (
            com_a_w - com_m_w[:, None, :, None]
        ) ** 2
        pos = pos.mean(-1) * present[:, None, :]
        obj_loss = obj_loss + cfg.com_loss_scale * pos

        # velocity: difference of CoMs between consecutive frames; the CoM
        # values are tiny (O, P, F, h) tensors, so the cross-shard exchange
        # moves a few hundred bytes, not attention maps.
        nxt = lambda x: _roll_next_frames(x, 2, axis_name)   # (O, P, F, h)
        nxt_m = lambda x: _roll_next_frames(x, 1, axis_name)  # (O, F)
        v_a_h = nxt(com_a_h) - com_a_h
        v_a_w = nxt(com_a_w) - com_a_w
        v_m_h = nxt_m(com_m_h) - com_m_h
        v_m_w = nxt_m(com_m_w) - com_m_w
        # valid only when this frame and its successor are both present and a
        # successor exists globally (zeroed boundary slots never contribute)
        both = present * nxt_m(present) * _frame_validity(n_f, axis_name)
        vel = (v_a_h - v_m_h[:, None, :, None]) ** 2 + (
            v_a_w - v_m_w[:, None, :, None]
        ) ** 2
        vel = vel.mean(-1) * both[:, None, :]
        obj_loss = obj_loss + cfg.com_loss_scale * vel

    # Sum over frames; masked-sum over tokens; normalize per object by its
    # valid token count; sum over objects.
    per_obj = (obj_loss.sum(-1) * token_mask).sum(-1)   # (O,)
    counts = jnp.maximum(token_mask.sum(-1), 1.0)
    return (per_obj / counts).sum()


def _topk_mean_via_log(values, k, eps, k_max: int = None):
    """-log of top-k values, meaned: used by the CE variant."""
    n = values.shape[-1]
    k_max = n if k_max is None else min(int(k_max), n)
    if k_max < n:
        top = jax.lax.top_k(values, k_max)[0]
    else:
        top = -jnp.sort(-values, axis=-1)
    ranks = jnp.arange(k_max, dtype=jnp.int32)
    w = (ranks[None] < k[..., None]).astype(jnp.float32) / jnp.maximum(
        k.astype(jnp.float32)[..., None], 1.0
    )
    return (-jnp.log(jnp.clip(top, eps, None)) * w).sum(-1)


def _corner_bands(masks, band: int = 1):
    """Per-(object, frame) indicator bands around box x/y extents, derived
    from the rasterized masks (differentiable inputs not needed)."""
    proj_x = masks.max(-2)  # (O, F, W)
    proj_y = masks.max(-1)  # (O, F, H)

    def band_of(proj):
        # edge = positions where the projected indicator changes
        padded = jnp.pad(proj, ((0, 0), (0, 0), (1, 1)))
        edges = jnp.abs(padded[..., 1:] - padded[..., :-1])  # (O,F,N+1)
        edge_pos = jnp.maximum(edges[..., :-1], edges[..., 1:])  # (O,F,N)
        # dilate by `band`
        out = edge_pos
        for _ in range(band):
            out = jnp.maximum(
                out,
                jnp.maximum(
                    jnp.pad(out[..., 1:], ((0, 0), (0, 0), (0, 1))),
                    jnp.pad(out[..., :-1], ((0, 0), (0, 0), (1, 0))),
                ),
            )
        return out

    return band_of(proj_x), band_of(proj_y)


def compute_ca_energy(
    aux: Dict[Tuple, jnp.ndarray],
    pack,  # layout/rasterize.GuidancePack (mask arrays already on device ok)
    guidance_attn_keys: Sequence[Tuple],
    cfg: GuidanceConfig,
    axis_name: str = None,
):
    """Total CA energy over instrumented keys (reference compute_ca_lossv3):
    sum of per-key losses normalized by (num_objects * num_keys).

    ``axis_name``: set when frames are sharded over a mesh axis (shard_map):
    per-frame contributions psum into the global energy, and the
    frame-coupled loss terms (attn-sync, center-of-mass velocity) exchange
    their single boundary frame with a nearest-neighbour ppermute."""
    keys = [tuple(k) for k in guidance_attn_keys]
    num_objects = pack.token_indices.shape[0]  # static under jit
    if num_objects == 0 or not keys:
        return jnp.float32(0.0)
    loss = jnp.float32(0.0)
    for key in keys:
        loss = loss + ca_energy_for_key(
            aux[key],
            jnp.asarray(pack.masks[key]),
            jnp.asarray(pack.token_indices),
            jnp.asarray(pack.token_mask),
            jnp.asarray(pack.k_fg[key]),
            jnp.asarray(pack.k_bg[key]),
            cfg,
            axis_name=axis_name,
        )
    if axis_name is not None:
        loss = jax.lax.psum(loss, axis_name)
    return loss / (num_objects * len(keys))
