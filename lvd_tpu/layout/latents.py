"""LMD-era latent blending, composition and alignment (image path).

Parity target: /root/reference/utils/latents.py:8-302. Used by the 2D
semantic-guidance pipeline: per-object latents are generated with separate
seeds, blended into the background noise inside their boxes, denoised
per-object, then the per-step latent histories are composed (largest mask
first) and optionally re-aligned to the overall layout boxes.

Channels-last ((B, H, W, C)); masks are (H, W) float/bool arrays.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rasterize import scale_proportion


def proportion_to_mask(box, h: int, w: int) -> jnp.ndarray:
    x0, y0, x1, y1 = scale_proportion(box, H=h, W=w)
    mask = np.zeros((h, w), np.float32)
    mask[y0:y1, x0:x1] = 1.0
    return jnp.asarray(mask)


def get_unscaled_latents(key, batch_size: int, in_channels: int, height: int,
                         width: int, dtype=jnp.float32):
    """Initial N(0,1) latents at the 8x-downsampled resolution."""
    return jax.random.normal(
        key, (batch_size, height // 8, width // 8, in_channels), jnp.float32
    ).astype(dtype)


def blend_latents(latents_bg, latents_fg, fg_mask, fg_blending_ratio: float = 0.01):
    """Blend independent fg noise into the bg noise inside the mask, with a
    variance-preserving sqrt mix (reference utils/latents.py:33-52)."""
    m = fg_mask[None, :, :, None].astype(jnp.float32)
    mixed = latents_bg.astype(jnp.float32) * float(np.sqrt(1.0 - fg_blending_ratio)) \
        + latents_fg.astype(jnp.float32) * float(np.sqrt(fg_blending_ratio))
    out = latents_bg.astype(jnp.float32) * (1.0 - m) + mixed * m
    return out.astype(latents_bg.dtype)


def binary_mask_to_box_mask(mask) -> jnp.ndarray:
    """Tight bounding-box mask of a binary mask."""
    mask = np.asarray(mask) > 0.5
    if not mask.any():
        return jnp.zeros(mask.shape, jnp.float32)
    ys, xs = np.where(mask)
    out = np.zeros(mask.shape, np.float32)
    out[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1] = 1.0
    return jnp.asarray(out)


def binary_mask_to_center(mask, normalize: bool = True) -> Tuple[float, float]:
    mask = np.asarray(mask, np.float32)
    total = mask.sum()
    if total == 0:
        return 0.5, 0.5
    h, w = mask.shape
    ys = (mask.sum(1) * np.arange(h)).sum() / total
    xs = (mask.sum(0) * np.arange(w)).sum() / total
    if normalize:
        return float(xs / w), float(ys / h)
    return float(xs), float(ys)


def shift_tensor(x, x_offset: float, y_offset: float, offset_normalized: bool = True):
    """Shift the last-two-but-one spatial dims ((..., H, W, C) layout) with
    zero fill. Offsets are normalized fractions of (W, H) when
    ``offset_normalized``."""
    h, w = x.shape[-3], x.shape[-2]
    dx = int(round(x_offset * w)) if offset_normalized else int(round(x_offset))
    dy = int(round(y_offset * h)) if offset_normalized else int(round(y_offset))
    out = jnp.zeros_like(x)
    if abs(dx) >= w or abs(dy) >= h:
        return out
    src_y = slice(max(-dy, 0), h - max(dy, 0))
    src_x = slice(max(-dx, 0), w - max(dx, 0))
    dst_y = slice(max(dy, 0), h - max(-dy, 0))
    dst_x = slice(max(dx, 0), w - max(-dx, 0))
    return out.at[..., dst_y, dst_x, :].set(x[..., src_y, src_x, :])


def shift_mask(mask, x_offset: float, y_offset: float):
    return shift_tensor(mask[..., None], x_offset, y_offset)[..., 0]


def compose_latents(
    latents_all_list: Sequence,   # per-object (T+1, B, h, w, C) latent histories
    mask_tensor_list: Sequence,   # per-object (h, w) masks
    latents_bg,                   # (B, h, w, C) scaled bg noise
    compose_box_to_bg: bool = True,
):
    """Compose per-object latent histories over a background
    (reference utils/latents.py:56-148): largest mask first; the t=0 slot is
    the composed initial noise, later steps only carry masked content.
    Returns (composed_latents (T+1, B, h, w, C), foreground_indices (h, w))."""
    if not latents_all_list:
        raise ValueError("Nothing to compose")
    steps_plus_one = latents_all_list[0].shape[0]
    composed = jnp.zeros(
        (steps_plus_one, *latents_bg.shape), latents_bg.dtype
    ).at[0].set(latents_bg)

    foreground_indices = jnp.zeros(latents_bg.shape[1:3], jnp.int32)

    sizes = np.array([float(np.asarray(m).sum()) for m in mask_tensor_list])
    order = np.argsort(-sizes)

    if compose_box_to_bg:
        for idx in order:
            box_mask = binary_mask_to_box_mask(mask_tensor_list[idx])
            m = box_mask[None, :, :, None].astype(composed.dtype)
            composed = composed.at[0].set(
                composed[0] * (1.0 - m) + latents_all_list[idx][0] * m
            )

    for idx in order:
        mask = jnp.asarray(mask_tensor_list[idx])
        foreground_indices = jnp.where(
            mask > 0.5, jnp.int32(idx + 1), foreground_indices
        )
        m = mask[None, None, :, :, None].astype(composed.dtype)
        composed = composed * (1.0 - m) + latents_all_list[idx] * m

    return composed, foreground_indices


def expand_overall_bboxes(overall_bboxes):
    """Flatten per-phrase box lists into one list (reference utils.utils)."""
    return [box for boxes in overall_bboxes for box in (
        boxes if isinstance(boxes[0], (list, tuple, np.ndarray)) else [boxes]
    )]


def align_with_bboxes(
    latents_all_list, mask_tensor_list, bboxes, horizontal_shift_only: bool = False
):
    """Shift each per-object latent history so its mask center lands on its
    target box center (reference utils/latents.py:151-186)."""
    new_latents, new_masks, offsets = [], [], []
    for latents_all, mask, bbox in zip(latents_all_list, mask_tensor_list, bboxes):
        x_src, y_src = binary_mask_to_center(mask, normalize=True)
        x0, y0, x1, y1 = bbox
        x_off = (x0 + x1) / 2 - x_src
        y_off = 0.0 if horizontal_shift_only else (y0 + y1) / 2 - y_src
        new_latents.append(shift_tensor(latents_all, x_off, y_off))
        new_masks.append(shift_mask(jnp.asarray(mask), x_off, y_off))
        offsets.append((x_off, y_off))
    return new_latents, new_masks, offsets


def compose_latents_with_alignment(
    latents_all_list,
    mask_tensor_list,
    latents_bg,
    align_with_overall_bboxes: bool = True,
    overall_bboxes: Optional[Sequence] = None,
    horizontal_shift_only: bool = False,
    **kwargs,
):
    if align_with_overall_bboxes and len(latents_all_list):
        bboxes = expand_overall_bboxes(overall_bboxes)
        latents_all_list, mask_tensor_list, offsets = align_with_bboxes(
            latents_all_list, mask_tensor_list, bboxes, horizontal_shift_only
        )
    else:
        offsets = [(0.0, 0.0)] * len(latents_all_list)
    composed, fg_indices = compose_latents(
        latents_all_list, mask_tensor_list, latents_bg, **kwargs
    )
    return composed, fg_indices, offsets


def get_input_latents_list(
    in_channels: int,
    bg_seed: int,
    fg_seed_start,
    fg_blending_ratio,
    height: int,
    width: int,
    so_boxes: Sequence,
    init_noise_sigma: float = 1.0,
    dtype=jnp.float32,
) -> Tuple[List, jnp.ndarray]:
    """Per-object blended initial latents + background latents, all scaled by
    the scheduler's init sigma (reference utils/latents.py:225-302)."""
    bg_key = jax.random.PRNGKey(bg_seed)
    latents_bg = get_unscaled_latents(bg_key, 1, in_channels, height, width, dtype)

    out = []
    h, w = height // 8, width // 8
    for idx, box in enumerate(so_boxes):
        fg_seed = (
            fg_seed_start[idx] if isinstance(fg_seed_start, list) else fg_seed_start + idx
        )
        if fg_seed == bg_seed:
            raise ValueError(f"fg seed {fg_seed} must differ from bg seed {bg_seed}")
        fg_mask = proportion_to_mask(box, h, w)
        latents_fg = get_unscaled_latents(
            jax.random.PRNGKey(fg_seed), 1, in_channels, height, width, dtype
        )
        ratio = (
            fg_blending_ratio[idx]
            if isinstance(fg_blending_ratio, list)
            else fg_blending_ratio
        )
        out.append(blend_latents(latents_bg, latents_fg, fg_mask, ratio)
                   * init_noise_sigma)
    return out, latents_bg * init_noise_sigma
