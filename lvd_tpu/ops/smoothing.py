"""Depthwise Gaussian smoothing of attention maps.

Parity target: /root/reference/utils/attn.py:91-157 (`GaussianSmoothing`) and
its use in utils/guidance.py:210-218 (`smooth_attn` with reflect padding).
Functional: the kernel is a compile-time constant; the op is a depthwise
conv over (N, H, W, C) maps.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_2d(kernel_size: int = 3, sigma: float = 0.5) -> np.ndarray:
    """Separable 2D Gaussian, normalized to sum 1 (reference builds it as a
    product of per-dim 1D Gaussians over a meshgrid)."""
    coords = np.arange(kernel_size, dtype=np.float64)
    mean = (kernel_size - 1) / 2.0
    g = np.exp(-(((coords - mean) / sigma) ** 2) / 2.0)
    g = g / (sigma * math.sqrt(2 * math.pi))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def smooth_attn_maps(maps, kernel_size: int = 3, sigma: float = 0.5):
    """maps: (..., H, W) -> same shape, reflect-padded Gaussian blur."""
    orig_shape = maps.shape
    h, w = orig_shape[-2], orig_shape[-1]
    x = maps.reshape(-1, h, w, 1).astype(jnp.float32)
    pad = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    k = jnp.asarray(gaussian_kernel_2d(kernel_size, sigma))[..., None, None]
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y.reshape(orig_shape).astype(maps.dtype)
