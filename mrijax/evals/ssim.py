"""SSIM and MS-SSIM in JAX (channels-last), torchmetrics-compatible math.

Used for the gen-vs-gen diversity statistic (`slice_cond_2d_ddpm/
metrics.py:419-443` uses SSIM; `evaluation_scripts/metrics.py` uses
MS-SSIM). Standard parameters: 11×11 Gaussian window σ=1.5,
C1=(0.01·L)², C2=(0.03·L)²; MS-SSIM weights (0.0448, 0.2856, 0.3001,
0.2363, 0.1333) with 2× average-pool between scales.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2d_separable(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode separable filtering of (B, H, W, C)."""
    k = win.shape[0]
    c = x.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    # depthwise: feature_group_count = C, kernel (kh, kw, 1, C)
    ky = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kx = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x, ky, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    out = jax.lax.conv_general_dilated(
        out, kx, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return out


def _ssim_components(
    a: jnp.ndarray, b: jnp.ndarray, data_range: float, win_size: int, sigma: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel (ssim_map, contrast_sensitivity_map), both (B, H', W', C)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    win = _gaussian_window(win_size, sigma)
    mu_a = _filter2d_separable(a, win)
    mu_b = _filter2d_separable(b, win)
    mu_aa = _filter2d_separable(a * a, win)
    mu_bb = _filter2d_separable(b * b, win)
    mu_ab = _filter2d_separable(a * b, win)
    var_a = mu_aa - mu_a**2
    var_b = mu_bb - mu_b**2
    cov = mu_ab - mu_a * mu_b
    cs = (2 * cov + c2) / (var_a + var_b + c2)
    ssim_map = ((2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)) * cs
    return ssim_map, cs


@partial(jax.jit, static_argnames=("win_size",))
def ssim(a, b, *, data_range: float = 2.0, win_size: int = 11, sigma: float = 1.5):
    """Mean SSIM per batch element. a, b: (B, H, W, C) → (B,)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    ssim_map, _ = _ssim_components(a, b, data_range, win_size, sigma)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


@partial(jax.jit, static_argnames=("win_size", "levels"))
def ms_ssim(
    a, b, *, data_range: float = 2.0, win_size: int = 11, sigma: float = 1.5,
    levels: int = 5,
):
    """Multi-scale SSIM, (B, H, W, C) → (B,). Needs H, W ≥ win_size·2^(levels−1)
    (drop levels for small images)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = weights / weights.sum()
    vals = []
    for i in range(levels):
        ssim_map, cs_map = _ssim_components(a, b, data_range, win_size, sigma)
        if i == levels - 1:
            vals.append(jnp.clip(jnp.mean(ssim_map, axis=(1, 2, 3)), 0.0))
        else:
            vals.append(jnp.clip(jnp.mean(cs_map, axis=(1, 2, 3)), 0.0))
            a = _avg_pool2(a)
            b = _avg_pool2(b)
    stacked = jnp.stack(vals, axis=0)  # (levels, B)
    return jnp.prod(stacked ** weights[:, None], axis=0)
