"""Spatial resize and crop helpers (channels-last).

``resize_bilinear`` matches ``torch.nn.functional.interpolate(mode="bilinear",
align_corners=False)`` — the half-pixel convention — which the reference data
pipeline uses for every slice (`slice_cond_2d_ddpm/dataset.py:86-95`) and the
2D UNet uses for up-path shape fixups (`slice_cond_2d_ddpm/unet.py:102-103`).
``jax.image.resize(method="linear")`` implements the same half-pixel
convention.

``center_crop_to`` reproduces the 3D UNet's skip-connection center crop on
shape mismatch (`ddpm_3d_ldm/unet.py:142-151`).
"""

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_spatial) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C) [or (B, D, H, W, C) trilinear] to
    ``out_spatial`` (tuple matching the number of spatial dims)."""
    b = x.shape[0]
    c = x.shape[-1]
    out_shape = (b, *out_spatial, c)
    # antialias=False: torch's interpolate does plain (non-antialiased)
    # bilinear gather even when downsampling; jax defaults to antialiased.
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def center_crop_to(x: jnp.ndarray, target_spatial) -> jnp.ndarray:
    """Center-crop the spatial dims of (B, *spatial, C) to ``target_spatial``.

    Offsets use floor((cur - target) / 2), matching the reference's
    ``dz = (skip - h) // 2`` crop.
    """
    spatial = x.shape[1:-1]
    if tuple(spatial) == tuple(target_spatial):
        return x
    slices = [slice(None)]
    for cur, tgt in zip(spatial, target_spatial):
        if tgt > cur:
            raise ValueError(
                f"center_crop_to: target {tuple(target_spatial)} exceeds "
                f"current spatial {tuple(spatial)} — pad first "
                "(pad_to_min_spatial)"
            )
        off = (cur - tgt) // 2
        slices.append(slice(off, off + tgt))
    slices.append(slice(None))
    return x[tuple(slices)]


def pad_to_min_spatial(x: jnp.ndarray, min_spatial) -> jnp.ndarray:
    """Symmetric zero-pad spatial dims of (B, *spatial, C) up to ``min_spatial``
    (before-pad = total // 2), matching `ddpm_3d_ldm/dataset.py:44-75`."""
    spatial = x.shape[1:-1]
    pads = [(0, 0)]
    for cur, tgt in zip(spatial, min_spatial):
        p = max(tgt - cur, 0)
        pads.append((p // 2, p - p // 2))
    pads.append((0, 0))
    return jnp.pad(x, pads)
