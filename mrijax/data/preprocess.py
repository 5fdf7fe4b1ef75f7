"""Jit-compiled preprocessing pipeline (normalization, resize, crop, pad).

The reference normalizes on the host with numpy per slice/volume
(`slice_cond_2d_ddpm/dataset.py:73-95`, `ddpm_3d_ldm/dataset.py:11-41`);
here the same math is a fused XLA program that runs on device — decode NIfTI
bytes on the host, then one jitted call takes raw voxels to model-ready
[-1, 1] tensors.

Math parity (verified by tests/test_preprocess.py against the reference
formulas):

* ``zscore_nonzero``: z-score over the nonzero mask (fallback: all elements
  when the mask is empty) → clip to ±5 → map [-5, 5] → [-1, 1]. The 2D
  pipeline does this per slice; the 3D pipeline per volume.
  Reference: `slice_cond_2d_ddpm/dataset.py:73-83` (slice),
  `ddpm_3d_ldm/dataset.py:11-41` (volume, incl. empty-mask fallback).
* ``preprocess_slice``: normalize → bilinear resize (align_corners=False
  half-pixel convention) to ``image_size``² — `dataset.py:86-95`.
* 3D: symmetric zero-pad to ≥ patch (`_pad_to_min_shape`,
  `ddpm_3d_ldm/dataset.py:44-75`) then random (train) / center (val) crop
  (`_random_or_center_crop`, :78-105).

The boolean nonzero mask is data-dependent — implemented with ``jnp.where``
masked sums so everything stays jittable with static shapes.
"""

from functools import partial

from typing import Optional

import jax
import jax.numpy as jnp

from mrijax.ops.resize import resize_bilinear


def zscore_nonzero(
    x: jnp.ndarray, axes=None, eps: Optional[float] = 1e-6
) -> jnp.ndarray:
    """Z-score the nonzero elements *in place* (zeros stay zero), clip ±5,
    rescale to [-1, 1].

    Exact reference semantics — the two families differ in one branch:
    * statistics over the nonzero mask; only masked values are z-scored —
      background voxels remain 0, which maps to 0 after [-5,5] → [-1,1];
    * degenerate-std handling: the 3D path replaces ``std < eps`` with 1.0
      (`ddpm_3d_ldm/dataset.py:11-41`); the 2D/2.5D path replaces only
      ``std == 0`` (`slice_cond_2d_ddpm/dataset.py:78` uses
      ``std if std > 0``) — pass ``eps=None`` for that branch;
    * with an empty mask, *all* elements are z-scored (3D fallback path;
      the 2D reference leaves the slice untouched, which is identical for
      the only realizable all-zero-slice case).

    ``axes``: reduction axes (None = all). Jittable: the data-dependent mask
    is a ``jnp.where`` select, shapes stay static.
    """
    xf = x.astype(jnp.float32)
    if axes is None:
        axes = tuple(range(xf.ndim))
    mask = (xf != 0).astype(jnp.float32)
    count = jnp.sum(mask, axis=axes, keepdims=True)
    has_nonzero = count > 0

    def fix_std(s):
        if eps is None:  # 2D/2.5D branch: replace only an exactly-zero std
            return jnp.where(s > 0.0, s, 1.0)
        return jnp.where(s < eps, 1.0, s)

    mean_m = jnp.sum(xf * mask, axis=axes, keepdims=True) / jnp.maximum(count, 1.0)
    var_m = jnp.sum(jnp.square(xf - mean_m) * mask, axis=axes, keepdims=True) / (
        jnp.maximum(count, 1.0)
    )
    std_m = fix_std(jnp.sqrt(var_m))

    mean_a = jnp.mean(xf, axis=axes, keepdims=True)
    std_a = fix_std(jnp.std(xf, axis=axes, keepdims=True))

    z_masked = jnp.where(mask > 0, (xf - mean_m) / std_m, 0.0)
    z_all = (xf - mean_a) / std_a
    z = jnp.where(has_nonzero, z_masked, z_all)
    z = jnp.clip(z, -5.0, 5.0)
    # [-5, 5] → [0, 1] → [-1, 1] collapses to z/5 (dataset.py:79-83).
    return z / 5.0


@partial(jax.jit, static_argnames=("image_size",))
def preprocess_slice(sl: jnp.ndarray, image_size: int = 128) -> jnp.ndarray:
    """Raw (H, W) slice → normalized, resized (image_size, image_size) in
    [-1, 1]. Matches the reference per-slice pipeline exactly
    (`slice_cond_2d_ddpm/dataset.py:73-95`)."""
    z = zscore_nonzero(sl, eps=None)  # 2D branch: replace only std == 0
    z = z[None, :, :, None]  # (1, H, W, 1) channels-last
    out = resize_bilinear(z, (image_size, image_size))
    return out[0, :, :, 0]


@partial(jax.jit, static_argnames=("image_size",))
def preprocess_slice_batch(slices: jnp.ndarray, image_size: int = 128) -> jnp.ndarray:
    """(N, H, W) raw slices → (N, S, S); per-slice statistics (vmapped)."""
    z = jax.vmap(lambda s: zscore_nonzero(s, eps=None))(slices)
    z = z[..., None]  # (N, H, W, 1)
    out = resize_bilinear(z, (image_size, image_size))
    return out[..., 0]


@jax.jit
def normalize_volume(vol: jnp.ndarray) -> jnp.ndarray:
    """Per-volume nonzero z-score → [-1, 1] for a (..., D, H, W)-shaped or any
    single-volume array. Statistics over the whole array
    (`ddpm_3d_ldm/dataset.py:11-41`)."""
    return zscore_nonzero(vol)


def pad_volume_to_min(vol, min_shape):
    """Symmetric zero-pad trailing spatial dims up to ``min_shape``
    (before = total // 2) — `ddpm_3d_ldm/dataset.py:44-75`. Host-side numpy
    friendly (shapes vary per subject, so this runs pre-batching)."""
    import numpy as np

    vol = np.asarray(vol)
    nd = len(min_shape)
    pads = [(0, 0)] * (vol.ndim - nd)
    for cur, tgt in zip(vol.shape[-nd:], min_shape):
        p = max(tgt - cur, 0)
        pads.append((p // 2, p - p // 2))
    if any(p != (0, 0) for p in pads):
        vol = np.pad(vol, pads)
    return vol


def crop_volume(vol, patch_shape, *, rng=None):
    """Random (rng given) or center crop of trailing spatial dims to
    ``patch_shape`` — `ddpm_3d_ldm/dataset.py:78-105`. Host-side."""
    import numpy as np

    vol = np.asarray(vol)
    nd = len(patch_shape)
    lead = vol.ndim - nd
    starts = []
    for cur, tgt in zip(vol.shape[lead:], patch_shape):
        extra = cur - tgt
        if extra < 0:
            raise ValueError(f"volume dim {cur} < patch dim {tgt}; pad first")
        if rng is not None:
            starts.append(int(rng.integers(0, extra + 1)))
        else:
            starts.append(extra // 2)
    slices = [slice(None)] * lead + [
        slice(s, s + t) for s, t in zip(starts, patch_shape)
    ]
    return vol[tuple(slices)]
