"""Segmentation-map metrics: per-label Dice and HD95.

Parity with `evaluation_scripts/evaluate_models.py:476-549` (BraTS labels
1/2/4): Dice = 2|A∩B| / (|A|+|B|) with the empty-empty convention = 1.0;
HD95 = 95th percentile of symmetric surface distances via
``scipy.ndimage.distance_transform_edt``.
"""

from typing import Dict, Sequence

import numpy as np
from scipy import ndimage

BRATS_LABELS = (1, 2, 4)


def dice_coefficient(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    denom = a.sum() + b.sum()
    if denom == 0:
        return 1.0
    return float(2.0 * np.logical_and(a, b).sum() / denom)


def dice_per_label(
    pred: np.ndarray, target: np.ndarray, labels: Sequence[int] = BRATS_LABELS
) -> Dict[int, float]:
    return {
        int(l): dice_coefficient(pred == l, target == l) for l in labels
    }


def _surface_distances(a: np.ndarray, b: np.ndarray, spacing=None) -> np.ndarray:
    """Distances from a's surface voxels to b's surface (both directions
    handled by the caller)."""
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    # surface = mask minus its erosion
    a_surface = a ^ ndimage.binary_erosion(a)
    b_surface = b ^ ndimage.binary_erosion(b)
    if not a_surface.any() or not b_surface.any():
        return np.asarray([])
    dt_b = ndimage.distance_transform_edt(~b_surface, sampling=spacing)
    return dt_b[a_surface]


def hd95(a: np.ndarray, b: np.ndarray, spacing=None) -> float:
    """95th-percentile symmetric Hausdorff distance. Conventions match the
    reference: both empty → 0.0; exactly one empty → inf."""
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    if not a.any() and not b.any():
        return 0.0
    if not a.any() or not b.any():
        return float("inf")
    d_ab = _surface_distances(a, b, spacing)
    d_ba = _surface_distances(b, a, spacing)
    all_d = np.concatenate([d_ab, d_ba])
    if all_d.size == 0:
        return 0.0
    return float(np.percentile(all_d, 95))


def hd95_per_label(
    pred: np.ndarray, target: np.ndarray, labels: Sequence[int] = BRATS_LABELS,
    spacing=None,
) -> Dict[int, float]:
    return {int(l): hd95(pred == l, target == l, spacing) for l in labels}
