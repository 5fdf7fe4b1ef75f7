"""Pallas TPU kernels with XLA fallbacks (used automatically on CPU)."""

from mrijax.kernels.flash_attention import flash_attention
from mrijax.kernels.groupnorm_pallas import group_norm_silu_pallas
from mrijax.kernels.dispatch import pallas_enabled, disable_pallas

__all__ = [
    "flash_attention",
    "group_norm_silu_pallas",
    "pallas_enabled",
    "disable_pallas",
]
