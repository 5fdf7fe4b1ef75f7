"""Pallas TPU kernels with XLA fallbacks (used automatically on CPU)."""

from mrijax.kernels.flash_attention import flash_attention

__all__ = ["flash_attention"]
