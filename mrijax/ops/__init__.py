"""Core tensor ops used across models (TPU-first, channels-last)."""

from mrijax.ops.embeddings import sinusoidal_time_embedding
from mrijax.ops.norms import group_norm, group_norm_silu
from mrijax.ops.resize import resize_bilinear, center_crop_to
from mrijax.ops.attention import multi_head_self_attention

__all__ = [
    "sinusoidal_time_embedding",
    "group_norm",
    "group_norm_silu",
    "resize_bilinear",
    "center_crop_to",
    "multi_head_self_attention",
]
