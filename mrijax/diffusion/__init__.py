"""Diffusion processes: schedules, forward process, losses, samplers."""

from mrijax.diffusion.schedules import (
    DiffusionSchedule,
    linear_beta_schedule,
    cosine_beta_schedule,
    make_schedule,
)
from mrijax.diffusion.gaussian import (
    GaussianDiffusion,
    ancestral_segments_for_backend,
)

__all__ = [
    "DiffusionSchedule",
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "make_schedule",
    "GaussianDiffusion",
    "ancestral_segments_for_backend",
]
