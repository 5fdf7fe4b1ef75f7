"""Beta schedules and precomputed diffusion constants.

Parity targets (math, not code):
* linear schedule β: 1e-4 → 2e-2 over T steps — reference 2D/2.5D diffusion
  (`slice_cond_2d_ddpm/diffusion.py:23`).
* cosine schedule (Nichol & Dhariwal, s=0.008, β clamped to [1e-8, 0.999]) —
  reference 3D latent diffusion (`ddpm_3d_ldm/diffusion.py:50-56`).
* derived buffers (ᾱ, √ᾱ, √(1-ᾱ), √(1/α), SNR, posterior variance and its
  clipped log) — `slice_cond_2d_ddpm/diffusion.py:30-49`.

All constants are float32 jnp arrays stored in a pytree-registered dataclass
so a schedule can be closed over by (or passed into) jitted functions. The
constants themselves are computed host-side in float64 (they're tiny (T,)
vectors built once) so the stored fp32 values are correctly rounded — the
reference accumulates cumprod in fp32, which drifts by ~1e-4 relative by
t=T; we don't replicate that drift.
"""

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


def linear_beta_schedule(
    timesteps: int, beta_start: float = 1e-4, beta_end: float = 0.02
) -> np.ndarray:
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0.0, float(timesteps), steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 1e-8, 0.999)


@struct.dataclass
class DiffusionSchedule:
    """Precomputed per-timestep constants; every field has shape (T,)."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas: jnp.ndarray
    snr: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray

    @property
    def timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(betas) -> DiffusionSchedule:
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([np.ones((1,)), alphas_cumprod[:-1]])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    def f32(a):
        return jnp.asarray(a, dtype=jnp.float32)

    return DiffusionSchedule(
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas=f32(np.sqrt(1.0 / alphas)),
        snr=f32(alphas_cumprod / (1.0 - alphas_cumprod)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.clip(posterior_variance, 1e-20, None))
        ),
    )
