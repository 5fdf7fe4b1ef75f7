"""Sinusoidal timestep embeddings.

Matches the classic DDPM embedding used by the reference
(`model_scripts/slice_cond_2d_ddpm/unet.py:7-25` and clones): for dimension
``d`` the frequencies are ``exp(-k * log(10^4) / (d/2 - 1))`` for
``k = 0..d/2-1``; output is ``[sin, cos]`` concatenated, zero-padded by one
column when ``d`` is odd.
"""

import math

import jax.numpy as jnp


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Embed integer (or float) timesteps ``t`` of shape (B,) into (B, dim).

    Computed in float32 regardless of input dtype; cast at the call site if a
    lower compute precision is wanted.
    """
    half_dim = dim // 2
    if half_dim < 2:
        raise ValueError(f"time embedding dim must be >= 4, got {dim}")
    emb_factor = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb_factor)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
