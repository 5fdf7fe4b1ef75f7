"""Shared flax building blocks for all three model families.

Channels-last (NHWC / NDHWC) layouts throughout — the TPU-native layout XLA
tiles onto the MXU. One rank-generic implementation replaces the reference's
three copy-pasted block sets (`slice_cond_2d_ddpm/unet.py`,
`ddpm_25d_all_modalities/unet.py`, `ddpm_3d_ldm/unet{,_attention}.py`).

Parity notes (math, not code):
* 2D res blocks use conv→norm→act ordering (`slice_cond_2d_ddpm/unet.py:42-56`)
  and apply SiLU to the time projection before the broadcast add.
* 3D res blocks use norm→act→conv (pre-activation) ordering
  (`ddpm_3d_ldm/unet.py:28-54`) and add the time projection without an
  activation.
* GroupNorm(8) with eps 1e-5 everywhere (torch default).
* Downsample: 4-kernel stride-2 conv, padding 1. Upsample: 4-kernel stride-2
  transposed conv (output = 2× input spatially).

Compute dtype is configurable (bf16 on TPU); params and normalization
statistics stay float32.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrijax.ops.embeddings import sinusoidal_time_embedding
from mrijax.ops.norms import group_norm, group_norm_silu_auto
from mrijax.ops.attention import multi_head_self_attention

Dtype = Any


class GroupNorm(nn.Module):
    """GroupNorm over channels-last input; stats in fp32, affine params fp32."""

    groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, self.groups, scale, bias, self.eps)


class GroupNormSiLU(nn.Module):
    """Fused GroupNorm→SiLU (the norm→act pair in every res block / head).
    Dispatches to the Pallas 2-read/1-write kernel on TPU
    (`mrijax.kernels.groupnorm_pallas`), XLA elsewhere."""

    groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_silu_auto(x, self.groups, scale, bias, self.eps)


class TimeEmbedding(nn.Module):
    """SinusoidalPosEmb → Dense(4d) → SiLU → Dense(d)
    (`slice_cond_2d_ddpm/unet.py:121-127`)."""

    dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = sinusoidal_time_embedding(t, self.dim)
        emb = nn.Dense(self.dim * 4, dtype=self.dtype)(emb.astype(self.dtype))
        emb = jax.nn.silu(emb)
        return nn.Dense(self.dim, dtype=self.dtype)(emb)


class ScalarCondEmbedding(nn.Module):
    """Dense(4d) → SiLU → Dense(d) on a scalar condition (slice position z),
    (`slice_cond_2d_ddpm/unet.py:130-134`)."""

    dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        z = z.astype(self.dtype)[:, None]  # (B, 1)
        h = nn.Dense(self.dim * 4, dtype=self.dtype)(z)
        h = jax.nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype)(h)


def _broadcast_cond(c: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """(B, C) → (B, 1, ..., 1, C) for a rank-``ndim`` activation."""
    return c.reshape(c.shape[0], *([1] * (ndim - 2)), c.shape[-1])


class ResBlock2D(nn.Module):
    """conv3×3 → GN → SiLU → (+SiLU(Dense(cond))) → conv3×3 → GN → SiLU → +skip."""

    out_ch: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond_emb: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype)(x)
        h = GroupNormSiLU(self.groups)(h)
        c = jax.nn.silu(nn.Dense(self.out_ch, dtype=self.dtype)(cond_emb))
        h = h + _broadcast_cond(c, h.ndim)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype)(h)
        h = GroupNormSiLU(self.groups)(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype)(x)
        return h + x


class ResBlock3D(nn.Module):
    """Pre-activation 3D res block, optional time conditioning
    (`ddpm_3d_ldm/unet_attention.py:59-85`; no-time variant `vae.py:5-23`)."""

    out_ch: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cond_emb: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        h = GroupNormSiLU(self.groups)(x)
        h = nn.Conv(self.out_ch, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        if cond_emb is not None:
            c = nn.Dense(self.out_ch, dtype=self.dtype)(cond_emb)
            h = h + _broadcast_cond(c, h.ndim)
        h = GroupNormSiLU(self.groups)(h)
        h = nn.Conv(self.out_ch, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1, 1), dtype=self.dtype)(x)
        return h + x


class Downsample(nn.Module):
    """4-kernel stride-2 conv, padding 1 (halves each spatial dim)."""

    out_ch: int
    spatial_rank: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (4,) * self.spatial_rank
        s = (2,) * self.spatial_rank
        p = ((1, 1),) * self.spatial_rank
        return nn.Conv(self.out_ch, k, strides=s, padding=p, dtype=self.dtype)(x)


class Upsample(nn.Module):
    """4-kernel stride-2 transposed conv (doubles each spatial dim).

    XLA lowers ``conv_transpose`` to a dilated convolution — the efficient
    TPU form; torch's ConvTranspose{2,3}d(4, stride=2, padding=1) has the
    same output geometry.
    """

    out_ch: int
    spatial_rank: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (4,) * self.spatial_rank
        s = (2,) * self.spatial_rank
        return nn.ConvTranspose(
            self.out_ch, k, strides=s, padding="SAME", dtype=self.dtype
        )(x)


class AttentionBlock3D(nn.Module):
    """GN → 1×1×1 qkv → multi-head attention over all D·H·W tokens → 1×1×1
    proj → residual (`ddpm_3d_ldm/unet_attention.py:28-56`).

    On channels-last tensors a 1×1×1 conv is a Dense over the channel axis,
    which XLA maps to a single MXU matmul over all tokens. At the flagship
    config this block sits at the UNet bottleneck (latent/4 ⇒ N = 8·10·10 =
    800 tokens), where exact attention is cheap; ``use_flash`` routes the
    softmax(qkᵀ)v core through the Pallas flash-attention kernel, which is
    what makes attention at HIGHER resolutions (e.g. the full 51 200-token
    latent, or shallower UNets) feasible with O(N·block) memory.
    """

    num_heads: int = 4
    groups: int = 8
    dtype: Dtype = jnp.float32
    use_flash: bool = True
    # Sequence parallelism: shard the D·H·W token axis over this mesh axis
    # (K/V all-gathered over ICI) — the scaling axis the reference lacks.
    sp_axis: Optional[str] = None
    mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        if c % self.num_heads != 0:
            raise ValueError(f"channels {c} not divisible by heads {self.num_heads}")
        hd = c // self.num_heads

        h = GroupNorm(self.groups)(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype)(h)
        qkv = qkv.reshape(b, -1, 3, self.num_heads, hd)  # (B, N, 3, H, Dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.sp_axis is not None and self.mesh is not None:
            from mrijax.parallel.sequence import sequence_parallel_attention

            out = sequence_parallel_attention(
                q, k, v, mesh=self.mesh, axis=self.sp_axis
            )
        elif self.use_flash:
            from mrijax.kernels.flash_attention import flash_attention

            out = flash_attention(q, k, v)
        else:
            out = multi_head_self_attention(q, k, v)
        out = out.reshape(b, *spatial, c)
        out = nn.Dense(c, dtype=self.dtype)(out)
        return x + out
