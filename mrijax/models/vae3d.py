"""3D convolutional VAE for the latent diffusion model's stage 1.

Math/topology parity with `ddpm_3d_ldm/vae.py:5-128`:
* Encoder: conv3×3×3 stem → per level i in 0..num_down-1:
  {res(cur→cur)} and, for all but the last level, {res(cur→2cur),
  conv4 s2} — i.e. spatial downsample factor 2^(num_down-1) (4× at the
  reference default num_down=3) — → conv3×3×3 to 2·latent channels,
  split into (μ, logσ²).
* Reparameterization: z = μ + exp(0.5·logσ²)·ε.
* Decoder mirrors the encoder with transposed convs.
* ``encode_to_latent`` returns μ deterministically (used to embed training
  volumes for stage 2); ``decode_from_latent`` decodes samples.

Channels-last (B, D, H, W, C); compute dtype configurable, μ/logσ²/output
cast to fp32.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrijax.models.blocks import Downsample, ResBlock3D, Upsample


class Encoder3D(nn.Module):
    base_channels: int = 32
    num_down: int = 3
    latent_channels: int = 8
    groups: int = 8
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        ResBlock = nn.remat(ResBlock3D) if self.remat else ResBlock3D
        rb = iter(range(100))
        h = nn.Conv(self.base_channels, (3, 3, 3), padding=1, dtype=self.dtype)(
            x.astype(self.dtype)
        )
        cur = self.base_channels
        for i in range(self.num_down):
            h = ResBlock(cur, self.groups, dtype=self.dtype,
                         name=f"ResBlock3D_{next(rb)}")(h)
            if i != self.num_down - 1:
                h = ResBlock(cur * 2, self.groups, dtype=self.dtype,
                             name=f"ResBlock3D_{next(rb)}")(h)
                h = Downsample(cur * 2, spatial_rank=3, dtype=self.dtype)(h)
                cur *= 2
        stats = nn.Conv(
            2 * self.latent_channels, (3, 3, 3), padding=1, dtype=self.dtype
        )(h)
        stats = stats.astype(jnp.float32)
        mu, logvar = jnp.split(stats, 2, axis=-1)
        return mu, logvar


class Decoder3D(nn.Module):
    out_channels: int = 4
    base_channels: int = 32
    num_down: int = 3
    groups: int = 8
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        ResBlock = nn.remat(ResBlock3D) if self.remat else ResBlock3D
        rb = iter(range(100))
        cur = self.base_channels * (2 ** (self.num_down - 1))
        h = nn.Conv(cur, (3, 3, 3), padding=1, dtype=self.dtype)(
            z.astype(self.dtype)
        )
        for i in reversed(range(self.num_down)):
            h = ResBlock(cur, self.groups, dtype=self.dtype,
                         name=f"ResBlock3D_{next(rb)}")(h)
            if i != 0:
                h = ResBlock(cur // 2, self.groups, dtype=self.dtype,
                             name=f"ResBlock3D_{next(rb)}")(h)
                h = Upsample(cur // 2, spatial_rank=3, dtype=self.dtype)(h)
                cur //= 2
        h = nn.Conv(self.out_channels, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        return h.astype(jnp.float32)


class VAE3D(nn.Module):
    in_channels: int = 4
    base_channels: int = 32
    num_down: int = 3
    latent_channels: int = 8
    groups: int = 8
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder3D(
            base_channels=self.base_channels,
            num_down=self.num_down,
            latent_channels=self.latent_channels,
            groups=self.groups,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.decoder = Decoder3D(
            out_channels=self.in_channels,
            base_channels=self.base_channels,
            num_down=self.num_down,
            groups=self.groups,
            remat=self.remat,
            dtype=self.dtype,
        )

    @property
    def spatial_downsample(self) -> int:
        return 2 ** (self.num_down - 1)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def reparameterize(self, mu, logvar, rng):
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape, dtype=std.dtype)
        return mu + eps * std

    def __call__(self, x, rng):
        mu, logvar = self.encode(x)
        z = self.reparameterize(mu, logvar, rng)
        recon = self.decode(z)
        return recon, mu, logvar

    def encode_to_latent(self, x):
        """Deterministic latent (μ) for diffusion (`vae.py:119-123`)."""
        mu, _ = self.encode(x)
        return mu

    def decode_from_latent(self, z):
        return self.decode(z)
