"""3D UNet for latent diffusion — plain and bottleneck-attention variants.

One class with an ``use_attention`` switch replaces the reference's
``UNet3DModel`` (`ddpm_3d_ldm/unet.py:57-158`) and
``UNet3DModelWithAttention`` (`ddpm_3d_ldm/unet_attention.py:88-200`), which
are identical except for a single attention block between the two bottleneck
res blocks.

Topology (parity):
* per level i: {res(ch_i→ch_i), res(ch_i→ch_i), downsample conv4 s2 to
  ch_{i+1}} (no downsample at the last level); the skip is stored *before*
  the downsample;
* bottleneck: res → [attention] → res;
* up path: convT4 s2 (except at the top level) → center-crop skip on shape
  mismatch → concat → res(2ch→ch) → res(ch→ch);
* head: GN → SiLU → conv3×3×3 → in_channels.

Layout is channels-last (B, D, H, W, C). The bottleneck attention (N =
D·H·W / 64 tokens at 2 downsamples) uses the Pallas flash kernel on TPU and
can shard its token axis over a mesh (``sp_axis``) for larger-N variants.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrijax.models.blocks import (
    AttentionBlock3D,
    Downsample,
    GroupNormSiLU,
    ResBlock3D,
    TimeEmbedding,
    Upsample,
)
from mrijax.ops.resize import center_crop_to


class UNet3D(nn.Module):
    in_channels: int = 16
    base_channels: int = 64
    channel_mults: Sequence[int] = (1, 2, 4)
    time_emb_dim: int = 256
    groups: int = 8
    num_heads: int = 4
    use_attention: bool = True
    # extra attention at the listed resolution levels (0 = full latent
    # resolution) on both the down and up paths — the capability the
    # reference lacks (its quadratic-memory attention is confined to the
    # bottleneck); feasible here thanks to the flash kernel and, across
    # chips, sequence-parallel sharding (sp_axis).
    attention_levels: Sequence[int] = ()
    use_flash_attention: bool = True
    # sequence parallelism for the bottleneck attention (token axis sharded
    # over mesh axis ``sp_axis``); None = single-device attention
    sp_axis: Any = None
    mesh: Any = None
    # rematerialize res blocks in the backward pass (trade FLOPs for HBM —
    # enables bigger volumes/batches in training; jax.checkpoint)
    remat: bool = False
    # selective remat: when set, ONLY res blocks at these resolution levels
    # (0 = full latent resolution; bottleneck counts as the deepest level)
    # are rematerialized, overriding ``remat``. Level-0 activations dominate
    # the HBM footprint (16× the per-tensor bytes of the bottleneck at 3
    # levels: spatial shrinks 64× while channels grow 4×) while level-0
    # convs are only ~57% of the FLOPs — rematting
    # just level 0 buys most of the memory for roughly half the recompute
    # of full remat (measured ladder in PERF.md).
    remat_levels: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        rb = iter(range(100))
        chs = [self.base_channels * m for m in self.channel_mults]
        num_levels = len(chs)

        if self.remat_levels is not None:
            bad = [l for l in self.remat_levels if not 0 <= l < num_levels]
            if bad:
                # a typo'd level would otherwise silently disable remat
                # everywhere (it overrides `remat`) and fall off the HBM cliff
                raise ValueError(
                    f"remat_levels {tuple(self.remat_levels)} out of range for "
                    f"{num_levels} resolution levels (valid: 0..{num_levels - 1})"
                )

        # explicit names keep the param tree identical with/without remat
        def res_cls(level: int):
            if self.remat_levels is not None:
                wrap = level in self.remat_levels
            else:
                wrap = self.remat
            return nn.remat(ResBlock3D) if wrap else ResBlock3D

        t_emb = TimeEmbedding(self.time_emb_dim, dtype=self.dtype)(t)
        h = nn.Conv(chs[0], (3, 3, 3), padding=1, dtype=self.dtype)(
            x.astype(self.dtype)
        )

        def attn(name):
            return AttentionBlock3D(
                num_heads=self.num_heads, groups=self.groups, dtype=self.dtype,
                use_flash=self.use_flash_attention, sp_axis=self.sp_axis,
                mesh=self.mesh, name=name,
            )

        skips = []
        for i, ch in enumerate(chs):
            Res = res_cls(i)
            h = Res(ch, self.groups, dtype=self.dtype, name=f"ResBlock3D_{next(rb)}")(h, t_emb)
            h = Res(ch, self.groups, dtype=self.dtype, name=f"ResBlock3D_{next(rb)}")(h, t_emb)
            if i in self.attention_levels:
                h = attn(f"DownAttn_{i}")(h)
            skips.append(h)
            if i != num_levels - 1:
                h = Downsample(chs[i + 1], spatial_rank=3, dtype=self.dtype)(h)

        Res = res_cls(num_levels - 1)
        h = Res(chs[-1], self.groups, dtype=self.dtype, name=f"ResBlock3D_{next(rb)}")(h, t_emb)
        if self.use_attention:
            h = AttentionBlock3D(
                num_heads=self.num_heads,
                groups=self.groups,
                dtype=self.dtype,
                use_flash=self.use_flash_attention,
                sp_axis=self.sp_axis,
                mesh=self.mesh,
            )(h)
        h = Res(chs[-1], self.groups, dtype=self.dtype, name=f"ResBlock3D_{next(rb)}")(h, t_emb)

        for i in reversed(range(num_levels)):
            ch = chs[i]
            Res = res_cls(i)
            if i != num_levels - 1:
                h = Upsample(ch, spatial_rank=3, dtype=self.dtype)(h)
            skip = skips.pop()
            if h.shape[1:4] != skip.shape[1:4]:
                skip = center_crop_to(skip, h.shape[1:4])
            h = jnp.concatenate([h, skip], axis=-1)
            h = Res(ch, self.groups, dtype=self.dtype, name=f"ResBlock3D_{next(rb)}")(h, t_emb)
            h = Res(ch, self.groups, dtype=self.dtype, name=f"ResBlock3D_{next(rb)}")(h, t_emb)
            if i in self.attention_levels:
                h = attn(f"UpAttn_{i}")(h)

        h = GroupNormSiLU(self.groups)(h)
        h = nn.Conv(self.in_channels, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        return h.astype(jnp.float32)
