"""2D slice UNet — covers both the slice-position-conditioned 2D DDPM and the
2.5D all-modalities DDPM.

One parameterized class replaces the reference's two near-identical UNets
(`slice_cond_2d_ddpm/unet.py:108-199` and
`ddpm_25d_all_modalities/unet.py:109-218`, which differ only in ctor
channel arguments and an optional channel-concat of neighbor-slice context).

Topology (parity with the reference):
* channels = base·mults, default 64·(1,2,4,8);
* conditioning = time embedding + slice-position embedding, summed, injected
  into every residual block;
* down path: per transition {res(in→out), res(out→out), conv4 s2} storing the
  pre-downsample activation as the skip;
* bottleneck: two res blocks;
* up path: convT4 s2 (in→out) → bilinear resize fixup on shape mismatch →
  concat skip → res(out+skip→out) → res(out→out);
* head: GN → SiLU → conv3×3 → out_channels.

Layout is channels-last (B, H, W, C); compute dtype configurable (bf16 on
TPU), params fp32, output cast to fp32 for the loss.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrijax.models.blocks import (
    GroupNormSiLU,
    ResBlock2D,
    Downsample,
    Upsample,
    TimeEmbedding,
    ScalarCondEmbedding,
)
from mrijax.ops.resize import resize_bilinear


class UNet2D(nn.Module):
    """Slice-position-conditioned 2D UNet.

    For the 2.5D all-modalities model use ``in_channels=4·(1+2·radius)``,
    ``out_channels=4`` and pass ``context`` (neighbor slices, channels-last)
    to ``__call__`` — it is concatenated on the channel axis before the stem
    conv, matching `ddpm_25d_all_modalities/unet.py:197-199`.
    """

    in_channels: int = 1
    out_channels: int = 1
    base_channels: int = 64
    channel_mults: Sequence[int] = (1, 2, 4, 8)
    time_emb_dim: int = 256
    groups: int = 8
    # rematerialize res blocks in the backward pass (jax.checkpoint)
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        z_pos: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        # explicit names keep the param tree identical whether or not the
        # blocks are remat-wrapped (nn.remat would otherwise prefix names)
        Res = nn.remat(ResBlock2D) if self.remat else ResBlock2D
        rb = iter(range(100))
        chs = [self.base_channels * m for m in self.channel_mults]

        t_emb = TimeEmbedding(self.time_emb_dim, dtype=self.dtype)(t)
        z_emb = ScalarCondEmbedding(self.time_emb_dim, dtype=self.dtype)(z_pos)
        cond = t_emb + z_emb

        if context is not None:
            x = jnp.concatenate([x, context.astype(x.dtype)], axis=-1)
        h = nn.Conv(chs[0], (3, 3), padding=1, dtype=self.dtype)(
            x.astype(self.dtype)
        )

        skips = []
        for out_ch in chs[1:]:
            h = Res(out_ch, self.groups, dtype=self.dtype, name=f"ResBlock2D_{next(rb)}")(h, cond)
            h = Res(out_ch, self.groups, dtype=self.dtype, name=f"ResBlock2D_{next(rb)}")(h, cond)
            skips.append(h)
            h = Downsample(out_ch, spatial_rank=2, dtype=self.dtype)(h)

        h = Res(chs[-1], self.groups, dtype=self.dtype, name=f"ResBlock2D_{next(rb)}")(h, cond)
        h = Res(chs[-1], self.groups, dtype=self.dtype, name=f"ResBlock2D_{next(rb)}")(h, cond)

        for out_ch in reversed(chs[:-1]):
            skip = skips.pop()
            h = Upsample(out_ch, spatial_rank=2, dtype=self.dtype)(h)
            if h.shape[1:3] != skip.shape[1:3]:
                h = resize_bilinear(h, skip.shape[1:3])
            h = jnp.concatenate([h, skip], axis=-1)
            h = Res(out_ch, self.groups, dtype=self.dtype, name=f"ResBlock2D_{next(rb)}")(h, cond)
            h = Res(out_ch, self.groups, dtype=self.dtype, name=f"ResBlock2D_{next(rb)}")(h, cond)

        h = GroupNormSiLU(self.groups)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(h)
        return h.astype(jnp.float32)
