"""Image feature extractor for FID/KID/precision-recall/perceptual metrics.

The reference uses ImageNet-pretrained extractors (torchmetrics
Inception-v3 for FID/KID, `slice_cond_2d_ddpm/metrics.py:329-335`; ResNet18
for improved PR, :147-229; AlexNet-LPIPS for diversity). This environment
has no pretrained weights and no network egress, so the default extractor
is an Inception-style conv net with FIXED, SEEDED random weights:

* random-feature Fréchet/kernel distances are well-defined, deterministic
  (seed 0), and rank generative quality consistently — they are not
  numerically comparable to ImageNet-FID, and reports must (and do) label
  the metric ``fid_rand``/``kid_rand``;
* any npz of flax params with the same tree (e.g. converted Inception
  weights) can be passed via ``weights_path`` to recover standard FID.

Architecture: 4 stride-2 conv stages (64→128→256→512, 3×3, GroupNorm+SiLU)
over 299×299 inputs + global average pool → 512-d features (2048-d optional
via ``width_mult``), matching the Inception pipeline's resize-to-299 and
pooled-feature protocol.
"""

from functools import partial
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mrijax.ops.resize import resize_bilinear


class ConvFeatureNet(nn.Module):
    widths: Sequence[int] = (64, 128, 256, 512)
    groups: int = 8

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        h = x
        for w in self.widths:
            h = nn.Conv(w, (3, 3), strides=(2, 2), padding=1)(h)
            gs = self.groups if w % self.groups == 0 else 1
            h = nn.GroupNorm(num_groups=gs)(h)
            h = jax.nn.silu(h)
            h = nn.Conv(w, (3, 3), padding=1)(h)
            h = jax.nn.silu(h)
        return jnp.mean(h, axis=(1, 2))  # global average pool -> (B, W[-1])


class FeatureExtractor:
    """Deterministic feature embedding for batches of single-channel images
    in [-1, 1] (the eval protocol's model space)."""

    def __init__(
        self,
        image_size: int = 299,
        widths: Sequence[int] = (64, 128, 256, 512),
        seed: int = 0,
        weights_path: Optional[str] = None,
    ):
        self.image_size = image_size
        self.net = ConvFeatureNet(widths=tuple(widths))
        if weights_path is not None:
            from mrijax.io import load_params_npz

            self.params, _ = load_params_npz(weights_path)
        else:
            self.params = self.net.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, image_size, image_size, 3)),
            )
        self._embed = jax.jit(self._embed_impl)

    @property
    def dim(self) -> int:
        return self.net.widths[-1]

    def _embed_impl(self, x):
        # (B, H, W, 1|3) in [-1,1] → resize 299 → 3-channel → features
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = resize_bilinear(x, (self.image_size, self.image_size))
        return self.net.apply(self.params, x)

    def __call__(self, images) -> jnp.ndarray:
        """images: (B, H, W, C) float in [-1, 1] → (B, dim) float32."""
        return self._embed(jnp.asarray(images, jnp.float32))

    def embed_batched(self, images, batch_size: int = 64) -> np.ndarray:
        out = []
        n = images.shape[0]
        for i in range(0, n, batch_size):
            out.append(np.asarray(self(images[i : i + batch_size])))
        return np.concatenate(out, axis=0)
