"""Image feature extractors for FID/KID/precision-recall/perceptual metrics.

The reference uses ImageNet-pretrained extractors (Inception-v3 for
FID/KID, `evaluation_scripts/evaluate_models.py:82-131` and
`slice_cond_2d_ddpm/metrics.py:329-335`; ResNet18 for improved PR,
:147-229; AlexNet-LPIPS for diversity, :419-443). The real architectures
live in ``mrijax.evals.backbones`` (flax, channels-last, BN folded), with
torchvision/lpips weight converters in ``mrijax.io.torch_convert``; this
module wraps them in the reference's exact input pipelines:

* ``InceptionFeatureExtractor`` — [-1,1] → [0,1] clip → 3-channel → resize
  299 bilinear → ImageNet normalize → 2048-d pool3 features
  (evaluate_models.py:103-131). Supply converted torchvision weights via
  ``weights_path``; metrics computed on it are reported as plain
  ``fid``/``kid``.
* ``ResNet18FeatureExtractor`` — [-1,1] → [0,1] → 3-channel → ImageNet
  normalize → 512-d pooled features at native resolution
  (metrics.py:456-476), for improved precision/recall.
* ``LPIPSDistance`` — AlexNet-LPIPS perceptual distance on [-1,1] pairs.

This environment ships no pretrained weights (zero egress), so the DEFAULT
extractor remains an Inception-style conv net with FIXED, SEEDED random
weights: random-feature Fréchet/kernel distances are well-defined,
deterministic (seed 0), and rank generative quality consistently — but are
not numerically comparable to ImageNet-FID, so reports label them
``fid_rand``/``kid_rand`` (``metric_suffix``).
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

    metric_suffix = "_rand"  # not ImageNet features — label metrics as such

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
            # flax init EXECUTES the forward: pin it to host CPU (on the
            # axon TPU backend an eager init is hundreds of per-op tunnel
            # roundtrips — the r4 CLI chip run's bug class)
            from mrijax.kernels.dispatch import host_init

            with host_init():
                self.params = self.net.init(
                    jax.random.PRNGKey(seed),
                    jnp.zeros((1, image_size, image_size, 3)),
                )
        # params travel as a jit ARGUMENT (never closed over): closed-over
        # weights become HLO constants, which blow up remote TPU compiles
        self._embed = jax.jit(self._embed_impl)

    @property
    def dim(self) -> int:
        return self.net.widths[-1]

    def _embed_impl(self, params, x):
        # (B, H, W, 1|3) in [-1,1] → resize 299 → 3-channel → features
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = resize_bilinear(x, (self.image_size, self.image_size))
        return self.net.apply(params, x)

    def __call__(self, images) -> jnp.ndarray:
        """images: (B, H, W, C) float in [-1, 1] → (B, dim) float32."""
        return self._embed(self.params, jnp.asarray(images, jnp.float32))

    def embed_batched(self, images, batch_size: int = 64) -> np.ndarray:
        out = []
        n = images.shape[0]
        for i in range(0, n, batch_size):
            out.append(np.asarray(self(images[i : i + batch_size])))
        return np.concatenate(out, axis=0)


# ----------------------------------------------------- pretrained pipelines


def _to_unit_rgb(x):
    """[-1,1] (B,H,W,1|3) → [0,1] 3-channel (evaluate_models.py:110-117)."""
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def _imagenet_normalize(x01):
    from mrijax.evals.backbones import IMAGENET_MEAN, IMAGENET_STD

    return (x01 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def _load_params(net, weights_path, params, example_shape):
    if params is not None:
        return params
    if weights_path is not None:
        from mrijax.io import load_params_npz

        loaded, _ = load_params_npz(weights_path)
        return loaded
    # deterministic random init — usable for pipeline tests, labeled _rand.
    # Pinned to host CPU: flax init executes the forward, and an eager
    # Inception/ResNet forward on the axon TPU backend is hundreds of
    # per-op tunnel roundtrips (the r4 CLI chip run's bug class).
    from mrijax.kernels.dispatch import host_init

    with host_init():
        return net.init(
            jax.random.PRNGKey(0), *(jnp.zeros(s) for s in example_shape)
        )


class InceptionFeatureExtractor:
    """Real-FID 2048-d features via the flax Inception-v3 trunk.

    ``weights_path`` takes an npz produced by::

        import torch
        from mrijax.io.torch_convert import convert_inception_v3
        from mrijax.io import save_params_npz
        sd = torch.load("inception_v3_google-*.pth", map_location="cpu")
        save_params_npz("inception.npz", convert_inception_v3(sd))

    With converted ImageNet weights, ``metric_suffix`` is "" and the
    harness reports standard FID/KID comparable to BASELINE.md. Without
    weights (seeded random init) the suffix stays "_rand".
    """

    def __init__(
        self,
        weights_path: Optional[str] = None,
        params=None,
        image_size: int = 299,
        transform_input: bool = True,
    ):
        from mrijax.evals.backbones import InceptionV3

        self.image_size = image_size
        self.net = InceptionV3(transform_input=transform_input)
        self.metric_suffix = "" if (weights_path or params is not None) else "_rand"
        self.params = _load_params(
            self.net, weights_path, params, [(1, image_size, image_size, 3)]
        )
        self._embed = jax.jit(self._embed_impl)  # params passed per call

    dim = 2048

    def _embed_impl(self, params, x):
        x = _to_unit_rgb(x)
        x = resize_bilinear(x, (self.image_size, self.image_size))
        return self.net.apply(params, _imagenet_normalize(x))

    def __call__(self, images) -> jnp.ndarray:
        return self._embed(self.params, jnp.asarray(images, jnp.float32))

    embed_batched = FeatureExtractor.embed_batched


class ResNet18FeatureExtractor:
    """Improved-PR 512-d features via the flax ResNet18 trunk, fed at native
    resolution (no resize — metrics.py:456-476)."""

    def __init__(self, weights_path: Optional[str] = None, params=None):
        from mrijax.evals.backbones import ResNet18

        self.net = ResNet18()
        self.metric_suffix = "" if (weights_path or params is not None) else "_rand"
        self.params = _load_params(
            self.net, weights_path, params, [(1, 64, 64, 3)]
        )
        self._embed = jax.jit(self._embed_impl)  # params passed per call

    dim = 512

    def _embed_impl(self, params, x):
        return self.net.apply(params, _imagenet_normalize(_to_unit_rgb(x)))

    def __call__(self, images) -> jnp.ndarray:
        return self._embed(self.params, jnp.asarray(images, jnp.float32))

    embed_batched = FeatureExtractor.embed_batched


class LPIPSDistance:
    """AlexNet-LPIPS perceptual distance on [-1,1] image pairs (the
    reference's diversity metric, metrics.py:419-443; lpips ``normalize=False``
    semantics). Convert weights with ``convert_lpips_alex``."""

    def __init__(self, weights_path: Optional[str] = None, params=None):
        from mrijax.evals.backbones import LPIPS

        self.net = LPIPS()
        self.is_pretrained = weights_path is not None or params is not None
        self.params = _load_params(
            self.net, weights_path, params, [(1, 64, 64, 3), (1, 64, 64, 3)]
        )
        self._dist = jax.jit(self._dist_impl)  # params passed per call

    def _dist_impl(self, params, x1, x2):
        def rgb(x):
            return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x

        return self.net.apply(params, rgb(x1), rgb(x2))

    def __call__(self, x1, x2) -> jnp.ndarray:
        """x1, x2: (B, H, W, C) in [-1, 1] → (B,) distances."""
        return self._dist(
            self.params, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
        )
