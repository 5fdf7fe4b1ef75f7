"""Pretrained-feature backbones for FID/KID, improved PR, and LPIPS.

Flax re-implementations of the three torchvision/lpips architectures the
reference evaluation stack runs on:

* ``InceptionV3`` — the 2048-d pool3 trunk of torchvision ``inception_v3``
  used for FID/KID (`evaluation_scripts/evaluate_models.py:82-131`,
  torchmetrics path `slice_cond_2d_ddpm/metrics.py:329-335`);
* ``ResNet18`` — the 512-d globally-pooled trunk used for improved
  precision/recall (`slice_cond_2d_ddpm/metrics.py:147-229`);
* ``AlexNetFeatures`` + ``LPIPS`` — the AlexNet-LPIPS perceptual distance
  used for diversity (`slice_cond_2d_ddpm/metrics.py:419-443`).

Design notes (TPU-first, inference-only):

* channels-last throughout; every op is MXU/XLA-friendly (convs, pools,
  concats — no dynamic shapes);
* BatchNorm is folded into the preceding conv's kernel/bias at weight
  CONVERSION time (`mrijax.io.torch_convert.convert_inception_v3` etc.) —
  mathematically exact for inference, one fused conv per BasicConv2d
  instead of conv+BN;
* parameter tree names mirror torchvision module names
  (``Mixed_5b/branch1x1/conv``), so converted checkpoints are
  self-describing and the converters are mechanical.

This environment ships no pretrained weights (zero egress), so these nets
are exercised by converter round-trip parity tests against torch replicas
with torchvision-identical state_dict layouts (tests/torch_replicas.py);
real torchvision/lpips checkpoints convert through the exact same code
path.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# ImageNet normalization constants (evaluate_models.py:124-127)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _pair(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return tuple((int(a), int(a)) for a in p)


class BasicConv(nn.Module):
    """torchvision ``BasicConv2d`` with the BatchNorm folded in: conv(+bias)
    then ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=_pair(self.padding),
            name="conv",
        )(x)
        return nn.relu(x)


def _avg_pool3(x):
    # AvgPool2d(3, stride=1, padding=1), count_include_pad=True (torch default)
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _max_pool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=2, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        bp = BasicConv(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision ``inception_v3`` up to global average pool → 2048-d.

    Input: (B, 299, 299, 3), already ImageNet-normalized (the full [-1,1] →
    FID-feature pipeline lives in ``mrijax.evals.features``).
    ``transform_input=True`` replicates torchvision's pretrained-model
    input remap (the IMAGENET1K_V1 builder forces it on).
    """

    transform_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.transform_input:
            ch0 = x[..., 0:1] * (IMAGENET_STD[0] / 0.5) + (IMAGENET_MEAN[0] - 0.5) / 0.5
            ch1 = x[..., 1:2] * (IMAGENET_STD[1] / 0.5) + (IMAGENET_MEAN[1] - 0.5) / 0.5
            ch2 = x[..., 2:3] * (IMAGENET_STD[2] / 0.5) + (IMAGENET_MEAN[2] - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        x = BasicConv(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool3s2(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool3s2(x)
        x = InceptionA(pool_features=32, name="Mixed_5b")(x)
        x = InceptionA(pool_features=64, name="Mixed_5c")(x)
        x = InceptionA(pool_features=64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(channels_7x7=128, name="Mixed_6b")(x)
        x = InceptionC(channels_7x7=160, name="Mixed_6c")(x)
        x = InceptionC(channels_7x7=160, name="Mixed_6d")(x)
        x = InceptionC(channels_7x7=192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avgpool(1,1) → (B, 2048)


# ------------------------------------------------------------------ ResNet18


class ResNetBasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        h = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1), strides=self.strides,
                               name="downsample")(x)
        return nn.relu(h + identity)


class ResNet18(nn.Module):
    """torchvision ``resnet18`` trunk (fc → identity): 512-d pooled features.

    Input: (B, H, W, 3) ImageNet-normalized, any H/W ≥ 32 (the reference
    feeds 128² directly, metrics.py:456-476).
    """

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, name="conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for layer, w in enumerate(widths, start=1):
            stride = 1 if layer == 1 else 2
            x = ResNetBasicBlock(w, strides=stride, downsample=layer > 1,
                                 name=f"layer{layer}_0")(x)
            x = ResNetBasicBlock(w, name=f"layer{layer}_1")(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 512)


# ----------------------------------------------------------- AlexNet / LPIPS

# LPIPS ScalingLayer constants (lpips/lpips.py, version 0.1)
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)


class AlexNetFeatures(nn.Module):
    """torchvision ``alexnet.features`` conv trunk, returning the five ReLU
    taps LPIPS reads (after features[0,3,6,8,10])."""

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        taps = []
        x = nn.Conv(64, (11, 11), strides=4, padding=2, name="conv0")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=2, name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=1, name="conv6")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv8")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv10")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


LPIPS_ALEX_TAP_CHANNELS = (64, 192, 384, 256, 256)


class LPIPS(nn.Module):
    """AlexNet-LPIPS perceptual distance (lpips package semantics,
    ``net_type="alex"``, ``normalize=False`` → inputs in [-1, 1]).

    Per tap: unit-normalize across channels (eps 1e-10 added to the norm),
    squared difference, learned per-channel weights (the ``lin`` 1×1 convs,
    stored here as vectors), spatial mean, summed over the five taps.
    """

    @nn.compact
    def __call__(self, x1, x2):
        shift = jnp.asarray(LPIPS_SHIFT)
        scale = jnp.asarray(LPIPS_SCALE)
        net = AlexNetFeatures(name="net")
        f1 = net((x1 - shift) / scale)
        f2 = net((x2 - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            w = self.param(
                f"lin{i}",
                nn.initializers.ones,
                (LPIPS_ALEX_TAP_CHANNELS[i],),
            )
            d = jnp.sum((a - b) ** 2 * w, axis=-1)  # (B, H, W)
            total = total + jnp.mean(d, axis=(1, 2))
        return total  # (B,)
