"""Forward parity of the flax eval backbones + weight converters against
torch replicas with torchvision/lpips-identical state_dict layouts.

The replicas (tests/torch_replicas.py) are randomized INCLUDING BatchNorm
running statistics, so the converters' BN folding is genuinely exercised
(a fresh BN is identity-like). A real torchvision/lpips checkpoint loads
into the replicas verbatim, so agreement here transfers to real weights.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_replicas import (  # noqa: E402
    InceptionV3Trunk,
    LPIPSAlexReplica,
    ResNet18Trunk,
    randomize_,
)

from mrijax.evals.backbones import InceptionV3, LPIPS, ResNet18  # noqa: E402
from mrijax.evals.features import (  # noqa: E402
    InceptionFeatureExtractor,
    LPIPSDistance,
    ResNet18FeatureExtractor,
)
from mrijax.io.torch_convert import (  # noqa: E402
    convert_inception_v3,
    convert_lpips_alex,
    convert_resnet18,
)


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def test_inception_v3_parity():
    rng = np.random.default_rng(10)
    model = randomize_(InceptionV3Trunk(transform_input=True), seed=1)
    params = convert_inception_v3(model.state_dict())

    # ImageNet-normalized input domain, 96² (inception accepts ≥ 75²)
    x = rng.normal(size=(2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(_nchw(x)).numpy()
    got = np.asarray(InceptionV3(transform_input=True).apply(params, jnp.asarray(x)))
    assert got.shape == (2, 2048)
    # random-weight activations reach O(70); 5e-4 abs is fp32 accumulation
    # noise at that magnitude (real ImageNet features are O(1))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-3)


def test_resnet18_parity():
    rng = np.random.default_rng(11)
    model = randomize_(ResNet18Trunk(), seed=2)
    params = convert_resnet18(model.state_dict())

    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(_nchw(x)).numpy()
    got = np.asarray(ResNet18().apply(params, jnp.asarray(x)))
    assert got.shape == (2, 512)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_lpips_alex_parity():
    rng = np.random.default_rng(12)
    model = randomize_(LPIPSAlexReplica(), seed=3)
    params = convert_lpips_alex(model.state_dict())

    x1 = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    x2 = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(_nchw(x1), _nchw(x2)).numpy()
    got = np.asarray(LPIPS().apply(params, jnp.asarray(x1), jnp.asarray(x2)))
    assert got.shape == (2,)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_inception_pipeline_parity():
    """Full FID feature pipeline ([-1,1] 1-ch → features) matches the torch
    reference pipeline (evaluate_models.py:103-131) end to end, including
    the bilinear 299-resize and ImageNet normalization."""
    import torch.nn.functional as F

    rng = np.random.default_rng(13)

    model = randomize_(InceptionV3Trunk(transform_input=True), seed=4)
    fe = InceptionFeatureExtractor(
        params=convert_inception_v3(model.state_dict()), image_size=96
    )
    assert fe.metric_suffix == ""

    x = rng.uniform(-1, 1, size=(2, 32, 32, 1)).astype(np.float32)
    t = _nchw(x).repeat(1, 3, 1, 1)
    t = torch.clamp((t + 1.0) / 2.0, 0.0, 1.0)
    t = F.interpolate(t, size=(96, 96), mode="bilinear", align_corners=False)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        ref = model((t - mean) / std).numpy()
    got = np.asarray(fe(x))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_random_init_extractors_labeled():
    fe = ResNet18FeatureExtractor()
    assert fe.metric_suffix == "_rand"
    lp = LPIPSDistance()
    assert not lp.is_pretrained
    d = np.asarray(lp(np.zeros((1, 32, 32, 1)), np.ones((1, 32, 32, 1))))
    assert d.shape == (1,) and np.isfinite(d).all()


def test_convert_features_cli_roundtrip(tmp_path):
    """torch .pth → `mrijax convert-features` npz → InceptionFeatureExtractor
    produces identical features to in-memory converted params."""
    from mrijax.cli import main

    model = randomize_(InceptionV3Trunk(), seed=5)
    pth = tmp_path / "inception.pth"
    torch.save(model.state_dict(), pth)
    npz = tmp_path / "inception.npz"
    rc = main(["convert-features", "--checkpoint", str(pth),
               "--arch", "inception_v3", "--out", str(npz)])
    assert rc == 0

    rng = np.random.default_rng(14)
    x = rng.uniform(-1, 1, size=(1, 32, 32, 1)).astype(np.float32)
    fe_npz = InceptionFeatureExtractor(weights_path=str(npz), image_size=96)
    fe_mem = InceptionFeatureExtractor(
        params=convert_inception_v3(model.state_dict()), image_size=96
    )
    np.testing.assert_array_equal(np.asarray(fe_npz(x)), np.asarray(fe_mem(x)))
