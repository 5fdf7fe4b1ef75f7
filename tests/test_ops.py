"""Golden-value tests for core ops against torch-CPU equivalents."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from mrijax.ops import (
    group_norm,
    multi_head_self_attention,
    resize_bilinear,
    sinusoidal_time_embedding,
)
from mrijax.ops.resize import center_crop_to, pad_to_min_spatial

torch = pytest.importorskip("torch")


def test_time_embedding_matches_reference_formula():
    dim = 256
    t = np.array([0, 1, 17, 999], dtype=np.int32)
    emb = np.asarray(sinusoidal_time_embedding(jnp.asarray(t), dim))
    half = dim // 2
    factor = math.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half) * -factor)
    ang = t[:, None].astype(np.float64) * freqs[None, :]
    expected = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    # fp32 exp/sin vs fp64 closed form: absolute tolerance on [-1, 1] values
    np.testing.assert_allclose(emb, expected, rtol=0, atol=5e-3)
    assert emb.shape == (4, dim)


def test_time_embedding_odd_dim_pads():
    emb = sinusoidal_time_embedding(jnp.arange(3), 129)
    assert emb.shape == (3, 129)
    assert np.all(np.asarray(emb[:, -1]) == 0)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    scale = rng.normal(size=(16,)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)

    got = np.asarray(
        group_norm(jnp.asarray(x), 4, jnp.asarray(scale), jnp.asarray(bias))
    )

    gn = torch.nn.GroupNorm(4, 16)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        # torch is channels-first
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        expected = gn(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_group_norm_3d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 6, 5, 8)).astype(np.float32)
    scale = np.ones(8, np.float32)
    bias = np.zeros(8, np.float32)
    got = np.asarray(
        group_norm(jnp.asarray(x), 8, jnp.asarray(scale), jnp.asarray(bias))
    )
    gn = torch.nn.GroupNorm(8, 8)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        expected = gn(xt).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_matches_torch_interpolate():
    """Parity with F.interpolate(mode='bilinear', align_corners=False), the
    convention used by the reference data pipeline (dataset.py:86-95)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 240, 240, 1)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (128, 128)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = (
        torch.nn.functional.interpolate(
            xt, size=(128, 128), mode="bilinear", align_corners=False
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_center_crop_matches_reference_offsets():
    x = jnp.arange(2 * 7 * 9 * 5 * 1).reshape(2, 7, 9, 5, 1).astype(jnp.float32)
    out = center_crop_to(x, (4, 8, 5))
    # offsets floor((cur-target)/2) = (1, 0, 0)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(x[:, 1:5, 0:8, 0:5, :])
    )


def test_pad_to_min_spatial():
    x = jnp.ones((1, 3, 5, 4, 2))
    out = pad_to_min_spatial(x, (8, 5, 6))
    assert out.shape == (1, 8, 5, 6, 2)
    # before-pad = total // 2 (reference _pad_to_min_shape)
    assert np.asarray(out)[0, 2, 0, 1, 0] == 1  # original corner moved by (2,0,1)
    assert np.asarray(out)[0, 0, 0, 0, 0] == 0


def test_attention_matches_torch_softmax_einsum():
    """Parity with the reference attention math (unet_attention.py:37-56)."""
    rng = np.random.default_rng(3)
    b, n, h, d = 2, 24, 4, 8
    q = rng.normal(size=(b, n, h, d)).astype(np.float32)
    k = rng.normal(size=(b, n, h, d)).astype(np.float32)
    v = rng.normal(size=(b, n, h, d)).astype(np.float32)
    got = np.asarray(
        multi_head_self_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    )
    # torch layout (B, H, Dh, N) as in the reference einsum 'bhcn,bhcm->bhnm'
    qt = torch.from_numpy(q).permute(0, 2, 3, 1)
    kt = torch.from_numpy(k).permute(0, 2, 3, 1)
    vt = torch.from_numpy(v).permute(0, 2, 3, 1)
    attn = torch.softmax(
        torch.einsum("bhcn,bhcm->bhnm", qt, kt) * (d ** -0.5), dim=-1
    )
    expected = (
        torch.einsum("bhnm,bhcm->bhcn", attn, vt).permute(0, 3, 1, 2).numpy()
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
