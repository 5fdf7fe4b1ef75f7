"""Shape and sanity tests for the three model families (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrijax.models import UNet2D, UNet3D, VAE3D


def _param_count(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


def test_unet2d_shapes():
    model = UNet2D(base_channels=16, channel_mults=(1, 2, 4), time_emb_dim=32)
    x = jnp.zeros((2, 32, 32, 1))
    t = jnp.array([0, 5])
    z = jnp.array([0.3, 0.7])
    params = model.init(jax.random.key(0), x, t, z)
    out = model.apply(params, x, t, z)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_unet2d_odd_spatial_resize_fixup():
    """Odd input sizes force the bilinear up-path fixup (unet.py:102-103)."""
    model = UNet2D(base_channels=16, channel_mults=(1, 2, 4), time_emb_dim=32)
    x = jnp.zeros((1, 30, 30, 1))
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1,))
    params = model.init(jax.random.key(0), x, t, z)
    out = model.apply(params, x, t, z)
    assert out.shape == x.shape


def test_unet25d_context_concat():
    """2.5D config: 4 center + 16 context channels in, 4 out
    (ddpm_25d_all_modalities/model.py:41-43, radius 2)."""
    model = UNet2D(
        in_channels=20,
        out_channels=4,
        base_channels=16,
        channel_mults=(1, 2),
        time_emb_dim=32,
    )
    x = jnp.zeros((2, 32, 32, 4))
    ctx = jnp.zeros((2, 32, 32, 16))
    t = jnp.array([1, 2])
    z = jnp.array([0.5, 0.5])
    params = model.init(jax.random.key(0), x, t, z, ctx)
    out = model.apply(params, x, t, z, ctx)
    assert out.shape == (2, 32, 32, 4)


def test_unet3d_shapes_with_attention():
    model = UNet3D(
        in_channels=8,
        base_channels=16,
        channel_mults=(1, 2),
        time_emb_dim=32,
        use_attention=True,
        use_flash_attention=False,
    )
    x = jnp.zeros((1, 8, 12, 12, 8))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape


def test_unet3d_flash_attention_matches_xla():
    kwargs = dict(
        in_channels=4,
        base_channels=16,
        channel_mults=(1, 2),
        time_emb_dim=32,
        use_attention=True,
    )
    x = jax.random.normal(jax.random.key(1), (1, 4, 8, 8, 4))
    t = jnp.array([3])
    m_xla = UNet3D(use_flash_attention=False, **kwargs)
    m_flash = UNet3D(use_flash_attention=True, **kwargs)
    params = m_xla.init(jax.random.key(0), x, t)
    out_xla = m_xla.apply(params, x, t)
    out_flash = m_flash.apply(params, x, t)  # same param structure
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_flash), rtol=1e-4, atol=1e-5
    )


def test_unet3d_odd_spatial_center_crop():
    """Odd spatial dims exercise the skip center-crop (unet.py:142-151)."""
    model = UNet3D(
        in_channels=2,
        base_channels=16,
        channel_mults=(1, 2),
        time_emb_dim=32,
        use_attention=False,
    )
    x = jnp.zeros((1, 7, 10, 9, 2))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    # up path doubles the halved dims: floor(d/2)*2
    assert out.shape == (1, 6, 10, 8, 2)


def test_vae3d_roundtrip_shapes():
    model = VAE3D(in_channels=4, base_channels=8, num_down=3, latent_channels=4)
    x = jnp.zeros((1, 16, 16, 16, 4))
    rng = jax.random.key(0)
    params = model.init(jax.random.key(1), x, rng)
    recon, mu, logvar = model.apply(params, x, rng)
    # downsample factor 2^(num_down-1) = 4
    assert mu.shape == (1, 4, 4, 4, 4)
    assert logvar.shape == mu.shape
    assert recon.shape == x.shape
    z = model.apply(params, x, method="encode_to_latent")
    assert z.shape == mu.shape
    dec = model.apply(params, z, method="decode_from_latent")
    assert dec.shape == x.shape


def test_bf16_compute_dtype_runs():
    model = UNet2D(
        base_channels=16, channel_mults=(1, 2), time_emb_dim=32, dtype=jnp.bfloat16
    )
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1,))
    params = model.init(jax.random.key(0), x, t, z)
    # params stay fp32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
    out = model.apply(params, x, t, z)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet3d_multilevel_attention():
    """Attention at higher resolution levels (the flash-kernel-enabled
    superset of the reference's bottleneck-only attention)."""
    import jax
    import jax.numpy as jnp
    from mrijax.models import UNet3D

    m = UNet3D(in_channels=4, base_channels=8, channel_mults=(1, 2),
               time_emb_dim=16, num_heads=2, use_attention=True,
               attention_levels=(0, 1), use_flash_attention=False)
    x = jnp.ones((1, 8, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    p = m.init(jax.random.PRNGKey(0), x, t)
    names = set(p["params"].keys())
    assert {"DownAttn_0", "DownAttn_1", "UpAttn_0", "UpAttn_1",
            "AttentionBlock3D_0"} <= names
    out = m.apply(p, x, t)
    assert out.shape == x.shape
    g = jax.grad(lambda pp: float(0) + jnp.sum(m.apply(pp, x, t) ** 2))(p)
    assert all(jnp.isfinite(l).all() for l in jax.tree.leaves(g))
