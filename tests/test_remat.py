"""Rematerialization: identical outputs/gradients, training runs."""

import numpy as np

import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'

import jax
import jax.numpy as jnp

from mrijax.models import UNet2D, UNet3D, VAE3D


def test_unet2d_remat_same_function():
    kw = dict(in_channels=1, out_channels=1, base_channels=8,
              channel_mults=(1, 2), time_emb_dim=16)
    m0 = UNet2D(remat=False, **kw)
    m1 = UNet2D(remat=True, **kw)
    x = jnp.ones((2, 16, 16, 1))
    t = jnp.zeros((2,), jnp.int32)
    z = jnp.full((2,), 0.5)
    p = m0.init(jax.random.PRNGKey(0), x, t, z)
    # remat wrapping must not change the parameter tree nor the math
    p1 = m1.init(jax.random.PRNGKey(0), x, t, z)
    assert jax.tree.map(lambda a: a.shape, p) == jax.tree.map(lambda a: a.shape, p1)
    np.testing.assert_allclose(
        np.asarray(m0.apply(p, x, t, z)), np.asarray(m1.apply(p, x, t, z)),
        atol=1e-6,
    )

    def loss(params, model):
        return jnp.sum(model.apply(params, x, t, z) ** 2)

    g0 = jax.grad(lambda pp: loss(pp, m0))(p)
    g1 = jax.grad(lambda pp: loss(pp, m1))(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_unet3d_and_vae_remat_grads_match():
    ukw = dict(in_channels=4, base_channels=8, channel_mults=(1, 2),
               time_emb_dim=16, use_attention=False)
    u0 = UNet3D(remat=False, **ukw)
    u1 = UNet3D(remat=True, **ukw)
    x = jnp.ones((1, 8, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    p = u0.init(jax.random.PRNGKey(0), x, t)
    g0 = jax.grad(lambda pp: jnp.sum(u0.apply(pp, x, t) ** 2))(p)
    g1 = jax.grad(lambda pp: jnp.sum(u1.apply(pp, x, t) ** 2))(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    vkw = dict(in_channels=4, base_channels=8, num_down=2, latent_channels=4)
    _check_vae_remat(vkw, x)


def test_unet3d_selective_remat_levels_match():
    """remat_levels wraps only the listed levels; param tree and math are
    identical to the unwrapped model (so checkpoints are interchangeable)."""
    ukw = dict(in_channels=4, base_channels=8, channel_mults=(1, 2),
               time_emb_dim=16, use_attention=False)
    u0 = UNet3D(remat=False, **ukw)
    x = jnp.ones((1, 8, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    p = u0.init(jax.random.PRNGKey(0), x, t)
    y0 = np.asarray(u0.apply(p, x, t))
    g0 = jax.grad(lambda pp: jnp.sum(u0.apply(pp, x, t) ** 2))(p)
    for levels in [(0,), (1,), (0, 1)]:
        u1 = UNet3D(remat_levels=levels, **ukw)
        p1 = u1.init(jax.random.PRNGKey(0), x, t)
        assert (jax.tree.map(lambda a: a.shape, p)
                == jax.tree.map(lambda a: a.shape, p1))
        np.testing.assert_allclose(y0, np.asarray(u1.apply(p, x, t)), atol=1e-6)
        g1 = jax.grad(lambda pp: jnp.sum(u1.apply(pp, x, t) ** 2))(p)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    # out-of-range levels fail loudly instead of silently disabling remat
    import pytest
    with pytest.raises(ValueError, match="remat_levels"):
        UNet3D(remat_levels=(3,), **ukw).init(jax.random.PRNGKey(0), x, t)


def test_flagship_preset_remat_defaults():
    """The 3D preset must ship vae.remat=True: the un-rematerialized
    stage-1 fwd+bwd program at the flagship 128×160×160 patch crashes the
    TPU compiler (measured, PERF.md "Stage-1 VAE training"); remat is
    math-identical (tests above). remat_levels flows config → model."""
    from mrijax.config import ExperimentConfig, preset_ddpm_3d_ldm
    from mrijax.train.experiments import build_unet3d, build_vae3d

    cfg = preset_ddpm_3d_ldm()
    assert cfg.vae.remat is True
    assert build_vae3d(cfg.vae).remat is True

    cfg.unet.remat_levels = (0,)
    assert build_unet3d(cfg.unet, use_flash=False).remat_levels == (0,)

    # the 2D builder rejects the 3D-only knob instead of silently no-op'ing
    import pytest
    from mrijax.train.experiments import build_unet2d
    with pytest.raises(ValueError, match="remat_levels"):
        build_unet2d(cfg.unet)
    # round-trip through JSON keeps the tuple
    cfg2 = ExperimentConfig.from_dict(
        __import__("json").loads(cfg.to_json())
    )
    assert cfg2.unet.remat_levels == (0,)
    assert cfg2.vae.remat is True


def _check_vae_remat(vkw, x):
    v0 = VAE3D(remat=False, **vkw)
    v1 = VAE3D(remat=True, **vkw)
    pv = v0.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))

    def vloss(params, model):
        recon, mu, logvar = model.apply(params, x, jax.random.PRNGKey(2))
        return jnp.mean(jnp.abs(recon - x)) + jnp.mean(mu**2 + logvar**2)

    g0 = jax.grad(lambda pp: vloss(pp, v0))(pv)
    g1 = jax.grad(lambda pp: vloss(pp, v1))(pv)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
