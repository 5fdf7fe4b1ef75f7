"""Mesh-sharded (data-parallel) sampling: `parallel.sharded_sample` and its
wiring through `generate.*(mesh=...)`.

The reference has no distributed inference (one GPU streams everything,
`show_model.py`, `metrics.py:347-389`). The contract here: the sharded
run's global batch equals concatenating the n_dev independent
single-device runs with fold_in(key, i) — determinism independent of the
physical device count that produced it.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'

import jax
import jax.numpy as jnp

from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule
from mrijax.generate import (
    conditional_sample_25d,
    generate_3d_volumes,
    sample_2d,
    sample_pseudo3d_sweep,
)
from mrijax.models import UNet2D, UNet3D, VAE3D
from mrijax.parallel import make_mesh, sharded_sample

T = 10


def _diffusion():
    return GaussianDiffusion(make_schedule(linear_beta_schedule(T)))


def _unet2d(in_ch=1, out_ch=1):
    # for the 2.5D variant in_ch counts center+context channels (the
    # context concat happens before the stem conv)
    return UNet2D(
        in_channels=in_ch, out_channels=out_ch, base_channels=8,
        channel_mults=(1, 2), time_emb_dim=16, dtype=jnp.float32,
    )


def test_sharded_sample_matches_concat_of_local_runs():
    mesh = make_mesh(("data",))
    n_dev = mesh.shape["data"]

    def sample_fn(params, key, local):
        # toy "sampler": params scale + key-dependent noise, batch leading
        return params * jax.random.normal(key, (local, 3))

    params = jnp.float32(2.0)
    key = jax.random.PRNGKey(5)
    out = sharded_sample(mesh, sample_fn, params, key, 2 * n_dev)
    assert out.shape == (2 * n_dev, 3)

    expected = jnp.concatenate(
        [sample_fn(params, jax.random.fold_in(key, i), 2) for i in range(n_dev)]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)


def test_sharded_sample_cond_sharding():
    mesh = make_mesh(("data",))
    n_dev = mesh.shape["data"]

    def sample_fn(params, key, cond):
        return cond * params + 0.0 * jax.random.normal(key, cond.shape)

    cond = jnp.arange(2.0 * n_dev)
    out = sharded_sample(
        mesh, sample_fn, jnp.float32(3.0), jax.random.PRNGKey(0),
        2 * n_dev, cond=cond,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(cond) * 3.0)


def test_sharded_sample_rejects_indivisible():
    mesh = make_mesh(("data",))
    with pytest.raises(ValueError, match="not divisible"):
        sharded_sample(
            mesh, lambda p, k, b: jnp.zeros((b,)), None,
            jax.random.PRNGKey(0), mesh.shape["data"] + 1,
        )


def test_sample_2d_mesh_equals_sharded_contract():
    mesh = make_mesh(("data",))
    n_dev = mesh.shape["data"]
    model = _unet2d()
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
    )
    diff = _diffusion()
    kw = dict(num_samples=n_dev, image_size=16, ddim_steps=5,
              key=jax.random.PRNGKey(3))
    out = sample_2d(model, params, diff, mesh=mesh, **kw)
    assert out.shape == (n_dev, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()
    # per-device folded keys -> distinct samples across the batch
    flat = np.asarray(out).reshape(n_dev, -1)
    assert np.std(flat, axis=0).max() > 0


def test_sweep_mesh_matches_single_device_math():
    """The sharded z-sweep must produce the same slice content as running
    each shard's (key, z) pair on one device."""
    mesh = make_mesh(("data",))
    n_dev = mesh.shape["data"]
    model = _unet2d()
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
    )
    diff = _diffusion()
    key = jax.random.PRNGKey(11)
    num = 2 * n_dev
    out = sample_pseudo3d_sweep(
        model, params, diff, num_slices=num, image_size=16,
        ddim_steps=5, key=key, mesh=mesh,
    )
    assert out.shape == (num, 16, 16, 1)

    z = jnp.linspace(0.0, 1.0, num)
    expected = []
    for i in range(n_dev):
        z_l = z[2 * i : 2 * i + 2]
        k = jax.random.fold_in(key, i)

        def model_fn(x, t, z_l=z_l):
            return model.apply(params, x, t, z_l)

        expected.append(
            diff.ddim_sample(model_fn, (2, 16, 16, 1), k, num_steps=5)
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.concatenate(expected)),
        rtol=2e-4, atol=2e-5,
    )


def test_conditional_25d_mesh():
    mesh = make_mesh(("data",))
    n_dev = mesh.shape["data"]
    model = _unet2d(in_ch=20, out_ch=4)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)), jnp.zeros((1, 16, 16, 16)),
    )
    diff = _diffusion()
    b = n_dev
    z_pos = jnp.linspace(0.2, 0.8, b)
    context = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, 16, 16, 16)), jnp.float32
    )
    out = conditional_sample_25d(
        model, params, diff, z_pos, context,
        ddim_steps=5, key=jax.random.PRNGKey(1), mesh=mesh,
    )
    assert out.shape == (b, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_generate_3d_volumes_mesh():
    mesh = make_mesh(("data",))
    n_dev = mesh.shape["data"]
    vae = VAE3D(in_channels=4, base_channels=8, num_down=2, latent_channels=4)
    unet = UNet3D(
        in_channels=4, base_channels=8, channel_mults=(1, 2),
        use_attention=True, use_flash_attention=False, num_heads=2,
        time_emb_dim=16,
    )
    key = jax.random.PRNGKey(0)
    vae_params = vae.init(key, jnp.zeros((1, 8, 8, 8, 4)), jax.random.PRNGKey(1))
    unet_params = unet.init(key, jnp.zeros((1, 4, 4, 4, 4)), jnp.zeros((1,), jnp.int32))
    diff = _diffusion()
    vols = generate_3d_volumes(
        unet, unet_params, vae, vae_params, diff,
        num_volumes=n_dev, latent_spatial=(4, 4, 4), latent_channels=4,
        latent_scale=1.3, ddim_steps=5, key=jax.random.PRNGKey(2), mesh=mesh,
    )
    assert vols.shape == (n_dev, 8, 8, 8, 4)
    assert np.isfinite(np.asarray(vols)).all()
    # equals the single-device run of shard 0's folded key
    single = generate_3d_volumes(
        unet, unet_params, vae, vae_params, diff,
        num_volumes=1, latent_spatial=(4, 4, 4), latent_channels=4,
        latent_scale=1.3, ddim_steps=5,
        key=jax.random.fold_in(jax.random.PRNGKey(2), 0),
    )
    np.testing.assert_allclose(
        np.asarray(vols[:1]), np.asarray(single), rtol=2e-4, atol=2e-5
    )
