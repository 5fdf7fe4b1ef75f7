"""Training LEARNS — loss decreases and trained params beat init.

Every other end-to-end test asserts plumbing (epochs ran, loss finite,
resume counters); these assert optimization itself, catching a silent
sign/weighting bug that forward-parity tests with converted weights cannot
see. The trainers exist to minimize exactly these losses
(`slice_cond_2d_ddpm/model.py:139-194`, `ddpm_3d_ldm/train.py:258-433`).

Data is deterministic and easy: images/latents are smooth functions of the
conditioning, so a tiny model reaches a fraction of its initial loss in
~100 steps on the CPU mesh.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'

import jax
import jax.numpy as jnp
import optax

from mrijax.diffusion import (
    GaussianDiffusion,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
)
from mrijax.models import UNet2D, UNet3D, VAE3D
from mrijax.train.state import TrainState
from mrijax.train.steps import (
    make_cached_latent_train_step,
    make_diffusion_eval_step,
    make_diffusion_train_step,
    make_vae_train_step,
)


def _state(params, lr=2e-3):
    return TrainState.create(apply_fn=None, params=params, tx=optax.adam(lr))


def _smooth_images(batch, size, channels, seed=0):
    """Deterministic smooth images keyed by z_pos: learnable structure."""
    z = np.linspace(0.1, 0.9, batch, dtype=np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.stack(
        [
            np.stack(
                [np.sin(2 * np.pi * (xx + zi) * (c + 1)) * (2 * zi - 1)
                 for c in range(channels)],
                axis=-1,
            )
            for zi in z
        ]
    ).astype(np.float32)
    return jnp.asarray(imgs), jnp.asarray(z)


def _run_steps(step, state, batch, n, seed=0):
    losses = []
    for i in range(n):
        state, loss = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(seed), i))
        losses.append(float(loss))
    return state, losses


def _assert_learned(losses, factor=0.5):
    first = float(np.mean(losses[:10]))
    last = float(np.mean(losses[-10:]))
    assert last < factor * first, (
        f"training did not learn: first10={first:.4f} last10={last:.4f}"
    )


def test_2d_training_learns_and_beats_init():
    model = UNet2D(in_channels=1, out_channels=1, base_channels=8,
                   channel_mults=(1, 2), time_emb_dim=16)
    diffusion = GaussianDiffusion(
        make_schedule(linear_beta_schedule(50)), loss_type="mse"
    )
    imgs, z = _smooth_images(16, 16, 1)
    batch = {"image": imgs, "z_pos": z}
    init_params = model.init(jax.random.PRNGKey(0), imgs[:1],
                             jnp.zeros((1,), jnp.int32), z[:1])
    step = make_diffusion_train_step(model, diffusion, donate=False)
    state, losses = _run_steps(step, _state(init_params), batch, 120)
    _assert_learned(losses)

    # trained params beat the init on a FIXED eval draw (same keys => same
    # t and noise for both): the epsilon-MSE sample-quality smoke
    eval_step = make_diffusion_eval_step(model, diffusion)
    keys = [jax.random.fold_in(jax.random.PRNGKey(99), i) for i in range(8)]
    init_mse = np.mean([float(eval_step(init_params, batch, k)) for k in keys])
    trained_mse = np.mean([float(eval_step(state.params, batch, k)) for k in keys])
    assert trained_mse < 0.5 * init_mse

    # and DDIM samples from the trained model are sane (finite, in range)
    def model_fn(x, t):
        return model.apply(state.params, x, t, z[:4])

    samples = np.asarray(
        diffusion.ddim_sample(model_fn, (4, 16, 16, 1),
                              jax.random.PRNGKey(3), num_steps=10)
    )
    assert np.isfinite(samples).all()
    assert np.abs(samples).max() < 5.0


def test_25d_training_learns():
    """Context-conditioned (2.5D) family: same assertion with the
    4-modality center + context-concat forward."""
    model = UNet2D(in_channels=12, out_channels=4, base_channels=8,
                   channel_mults=(1, 2), time_emb_dim=16)
    diffusion = GaussianDiffusion(
        make_schedule(linear_beta_schedule(50)), loss_type="mse"
    )
    imgs, z = _smooth_images(16, 16, 4)
    ctx, _ = _smooth_images(16, 16, 8, seed=1)
    batch = {"image": imgs, "z_pos": z, "context": ctx}
    init_params = model.init(jax.random.PRNGKey(0), imgs[:1],
                             jnp.zeros((1,), jnp.int32), z[:1], ctx[:1])
    step = make_diffusion_train_step(model, diffusion, donate=False)
    _, losses = _run_steps(step, _state(init_params), batch, 120)
    _assert_learned(losses)


def test_vae3d_training_learns():
    vae = VAE3D(in_channels=4, base_channels=8, num_down=2, latent_channels=4,
                dtype=jnp.float32)
    rng = np.random.default_rng(0)
    base = np.sin(np.linspace(0, 4 * np.pi, 8 * 8 * 8 * 4)).reshape(8, 8, 8, 4)
    vols = jnp.asarray(
        np.stack([base * (0.5 + 0.1 * i) for i in range(8)]), jnp.float32
    )
    params = vae.init(jax.random.PRNGKey(0), vols[:1], jax.random.PRNGKey(1))
    step = make_vae_train_step(vae, kl_weight=1e-4, donate=False)
    state = _state(params)
    losses = []
    for i in range(80):
        state, aux = step(state, {"volume": vols},
                          jax.random.fold_in(jax.random.PRNGKey(0), i))
        losses.append(float(aux["loss"]))
    _assert_learned(losses)


def test_3d_ldm_cached_training_learns():
    """Stage-2 (the shipped cached-latent path) learns on structured
    latents with the min-SNR loss + cosine schedule of the flagship."""
    unet = UNet3D(in_channels=4, base_channels=8,
                  channel_mults=(1, 2), time_emb_dim=16, num_heads=2,
                  use_attention=False, dtype=jnp.float32)
    diffusion = GaussianDiffusion(
        make_schedule(cosine_beta_schedule(50)), loss_type="min_snr"
    )
    grid = np.mgrid[0:8, 0:8, 0:8].astype(np.float32) / 8.0
    base = np.stack(
        [np.sin(2 * np.pi * grid[i % 3] * (i + 1)) for i in range(4)], axis=-1
    )
    lats = jnp.asarray(
        np.stack([base * (0.5 + 0.15 * i) for i in range(8)]), jnp.float32
    )
    params = unet.init(jax.random.PRNGKey(0), lats[:1], jnp.zeros((1,), jnp.int32))
    step = make_cached_latent_train_step(unet, diffusion, t_min=1, donate=False)

    state = _state(params)
    losses = []
    for i in range(120):
        state, loss = step(state, {"latent": lats},
                           jax.random.fold_in(jax.random.PRNGKey(0), i), 1.0)
        losses.append(float(loss))
    _assert_learned(losses)
