"""Optimizer-TRAJECTORY parity vs the torch reference.

Forward/sampler parity (test_torch_parity*.py) proves converted checkpoints
run identically; this file proves the TRAINING DYNAMICS match: starting from
converted-identical parameters and feeding both frameworks the SAME batches,
timesteps, and noise (injected explicitly to bypass RNG-stream differences),
N Adam steps in fp32 must produce the same loss trajectory and the same
final parameters within float tolerance.

This is the strongest "loss-parity training" evidence available in this
data-less environment (real-data FID parity needs BraTS): if step-k losses
and post-step parameters agree for 25 consecutive coupled steps, the two
frameworks implement the same optimization process.

Covered trainers:
* 2D slice-conditioned DDPM — Adam(lr=2e-4, torch defaults), plain-MSE
  noise-prediction loss, linear β schedule
  (`slice_cond_2d_ddpm/model.py:126-168`, `diffusion.py:23,77-89`).
* stage-2 3D latent diffusion — Adam(lr=1e-4), min-SNR-γ=5 weighted loss,
  cosine β schedule, t ~ U[1, T)
  (`ddpm_3d_ldm/train.py:368-433`, `diffusion.py:50-56,84-100`).
  The frozen-VAE encode that precedes the reference's stage-2 step is
  no-grad and already forward-parity-proven (test_torch_parity_3d); the
  latent batches here are injected identically into both frameworks so the
  comparison isolates the optimizer trajectory itself.

Optimizer-formula note (PARITY.md "optimizer"): torch.optim.Adam computes
update = lr · m̂ / (√v̂ + eps); optax.adam computes
update = lr · m̂ / (√(v̂ + eps_root) + eps) with eps_root=0 — identical.
Both use defaults betas=(0.9, 0.999), eps=1e-8. No irreducible delta; the
residual drift measured here is fp32 reduction-order noise (channels-last
XLA convs vs channels-first torch convs) amplified ~linearly by Adam's
normalization across steps.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mrijax.diffusion import (
    GaussianDiffusion,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
)
from mrijax.io.torch_convert import convert_reference_unet2d, convert_reference_unet3d
from mrijax.models import UNet2D, UNet3D
from mrijax.train.state import create_train_state

from test_torch_parity import TorchRefUNet
from test_torch_parity_3d import TUNet3D


def _flat(params):
    leaves = jax.tree_util.tree_leaves_with_path(params)
    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in leaves}


def _param_rel_l2(pa, pb):
    fa, fb = _flat(pa), _flat(pb)
    assert fa.keys() == fb.keys()
    num = sum(float(np.sum((fa[k] - fb[k]) ** 2)) for k in fa)
    den = sum(float(np.sum(fb[k] ** 2)) for k in fb)
    return (num / max(den, 1e-30)) ** 0.5


def _run_mrijax_trajectory(model, params, diffusion, batches, lr, has_z):
    """N coupled Adam steps through the SHIPPED loss (`p_losses`) and
    TrainState optimizer path, with t/noise injected as arguments."""
    state = create_train_state(params, lr)

    def loss_fn(p, x, t, noise, z):
        def model_fn(xx, tt):
            if has_z:
                return model.apply(p, xx, tt, z)
            return model.apply(p, xx, tt)

        return diffusion.p_losses(model_fn, x, t, noise)

    @jax.jit
    def step(state, x, t, noise, z):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, t, noise, z)
        return state.apply_gradients(grads=grads), loss

    losses = []
    for b in batches:
        z = b["z"] if has_z else np.zeros((1,), np.float32)  # unused dummy
        state, loss = step(
            state, jnp.asarray(b["x"]), jnp.asarray(b["t"]),
            jnp.asarray(b["noise"]), jnp.asarray(z),
        )
        losses.append(float(loss))
    return np.asarray(losses), state.params


def _torch_constants(betas_np):
    """The same fp64→fp32 schedule constants mrijax stores
    (`mrijax.diffusion.schedules.make_schedule`), as torch tensors."""
    acp = np.cumprod(1.0 - np.asarray(betas_np, np.float64))
    return (
        torch.tensor(np.sqrt(acp).astype(np.float32)),
        torch.tensor(np.sqrt(1.0 - acp).astype(np.float32)),
        torch.tensor((acp / (1.0 - acp)).astype(np.float32)),
    )


def _run_torch_trajectory(tm, betas_np, batches, lr, *, has_z, min_snr_gamma=None):
    """The reference training step: q_sample → UNet → (plain or min-SNR)
    MSE → Adam, exactly as `slice_cond_2d_ddpm/model.py:139-168` /
    `ddpm_3d_ldm/train.py:368-433` — with t/noise injected."""
    sqrt_acp, sqrt_1m_acp, snr = _torch_constants(betas_np)
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    to_cfirst = (0, 3, 1, 2) if has_z else (0, 4, 1, 2, 3)
    losses = []
    for b in batches:
        x = torch.tensor(b["x"].transpose(*to_cfirst))
        noise = torch.tensor(b["noise"].transpose(*to_cfirst))
        t = torch.tensor(b["t"])
        shape = (-1,) + (1,) * (x.ndim - 1)
        x_noisy = (sqrt_acp[t].reshape(shape) * x
                   + sqrt_1m_acp[t].reshape(shape) * noise)
        if has_z:
            pred = tm(x_noisy, t, torch.tensor(b["z"]))
        else:
            pred = tm(x_noisy, t)
        err2 = (pred - noise) ** 2
        if min_snr_gamma is None:
            loss = err2.mean()
        else:
            mse = err2.mean(dim=tuple(range(1, x.ndim)))
            w = torch.clamp(snr[t], max=min_snr_gamma) / snr[t]
            loss = (w * mse).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return np.asarray(losses)


def test_trajectory_parity_2d():
    """25 coupled Adam steps of the 2D slice-conditioned DDPM trainer."""
    torch.manual_seed(7)
    T, n_steps, lr = 20, 25, 2e-4
    mults = (1, 2)
    tm = TorchRefUNet(img_channels=1, base=16, mults=mults, tdim=32)
    params0 = convert_reference_unet2d(
        {f"model.{k}": v for k, v in tm.state_dict().items()},
        channel_mults=mults,
    )
    fm = UNet2D(in_channels=1, out_channels=1, base_channels=16,
                channel_mults=mults, time_emb_dim=32)
    betas = linear_beta_schedule(T)
    diffusion = GaussianDiffusion(make_schedule(betas), loss_type="mse")

    rng = np.random.default_rng(42)
    batches = [
        {
            "x": rng.normal(size=(4, 16, 16, 1)).astype(np.float32),
            "noise": rng.normal(size=(4, 16, 16, 1)).astype(np.float32),
            "t": rng.integers(0, T, size=(4,)).astype(np.int64),
            "z": rng.uniform(size=(4,)).astype(np.float32),
        }
        for _ in range(n_steps)
    ]

    losses_j, params_j = _run_mrijax_trajectory(
        fm, params0, diffusion, batches, lr, has_z=True
    )
    losses_t = _run_torch_trajectory(tm, betas, batches, lr, has_z=True)

    # loss trajectories agree step-for-step (loss ~ O(1); fp32 drift
    # compounds through Adam — measured max |Δ| = 6.0e-7 over 25 steps)
    np.testing.assert_allclose(losses_j, losses_t, rtol=0, atol=1e-4)
    # and the trajectory is a real one: training reduced the loss
    assert losses_j[-1] < losses_j[0]

    # final parameters agree through the converter (measured rel-L2 7.0e-8)
    params_t = convert_reference_unet2d(
        {f"model.{k}": v for k, v in tm.state_dict().items()},
        channel_mults=mults,
    )
    rel = _param_rel_l2(params_j, params_t)
    assert rel < 1e-4, f"2D final-param drift after {n_steps} steps: {rel:.2e}"


def test_trajectory_parity_ldm_stage2():
    """25 coupled Adam steps of the stage-2 latent-diffusion trainer:
    min-SNR loss, cosine schedule, t ~ U[1, T)."""
    torch.manual_seed(9)
    T, n_steps, lr = 16, 25, 1e-4
    tm = TUNet3D(cin=4, base=16, mults=(1, 2), tdim=32, heads=2)
    params0 = convert_reference_unet3d(
        tm.state_dict(), channel_mults=(1, 2), use_attention=True
    )
    fm = UNet3D(in_channels=4, base_channels=16, channel_mults=(1, 2),
                time_emb_dim=32, num_heads=2, use_attention=True,
                use_flash_attention=False)
    betas = cosine_beta_schedule(T)
    diffusion = GaussianDiffusion(make_schedule(betas), loss_type="min_snr")

    rng = np.random.default_rng(43)
    batches = [
        {
            # latent batches (the frozen-VAE encode is no-grad and
            # forward-parity-proven separately; identical latents feed both)
            "x": rng.normal(size=(2, 8, 8, 8, 4)).astype(np.float32),
            "noise": rng.normal(size=(2, 8, 8, 8, 4)).astype(np.float32),
            "t": rng.integers(1, T, size=(2,)).astype(np.int64),
            "z": None,
        }
        for _ in range(n_steps)
    ]

    losses_j, params_j = _run_mrijax_trajectory(
        fm, params0, diffusion, batches, lr, has_z=False
    )
    losses_t = _run_torch_trajectory(
        tm, betas, batches, lr, has_z=False, min_snr_gamma=5.0
    )

    np.testing.assert_allclose(losses_j, losses_t, rtol=0, atol=1e-4)
    assert losses_j[-1] < losses_j[0]

    params_t = convert_reference_unet3d(
        tm.state_dict(), channel_mults=(1, 2), use_attention=True
    )
    rel = _param_rel_l2(params_j, params_t)
    assert rel < 1e-4, f"LDM final-param drift after {n_steps} steps: {rel:.2e}"
