"""Jitted SPMD train/eval steps for all three model families.

Each factory returns a single compiled function covering what the reference
spreads across a Python hot loop (H2D copies, autocast regions, GradScaler
calls, per-step ``loss.item()`` syncs — e.g.
`slice_cond_2d_ddpm/model.py:139-194`): timestep sampling, q_sample, model
forward, loss, backward, and the optimizer update all fuse into one XLA
program. Under a data-parallel mesh the gradient all-reduce over ICI is
inserted by the SPMD partitioner — the DDP/NCCL layer of
`ddpm_3d_ldm/train.py:76-144` has no explicit equivalent here.

Conventions: batches are channels-last pytrees of device arrays (shard the
batch dim with ``mrijax.parallel.shard_batch``); params are replicated;
losses come back as fp32 scalars (replicated, so ``float(loss)`` needs no
extra collective).
"""

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mrijax.diffusion import GaussianDiffusion
from mrijax.train.state import ema_update


def sample_timesteps(key, batch_size: int, timesteps: int, t_min: int = 0):
    """t ~ U[t_min, T). 2D/2.5D use t_min=0 (model.py:154-159); the 3D latent
    trainer uses t_min=1 (train.py:391)."""
    return jax.random.randint(key, (batch_size,), t_min, timesteps)


def apply_if_finite(state, grads, loss):
    """Optimizer update skipped when the step went non-finite.

    The reference has no NaN/Inf protection anywhere (SURVEY §5: "no NaN
    guards") — one overflowing batch poisons the params permanently, and
    under DDP the poison all-reduces to every rank. Here the update is
    applied exactly when the loss AND every gradient leaf are finite; a
    bad step leaves the params untouched and still reports its loss for
    logging/alerting. Inside jit this is a `where`-select, not control
    flow — zero recompilation, negligible cost next to the backward.
    """
    gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
    ok = jnp.isfinite(loss) & jnp.isfinite(gsum)
    new_state = state.apply_gradients(grads=grads)
    return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state), loss


# --------------------------------------------------------------------- DDPM


# classifier-free-guidance null token for the slice-position condition:
# real z_pos lives in [0, 1]; the network learns -1 as "no condition"
# when trained with cond_dropout > 0 (↗ no reference analog)
CFG_NULL_Z = -1.0


def make_diffusion_train_step(
    model, diffusion: GaussianDiffusion, *, t_min: int = 0, donate: bool = True,
    nan_guard: bool = False, ema_decay=None, cond_dropout: float = 0.0,
):
    """Train step for the 2D / 2.5D DDPMs.

    batch: {"image": (B, H, W, C), "z_pos": (B,) [, "context": (B, H, W, Ck)]}
    ``ema_decay``: when set, the state's EMA shadow params are updated in
    the same program (state must be created with ``ema=True``).
    ``cond_dropout``: classifier-free-guidance training — each sample's
    z_pos is replaced by the ``CFG_NULL_Z`` null token with this
    probability, teaching one network both the conditional and the
    unconditional score so sampling can extrapolate between them
    (``generate.sample_2d(guidance_scale=...)``). 0.0 (the default)
    leaves the program AND its RNG stream bit-identical to the
    pre-CFG step (pinned by test).
    """

    def loss_fn(params, batch, t, noise, z):
        context = batch.get("context")

        def model_fn(x, tt):
            return model.apply(params, x, tt, z, context)

        return diffusion.p_losses(model_fn, batch["image"], t, noise)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch, key):
        tkey, nkey = jax.random.split(key)
        b = batch["image"].shape[0]
        t = sample_timesteps(tkey, b, diffusion.timesteps, t_min)
        noise = jax.random.normal(nkey, batch["image"].shape, jnp.float32)
        z = batch["z_pos"]
        if cond_dropout > 0.0:
            # extra key derived only in the CFG regime so cond_dropout=0
            # reproduces the historical draw sequence exactly
            dkey = jax.random.fold_in(key, 0x0CF6)
            drop = jax.random.bernoulli(dkey, cond_dropout, (b,))
            z = jnp.where(drop, jnp.float32(CFG_NULL_Z), z)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, t, noise, z
        )
        if nan_guard:
            state, loss = apply_if_finite(state, grads, loss)
        else:
            state = state.apply_gradients(grads=grads)
        if ema_decay is not None:
            state = ema_update(state, ema_decay)
        return state, loss

    return train_step


def make_diffusion_eval_step(model, diffusion: GaussianDiffusion, *, t_min: int = 0):
    def loss_fn(params, batch, t, noise):
        context = batch.get("context")

        def model_fn(x, tt):
            return model.apply(params, x, tt, batch["z_pos"], context)

        return diffusion.p_losses(model_fn, batch["image"], t, noise)

    @jax.jit
    def eval_step(params, batch, key):
        tkey, nkey = jax.random.split(key)
        b = batch["image"].shape[0]
        t = sample_timesteps(tkey, b, diffusion.timesteps, t_min)
        noise = jax.random.normal(nkey, batch["image"].shape, jnp.float32)
        return loss_fn(params, batch, t, noise)

    return eval_step


# ---------------------------------------------------------------------- VAE


def vae_loss(recon, x, mu, logvar, kl_weight: float):
    """L1 reconstruction + KL (reference `ddpm_3d_ldm/train.py:277-279`):
    kl = -0.5 * mean(1 + logσ² - μ² - e^{logσ²})."""
    recon_loss = jnp.mean(jnp.abs(recon.astype(jnp.float32) - x.astype(jnp.float32)))
    kl = -0.5 * jnp.mean(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
    return recon_loss + kl_weight * kl, (recon_loss, kl)


def make_vae_train_step(vae, *, kl_weight: float = 1e-4, donate: bool = True,
                        nan_guard: bool = False, grad_accum: int = 1):
    """batch: {"volume": (B, D, H, W, C)}.

    ``grad_accum > 1``: gradient accumulation as a ``lax.scan`` over
    ``grad_accum`` microbatches of ``B / grad_accum`` volumes, one optimizer
    update on the averaged gradient. The scan body is traced ONCE at
    microbatch size, so the compiled fwd+bwd graph stays exactly as large
    as the microbatch program — the engineering point on this hardware:
    the flagship-size (128×160×160) VAE fwd+bwd crashes the TPU compiler
    at batch ≥ 2 even with remat (PERF.md "Stage-1 VAE training"), and
    accumulation is the only way to raise the effective batch past that
    ceiling inside one chip. The averaged gradient is mathematically the
    large-batch gradient: ``vae_loss`` is a mean over its batch, and the
    mean of equal-size microbatch means IS the full-batch mean (pinned by
    ``tests/test_grad_accum.py`` against a hand-built per-microbatch
    oracle). Microbatch a takes the STRIDED rows ``{m * grad_accum + a}``
    so that under a data mesh every device contributes equally to every
    microbatch (a contiguous split would route whole microbatches to
    device subsets and serialize the mesh). Each microbatch reparametrizes
    with its own fold_in key; ``grad_accum=1`` is bit-identical to the
    historical single-batch step. The reference has no accumulation — its
    stage-1 is locked to bs=1 per GPU (`ddpm_3d_ldm/train.py:258-348`).
    """

    def loss_fn(params, x, rng):
        recon, mu, logvar = vae.apply(params, x, rng)
        return vae_loss(recon, x, mu, logvar, kl_weight)

    if grad_accum <= 1:
        @partial(jax.jit, donate_argnums=(0,) if donate else ())
        def train_step(state, batch, key):
            (loss, (recon_loss, kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch["volume"], key)
            if nan_guard:
                state, _ = apply_if_finite(state, grads, loss)
            else:
                state = state.apply_gradients(grads=grads)
            return state, {"loss": loss, "recon": recon_loss, "kl": kl}

        return train_step

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch, key):
        x = batch["volume"]
        b = x.shape[0]
        if b % grad_accum:
            raise ValueError(
                f"batch size {b} is not divisible by grad_accum={grad_accum}"
            )
        micro = b // grad_accum
        # strided microbatch assignment: row r -> microbatch r % grad_accum
        xs = jnp.moveaxis(x.reshape(micro, grad_accum, *x.shape[1:]), 1, 0)
        keys = jax.random.split(key, grad_accum)

        def body(gsum, inp):
            xm, km = inp
            (loss, (recon, kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, xm, km)
            gsum = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), gsum, grads
            )
            return gsum, jnp.stack([loss, recon, kl])

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        gsum, per_micro = jax.lax.scan(body, zeros, (xs, keys))
        grads = jax.tree.map(lambda g: g / grad_accum, gsum)
        loss, recon_loss, kl = jnp.mean(per_micro, axis=0)
        if nan_guard:
            state, _ = apply_if_finite(state, grads, loss)
        else:
            state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, "recon": recon_loss, "kl": kl}

    return train_step


def make_vae_eval_step(vae, *, kl_weight: float = 1e-4):
    @jax.jit
    def eval_step(params, batch, key):
        recon, mu, logvar = vae.apply(params, batch["volume"], key)
        loss, (recon_loss, kl) = vae_loss(
            recon, batch["volume"], mu, logvar, kl_weight
        )
        return {"loss": loss, "recon": recon_loss, "kl": kl}

    return eval_step


@partial(jax.jit, static_argnums=(0,))
def _encode_latent(vae, vae_params, x):
    return vae.apply(vae_params, x, method="encode_to_latent")


def estimate_latent_scale(vae, vae_params, batches) -> float:
    """1/√(mean per-batch latent variance) over ≤N batches
    (reference `ddpm_3d_ldm/train.py:350-364`). Under SPMD every device sees
    the same replicated result — no rank-0 broadcast needed."""
    vars_ = []
    for x in batches:
        z = _encode_latent(vae, vae_params, x)
        vars_.append(float(jnp.var(z)))
    v = float(jnp.mean(jnp.asarray(vars_))) if vars_ else 1.0
    return 1.0 / (max(v, 1e-8) ** 0.5)


# ----------------------------------------------------------- latent diffusion


def make_latent_diffusion_train_step(
    unet, vae, diffusion: GaussianDiffusion, *, t_min: int = 1, donate: bool = True,
    nan_guard: bool = False, ema_decay=None,
):
    """Stage-2 LDM step: frozen-VAE encode → scale → min-SNR diffusion loss.

    batch: {"volume": (B, D, H, W, C)}; ``latent_scale`` is a traced scalar
    so re-estimation does not recompile.
    """

    def loss_fn(params, z, t, noise):
        def model_fn(x, tt):
            return unet.apply(params, x, tt)

        return diffusion.p_losses(model_fn, z, t, noise)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, vae_params, batch, key, latent_scale):
        z = vae.apply(vae_params, batch["volume"], method="encode_to_latent")
        z = jax.lax.stop_gradient(z.astype(jnp.float32)) * latent_scale
        tkey, nkey = jax.random.split(key)
        t = sample_timesteps(tkey, z.shape[0], diffusion.timesteps, t_min)
        noise = jax.random.normal(nkey, z.shape, jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, z, t, noise)
        if nan_guard:
            state, loss = apply_if_finite(state, grads, loss)
        else:
            state = state.apply_gradients(grads=grads)
        if ema_decay is not None:
            state = ema_update(state, ema_decay)
        return state, loss

    return train_step


def make_cached_latent_train_step(
    unet, diffusion: GaussianDiffusion, *, t_min: int = 1, donate: bool = True,
    nan_guard: bool = False, ema_decay=None,
):
    """Stage-2 LDM step over PRECOMPUTED frozen-VAE latents.

    TPU-native optimization of the reference's per-step re-encode
    (`ddpm_3d_ldm/train.py:391-400` encodes every batch through the frozen
    VAE forever): the encoder is frozen after stage 1, so its output is a
    pure function of the data — encode each full volume ONCE offline
    (``mrijax.data.packing.pack_latents``) and train from latent crops.
    Measured on one v5e chip at flagship scale (PERF.md "Cached-latent
    training"): encode-per-step at the reference's bs=1 trains ~2.5
    volumes/s; the cached step at batch 32 with selective remat
    (``unet.remat_levels=(0,)`` — only the full-resolution res blocks
    recompute) trains ~29 vols/s — the encode leaves the step entirely,
    batching fills the MXU, and remat of just the level-0 activations
    (the HBM hog) keeps batch ≥16 inside HBM for half the recompute of
    full remat.

    batch: {"latent": (B, d, h, w, Cz)} — raw (unscaled) VAE means.
    Identical math to ``make_latent_diffusion_train_step`` given the same
    latents and RNG key (pinned by test).
    """

    def loss_fn(params, z, t, noise):
        def model_fn(x, tt):
            return unet.apply(params, x, tt)

        return diffusion.p_losses(model_fn, z, t, noise)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch, key, latent_scale):
        z = batch["latent"].astype(jnp.float32) * latent_scale
        tkey, nkey = jax.random.split(key)
        t = sample_timesteps(tkey, z.shape[0], diffusion.timesteps, t_min)
        noise = jax.random.normal(nkey, z.shape, jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, z, t, noise)
        if nan_guard:
            state, loss = apply_if_finite(state, grads, loss)
        else:
            state = state.apply_gradients(grads=grads)
        if ema_decay is not None:
            state = ema_update(state, ema_decay)
        return state, loss

    return train_step


def make_cached_latent_eval_step(unet, diffusion: GaussianDiffusion):
    """Fixed-timestep validation on precomputed latents (same grid protocol
    as ``make_latent_diffusion_eval_step``)."""

    @jax.jit
    def eval_step(params, batch, key, latent_scale, t_fixed):
        z = batch["latent"].astype(jnp.float32) * latent_scale
        t = jnp.full((z.shape[0],), t_fixed, jnp.int32)
        noise = jax.random.normal(key, z.shape, jnp.float32)

        def model_fn(x, tt):
            return unet.apply(params, x, tt)

        return diffusion.p_losses(model_fn, z, t, noise)

    return eval_step


def estimate_latent_scale_from_latents(batches) -> float:
    """``estimate_latent_scale`` when the latents are already in hand:
    1/√(mean per-batch latent variance) (`ddpm_3d_ldm/train.py:350-364`)."""
    vars_ = [float(jnp.var(jnp.asarray(z))) for z in batches]
    v = float(jnp.mean(jnp.asarray(vars_))) if vars_ else 1.0
    return 1.0 / (max(v, 1e-8) ** 0.5)


def make_latent_diffusion_eval_step(unet, vae, diffusion: GaussianDiffusion):
    """Fixed-timestep validation: the reference evaluates on a deterministic
    grid linspace(1, T-1, 8) cycled across batches for low-variance val loss
    (`ddpm_3d_ldm/train.py:446-458`). Pass the grid value as ``t_fixed``."""

    @jax.jit
    def eval_step(params, vae_params, batch, key, latent_scale, t_fixed):
        z = vae.apply(vae_params, batch["volume"], method="encode_to_latent")
        z = z.astype(jnp.float32) * latent_scale
        t = jnp.full((z.shape[0],), t_fixed, jnp.int32)
        noise = jax.random.normal(key, z.shape, jnp.float32)

        def model_fn(x, tt):
            return unet.apply(params, x, tt)

        return diffusion.p_losses(model_fn, z, t, noise)

    return eval_step


def fixed_validation_timesteps(timesteps: int, n: int = 8) -> jnp.ndarray:
    return jnp.linspace(1, timesteps - 1, n).astype(jnp.int32)
