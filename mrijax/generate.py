"""Generation / inference tools for all three model families.

TPU-native re-design of the reference's inference scripts:

* ``sample_2d``, ``sample_pseudo3d_sweep`` ~ `slice_cond_2d_ddpm/
  show_model.py` — grid sampling at fixed z and the 155-slice z-sweep
  (already one batch in the reference; here additionally one compiled scan).
* ``generate_pseudo3d_real_context`` ~ `ddpm_25d_all_modalities/
  generate_pseudo3d_volume.py:104-179` — real-neighbor conditioning. The
  reference samples slice-by-slice in Python (119 sequential 1000-step
  loops); slices are independent given real context, so here ALL slices
  denoise as one batch: one scan, ~S× less wall-clock.
* ``generate_pseudo3d_hybrid`` ~ :185-299 — ascending-z autoregression
  where already-generated slices replace real context for j<k (boundary
  fallback to the real center slice, dz-major/modality-minor ordering).
  Inherently sequential over slices; each slice is one compiled scan.
* ``generate_3d_volumes`` + ``Vae3dDiagnostics`` ~ `ddpm_3d_ldm/
  show_model.py` — latent sampling (ancestral or strided DDIM) → VAE
  decode; recon/latent-stats/noising-roundtrip/eps-MSE probes.

All functions take (model, params) and return arrays; file IO lives in the
CLI layer.
"""

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mrijax.diffusion import GaussianDiffusion


# ------------------------------------------------------------------ 2D


def cfg_model_fn(model, params, z, guidance_scale: float, context=None):
    """Classifier-free-guided ε-predictor for the slice-position condition.

    ε = ε_null + s·(ε_cond − ε_null), evaluated as ONE batch-doubled
    forward (conditional half + null-token half) so the guided sampler
    stays a single scan. ``s=1`` is algebraically the plain conditional
    model (pinned by test); requires training with
    ``train.cond_dropout > 0`` so the network knows the null token
    (`train.steps.CFG_NULL_Z`). ↗ No reference analog."""
    from mrijax.train.steps import CFG_NULL_Z

    def model_fn(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        z2 = jnp.concatenate([z, jnp.full_like(z, CFG_NULL_Z)], axis=0)
        ctx2 = (jnp.concatenate([context, context], axis=0)
                if context is not None else None)
        eps2 = model.apply(params, x2, t2, z2, ctx2)
        eps_c, eps_u = jnp.split(eps2, 2, axis=0)
        return eps_u + guidance_scale * (eps_c - eps_u)

    return model_fn


def sample_2d(
    model,
    params,
    diffusion: GaussianDiffusion,
    *,
    num_samples: int,
    image_size: int,
    z_pos: float = 0.5,
    key=None,
    ddim_steps: Optional[int] = None,
    sampler: str = "ddim",
    channels: int = 1,
    mesh=None,
    guidance_scale: Optional[float] = None,
):
    """Unconditional-ish grid sampling at a fixed slice position
    (`show_model.py` mode "2d", default z=0.5). With ``mesh``, the batch
    is sharded data-parallel over the mesh (`parallel.sharded_sample`).
    ``guidance_scale`` enables classifier-free guidance (needs a model
    trained with ``train.cond_dropout > 0``; doubles per-step compute).

    Mesh + full-T ancestral caveat: inside ``sharded_sample``'s shard_map
    the scan fuses into ONE device execution, so tunnel backends with a
    per-execution cap (PERF.md "2D sampling") can crash the worker — use
    ``ddim_steps``/``sampler`` there, as the CLI does."""
    key = key if key is not None else jax.random.PRNGKey(0)
    # Segmentation inside shard_map would fuse back into one execution
    # anyway (p_sample_loop_auto docstring); call the plain loop there —
    # bit-identical result, no redundant trace work.
    ancestral = (diffusion.p_sample_loop if mesh is not None
                 else diffusion.p_sample_loop_auto)

    def _sample(p, k, local):
        z = jnp.full((local,), z_pos, jnp.float32)

        if guidance_scale is not None:
            model_fn = cfg_model_fn(model, p, z, guidance_scale)
        else:
            def model_fn(x, t):
                return model.apply(p, x, t, z)

        shape = (local, image_size, image_size, channels)
        if ddim_steps is not None:
            return diffusion.fast_sample(
                model_fn, shape, k, num_steps=ddim_steps, sampler=sampler
            )
        return ancestral(model_fn, shape, k)

    if mesh is not None:
        from mrijax.parallel.sampling import sharded_sample

        return sharded_sample(mesh, _sample, params, key, num_samples)
    return _sample(params, key, num_samples)


def sample_pseudo3d_sweep(
    model,
    params,
    diffusion: GaussianDiffusion,
    *,
    num_slices: int = 155,
    image_size: int = 128,
    key=None,
    ddim_steps: Optional[int] = None,
    sampler: str = "ddim",
    channels: int = 1,
    mesh=None,
    guidance_scale: Optional[float] = None,
):
    """z-sweep pseudo-3D volume: all ``num_slices`` positions sampled as one
    batch (`show_model.py:152-209`). Returns (S, H, W, C). With ``mesh``,
    the z positions are sharded over the mesh's data axis (mesh + full-T
    ancestral caveat: see ``sample_2d``)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    z = jnp.linspace(0.0, 1.0, num_slices)
    ancestral = (diffusion.p_sample_loop if mesh is not None
                 else diffusion.p_sample_loop_auto)

    def _sample(p, k, z_local):
        if guidance_scale is not None:
            model_fn = cfg_model_fn(model, p, z_local, guidance_scale)
        else:
            def model_fn(x, t):
                return model.apply(p, x, t, z_local)

        shape = (z_local.shape[0], image_size, image_size, channels)
        if ddim_steps is not None:
            return diffusion.fast_sample(
                model_fn, shape, k, num_steps=ddim_steps, sampler=sampler
            )
        return ancestral(model_fn, shape, k)

    if mesh is not None:
        from mrijax.parallel.sampling import sharded_sample

        return sharded_sample(mesh, _sample, params, key, num_slices, cond=z)
    return _sample(params, key, z)


# ----------------------------------------------------------------- 2.5D


def _subject_slices(dataset, subject_idx: int):
    """Dataset indices belonging to one subject (in ascending z)."""
    path = dataset.volume_paths[subject_idx]
    return [i for i, (p, _) in enumerate(dataset.slice_tuples) if p == path]


def conditional_sample_25d(
    model,
    params,
    diffusion: GaussianDiffusion,
    z_pos: jnp.ndarray,
    context: jnp.ndarray,
    *,
    key=None,
    ddim_steps: Optional[int] = None,
    sampler: str = "ddim",
    out_channels: int = 4,
    mesh=None,
    guidance_scale: Optional[float] = None,
):
    """Sample center slices given (z_pos (B,), context (B, H, W, Ck)).
    With ``mesh``, the (z_pos, context) batch is sharded data-parallel —
    real-context pseudo-3D generation then scales linearly with chips.
    ``guidance_scale`` applies classifier-free guidance on the z condition
    (the context stays attached to both halves; needs a model trained with
    ``train.cond_dropout > 0``). Mesh + full-T ancestral caveat: see
    ``sample_2d``."""
    key = key if key is not None else jax.random.PRNGKey(0)
    h, w = context.shape[1], context.shape[2]
    ancestral = (diffusion.p_sample_loop if mesh is not None
                 else diffusion.p_sample_loop_auto)

    def _sample(p, k, cond):
        z_l, ctx_l = cond

        if guidance_scale is not None:
            model_fn = cfg_model_fn(model, p, z_l, guidance_scale,
                                    context=ctx_l)
        else:
            def model_fn(x, t):
                return model.apply(p, x, t, z_l, ctx_l)

        shape = (ctx_l.shape[0], h, w, out_channels)
        if ddim_steps is not None:
            return diffusion.fast_sample(
                model_fn, shape, k, num_steps=ddim_steps, sampler=sampler
            )
        return ancestral(model_fn, shape, k)

    if mesh is not None:
        from mrijax.parallel.sampling import sharded_sample

        return sharded_sample(
            mesh, _sample, params, key, context.shape[0], cond=(z_pos, context)
        )
    return _sample(params, key, (z_pos, context))


def generate_pseudo3d_real_context(
    model,
    params,
    diffusion: GaussianDiffusion,
    dataset,
    subject_idx: int = 0,
    *,
    key=None,
    ddim_steps: Optional[int] = None,
    sampler: str = "ddim",
    batch_size: Optional[int] = None,
    mesh=None,
    guidance_scale: Optional[float] = None,
):
    """All slices of one subject conditioned on their REAL neighbors.

    Independent given real context ⇒ fully batched (the reference loops one
    slice at a time). Returns (S, H, W, 4) in [-1, 1]. With ``mesh``, each
    chunk is sharded over the mesh's data axis; the default ``batch_size``
    is then a multiple of the axis (4 slices/device) so every full chunk
    shards and only the ragged tail falls back to single-device.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    idxs = _subject_slices(dataset, subject_idx)
    samples = [dataset[i] for i in idxs]
    context = jnp.stack([s["context"] for s in samples])
    z_pos = jnp.asarray([s["z_pos"] for s in samples])
    n = len(idxs)
    if batch_size is None:
        batch_size = mesh.shape["data"] * 4 if mesh is not None else n
    bs = batch_size
    outs = []
    for s0 in range(0, n, bs):
        chunk = min(bs, n - s0)
        use_mesh = (
            mesh if mesh is not None and chunk % mesh.shape["data"] == 0 else None
        )
        outs.append(
            conditional_sample_25d(
                model, params, diffusion,
                z_pos[s0 : s0 + bs], context[s0 : s0 + bs],
                key=jax.random.fold_in(key, s0), ddim_steps=ddim_steps,
                sampler=sampler,
                mesh=use_mesh, guidance_scale=guidance_scale,
            )
        )
    return jnp.concatenate(outs, axis=0)


def generate_pseudo3d_hybrid(
    model,
    params,
    diffusion: GaussianDiffusion,
    dataset,
    subject_idx: int = 0,
    *,
    key=None,
    ddim_steps: Optional[int] = None,
    sampler: str = "ddim",
    progress: Optional[Callable[[int, int], None]] = None,
    guidance_scale: Optional[float] = None,
):
    """Ascending-z autoregressive generation: context uses already-generated
    slices for j<k, real slices otherwise; out-of-range neighbors fall back
    to the subject's real center slice k (reference :228-251 semantics,
    dz-major then modality channel order). Returns (S, H, W, 4)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    idxs = _subject_slices(dataset, subject_idx)
    samples = [dataset[i] for i in idxs]
    real_centers = [np.asarray(s["image"]) for s in samples]  # (H, W, 4)
    z_positions = [float(s["z_pos"]) for s in samples]
    n = len(idxs)
    radius = dataset.slice_radius
    gen = [None] * n

    for k in range(n):
        chans = []
        for dz in range(-radius, radius + 1):
            if dz == 0:
                continue
            j = k + dz
            if j < 0 or j >= n:
                neighbor = real_centers[k]
            elif j < k and gen[j] is not None:
                neighbor = gen[j]
            else:
                neighbor = real_centers[j]
            chans.append(neighbor)  # (H, W, 4); dz-major, modality-minor
        context = jnp.concatenate(chans, axis=-1)[None]  # (1, H, W, 4·2r)
        z = jnp.asarray([z_positions[k]])
        out = conditional_sample_25d(
            model, params, diffusion, z, context,
            key=jax.random.fold_in(key, k), ddim_steps=ddim_steps,
            sampler=sampler, guidance_scale=guidance_scale,
        )
        gen[k] = np.asarray(out[0])
        if progress is not None:
            progress(k + 1, n)
    return jnp.asarray(np.stack(gen))


# ------------------------------------------------------------------- 3D


def generate_3d_volumes(
    unet,
    unet_params,
    vae,
    vae_params,
    diffusion: GaussianDiffusion,
    *,
    num_volumes: int = 1,
    latent_spatial: Sequence[int],
    latent_channels: int,
    latent_scale: float = 1.0,
    key=None,
    ddim_steps: Optional[int] = None,
    sampler: str = "ddim",
    mesh=None,
):
    """Latent sample → unscale → VAE decode (`show_model.py:249-259`).
    Returns (N, D, H, W, C) volumes in model space. With ``mesh``, volumes
    are sharded over the mesh's data axis — each chip denoises and decodes
    its own shard with zero collectives (linear scaling over ICI).
    Mesh + full-T ancestral caveat: see ``sample_2d``."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ancestral = (diffusion.p_sample_loop if mesh is not None
                 else diffusion.p_sample_loop_auto)

    def _sample(ps, k, local):
        up, vp = ps
        shape = (local, *latent_spatial, latent_channels)

        def model_fn(x, t):
            return unet.apply(up, x, t)

        if ddim_steps is not None:
            z = diffusion.fast_sample(
                model_fn, shape, k, num_steps=ddim_steps, sampler=sampler
            )
        else:
            z = ancestral(model_fn, shape, k)
        z = z / latent_scale
        return vae.apply(vp, z, method="decode_from_latent")

    if mesh is not None:
        from mrijax.parallel.sampling import sharded_sample

        return sharded_sample(
            mesh, _sample, (unet_params, vae_params), key, num_volumes
        )
    return _sample((unet_params, vae_params), key, num_volumes)


def latent_shape_for(vae, vae_params, volume_shape) -> tuple:
    """Latent spatial size autodetect by encoding a dummy patch
    (`show_model.py:93-103`)."""
    dummy = jnp.zeros((1, *volume_shape), jnp.float32)
    mu = vae.apply(vae_params, dummy, method="encode_to_latent")
    return tuple(mu.shape[1:])


class Vae3dDiagnostics:
    """Sanity probes mirroring `ddpm_3d_ldm/show_model.py:262-351`."""

    def __init__(self, unet, unet_params, vae, vae_params,
                 diffusion: GaussianDiffusion, latent_scale: float = 1.0):
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.diffusion = diffusion
        self.latent_scale = latent_scale

    def _encode(self, x):
        z = self.vae.apply(self.vae_params, x, method="encode_to_latent")
        return z * self.latent_scale

    def _model_fn(self, x, t):
        return self.unet.apply(self.unet_params, x, t)

    def reconstruction(self, volumes):
        """VAE recon of real volumes; returns (recon, l1_error)."""
        z = self.vae.apply(self.vae_params, volumes, method="encode_to_latent")
        recon = self.vae.apply(self.vae_params, z, method="decode_from_latent")
        l1 = float(jnp.mean(jnp.abs(recon - volumes)))
        return recon, l1

    def latent_stats(self, volumes) -> dict:
        z = self._encode(volumes)
        return {
            "mean": float(jnp.mean(z)),
            "std": float(jnp.std(z)),
            "min": float(jnp.min(z)),
            "max": float(jnp.max(z)),
        }

    def noising_roundtrip(self, volumes, ts=(50, 100, 200, 399), key=None) -> dict:
        """Encode → q_sample to t → DDIM reverse from t → decode; reports the
        per-t L1 between original and roundtripped volumes (:298-336)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        z0 = self._encode(volumes)
        out = {}
        for t in ts:
            t = int(min(t, self.diffusion.timesteps - 1))
            tt = jnp.full((z0.shape[0],), t, jnp.int32)
            noise = jax.random.normal(jax.random.fold_in(key, t), z0.shape)
            zt = self.diffusion.q_sample(z0, tt, noise)
            zr = self.diffusion.ddim_sample(
                self._model_fn, z0.shape, x_t=zt, start_t=t
            )
            rec = self.vae.apply(
                self.vae_params, zr / self.latent_scale, method="decode_from_latent"
            )
            out[t] = float(jnp.mean(jnp.abs(rec - volumes)))
        return out

    def eps_mse_by_t(self, volumes, num_ts: int = 8, key=None) -> dict:
        """ε-prediction MSE on a grid of timesteps (:339-351)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        z0 = self._encode(volumes)
        grid = np.linspace(1, self.diffusion.timesteps - 1, num_ts).astype(int)
        out = {}
        for t in grid:
            tt = jnp.full((z0.shape[0],), int(t), jnp.int32)
            noise = jax.random.normal(jax.random.fold_in(key, int(t)), z0.shape)
            zt = self.diffusion.q_sample(z0, tt, noise)
            eps = self._model_fn(zt, tt)
            out[int(t)] = float(jnp.mean(jnp.square(eps - noise)))
        return out
