"""Experiment drivers: config → data → model → Trainer for all 3 families.

These are the TPU-native equivalents of the reference's three training
entry points (`python -m model_scripts.<exp>.<module>`):

* ``train_slice_cond_2d``  ~ slice_cond_2d_ddpm/model.py
* ``train_ddpm_25d``       ~ ddpm_25d_all_modalities/model.py
* ``train_ddpm_3d_ldm``    ~ ddpm_3d_ldm/train.py (two-stage: VAE → LDM,
  with latent-scale estimation between stages and the fixed-timestep
  validation grid)

``run_experiment`` dispatches on ``cfg.family``. A data-parallel mesh over
all devices replaces both DataParallel and DDP/NCCL; pass ``mesh=None`` to
build one automatically.
"""

import json
import traceback
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from mrijax.config import DiffusionConfig, ExperimentConfig, TrainConfig, UNetConfig, VAEConfig
from mrijax.data import (
    BatchLoader,
    MultiModalSliceDataset25D,
    PackedLatentDataset,
    PackedMultiModalDataset25D,
    PackedSliceDataset,
    PackedVolumeDataset,
    SliceDataset2D,
    VolumeDataset3D,
    pack_latents,
    split_dataset,
    take_subset,
)
from mrijax.data.packing import (
    latent_cache_is_stale,
    latent_source_files,
    params_fingerprint,
)
from mrijax.diffusion import (
    GaussianDiffusion,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
)
from mrijax.io import CheckpointManager
from mrijax.models import UNet2D, UNet3D, VAE3D
from mrijax.obs import MetricsLogger, install_signal_handlers
from mrijax.parallel import (
    broadcast_from_host0,
    global_put,
    make_mesh,
    replicated_sharding,
)
from mrijax.train.state import create_train_state
from mrijax.train.steps import (
    estimate_latent_scale,
    estimate_latent_scale_from_latents,
    fixed_validation_timesteps,
    make_cached_latent_eval_step,
    make_cached_latent_train_step,
    make_diffusion_eval_step,
    make_diffusion_train_step,
    make_latent_diffusion_eval_step,
    make_latent_diffusion_train_step,
    make_vae_eval_step,
    make_vae_train_step,
)
from mrijax.train.trainer import Trainer, TrainerResult


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def build_diffusion(cfg: DiffusionConfig) -> GaussianDiffusion:
    if cfg.schedule == "linear":
        betas = linear_beta_schedule(cfg.timesteps, cfg.beta_start, cfg.beta_end)
    elif cfg.schedule == "cosine":
        betas = cosine_beta_schedule(cfg.timesteps)
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    return GaussianDiffusion(
        make_schedule(betas), loss_type=cfg.loss_type, min_snr_gamma=cfg.min_snr_gamma
    )


def build_unet2d(cfg: UNetConfig) -> UNet2D:
    if cfg.remat_levels is not None:
        # fail loudly instead of silently ignoring the knob: only the 3D
        # UNet implements per-level selective remat
        raise ValueError(
            "unet.remat_levels is only supported by the 3D UNet "
            "(ddpm_3d_ldm family); use unet.remat for the 2D/2.5D families"
        )
    return UNet2D(
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        base_channels=cfg.base_channels,
        channel_mults=cfg.channel_mults,
        time_emb_dim=cfg.time_emb_dim,
        groups=cfg.groups,
        remat=cfg.remat,
        dtype=_dtype(cfg.compute_dtype),
    )


def build_unet3d(cfg: UNetConfig, *, use_flash: Optional[bool] = None) -> UNet3D:
    if cfg.remat_levels is not None:
        # validate HERE (not only at trace time): the two-stage trainer
        # otherwise spends all of stage 1 before the stage-2 UNet traces
        n = len(cfg.channel_mults)
        bad = [l for l in cfg.remat_levels if not 0 <= l < n]
        if bad:
            raise ValueError(
                f"unet.remat_levels {tuple(cfg.remat_levels)} out of range "
                f"for {n} resolution levels (valid: 0..{n - 1})"
            )
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    return UNet3D(
        in_channels=cfg.in_channels,
        base_channels=cfg.base_channels,
        channel_mults=cfg.channel_mults,
        time_emb_dim=cfg.time_emb_dim,
        groups=cfg.groups,
        num_heads=cfg.num_heads,
        use_attention=cfg.use_attention,
        attention_levels=cfg.attention_levels,
        use_flash_attention=use_flash,
        remat=cfg.remat,
        remat_levels=cfg.remat_levels,
        dtype=_dtype(cfg.compute_dtype),
    )


def build_vae3d(cfg: VAEConfig) -> VAE3D:
    return VAE3D(
        in_channels=cfg.in_channels,
        base_channels=cfg.base_channels,
        num_down=cfg.num_down,
        latent_channels=cfg.latent_channels,
        remat=cfg.remat,
        dtype=_dtype(cfg.compute_dtype),
    )


def _make_loaders(cfg: ExperimentConfig, dataset, mesh, batch_size=None):
    d = cfg.data
    if batch_size is None:  # not `or`: an explicit 0 must hit the
        batch_size = d.batch_size  # "must be positive" error, not fall back
    if d.subsample_fraction:
        dataset = take_subset(dataset, fraction=d.subsample_fraction, seed=42)
    if cfg.train.debug_fast:
        dataset = take_subset(dataset, max_items=max(4 * batch_size, 64), seed=42)
    train_ds, val_ds = split_dataset(dataset, d.val_fraction, seed=0)
    if len(train_ds) < batch_size:
        raise ValueError(
            f"train split has {len(train_ds)} items < batch size {batch_size} "
            "(drop_last would yield zero batches) — lower the batch size or "
            "add data"
        )
    train_loader = BatchLoader(
        train_ds, batch_size, shuffle=True, drop_last=True,
        seed=d.shuffle_seed, mesh=mesh,
    )
    val_loader = BatchLoader(
        val_ds, batch_size, shuffle=False, drop_last=False, mesh=mesh
    )
    # drop_last=False can yield a final batch not divisible by the mesh;
    # keep validation simple by dropping it when sharded.
    if mesh is not None:
        val_loader.drop_last = True
    return train_loader, val_loader


def _build_2d_dataset(cfg: ExperimentConfig):
    d = cfg.data
    if d.packed_dir:
        return PackedSliceDataset(d.packed_dir)
    return SliceDataset2D(d.root_dir, d.image_size, d.modality_suffix)


def _trainer(cfg_train: TrainConfig, *, ckpt_dir, logger, train_step, eval_step,
             train_loader, val_loader, prefix="", extra=None,
             root=None) -> Trainer:
    """``root`` overrides ``cfg_train.checkpoint_dir`` as the checkpoint
    tree base. The 3D two-stage experiment passes ``cfg.train.checkpoint_dir``
    for BOTH stages: a run is ONE directory (config.json, vae/, ldm/,
    latent_cache/ — what `sample`/`export`/resume read), and rooting stage 1
    at ``vae_train.checkpoint_dir`` instead silently split the run across
    two trees when only ``train.checkpoint_dir`` was overridden — worse, a
    rerun then RESUMED stage 1 from the stale default-dir checkpoint and
    reported success after 0 epochs (found by the r4 TPU CLI smoke run)."""
    ckpt = CheckpointManager(
        Path(root or cfg_train.checkpoint_dir) / ckpt_dir,
        max_to_keep=cfg_train.max_checkpoints,
    )
    return Trainer(
        train_step=train_step,
        eval_step=eval_step,
        train_loader=train_loader,
        val_loader=val_loader,
        logger=logger,
        checkpoint_manager=ckpt,
        epochs=cfg_train.epochs,
        plateau_factor=cfg_train.plateau_factor,
        plateau_patience=cfg_train.plateau_patience,
        early_stop_patience=cfg_train.early_stop_patience,
        log_every_steps=cfg_train.log_every_steps,
        debug_max_steps=cfg_train.debug_max_steps if cfg_train.debug_fast else None,
        seed=cfg_train.seed,
        metric_prefix=prefix,
        checkpoint_extra=extra,
        resume=cfg_train.resume,
    )


def _init_params(model, *args, seed=0, mesh=None):
    """Init on host CPU (flax init executes the forward; keep it off the
    device tunnel), then replicate across the mesh (or place on the default
    device when mesh is None)."""
    from mrijax.kernels.dispatch import host_init

    # Every process inits from the same PRNGKey, so host values agree and
    # global_put can place them without any cross-host broadcast.
    with host_init():
        params = model.init(jax.random.PRNGKey(seed), *args)
    if mesh is not None:
        # global_put, not device_put: multi-process placement from identical
        # host values (see parallel.mesh.global_put)
        return global_put(params, replicated_sharding(mesh))
    return jax.device_put(params, jax.devices()[0])


def _use_fsdp(train_cfg, mesh) -> bool:
    """FSDP is a layout, so it only means anything on a >1-device data
    axis; quietly fall back to replicated otherwise."""
    return bool(
        train_cfg.fsdp and mesh is not None and mesh.shape.get("data", 1) > 1
    )


def _place_state_and_step(state, mesh, use_fsdp: bool, train_step,
                          min_leaf_elems: int = 2 ** 15):
    """Place the train state on the mesh and return the (possibly wrapped)
    train step.

    Default: full replication — the SPMD equivalent of DDP. With
    ``train.fsdp``: the ZeRO layout from ``mrijax.parallel.fsdp`` (~1/N
    state memory per chip); the step is wrapped so the updated state keeps
    the sharded layout (build the inner step with ``donate=False`` — the
    wrapper donates at the outer jit instead). Orbax resume keeps working
    either way: restore uses the live state as its template, shardings
    included."""
    if use_fsdp:
        from mrijax.parallel import fsdp_step, shard_train_state

        state, shardings = shard_train_state(
            mesh, state, min_leaf_elems=min_leaf_elems
        )
        return state, fsdp_step(train_step, shardings)
    return global_put(state, replicated_sharding(mesh)), train_step


# ------------------------------------------------------------- 2D / 2.5D


def _default_mesh(cfg: ExperimentConfig):
    devices = jax.devices()
    if cfg.train.num_devices:
        devices = devices[: cfg.train.num_devices]
    return make_mesh(("data",), devices=devices)


def train_slice_cond_2d(cfg: ExperimentConfig, mesh=None, logger=None) -> TrainerResult:
    install_signal_handlers()
    mesh = mesh or _default_mesh(cfg)
    own_logger = logger is None
    logger = logger or MetricsLogger(cfg.family, run_name=cfg.name)
    logger.log_params(_flatten_cfg(cfg))

    dataset = _build_2d_dataset(cfg)
    train_loader, val_loader = _make_loaders(cfg, dataset, mesh)

    model = build_unet2d(cfg.unet)
    diffusion = build_diffusion(cfg.diffusion)
    s = cfg.data.image_size
    params = _init_params(
        model,
        jnp.zeros((1, s, s, cfg.unet.in_channels), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)),
        seed=cfg.train.seed, mesh=mesh,
    )
    use_fsdp = _use_fsdp(cfg.train, mesh)
    state, train_step = _place_state_and_step(
        create_train_state(params, cfg.train.learning_rate,
                           ema=cfg.train.ema_decay is not None),
        mesh, use_fsdp,
        make_diffusion_train_step(
            model, diffusion, t_min=cfg.diffusion.t_min,
            nan_guard=cfg.train.nan_guard, ema_decay=cfg.train.ema_decay,
            donate=not use_fsdp, cond_dropout=cfg.train.cond_dropout,
        ),
        min_leaf_elems=cfg.train.fsdp_min_leaf_elems,
    )
    eval_step = make_diffusion_eval_step(model, diffusion, t_min=cfg.diffusion.t_min)
    trainer = _trainer(
        cfg.train, ckpt_dir=f"{cfg.family}/{cfg.name}", logger=logger,
        train_step=train_step, eval_step=eval_step,
        train_loader=train_loader, val_loader=val_loader,
    )
    with mesh:
        result = trainer.fit(state)
    if own_logger:
        logger.finish()
    return result


def train_ddpm_25d(cfg: ExperimentConfig, mesh=None, logger=None) -> TrainerResult:
    install_signal_handlers()
    mesh = mesh or _default_mesh(cfg)
    own_logger = logger is None
    logger = logger or MetricsLogger(cfg.family, run_name=cfg.name)
    logger.log_params(_flatten_cfg(cfg))

    d = cfg.data
    if d.packed_dir:
        dataset = PackedMultiModalDataset25D(d.packed_dir, d.slice_radius)
    else:
        dataset = MultiModalSliceDataset25D(d.root_dir, d.image_size, d.slice_radius)
    train_loader, val_loader = _make_loaders(cfg, dataset, mesh)

    model = build_unet2d(cfg.unet)
    diffusion = build_diffusion(cfg.diffusion)
    s = d.image_size
    ctx_ch = cfg.unet.in_channels - cfg.unet.out_channels
    params = _init_params(
        model,
        jnp.zeros((1, s, s, cfg.unet.out_channels), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)),
        jnp.zeros((1, s, s, ctx_ch), jnp.float32),
        seed=cfg.train.seed, mesh=mesh,
    )
    use_fsdp = _use_fsdp(cfg.train, mesh)
    state, train_step = _place_state_and_step(
        create_train_state(params, cfg.train.learning_rate,
                           ema=cfg.train.ema_decay is not None),
        mesh, use_fsdp,
        make_diffusion_train_step(
            model, diffusion, t_min=cfg.diffusion.t_min,
            nan_guard=cfg.train.nan_guard, ema_decay=cfg.train.ema_decay,
            donate=not use_fsdp, cond_dropout=cfg.train.cond_dropout,
        ),
        min_leaf_elems=cfg.train.fsdp_min_leaf_elems,
    )
    eval_step = make_diffusion_eval_step(model, diffusion, t_min=cfg.diffusion.t_min)
    trainer = _trainer(
        cfg.train, ckpt_dir=f"{cfg.family}/{cfg.name}", logger=logger,
        train_step=train_step, eval_step=eval_step,
        train_loader=train_loader, val_loader=val_loader,
    )
    with mesh:
        result = trainer.fit(state)
    if own_logger:
        logger.finish()
    return result


# ------------------------------------------------------------ 3D two-stage


def train_ddpm_3d_ldm(cfg: ExperimentConfig, mesh=None, logger=None):
    """Two-stage: (1) VAE on volumes; (2) frozen-VAE latent diffusion.

    Returns (vae_result, ldm_result, latent_scale). The latent-scale
    estimate runs as replicated SPMD compute (no rank-0 broadcast —
    reference `train.py:350-364,539-553`).
    """
    install_signal_handlers()
    mesh = mesh or _default_mesh(cfg)
    own_logger = logger is None
    logger = logger or MetricsLogger(cfg.family, run_name=cfg.name)
    logger.log_params(_flatten_cfg(cfg))

    # fail fast on a bad stage-2 UNet config BEFORE the (expensive) VAE
    # stage runs — the UNet is otherwise only built after stage 1
    build_unet3d(cfg.unet, use_flash=False)

    d = cfg.data
    if d.packed_dir:
        dataset = PackedVolumeDataset(d.packed_dir, d.patch_size, random_crop=True)
    else:
        dataset = VolumeDataset3D(d.root_dir, d.patch_size, random_crop=True)
    train_loader, val_loader = _make_loaders(cfg, dataset, mesh)

    vae = build_vae3d(cfg.vae)
    if cfg.train.cache_latents:
        # fail fast, BEFORE hours of stage-1 VAE training: latent crops need
        # the patch on the encoder's 2**(num_down-1) pixel grid
        f = vae.spatial_downsample
        if any(p % f for p in d.patch_size):
            raise ValueError(
                f"cache_latents requires patch_size {d.patch_size} divisible "
                f"by the VAE downsample factor {f}"
            )
    vol_shape = (1, *d.patch_size, cfg.vae.in_channels)
    vae_params = _init_params(
        vae, jnp.zeros((1, 16, 16, 16, cfg.vae.in_channels), jnp.float32),
        jax.random.PRNGKey(1), seed=cfg.vae_train.seed, mesh=mesh,
    )
    vae_fsdp = _use_fsdp(cfg.vae_train, mesh)
    vae_state, vae_step = _place_state_and_step(
        create_train_state(vae_params, cfg.vae_train.learning_rate),
        mesh, vae_fsdp,
        make_vae_train_step(vae, kl_weight=cfg.vae.kl_weight,
                            nan_guard=cfg.vae_train.nan_guard,
                            donate=not vae_fsdp,
                            grad_accum=cfg.vae_train.grad_accum),
        min_leaf_elems=cfg.vae_train.fsdp_min_leaf_elems,
    )

    vae_trainer = _trainer(
        cfg.vae_train, ckpt_dir=f"{cfg.family}/{cfg.name}/vae", logger=logger,
        train_step=vae_step,
        eval_step=make_vae_eval_step(vae, kl_weight=cfg.vae.kl_weight),
        train_loader=train_loader, val_loader=val_loader, prefix="vae_",
        root=cfg.train.checkpoint_dir,  # one run = one directory tree
    )
    with mesh:
        vae_result = vae_trainer.fit(vae_state)
    vae_params = vae_result.state.params  # frozen from here on

    # The VAE is frozen from here on, so its output is a pure function of
    # the data: with cache_latents, encode every full volume ONCE and run
    # the whole LDM stage from latent crops — removing the per-step encode
    # that costs 183 of 273 ms at flagship scale (PERF.md; the reference
    # re-encodes every batch forever, train.py:391-400).
    use_cache = cfg.train.cache_latents
    if use_cache:
        f = vae.spatial_downsample  # 2**(num_down-1), NOT 2**num_down
        cache_dir = (
            Path(cfg.train.checkpoint_dir) / cfg.family / cfg.name / "latent_cache"
        )
        fp = params_fingerprint(vae_params)
        src_dir = d.packed_dir or d.root_dir
        src_files = latent_source_files(src_dir)
        idx_path = cache_dir / "index.json"
        needs_pack = latent_cache_is_stale(idx_path, fp, src_files)
        # Multi-host: only process 0 writes the cache (np.savez is not
        # atomic — concurrent writers would corrupt shards). The DECISION is
        # host 0's, broadcast so every process enters the same collectives
        # even if a stale filesystem view made needs_pack diverge; the same
        # broadcast then reports pack success (0.0 = host 0 failed) and
        # doubles as the barrier before readers open the cache. cache_dir
        # (under train.checkpoint_dir) must be on a SHARED filesystem in
        # multi-host runs — checked explicitly below.
        multihost = jax.process_count() > 1
        if multihost:
            needs_pack = broadcast_from_host0(float(needs_pack)) > 0.5
        if needs_pack:
            ok = 1.0
            if jax.process_index() == 0:
                print(f"[3d_ldm] packing frozen-VAE latents -> {cache_dir}")
                try:
                    # encode on a LOCAL device: vae_params live replicated on
                    # the global mesh, which process 0 cannot dispatch alone
                    local_params = jax.device_put(
                        vae_params, jax.local_devices()[0]
                    )
                    pack_latents(
                        d.packed_dir or d.root_dir, cache_dir, vae,
                        local_params, downsample=f,
                    )
                except Exception:
                    ok = 0.0
                    if not multihost:
                        raise
                    traceback.print_exc()
            if multihost:
                ok = broadcast_from_host0(ok)
                if ok < 0.5:
                    raise RuntimeError(
                        "latent packing failed on process 0 (see its log)"
                    )
        if not idx_path.exists():
            raise RuntimeError(
                f"latent cache index {idx_path} is not visible on process "
                f"{jax.process_index()} — train.checkpoint_dir must be on a "
                "filesystem shared by all hosts when cache_latents is on"
            )
        lat_patch = tuple(p // f for p in d.patch_size)
        # cross-check against the encoder's ACTUAL output shape (shape-only
        # trace, no compute) so a future VAE topology change can't silently
        # train the UNet at the wrong latent size again
        enc_shape = jax.eval_shape(
            lambda p, x: vae.apply(p, x, method="encode_to_latent"),
            vae_params,
            jax.ShapeDtypeStruct((1, *d.patch_size, cfg.vae.in_channels),
                                 jnp.float32),
        ).shape
        if tuple(enc_shape[1:-1]) != lat_patch:
            raise AssertionError(
                f"latent patch {lat_patch} != encoder output {enc_shape[1:-1]} "
                f"for patch_size {d.patch_size}"
            )
        lat_ds = PackedLatentDataset(cache_dir, lat_patch, random_crop=True)
        # same split seed over the same case order => identical subject split;
        # stage 2 batches latents (64x smaller than volumes) so it gets its
        # own batch size — 32 + unet.remat_levels=(0,) (selective remat of
        # the full-resolution blocks only) is the measured optimum (PERF.md)
        train_loader, val_loader = _make_loaders(
            cfg, lat_ds, mesh, batch_size=d.latent_batch_size
        )

    # latent-scale estimation over ≤200 batches (replicated, deterministic)
    train_loader.set_epoch(0)
    if use_cache:
        batches = (b["latent"] for _, b in zip(range(200), iter(train_loader)))
        latent_scale = estimate_latent_scale_from_latents(batches)
    else:
        batches = (b["volume"] for _, b in zip(range(200), iter(train_loader)))
        with mesh:
            latent_scale = estimate_latent_scale(vae, vae_params, batches)
    logger.log_metric("latent_scale", latent_scale)
    print(f"[3d_ldm] latent scale = {latent_scale:.4f}")

    unet = build_unet3d(cfg.unet)
    diffusion = build_diffusion(cfg.diffusion)
    unet_init = build_unet3d(cfg.unet, use_flash=False)
    unet_params = _init_params(
        unet_init,
        jnp.zeros((1, 8, 8, 8, cfg.vae.latent_channels), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        seed=cfg.train.seed, mesh=mesh,
    )
    ldm_fsdp = _use_fsdp(cfg.train, mesh)
    ldm_state = create_train_state(unet_params, cfg.train.learning_rate,
                                   ema=cfg.train.ema_decay is not None)
    if ldm_fsdp:
        from mrijax.parallel import shard_train_state

        ldm_state, ldm_shardings = shard_train_state(
            mesh, ldm_state, min_leaf_elems=cfg.train.fsdp_min_leaf_elems
        )
    else:
        ldm_state = global_put(ldm_state, replicated_sharding(mesh))

    def _fsdp_wrap(step):
        """Pin the output layout on the RAW step (whose first arg is the
        state and whose other operands — incl. the frozen vae_params — are
        real arguments). Wrapping the convenience closures below instead
        would close vae_params into the jit as a baked-in HLO constant
        (~hundreds of MB at flagship scale — the exact remote-compile
        failure mode documented in PERF.md)."""
        from mrijax.parallel import fsdp_step

        return fsdp_step(step, ldm_shardings) if ldm_fsdp else step

    t_grid = fixed_validation_timesteps(cfg.diffusion.timesteps, 8)

    if use_cache:
        ldm_step = _fsdp_wrap(make_cached_latent_train_step(
            unet, diffusion, t_min=cfg.diffusion.t_min,
            nan_guard=cfg.train.nan_guard, ema_decay=cfg.train.ema_decay,
            donate=not ldm_fsdp,
        ))
        ldm_eval = make_cached_latent_eval_step(unet, diffusion)

        def train_step(state, batch, key):
            return ldm_step(state, batch, key, latent_scale)

        def eval_step(params, batch, key, batch_index=0):
            t_fixed = t_grid[batch_index % len(t_grid)]
            return ldm_eval(params, batch, key, latent_scale, t_fixed)

    else:
        ldm_step = _fsdp_wrap(make_latent_diffusion_train_step(
            unet, vae, diffusion, t_min=cfg.diffusion.t_min,
            nan_guard=cfg.train.nan_guard, ema_decay=cfg.train.ema_decay,
            donate=not ldm_fsdp,
        ))
        ldm_eval = make_latent_diffusion_eval_step(unet, vae, diffusion)

        def train_step(state, batch, key):
            return ldm_step(state, vae_params, batch, key, latent_scale)

        def eval_step(params, batch, key, batch_index=0):
            # fixed-timestep validation grid, cycled per batch and realigned
            # every epoch (train.py:446-458) — the Trainer supplies the
            # per-epoch batch_index, so every epoch validates on the same
            # timestep alignment regardless of the number of val batches.
            t_fixed = t_grid[batch_index % len(t_grid)]
            return ldm_eval(params, vae_params, batch, key, latent_scale, t_fixed)

    ldm_trainer = _trainer(
        cfg.train, ckpt_dir=f"{cfg.family}/{cfg.name}/ldm", logger=logger,
        train_step=train_step, eval_step=eval_step,
        train_loader=train_loader, val_loader=val_loader, prefix="ldm_",
        extra=lambda: {"latent_scale": float(latent_scale)},
    )
    with mesh:
        ldm_result = ldm_trainer.fit(ldm_state)
    if own_logger:
        logger.finish()
    return vae_result, ldm_result, latent_scale


def run_experiment(cfg: ExperimentConfig, mesh=None, logger=None):
    fn = {
        "slice_cond_2d": train_slice_cond_2d,
        "ddpm_25d": train_ddpm_25d,
        "ddpm_3d_ldm": train_ddpm_3d_ldm,
    }.get(cfg.family)
    if fn is None:
        raise ValueError(f"unknown family {cfg.family!r}")
    return fn(cfg, mesh=mesh, logger=logger)


def _flatten_cfg(cfg: ExperimentConfig) -> dict:
    flat = {}

    def rec(prefix, d):
        for k, v in d.items():
            if isinstance(v, dict):
                rec(f"{prefix}{k}.", v)
            else:
                flat[f"{prefix}{k}"] = str(v)

    rec("", cfg.to_dict())
    return flat
