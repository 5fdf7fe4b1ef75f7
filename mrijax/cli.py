"""Command-line entry points: train / sample / preprocess / split / info.

Replaces the reference's SLURM-wrapped ``python -m model_scripts.<exp>...``
entry points and utility CLIs (`preprocess_data.py`, `split_train_val_test.py`,
show_model/generate scripts) with one ``python -m mrijax.cli <cmd>``:

  train       --preset slice_cond_2d|ddpm_25d|ddpm_3d_ldm --root-dir ...
              [--config cfg.json] [--set train.epochs=3 ...]
  sample      --run-dir checkpoints/<family>/<name> [--mode grid|sweep|
              pseudo3d-real|pseudo3d-hybrid|volume3d] [--ddim-steps N]
  preprocess  --root-dir ... --output-dir ... [--image-size 128]
  split       --src ... --out-root ... [--mode symlink|copy|move] [--dry-run]
  info        --run-dir ...   (print config + checkpoint inventory)

Every training run writes ``config.json`` next to its checkpoints so
``sample``/``info`` rebuild exactly the trained model — fixing the
reference's re-typed-config drift hazard (`ddpm_3d_ldm/show_model.py:391-408`).
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np


def _parse_set(values):
    out = {}
    for item in values or []:
        k, _, v = item.partition("=")
        if not _:
            raise SystemExit(f"--set expects key=value, got {item!r}")
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass  # keep string
        out[k] = v
    return out


def run_experiment_with_logger(cfg, logger):
    from mrijax.train.experiments import run_experiment

    return run_experiment(cfg, logger=logger)


def _multihost_mode(args) -> bool:
    """True when this run is one rank of a multi-process job: any rendezvous
    flag, ``MRIJAX_MULTIHOST=1`` (the TPU-pod switch — the pod runtime gives
    ``jax.distributed.initialize()`` its coordinator), or a multi-task SLURM
    allocation (auto-discovered the same way). Computed ONCE and reused so
    the rendezvous call and the rank-0 write gating can never disagree —
    a desynchronized pair would leave every rank believing it is host 0
    while distributed init ran, clobbering the shared run dir."""
    # --num-processes 1 alone is a plain single-process run (launchers
    # template it from $NTASKS, which can legitimately be 1); treating it
    # as multihost would make required=True turn initialize()'s documented
    # num_processes=1 degrade-gracefully contract into a crash.
    if args.coordinator or args.process_id is not None:
        return True
    if args.num_processes and int(args.num_processes) > 1:
        return True
    if os.environ.get("MRIJAX_MULTIHOST"):
        return True
    try:
        return int(os.environ.get("SLURM_NTASKS", "1")) > 1
    except ValueError:
        return False


def cmd_train(args):
    from mrijax.config import PRESETS, ExperimentConfig, _apply_overrides

    # Multi-process rendezvous FIRST — jax.distributed.initialize must run
    # before anything touches the XLA backend (the reference reaches the
    # same point via torchrun env plumbing, ddpm_3d_ldm/train.py:76-105).
    # Exercised for real by scripts/training_job_multihost.sh and
    # tests/test_multiprocess_dcn.py.
    is_multihost = _multihost_mode(args)
    if is_multihost:
        from mrijax.parallel import multihost as mh

        mh.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            required=True,
        )
        import jax

        print(f"[cli] multihost: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    if args.config:
        cfg = ExperimentConfig.from_json(args.config)
    else:
        if args.preset not in PRESETS:
            raise SystemExit(f"unknown preset {args.preset!r}; options: {list(PRESETS)}")
        cfg = PRESETS[args.preset](args.root_dir or "")
    if args.root_dir:
        cfg.data.root_dir = args.root_dir
    if args.name:
        cfg.name = args.name
    _apply_overrides(cfg, _parse_set(args.set))

    run_dir = Path(cfg.train.checkpoint_dir) / cfg.family / cfg.name
    # rank-0-only writes: metrics.jsonl / config.json / MLflow mirror belong
    # to host 0 alone (the reference gates the same way through torchrun
    # rank checks); non-zero ranks log into a NullLogger
    from mrijax.obs import MetricsLogger, NullLogger, run_with_energy

    is_host0 = True
    if is_multihost:
        import jax

        is_host0 = jax.process_index() == 0
    if is_host0:
        run_dir.mkdir(parents=True, exist_ok=True)
        cfg.to_json(run_dir / "config.json")
        print(f"[cli] training {cfg.family}/{cfg.name} -> {run_dir}")
    # the reference wraps train() in the Perun profiler and logs the energy
    # summary post-run (helpers/perun_utils.py:132-148); same shape here
    logger = MetricsLogger(cfg.family, run_name=cfg.name) if is_host0 else NullLogger()
    try:
        result = run_with_energy(
            lambda: run_experiment_with_logger(cfg, logger), logger=logger
        )
    finally:
        logger.finish()
    if isinstance(result, tuple):  # 3D two-stage: (vae, ldm, scale)
        vae_res, ldm_res, scale = result
        print(
            f"[cli] done: vae best_val={vae_res.best_val_loss:.5f} "
            f"({vae_res.epochs_run} epochs), ldm best_val="
            f"{ldm_res.best_val_loss:.5f} ({ldm_res.epochs_run} epochs), "
            f"latent_scale={scale:.4f}"
        )
    else:
        print(
            f"[cli] done: best_val={result.best_val_loss:.5f} "
            f"epochs={result.epochs_run} early_stop={result.stopped_early} "
            f"preempted={result.preempted}"
        )
    return 0


def _load_run(run_dir):
    """(cfg, best params per stage) from a training run directory."""
    from mrijax.config import ExperimentConfig

    run_dir = Path(run_dir)
    cfg = ExperimentConfig.from_json(run_dir / "config.json")
    return cfg, run_dir


def _restore_params(run_dir, state_like):
    import jax

    from mrijax.io import CheckpointManager

    mgr = CheckpointManager(run_dir)
    try:
        state, extra = mgr.restore(state_like, best=True)
    except (FileNotFoundError, ValueError):
        state, extra = mgr.restore(state_like)
    mgr.close()
    # templates are built on host CPU; move weights to the compute device
    state = jax.device_put(state, jax.devices()[0])
    return state, extra or {}


def cmd_sample(args):
    import jax
    import jax.numpy as jnp

    from mrijax import generate
    from mrijax.io import save_grid_png, volume_midslice_panel, save_png
    from mrijax.data import nifti
    from mrijax.train.experiments import (
        build_diffusion, build_unet2d, build_unet3d, build_vae3d,
    )
    from mrijax.train.state import create_train_state, inference_params

    cfg, run_dir = _load_run(args.run_dir)
    out_dir = Path(args.out_dir or run_dir / "samples")
    out_dir.mkdir(parents=True, exist_ok=True)
    diffusion = build_diffusion(cfg.diffusion)
    key = jax.random.PRNGKey(args.seed)
    s = cfg.data.image_size

    # --data-parallel: shard the sampling batch over all devices (each chip
    # denoises its own shard, zero collectives — parallel.sharded_sample)
    mesh = None
    if getattr(args, "data_parallel", False):
        from mrijax.parallel import make_mesh

        from mrijax.diffusion.gaussian import ancestral_segments_for_backend

        if args.mode == "pseudo3d-hybrid":
            print("[cli] note: pseudo3d-hybrid is sequential over slices "
                  "(autoregressive); --data-parallel has no effect")
        elif not args.ddim_steps and ancestral_segments_for_backend() > 1:
            # shard_map traces the segmented loop into ONE fused program,
            # re-exposing the tunnel's per-execution cap (PERF.md)
            print("[cli] note: full-T ancestral sampling on this backend "
                  "must run segmented, which --data-parallel would fuse "
                  "back into one over-cap execution — running single-device "
                  "(use --ddim-steps/--sampler dpm for sharded sampling)")
        else:
            mesh = make_mesh(("data",))
            print(f"[cli] data-parallel sampling over {mesh.shape['data']} devices")

    if cfg.family in ("slice_cond_2d", "ddpm_25d"):
        model = build_unet2d(cfg.unet)
        x_ch = cfg.unet.out_channels  # denoised channels
        ctx_ch = cfg.unet.in_channels - x_ch
        from mrijax.kernels.dispatch import host_init

        with host_init():
            zeros_ctx = (jnp.zeros((1, s, s, ctx_ch)),) if ctx_ch else ()
            template = create_train_state(
                model.init(
                    key, jnp.zeros((1, s, s, x_ch)),
                    jnp.zeros((1,), jnp.int32), jnp.zeros((1,)), *zeros_ctx,
                ),
                cfg.train.learning_rate,
                ema=cfg.train.ema_decay is not None,
            )
        state, _ = _restore_params(run_dir, template)
        params = inference_params(state)

        ctx_ch_ = cfg.unet.in_channels - cfg.unet.out_channels
        if (args.guidance_scale is not None and ctx_ch_ > 0
                and args.mode in ("grid", "sweep")):
            raise SystemExit(
                "--guidance-scale with a 2.5D (context-conditioned) model "
                "applies to --mode pseudo3d-real|pseudo3d-hybrid (grid/sweep "
                "have no context to condition on)"
            )
        if args.mode == "grid":
            imgs = generate.sample_2d(
                model, params, diffusion, num_samples=args.num_samples,
                image_size=s, z_pos=args.z_pos, key=key,
                ddim_steps=args.ddim_steps, sampler=args.sampler, channels=cfg.unet.out_channels,
                mesh=mesh, guidance_scale=args.guidance_scale,
            )
            save_grid_png(out_dir / "grid.png", np.asarray(imgs)[..., :1])
            print(f"[cli] wrote {out_dir/'grid.png'}")
        elif args.mode == "sweep":
            vol = generate.sample_pseudo3d_sweep(
                model, params, diffusion, num_slices=args.num_slices,
                image_size=s, key=key, ddim_steps=args.ddim_steps, sampler=args.sampler,
                channels=cfg.unet.out_channels, mesh=mesh,
                guidance_scale=args.guidance_scale,
            )
            save_grid_png(out_dir / "sweep.png", np.asarray(vol)[..., :1], nrow=16)
            nifti.save(out_dir / "sweep.nii.gz", np.asarray(vol)[..., 0])
            print(f"[cli] wrote {out_dir/'sweep.png'} and .nii.gz")
        elif args.mode in ("pseudo3d-real", "pseudo3d-hybrid"):
            from mrijax.data import MultiModalSliceDataset25D

            ds = MultiModalSliceDataset25D(
                cfg.data.root_dir, s, cfg.data.slice_radius
            )
            if args.mode == "pseudo3d-real":
                if mesh is not None:
                    print(
                        "[cli] pseudo3d-real: chunks of "
                        f"{mesh.shape['data'] * 4} shard over "
                        f"{mesh.shape['data']} devices (ragged tail, if "
                        "any, runs on one device)"
                    )
                vol = generate.generate_pseudo3d_real_context(
                    model, params, diffusion, ds, args.subject, key=key,
                    ddim_steps=args.ddim_steps, sampler=args.sampler, mesh=mesh,
                    guidance_scale=args.guidance_scale,
                )
            else:  # hybrid is inherently sequential over slices
                vol = generate.generate_pseudo3d_hybrid(
                    model, params, diffusion, ds, args.subject, key=key,
                    ddim_steps=args.ddim_steps, sampler=args.sampler,
                    guidance_scale=args.guidance_scale,
                )
            vol = np.asarray(vol)
            for c in range(vol.shape[-1]):
                save_grid_png(out_dir / f"{args.mode}_mod{c}.png", vol[..., c], nrow=16)
            nifti.save(out_dir / f"{args.mode}.nii.gz", vol)
            print(f"[cli] wrote {out_dir}/{args.mode}_mod*.png and .nii.gz")
        else:
            raise SystemExit(f"mode {args.mode!r} invalid for {cfg.family}")
    elif cfg.family == "ddpm_3d_ldm":
        if args.guidance_scale is not None:
            raise SystemExit(
                "--guidance-scale is not supported for the ddpm_3d_ldm "
                "family (unconditional latent sampling has no condition to "
                "guide on; the flag would be silently ignored)"
            )
        vae = build_vae3d(cfg.vae)
        unet = build_unet3d(cfg.unet)
        unet_init = build_unet3d(cfg.unet, use_flash=False)
        from mrijax.kernels.dispatch import host_init

        with host_init():
            vae_template = create_train_state(
                vae.init(key, jnp.zeros((1, 16, 16, 16, cfg.vae.in_channels)),
                         jax.random.PRNGKey(1)),
                cfg.vae_train.learning_rate,
            )
            unet_template = create_train_state(
                unet_init.init(key, jnp.zeros((1, 8, 8, 8, cfg.vae.latent_channels)),
                               jnp.zeros((1,), jnp.int32)),
                cfg.train.learning_rate,
                ema=cfg.train.ema_decay is not None,
            )
        vae_state, _ = _restore_params(run_dir / "vae", vae_template)
        ldm_state, extra = _restore_params(run_dir / "ldm", unet_template)
        latent_scale = float(extra.get("latent_scale", 1.0))

        if args.mode == "diagnostics":
            # VAE/LDM sanity suite on real volumes (reference show_model's
            # recon grid, latent stats, DDIM noising roundtrip, eps-MSE-by-t)
            from mrijax.data import VolumeDataset3D

            ds = VolumeDataset3D(cfg.data.root_dir, cfg.data.patch_size,
                                 random_crop=False)
            real = jnp.stack(
                [jnp.asarray(ds[i]["volume"]) for i in range(min(2, len(ds)))]
            )
            diag = generate.Vae3dDiagnostics(
                unet, inference_params(ldm_state), vae, vae_state.params, diffusion,
                latent_scale=latent_scale,
            )
            recon, l1 = diag.reconstruction(real)
            report = {
                "recon_l1": l1,
                "latent_stats": diag.latent_stats(real),
                "noising_roundtrip_l1": {
                    str(k): v for k, v in diag.noising_roundtrip(real).items()
                },
                "eps_mse_by_t": {
                    str(k): v for k, v in diag.eps_mse_by_t(real).items()
                },
            }
            (out_dir / "diagnostics.json").write_text(json.dumps(report, indent=2))
            save_png(out_dir / "recon_real.png",
                     volume_midslice_panel(np.asarray(real[0])))
            save_png(out_dir / "recon_vae.png",
                     volume_midslice_panel(np.asarray(recon[0])))
            print(json.dumps(report, indent=2))
            print(f"[cli] wrote {out_dir}/diagnostics.json + recon panels")
            return 0

        latent_shape = generate.latent_shape_for(
            vae, vae_state.params, (*cfg.data.patch_size, cfg.vae.in_channels)
        )
        vols = generate.generate_3d_volumes(
            unet, inference_params(ldm_state), vae, vae_state.params, diffusion,
            num_volumes=args.num_samples,
            latent_spatial=latent_shape[:-1], latent_channels=latent_shape[-1],
            latent_scale=latent_scale, key=key, ddim_steps=args.ddim_steps, sampler=args.sampler,
            mesh=mesh,
        )
        vols = np.asarray(vols)
        for i, v in enumerate(vols):
            save_png(out_dir / f"volume{i}_midslices.png", volume_midslice_panel(v))
            nifti.save(out_dir / f"volume{i}.nii.gz", v)
        print(f"[cli] wrote {len(vols)} volumes to {out_dir}")
    else:
        raise SystemExit(f"unknown family {cfg.family!r}")
    return 0


def cmd_eval(args):
    """Matched-condition eval of a trained 2D run on the volume-level test
    split (reference protocol, `slice_cond_2d_ddpm/metrics.py:232-523`)."""
    import jax
    import jax.numpy as jnp

    from mrijax import generate
    from mrijax.data import BatchLoader, SliceDataset2D, volume_split_indices
    from mrijax.evals import (
        FeatureExtractor,
        InceptionFeatureExtractor,
        LPIPSDistance,
        ResNet18FeatureExtractor,
        evaluate_conditional_2d,
    )
    from mrijax.train.experiments import build_diffusion, build_unet2d
    from mrijax.train.state import create_train_state, inference_params

    cfg, run_dir = _load_run(args.run_dir)
    if cfg.family not in ("slice_cond_2d", "ddpm_25d"):
        raise SystemExit("eval supports slice_cond_2d and ddpm_25d runs")
    s = cfg.data.image_size
    model = build_unet2d(cfg.unet)
    diffusion = build_diffusion(cfg.diffusion)
    key = jax.random.PRNGKey(args.seed)
    is_25d = cfg.family == "ddpm_25d"
    x_ch = cfg.unet.out_channels
    ctx_ch = cfg.unet.in_channels - x_ch
    from mrijax.kernels.dispatch import host_init

    with host_init():
        zeros_ctx = (jnp.zeros((1, s, s, ctx_ch)),) if is_25d else ()
        template = create_train_state(
            model.init(key, jnp.zeros((1, s, s, x_ch)),
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1,)), *zeros_ctx),
            cfg.train.learning_rate,
            ema=cfg.train.ema_decay is not None,
        )
    state, _ = _restore_params(run_dir, template)
    params = inference_params(state)

    # volume-level split (no slice leakage)
    if is_25d:
        from mrijax.data import MultiModalSliceDataset25D

        ds = MultiModalSliceDataset25D(cfg.data.root_dir, s, cfg.data.slice_radius)
    else:
        ds = SliceDataset2D(cfg.data.root_dir, s, cfg.data.modality_suffix)
    train_v, val_v, test_v = volume_split_indices(len(ds.volume_paths), seed=42)
    vols = {"train": train_v, "val": val_v, "test": test_v,
            "all": list(range(len(ds.volume_paths)))}[args.split]
    if not vols:
        raise SystemExit(
            f"the {args.split!r} split is empty ({len(ds.volume_paths)} volumes "
            f"total) — use --split all or a larger dataset"
        )
    paths = {ds.volume_paths[i] for i in vols}
    keep = [i for i, (p, _) in enumerate(ds.slice_tuples) if p in paths]

    # --data-parallel: shard the dominant eval cost (matched-condition
    # sampling, ~num_samples × T UNet forwards) over all devices
    mesh = None
    if getattr(args, "data_parallel", False):
        from mrijax.diffusion.gaussian import ancestral_segments_for_backend
        from mrijax.parallel import make_mesh

        if args.batch_size % jax.device_count():
            raise SystemExit(
                f"--data-parallel needs --batch-size divisible by the "
                f"device count ({jax.device_count()})"
            )
        if not args.ddim_steps and ancestral_segments_for_backend() > 1:
            # shard_map would fuse the segmented full-T scan into one
            # over-cap execution on this backend (PERF.md "2D sampling")
            print("[cli] note: full-T ancestral sampling on this backend "
                  "must run segmented, which --data-parallel would fuse "
                  "back into one over-cap execution — running "
                  "single-device (use --ddim-steps for sharded eval)")
        else:
            mesh = make_mesh(("data",))
            print(f"[cli] data-parallel sampling over {mesh.shape['data']} devices")

    # a split smaller than the batch size used to die three frames from its
    # cause (zero batches → "need ≥2 samples for covariance"); keep the
    # ragged tail when single-device, fail loud when sharding requires
    # whole batches
    if mesh is not None and len(keep) < args.batch_size:
        raise SystemExit(
            f"the {args.split!r} split has {len(keep)} slices < batch-size "
            f"{args.batch_size} — use --split all, a smaller --batch-size, "
            "or drop --data-parallel"
        )
    if len(keep) < 2:
        raise SystemExit(
            f"the {args.split!r} split has {len(keep)} slices — FID/KID need "
            "at least 2; use --split all or a larger dataset"
        )

    from mrijax.data.loader import _IndexView

    # compile-cost note: the ragged tail batch reaches sample_fn (one extra
    # trace for its batch dim) only when the full batches don't already
    # cover --num-samples — the harness breaks before touching it otherwise
    loader = BatchLoader(_IndexView(ds, keep), args.batch_size, shuffle=False,
                         drop_last=mesh is not None, prefetch=0)

    def _local_sample(p, k, cond):
        z, context = cond

        def model_fn(x, t):
            return model.apply(p, x, t, z, context)

        shape = (z.shape[0], s, s, cfg.unet.out_channels)
        if args.ddim_steps:
            return diffusion.fast_sample(
                model_fn, shape, k, num_steps=args.ddim_steps,
                sampler=getattr(args, "sampler", "ddim"),
            )
        # segmented on tunnel backends: one T=1000 execution would exceed
        # the remote worker's per-execution cap (PERF.md "2D sampling").
        # Under a mesh call the plain loop — segments would fuse back into
        # one execution inside shard_map anyway (same dispatch as
        # generate.py; the tunnel+full-T case keeps mesh=None above).
        ancestral = (diffusion.p_sample_loop if mesh is not None
                     else diffusion.p_sample_loop_auto)
        return ancestral(model_fn, shape, k)

    def sample_fn(batch, k):
        z = jnp.asarray(batch["z_pos"])
        if args.unconditional:
            # fixed z=0.5 regardless of the real batch's conditions
            z = jnp.full_like(z, 0.5)
        context = jnp.asarray(batch["context"]) if is_25d else None
        if mesh is not None and z.shape[0] % mesh.shape["data"] == 0:
            from mrijax.parallel import sharded_sample

            return sharded_sample(
                mesh, _local_sample, params, k, z.shape[0], cond=(z, context)
            )
        return _local_sample(params, k, (z, context))

    # pretrained extractors (converted via `mrijax convert-features`) give
    # real FID/KID/LPIPS/PR; without them the seeded-random extractor is
    # used and every metric carries the _rand suffix
    if args.inception_weights:
        fe = InceptionFeatureExtractor(weights_path=args.inception_weights)
    else:
        fe = FeatureExtractor()
    lpips = (
        LPIPSDistance(weights_path=args.lpips_weights)
        if args.lpips_weights else None
    )
    pr_fe = (
        ResNet18FeatureExtractor(weights_path=args.resnet18_weights)
        if args.resnet18_weights else None
    )

    out = Path(args.out or run_dir / "eval" / "metrics.json")
    # label the fakes-generation sampler in the report: --ddim-steps engages
    # a documented NON-protocol fast mode (DDIM/DPM strided); the reference
    # protocol is full-T ancestral only (`metrics.py:355`)
    T = cfg.diffusion.timesteps
    sampling_meta = {
        "sampler": (f"{args.sampler}-{args.ddim_steps}" if args.ddim_steps
                    else f"ancestral-T{T}"),
        "sampler_is_reference_protocol": not args.ddim_steps,
    }
    report = evaluate_conditional_2d(
        sample_fn,
        iter(loader),
        feature_extractor=fe,
        pr_feature_extractor=pr_fe,
        lpips=lpips,
        num_samples=args.num_samples,
        num_diversity_pairs=args.diversity_pairs,
        compute_pr=args.pr,
        seed=args.seed,
        eval_channel=args.eval_channel if is_25d else None,
        out_path=out,
        metadata=sampling_meta,
    )
    print(json.dumps({k: v for k, v in report.items()
                      if not isinstance(v, dict)}, indent=2))
    print(f"[cli] wrote {out}")
    return 0


def cmd_eval_multi(args):
    """Batch-evaluate a config list of run dirs (the reference's
    `metrics_both.py` harness as a CLI): per-model metrics.json +
    summary.json + RUNNING/progress/ERROR breadcrumbs."""
    from mrijax.evals import evaluate_runs

    run_configs = json.loads(Path(args.config).read_text())
    if isinstance(run_configs, dict):
        run_configs = run_configs.get("runs")
    if not isinstance(run_configs, list) or not all(
        isinstance(rc, dict) for rc in run_configs
    ):
        raise SystemExit(
            "--config must be a JSON list of run configs (or {\"runs\": "
            "[...]}) — each entry: {\"run_dir\": ..., \"num_samples\": N, "
            "\"ddim_steps\": N, \"split\": ..., \"compute_pr\": bool, "
            "\"name\": ..., per-run *_weights overrides}"
        )
    summary = evaluate_runs(
        run_configs,
        args.out_dir,
        inception_weights=args.inception_weights,
        lpips_weights=args.lpips_weights,
        resnet18_weights=args.resnet18_weights,
    )
    failed = [k for k, v in summary.items() if "error" in v]
    print(f"[cli] evaluated {len(summary)} runs "
          f"({len(failed)} failed: {failed}) -> {args.out_dir}/summary.json")
    return 1 if failed and len(failed) == len(summary) else 0


def cmd_eval_seg(args):
    """Dice + HD95 per BraTS label between predicted and reference
    segmentation label maps (NIfTI), matched by filename when directories
    are given (`evaluation_scripts/evaluate_models.py:473-549`)."""
    import numpy as np

    from mrijax.data import nifti
    from mrijax.evals import BRATS_LABELS, dice_per_label, hd95_per_label

    pred, target = Path(args.pred), Path(args.target)
    if pred.is_dir() != target.is_dir():
        raise SystemExit("--pred and --target must both be files or both dirs")
    if pred.is_dir():
        pairs = []
        for p in sorted(pred.rglob("*.nii*")):
            t = target / p.relative_to(pred)
            if t.exists():
                pairs.append((p, t))
        if not pairs:
            raise SystemExit(f"no matching label maps between {pred} and {target}")
    else:
        pairs = [(pred, target)]

    labels = tuple(args.labels or BRATS_LABELS)
    spacing = tuple(args.voxelspacing) if args.voxelspacing else None
    per_case = {}
    for p, t in pairs:
        pv = np.rint(nifti.load(p)).astype(np.int32)
        tv = np.rint(nifti.load(t)).astype(np.int32)
        # key by the relative path used for matching — bare filenames can
        # collide across per-subject subdirectories
        case = str(p.relative_to(pred)) if pred.is_dir() else p.name
        per_case[case] = {
            "dice": dice_per_label(pv, tv, labels),
            "hd95": hd95_per_label(pv, tv, labels, spacing=spacing),
        }
    def finite_mean(vals):
        vals = [v for v in vals if np.isfinite(v)]
        return float(np.mean(vals)) if vals else None

    def jsonable(v):
        return float(v) if np.isfinite(v) else None  # inf: label absent

    report = {
        "labels": list(labels),
        "num_cases": len(per_case),
        "mean_dice": {
            str(l): float(np.mean([c["dice"][l] for c in per_case.values()]))
            for l in labels
        },
        "mean_hd95": {
            str(l): finite_mean([c["hd95"][l] for c in per_case.values()])
            for l in labels
        },
        "per_case": {
            name: {"dice": {str(l): v for l, v in c["dice"].items()},
                   "hd95": {str(l): jsonable(v) for l, v in c["hd95"].items()}}
            for name, c in per_case.items()
        },
    }
    out = json.dumps(report, indent=2)
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(out)
        print(f"[cli] wrote {args.out}")
    print(out if not args.out else json.dumps(
        {k: report[k] for k in ("labels", "num_cases", "mean_dice", "mean_hd95")},
        indent=2,
    ))
    return 0


def cmd_convert_features(args):
    """Convert a torch feature-backbone state_dict (torchvision
    inception_v3/resnet18, or lpips alex) to a portable flax npz for
    ``mrijax eval`` — recovers the reference's real ImageNet metrics
    (`evaluation_scripts/evaluate_models.py:82-131`,
    `slice_cond_2d_ddpm/metrics.py:147-229,329-343,419-443`)."""
    import torch

    from mrijax.io import save_params_npz
    from mrijax.io.torch_convert import (
        convert_inception_v3,
        convert_lpips_alex,
        convert_resnet18,
    )

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    convert = {
        "inception_v3": convert_inception_v3,
        "resnet18": convert_resnet18,
        "lpips_alex": convert_lpips_alex,
    }[args.arch]
    params = convert(sd)
    save_params_npz(args.out, params, meta={"arch": args.arch})
    n = sum(1 for _ in _iter_leaves(params))
    print(f"[cli] converted {args.arch}: {n} tensors -> {args.out}")
    return 0


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


def _load_torch_state_dict(path):
    """torch.load + the reference's checkpoint-format tolerance: raw
    state_dict or ``{"state_dict": ...}`` wrapping
    (`ddpm_3d_ldm/show_model.py:43-52`)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and isinstance(sd.get("state_dict"), dict):
        sd = sd["state_dict"]
    if not isinstance(sd, dict):
        raise SystemExit(
            f"{path} does not contain a state_dict (got {type(sd).__name__}) "
            "— expected a raw state_dict or {'state_dict': ...} checkpoint"
        )
    return {k: v for k, v in sd.items()}


def cmd_import_torch(args):
    """Convert a reference PyTorch checkpoint (2D / 2.5D diffusion
    state_dict, or the 3D VAE+LDM pair) into a mrijax run directory usable
    by sample/eval/export."""
    import jax
    import jax.numpy as jnp

    from mrijax.config import PRESETS, _apply_overrides
    from mrijax.io import CheckpointManager
    from mrijax.io.torch_convert import convert_reference_unet2d, infer_timesteps
    from mrijax.train.experiments import build_unet2d
    from mrijax.train.state import create_train_state, inference_params

    cfg = PRESETS[args.preset](args.root_dir or "")
    cfg.name = args.name or "imported"
    _apply_overrides(cfg, _parse_set(args.set))
    if cfg.train.ema_decay is not None:
        # torch checkpoints carry no EMA shadow; a config claiming one
        # would make the written run dir unrestorable by sample/eval
        print("[cli] note: train.ema_decay cleared — imported torch "
              "checkpoints have no EMA shadow")
        cfg.train.ema_decay = None

    if cfg.family == "ddpm_3d_ldm":
        return _import_torch_3d(args, cfg)

    sd = _load_torch_state_dict(args.checkpoint)
    t_inferred = infer_timesteps(sd)
    if t_inferred:
        cfg.diffusion.timesteps = t_inferred
        print(f"[cli] inferred T={t_inferred} from checkpoint betas")

    params = convert_reference_unet2d(sd, channel_mults=cfg.unet.channel_mults)

    # sanity: the converted tree must match the model built from the config
    model = build_unet2d(cfg.unet)
    s = cfg.data.image_size
    x_ch = cfg.unet.out_channels
    ctx_ch = cfg.unet.in_channels - x_ch
    from mrijax.kernels.dispatch import host_init

    with host_init():
        zeros_ctx = (jnp.zeros((1, s, s, ctx_ch)),) if ctx_ch else ()
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, x_ch)),
                         jnp.zeros((1,), jnp.int32), jnp.zeros((1,)), *zeros_ctx)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    if ref_shapes != got_shapes:
        raise SystemExit(
            "converted parameter tree does not match the config's model — "
            "check --preset / --set channel settings against the checkpoint"
        )

    run_dir = Path(args.out)
    run_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_json(run_dir / "config.json")
    state = create_train_state(
        jax.tree.map(jnp.asarray, params), cfg.train.learning_rate
    )
    mgr = CheckpointManager(run_dir)
    mgr.save(0, state, {"imported_from": str(args.checkpoint)},
             metrics={"val_loss": 0.0})
    mgr.wait()
    mgr.close()
    print(f"[cli] imported {args.checkpoint} -> {run_dir}")
    return 0


def _import_torch_3d(args, cfg):
    """Import the reference 3D pair — ``vae3d_final.pt`` +
    ``3d_ldm_diffusion_best.pt`` (the load protocol of
    `ddpm_3d_ldm/show_model.py:54-103`, incl. ``{"state_dict": ...}``
    wrapping and DDP prefix remap) — into a run dir with the ``vae/`` and
    ``ldm/`` checkpoints that ``sample --mode volume3d|diagnostics`` and
    ``export`` consume."""
    import jax
    import jax.numpy as jnp

    from mrijax.io import CheckpointManager
    from mrijax.io.torch_convert import (
        convert_reference_unet3d,
        convert_reference_vae3d,
    )
    from mrijax.train.experiments import build_unet3d, build_vae3d
    from mrijax.train.state import create_train_state, inference_params

    if not args.vae_checkpoint:
        raise SystemExit(
            "--preset ddpm_3d_ldm needs --vae-checkpoint (vae3d_final.pt) "
            "in addition to --checkpoint (the LDM UNet state_dict)"
        )
    vae_sd = _load_torch_state_dict(args.vae_checkpoint)
    unet_sd = _load_torch_state_dict(args.checkpoint)
    vae_params = convert_reference_vae3d(vae_sd, num_down=cfg.vae.num_down)
    unet_params = convert_reference_unet3d(
        unet_sd, channel_mults=cfg.unet.channel_mults,
        use_attention=cfg.unet.use_attention,
    )

    # shape sanity against the config's models (same guard as the 2D path)
    vae = build_vae3d(cfg.vae)
    unet = build_unet3d(cfg.unet, use_flash=False)
    from mrijax.kernels.dispatch import host_init

    with host_init():
        vae_ref = vae.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 16, 16, cfg.vae.in_channels)),
            jax.random.PRNGKey(1),
        )
        unet_ref = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, 8, cfg.vae.latent_channels)),
            jnp.zeros((1,), jnp.int32),
        )
    for label, ref, got in (("vae", vae_ref, vae_params),
                            ("ldm", unet_ref, unet_params)):
        if jax.tree.map(lambda a: a.shape, ref) != jax.tree.map(
            lambda a: a.shape, got
        ):
            raise SystemExit(
                f"converted {label} parameter tree does not match the "
                "config's model — check --preset / --set channel settings "
                "against the checkpoints"
            )

    latent_scale = float(args.latent_scale)
    if args.latent_scale == 1.0:
        print(
            "[cli] latent_scale defaulted to 1.0 — the reference re-estimates "
            "it from data at inference (show_model.py:303,354-363); pass "
            "--latent-scale from the training run for exact parity"
        )

    run_dir = Path(args.out)
    run_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_json(run_dir / "config.json")
    for sub, params, lr, extra in (
        ("vae", vae_params, cfg.vae_train.learning_rate,
         {"imported_from": str(args.vae_checkpoint)}),
        ("ldm", unet_params, cfg.train.learning_rate,
         {"imported_from": str(args.checkpoint),
          "latent_scale": latent_scale}),
    ):
        state = create_train_state(jax.tree.map(jnp.asarray, params), lr)
        mgr = CheckpointManager(run_dir / sub)
        mgr.save(0, state, extra, metrics={"val_loss": 0.0})
        mgr.wait()
        mgr.close()
    print(f"[cli] imported 3D pair -> {run_dir} (vae/ + ldm/, "
          f"latent_scale={latent_scale})")
    return 0


def cmd_export(args):
    """Export a run's best weights to a portable npz (torch-free single
    file, the .pt-artifact analog)."""
    import jax
    import jax.numpy as jnp

    from mrijax.io import save_params_npz
    from mrijax.train.experiments import build_unet2d, build_unet3d, build_vae3d
    from mrijax.train.state import create_train_state, inference_params

    cfg, run_dir = _load_run(args.run_dir)
    s = cfg.data.image_size
    out = Path(args.out)
    if cfg.family in ("slice_cond_2d", "ddpm_25d"):
        model = build_unet2d(cfg.unet)
        x_ch = cfg.unet.out_channels
        ctx_ch = cfg.unet.in_channels - x_ch
        from mrijax.kernels.dispatch import host_init

        with host_init():
            zeros_ctx = (jnp.zeros((1, s, s, ctx_ch)),) if ctx_ch else ()
            template = create_train_state(
                model.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, x_ch)),
                           jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
                           *zeros_ctx),
                cfg.train.learning_rate,
                ema=cfg.train.ema_decay is not None,
            )
        state, extra = _restore_params(run_dir, template)
        save_params_npz(out, inference_params(state),
                        meta={"family": cfg.family, "config": cfg.to_dict(),
                              **{k: v for k, v in extra.items()
                                 if isinstance(v, (int, float, str))}})
        print(f"[cli] exported {cfg.family} weights -> {out}")
    elif cfg.family == "ddpm_3d_ldm":
        vae = build_vae3d(cfg.vae)
        unet_init = build_unet3d(cfg.unet, use_flash=False)
        from mrijax.kernels.dispatch import host_init

        with host_init():
            vae_template = create_train_state(
                vae.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, 16, cfg.vae.in_channels)),
                         jax.random.PRNGKey(1)),
                cfg.vae_train.learning_rate,
            )
            unet_template = create_train_state(
                unet_init.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 8, 8, cfg.vae.latent_channels)),
                               jnp.zeros((1,), jnp.int32)),
                cfg.train.learning_rate,
                ema=cfg.train.ema_decay is not None,
            )
        vae_state, _ = _restore_params(run_dir / "vae", vae_template)
        ldm_state, extra = _restore_params(run_dir / "ldm", unet_template)
        save_params_npz(out.with_suffix(".vae.npz"), vae_state.params,
                        meta={"family": "vae3d", "config": cfg.to_dict()})
        save_params_npz(out, inference_params(ldm_state),
                        meta={"family": cfg.family, "config": cfg.to_dict(),
                              "latent_scale": float(extra.get("latent_scale", 1.0))})
        print(f"[cli] exported LDM -> {out} and VAE -> {out.with_suffix('.vae.npz')}")
    else:
        raise SystemExit(f"unknown family {cfg.family!r}")
    return 0


def cmd_export_aot(args):
    """Serialize the run's lowered sampling program via ``jax.export`` so
    serving processes skip the per-process trace entirely (minutes at
    flagship scale — see mrijax/aot.py; params stay external arguments
    and come from checkpoints or ``export`` npz)."""
    import jax
    import jax.numpy as jnp

    from mrijax import aot
    from mrijax.train.state import create_train_state

    cfg, run_dir = _load_run(args.run_dir)
    out = Path(args.out)
    if cfg.family == "ddpm_3d_ldm":
        from mrijax.train.experiments import build_unet3d

        # latent_scale travels in the ldm checkpoint's extra and is baked
        # into the program (a scalar constant, unlike the weight trees)
        unet_init = build_unet3d(cfg.unet, use_flash=False)
        from mrijax.kernels.dispatch import host_init

        with host_init():
            template = create_train_state(
                unet_init.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, 8, 8, cfg.vae.latent_channels)),
                    jnp.zeros((1,), jnp.int32),
                ),
                cfg.train.learning_rate,
                ema=cfg.train.ema_decay is not None,
            )
        _, extra = _restore_params(run_dir / "ldm", template)
        fn, ex = aot.build_volume_sampler(
            cfg, float(extra.get("latent_scale", 1.0)),
            num_volumes=args.num_samples, ddim_steps=args.ddim_steps, sampler=args.sampler,
        )
        sig = "(unet_params, vae_params, key)"
    elif cfg.family == "slice_cond_2d":
        fn, ex = aot.build_slice_sampler(
            cfg, num_samples=args.num_samples, ddim_steps=args.ddim_steps
        )
        sig = "(params, key, z_pos)"
    else:
        raise SystemExit(
            f"export-aot supports slice_cond_2d and ddpm_3d_ldm; "
            f"{cfg.family!r} sampling consumes context data, not just "
            "params — serve it via mrijax.generate"
        )
    aot.save_exported(out, fn, ex)
    print(
        f"[cli] AOT sampling program -> {out} "
        f"(platform {jax.default_backend()}, call signature {sig}); "
        "serving: mrijax.aot.load_exported(path)"
    )
    return 0


def cmd_serve(args):
    """Generation loop from an AOT program + exported weights — the serving
    deployment path (mrijax/aot.py). Needs neither the run dir nor a
    trace/lower wait: ``export-aot`` built the program, ``export`` the npz
    weights; this just binds them and writes batches of outputs."""
    import time

    import jax
    import numpy as np

    from mrijax import aot
    from mrijax.io import load_params_npz, save_grid_png, save_png
    from mrijax.io.images import volume_midslice_panel

    exp = aot.deserialize_exported(args.program)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    weights, meta = load_params_npz(args.weights)
    family = meta.get("family")
    n_baked = exp.out_avals[0].shape[0]  # batch size baked into the program

    if family == "ddpm_3d_ldm":
        vae_path = args.vae_weights or Path(args.weights).with_suffix(".vae.npz")
        if not Path(vae_path).exists():
            raise SystemExit(
                f"VAE weights not found at {vae_path} — `mrijax export` "
                "writes them next to the LDM npz; pass --vae-weights"
            )
        vae_weights, _ = load_params_npz(vae_path)
        call_args = lambda key: (weights, vae_weights, key)  # noqa: E731
    elif family == "slice_cond_2d":
        if args.z == "sweep":
            z = np.linspace(0.0, 1.0, n_baked, dtype=np.float32)
        else:
            z = np.full((n_baked,), float(args.z), np.float32)
        call_args = lambda key: (weights, key, z)  # noqa: E731
    else:
        raise SystemExit(
            f"weights npz is family {family!r}; serve supports "
            "slice_cond_2d and ddpm_3d_ldm (what export-aot can build)"
        )

    base = jax.random.PRNGKey(args.seed)
    t_first = t0 = time.perf_counter()
    for b in range(args.batches):
        key = jax.random.fold_in(base, b)
        try:
            out = np.asarray(exp.call(*call_args(key)), dtype=np.float32)
        except (TypeError, ValueError) as e:
            # Chain the original exception: a ValueError from deep inside
            # the export runtime must stay diagnosable, not be rewritten
            # as a mismatch unconditionally.
            raise SystemExit(
                f"serve failed calling the exported program: {e}\n  if the "
                "error is about argument structure/shapes, check that "
                f"{args.program} and {args.weights} were exported from the "
                "same run/config (full traceback above)"
            ) from e
        if b == 0:
            t0 = time.perf_counter()  # first batch pays the XLA compile
        if family == "ddpm_3d_ldm":
            from mrijax.data import nifti

            for j, v in enumerate(out):
                nifti.save(out_dir / f"b{b:03d}_v{j}.nii.gz", v)
                save_png(out_dir / f"b{b:03d}_v{j}_midslices.png",
                         volume_midslice_panel(v))
        else:
            save_grid_png(out_dir / f"b{b:03d}.png", out)
            np.savez(out_dir / f"b{b:03d}.npz", samples=out, z_pos=z)
    dt = time.perf_counter() - t_first
    steady = (time.perf_counter() - t0) / max(args.batches - 1, 1)
    print(
        f"[cli] served {args.batches} batch(es) of {n_baked} -> {out_dir} "
        f"({dt:.1f}s total"
        + (f", {steady:.2f}s/batch steady-state" if args.batches > 1 else "")
        + ")"
    )
    return 0


def cmd_preprocess(args):
    from mrijax.data import pack_dataset, pack_multimodal_slices, pack_volumes

    if args.family == "2d":
        index = pack_dataset(
            args.root_dir, args.output_dir,
            image_size=args.image_size, modality_suffix=args.modality_suffix,
        )
    elif args.family == "25d":
        index = pack_multimodal_slices(
            args.root_dir, args.output_dir, image_size=args.image_size
        )
    else:  # 3d
        index = pack_volumes(args.root_dir, args.output_dir)
    print(f"[cli] packed {len(index['files'])} volumes "
          f"({args.family}) -> {args.output_dir}")
    return 0


def cmd_split(args):
    from mrijax.data import apply_split

    splits = apply_split(
        args.src, args.out_root,
        train_frac=args.train_frac, val_frac=args.val_frac,
        test_frac=args.test_frac, seed=args.seed, mode=args.mode,
        dry_run=args.dry_run,
    )
    print({k: len(v) for k, v in splits.items()})
    return 0


def cmd_doctor(args):
    """Environment diagnostics: backend, devices, native/kernel/cache
    readiness. Read-only — run this first when anything behaves oddly on a
    new machine or TPU session (the usual suspects are all listed)."""
    import jax

    print(f"jax {jax.__version__}  backend={jax.default_backend()}")
    for d in jax.devices():
        pv = getattr(getattr(d, "client", None), "platform_version", "?")
        print(f"  device: {d}  platform_version={pv!r}")
    print(f"  process {jax.process_index()}/{jax.process_count()}, "
          f"{jax.local_device_count()} local / {jax.device_count()} global devices")
    for d in jax.local_devices():
        try:
            ms = d.memory_stats() or {}
        except Exception:
            ms = {}
        used = ms.get("bytes_in_use")
        limit = ms.get("bytes_limit")
        if used is not None and limit:
            print(f"  {d}: HBM {used / 2**30:.2f} / {limit / 2**30:.2f} GiB in use")
        else:
            # RESOURCE_EXHAUSTED on a remote chip with no visible stats
            # usually means another session holds it (one process at a time)
            print(f"  {d}: memory stats unavailable on this backend")

    from mrijax.data import cnifti

    print(f"native NIfTI decoder: "
          f"{'built' if cnifti.available() else 'NOT built (make -C csrc; pure-numpy fallback active)'}")

    from mrijax.kernels.dispatch import pallas_enabled

    on_tpu = jax.default_backend() == "tpu"
    print(f"pallas kernels: {'available (TPU backend)' if on_tpu else 'inactive (XLA fallbacks on ' + jax.default_backend() + ')'}"
          f"{'' if pallas_enabled() else ' [currently disabled via disable_pallas()]'}")

    import os as _os

    cache = _os.environ.get("MRIJAX_COMPILE_CACHE")
    disabled = _os.environ.get("MRIJAX_DISABLE_COMPILE_CACHE")
    tunnel = any(
        "axon" in str(getattr(getattr(d, "client", None), "platform_version", "")).lower()
        for d in jax.devices()
    )
    if disabled:
        print("compile cache: disabled (MRIJAX_DISABLE_COMPILE_CACHE)")
    elif cache:
        print(f"compile cache: {cache}")
    else:
        print("compile cache: not configured (set MRIJAX_COMPILE_CACHE or "
              "--compile-cache; on a remote-tunnel backend the worker-side "
              "compile is usually faster than shipping cached executables — "
              "see PERF.md)")
    if tunnel:
        print("note: remote-tunnel (axon) backend detected — one process on "
              "the TPU at a time; time work with a value readback, not "
              "block_until_ready (PERF.md 'Cold-setup anatomy')")
    return 0


def cmd_info(args):
    from mrijax.io import CheckpointManager

    cfg, run_dir = _load_run(args.run_dir)
    print(cfg.to_json())
    for sub in ("", "vae", "ldm"):
        d = run_dir / sub if sub else run_dir
        if not (d / "best.json").exists() and not any(d.glob("[0-9]*")):
            continue
        mgr = CheckpointManager(d)
        print(f"{d}: latest={mgr.latest_step} best={mgr.best_step}")
        mgr.close()
    return 0


def build_parser():
    p = argparse.ArgumentParser(prog="mrijax", description=__doc__)
    p.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force the JAX backend (authoritative, unlike JAX_PLATFORMS "
             "which some PJRT plugins ignore)",
    )
    p.add_argument(
        "--compile-cache", default=None, metavar="DIR",
        help="persistent XLA compile cache (default: $MRIJAX_COMPILE_CACHE; "
             "session-proof key, see mrijax.compile_cache)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a model family")
    t.add_argument("--preset", default="slice_cond_2d")
    t.add_argument("--config", default=None, help="config JSON (overrides preset)")
    t.add_argument("--root-dir", default=None)
    t.add_argument("--name", default=None)
    # action="extend": repeated --set flags accumulate instead of the last
    # silently replacing the rest (argparse nargs="*" alone keeps only the
    # final occurrence)
    t.add_argument("--set", nargs="*", action="extend", default=[], metavar="KEY=VAL",
                   help="dotted config overrides, e.g. train.epochs=3")
    t.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-process coordinator address (host 0); omit on "
                        "multi-task SLURM jobs (detected via SLURM_NTASKS) "
                        "and on TPU pods with MRIJAX_MULTIHOST=1, where "
                        "jax.distributed auto-discovers the coordinator")
    t.add_argument("--num-processes", type=int, default=None,
                   help="total processes in the multi-process job")
    t.add_argument("--process-id", type=int, default=None,
                   help="this process's rank in [0, num-processes)")
    t.set_defaults(fn=cmd_train)

    s = sub.add_parser("sample", help="generate from a trained run")
    s.add_argument("--run-dir", required=True)
    s.add_argument("--mode", default="grid",
                   choices=["grid", "sweep", "pseudo3d-real", "pseudo3d-hybrid",
                            "volume3d", "diagnostics"])
    s.add_argument("--num-samples", type=int, default=16)
    s.add_argument("--num-slices", type=int, default=155)
    s.add_argument("--z-pos", type=float, default=0.5)
    s.add_argument("--subject", type=int, default=0)
    s.add_argument("--ddim-steps", type=int, default=None)
    s.add_argument("--guidance-scale", type=float, default=None,
                   help="classifier-free guidance scale (2D/2.5D grid+sweep; "
                        "needs a model trained with train.cond_dropout>0; "
                        "1.0 = plain conditional)")
    s.add_argument("--sampler", default="ddim", choices=["ddim", "dpm"],
                   help="fast-path solver when --ddim-steps is set: "
                        "first-order DDIM or second-order DPM-Solver++(2M) "
                        "(~2.5x fewer steps at equal ODE accuracy)")
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--out-dir", default=None)
    s.add_argument("--data-parallel", action="store_true",
                   help="shard the sampling batch over all devices "
                        "(batch size must be a multiple of the device count)")
    s.set_defaults(fn=cmd_sample)

    e = sub.add_parser("eval", help="matched-condition generative eval")
    e.add_argument("--run-dir", required=True)
    e.add_argument("--num-samples", type=int, default=1000)
    # 128 is the measured knee of the sampling batch ladder on a v5e chip
    # (PERF.md "2D sampling batch ladder": DDIM/DPM gain ~15% MFU over the
    # reference's bs-64 A100-MIG protocol, flat beyond); the fakes batch is
    # a free parameter of the harness, not part of the metric definition
    e.add_argument("--batch-size", type=int, default=128)
    e.add_argument("--ddim-steps", type=int, default=None)
    e.add_argument("--sampler", default="ddim", choices=["ddim", "dpm"])
    e.add_argument("--diversity-pairs", type=int, default=64)
    e.add_argument("--pr", action="store_true")
    e.add_argument("--unconditional", action="store_true")
    e.add_argument("--split", default="test", choices=["train", "val", "test", "all"])
    e.add_argument("--eval-channel", type=int, default=3,
                   help="channel scored for multichannel (2.5D) models (3=FLAIR)")
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--out", default=None)
    e.add_argument("--inception-weights", default=None,
                   help="npz from `convert-features --arch inception_v3` → real FID/KID")
    e.add_argument("--lpips-weights", default=None,
                   help="npz from `convert-features --arch lpips_alex` → real LPIPS diversity")
    e.add_argument("--resnet18-weights", default=None,
                   help="npz from `convert-features --arch resnet18` → real improved PR")
    e.add_argument("--data-parallel", action="store_true",
                   help="shard the matched-condition sampling over all devices")
    e.set_defaults(fn=cmd_eval)

    em = sub.add_parser("eval-multi",
                        help="batch-evaluate a JSON list of run dirs")
    em.add_argument("--config", required=True,
                    help="JSON list of run configs (see evals.multi)")
    em.add_argument("--out-dir", required=True)
    em.add_argument("--inception-weights", default=None,
                    help="harness-wide default; per-run override via config")
    em.add_argument("--lpips-weights", default=None)
    em.add_argument("--resnet18-weights", default=None)
    em.set_defaults(fn=cmd_eval_multi)

    ex = sub.add_parser("export", help="export best weights to portable npz")
    ex.add_argument("--run-dir", required=True)
    ex.add_argument("--out", required=True)

    ea = sub.add_parser(
        "export-aot",
        help="serialize the lowered sampling program (jax.export) so "
             "serving processes skip the per-process trace",
    )
    ea.add_argument("--run-dir", required=True)
    ea.add_argument("--out", required=True, help="output .jaxexport path")
    ea.add_argument("--num-samples", type=int, default=8,
                    help="batch size baked into the program's shapes")
    ea.add_argument("--ddim-steps", type=int, default=None,
                    help="fast-path steps (default: full ancestral T)")
    ea.add_argument("--sampler", default="ddim", choices=["ddim", "dpm"],
                    help="solver when --ddim-steps is set (dpm = "
                         "DPM-Solver++(2M), ~2.5x fewer steps)")
    ea.set_defaults(fn=cmd_export_aot)
    ex.set_defaults(fn=cmd_export)

    sv = sub.add_parser(
        "serve",
        help="generation loop from an export-aot program + export npz "
             "weights (no run dir, no trace wait)",
    )
    sv.add_argument("--program", required=True, help=".jaxexport from export-aot")
    sv.add_argument("--weights", required=True, help="npz from export")
    sv.add_argument("--vae-weights", default=None,
                    help="3D family VAE npz (default: <weights>.vae.npz)")
    sv.add_argument("--out", required=True)
    sv.add_argument("--batches", type=int, default=1,
                    help="number of batches to generate")
    sv.add_argument("--seed", type=int, default=0)
    sv.add_argument("--z", default="0.5",
                    help="2D family slice position: a float, or 'sweep' for "
                         "linspace(0,1) across the batch")
    sv.set_defaults(fn=cmd_serve)

    es = sub.add_parser(
        "eval-seg",
        help="Dice + HD95 per BraTS label between NIfTI label maps",
    )
    es.add_argument("--pred", required=True, help="predicted labels (file or dir)")
    es.add_argument("--target", required=True, help="reference labels (file or dir)")
    es.add_argument("--labels", type=int, nargs="*", default=None,
                    help="label ids (default: BraTS 1 2 4)")
    es.add_argument("--voxelspacing", type=float, nargs=3, default=None)
    es.add_argument("--out", default=None, help="write full report JSON here")
    es.set_defaults(fn=cmd_eval_seg)

    cf = sub.add_parser(
        "convert-features",
        help="torch inception_v3/resnet18/lpips weights -> flax npz for eval",
    )
    cf.add_argument("--checkpoint", required=True, help=".pth state_dict")
    cf.add_argument("--arch", required=True,
                    choices=["inception_v3", "resnet18", "lpips_alex"])
    cf.add_argument("--out", required=True, help="output npz path")
    cf.set_defaults(fn=cmd_convert_features)

    it = sub.add_parser("import-torch",
                        help="convert a reference PyTorch checkpoint")
    it.add_argument("--checkpoint", required=True,
                    help="diffusion state_dict (2D/2.5D) or the LDM UNet "
                         "state_dict (3D)")
    it.add_argument("--out", required=True, help="run dir to create")
    it.add_argument("--preset", default="slice_cond_2d")
    it.add_argument("--vae-checkpoint", default=None,
                    help="vae3d_final.pt (required for --preset ddpm_3d_ldm)")
    it.add_argument("--latent-scale", type=float, default=1.0,
                    help="latent scale from the reference training run (3D)")
    it.add_argument("--root-dir", default=None)
    it.add_argument("--name", default=None)
    it.add_argument("--set", nargs="*", action="extend", default=[], metavar="KEY=VAL")
    it.set_defaults(fn=cmd_import_torch)

    pp = sub.add_parser("preprocess", help="pack data into npz shards")
    pp.add_argument("--root-dir", required=True)
    pp.add_argument("--output-dir", required=True)
    pp.add_argument("--family", default="2d", choices=["2d", "25d", "3d"],
                    help="2d: FLAIR slices; 25d: multimodal slice stacks; "
                         "3d: normalized full volumes")
    pp.add_argument("--image-size", type=int, default=128)
    pp.add_argument("--modality-suffix", default="_flair.nii.gz")
    pp.set_defaults(fn=cmd_preprocess)

    sp = sub.add_parser("split", help="subject-level train/val/test split")
    sp.add_argument("--src", required=True)
    sp.add_argument("--out-root", required=True)
    sp.add_argument("--train-frac", type=float, default=0.8)
    sp.add_argument("--val-frac", type=float, default=0.1)
    sp.add_argument("--test-frac", type=float, default=0.1)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--mode", default="symlink", choices=["symlink", "copy", "move"])
    sp.add_argument("--dry-run", action="store_true")
    sp.set_defaults(fn=cmd_split)

    dr = sub.add_parser("doctor", help="environment diagnostics (read-only)")
    dr.set_defaults(fn=cmd_doctor)

    i = sub.add_parser("info", help="show run config + checkpoints")
    i.add_argument("--run-dir", required=True)
    i.set_defaults(fn=cmd_info)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import os

        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)
    from mrijax.compile_cache import enable_compile_cache

    cache_dir = enable_compile_cache(args.compile_cache)
    if cache_dir:
        print(f"[cli] persistent compile cache: {cache_dir}")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
