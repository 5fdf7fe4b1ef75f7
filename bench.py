"""Headline benchmark: 3D MRI volume sampling throughput per chip.

Protocol (matches the reference's only full generation pipeline,
`ddpm_3d_ldm/show_model.py:249-259`): T=400-step denoising of a 16-channel
32×40×40 latent with the flagship UNet3D (+bottleneck attention, base 128,
mults (1,2,4)) followed by VAE3D decode to a 4-modality 128×160×160 volume.
Here the whole loop is ONE compiled ``lax.scan`` (DDIM, same 400 model
evaluations), bf16 compute, fused Pallas GroupNorm+SiLU, flash attention at
the bottleneck.

Prints ONE JSON line: volumes/sec/chip and the ratio vs the GPU baseline.

Baseline: the reference publishes no sampling throughput. Estimate for its
hardware (A100 MIG 4g.20gb, `job_submission_scripts/training_job.sh:4`):
400 sequential eager UNet forwards (each ≈ 2×0.67 TFLOP attention +
~1.5 TFLOP convs at fp16/bf16 on a 4g.20gb slice ≈ 78 TFLOP/s peak,
realistically ~35% util) ≈ 55 ms/step → ~22 s + decode ≈ 0.045 vol/s.
BENCH_r{N}.json history tracks our absolute number either way.
"""

import json
import os
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Session-proof persistent compile cache (key stabilization survives axon
# worker rotation — see mrijax/compile_cache.py). But on a REMOTE-worker
# tunnel the client cache is a net loss: a cache hit makes the client ship
# the deserialized 18.7 MB flagship executable to the worker (175-260 s at
# tunnel bandwidth, measured A/B in PERF.md "Cold-setup anatomy") where
# sending the ~250 KB HLO and letting the worker compile costs ~46 s. So:
# enable it on local backends, skip it when the backend is a tunnel.
# MRIJAX_COMPILE_CACHE forces it on; MRIJAX_DISABLE_COMPILE_CACHE off.
from mrijax.compile_cache import enable_compile_cache  # noqa: E402


def _client_cache_worth_it() -> bool:
    if os.environ.get("MRIJAX_COMPILE_CACHE"):
        return True
    try:
        pv = jax.devices()[0].client.platform_version
    except Exception:
        return True
    return "axon" not in pv.lower()


if _client_cache_worth_it():
    enable_compile_cache(
        os.environ.get("MRIJAX_COMPILE_CACHE")
        or str(pathlib.Path(__file__).parent / ".jax_cache")
    )
else:
    print(
        "# client compile cache off: remote-tunnel worker compile beats "
        "executable shipping (PERF.md); set MRIJAX_COMPILE_CACHE to force",
        file=sys.stderr,
    )

_t_phase = time.perf_counter()
_PHASES = {}  # label -> seconds; feeds the self-attributing JSON fields


def _phase(label: str) -> None:
    """Setup-phase timing (stderr for humans, ``_PHASES`` for the JSON):
    the driver-observed 181 s setup of r2 needed a breakdown to diagnose,
    and r3's lesson was that a breakdown only the stderr log sees cannot
    distinguish 'builder regressed' from 'worker pool was busy' in the one
    artifact the driver records — so the headline JSON now carries
    ``setup_client_secs`` / ``setup_worker_secs`` built from these."""
    global _t_phase
    now = time.perf_counter()
    _PHASES[label] = now - _t_phase
    print(f"# phase {label}: {now - _t_phase:.1f}s", file=sys.stderr)
    _t_phase = now


# --------------------------------------------------- session calibration

_CAL = {}  # merged into every JSON row by _emit


def _calibrate_session(dim: int = 8192, iters: int = 16) -> None:
    """Time a tiny FIXED reference program (a scan of ``iters`` bf16
    ``dim×dim`` matmuls — ~17.6 TFLOP at the defaults) and stamp its
    measured TFLOP/s into every JSON row as ``session_tflops``.

    Why: the same warm executable measured 0.368 → 0.142 vol/s across
    tunnel sessions within one morning (PERF.md "Tunnel-session variance"),
    and the driver samples ONE session per round — a capture without an
    in-run speed reference cannot be normalized or even labeled slow/fast.
    The probe's known-good reading on a healthy v5e session is ~120-190
    TFLOP/s (w ~ N(0, 1/dim) keeps activations normalized, so the loop is
    pure MXU); a capture whose ``session_tflops`` sits far below that was
    taken on a degraded session and its headline should be read with the
    same discount."""
    if jax.default_backend() != "tpu":
        return
    t0 = time.perf_counter()
    try:
        # ONE self-contained program: input generation + `iters` unrolled
        # chained matmuls + the readback reduction. Measured reality of the
        # tunnel (r4): the worker-compile round trip costs ~30-50 s largely
        # INDEPENDENT of program size — a scan-probe paid it once (60 s), a
        # "cheap" bare-dot probe paid it FOUR times (190 s: x, w, dot, sum
        # each a separate program). Everything in one jit = one compile;
        # the timed calls after it cost ~15 ms.
        @jax.jit
        def probe(key):
            x = jax.random.normal(key, (dim, dim), jnp.bfloat16)
            w = (jax.random.normal(jax.random.fold_in(key, 1), (dim, dim),
                                   jnp.float32)
                 / np.sqrt(dim)).astype(jnp.bfloat16)
            y = x
            for _ in range(iters):
                y = jnp.dot(y, w)
            return y.astype(jnp.float32).sum()

        key = jax.random.PRNGKey(0)
        _ = float(probe(key))  # compile + warmup
        best = None
        for _i in range(3):
            t1 = time.perf_counter()
            _ = float(probe(key))
            dt = time.perf_counter() - t1
            best = dt if best is None else min(best, dt)
        flops = 2.0 * iters * dim ** 3  # RNG + sum are noise next to this
        _CAL["session_tflops"] = round(flops / best / 1e12, 1)
        _CAL["calibration_secs"] = round(time.perf_counter() - t0, 1)
    except Exception as e:  # calibration must never break the benchmark
        print(f"# session calibration failed: {e}", file=sys.stderr)
    _phase("session calibration")


def _emit(row: dict) -> None:
    """Print one JSON result line, stamped with the session calibration."""
    print(json.dumps({**row, **_CAL}), flush=True)

BASELINE_VOL_PER_S = 0.045  # estimated reference GPU pipeline (see docstring)
V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e peak bf16 (MXU) FLOP/s per chip
T_STEPS = 400
BATCH = 8  # volumes denoised together: throughput metric; the reference
           # samples one volume at a time (bs=1/GPU) — batching is the
           # TPU-native way to fill the MXU at these small spatial shapes
DECODE_CHUNK = 4  # volumes decoded at once (full-res decode sets the HBM peak)
LATENT_SHAPE = (BATCH, 32, 40, 40, 16)
VOLUME_SHAPE = (128, 160, 160)


def _flops_of(fn, *args):
    """Total FLOPs of one call of ``fn`` via XLA HLO cost analysis.

    Lowered on host CPU with Pallas disabled (the XLA attention path is
    math-identical to the flash kernel, and HLO cost analysis cannot see
    inside a Pallas call anyway). NOTE: cost analysis counts a
    ``lax.scan``/``while`` body ONCE, so callers must analyze loop bodies
    separately and multiply by trip count."""
    from mrijax.kernels.dispatch import disable_pallas

    specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), args
    )
    try:
        # backend="cpu" pins BOTH lowering and the analysis to the host CPU
        # client — in an axon session, default_device alone still lowers
        # for the TPU and cost_analysis then triggers a remote compile
        # (minutes through the tunnel for the big remat steps)
        with disable_pallas():
            ca = jax.jit(fn, backend="cpu").lower(*specs).cost_analysis()
        flops = float((ca or {}).get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception as e:  # analysis must never break the benchmark
        print(f"# flops analysis unavailable: {e}",
              file=__import__("sys").stderr)
        return None


def _mfu(flops, dt):
    """Model FLOPs utilization vs the v5e bf16 peak (only meaningful on
    the real chip)."""
    if flops is None or jax.default_backend() != "tpu":
        return None
    return round(flops / dt / V5E_BF16_PEAK_FLOPS, 4)


def _init_on_cpu(model, *example_args):
    """Parameter tree WITHOUT compiling the init forward: flax init is only
    traced (jax.eval_shape — no XLA compile; a real init costs ~37 s of
    1-core host CPU at these model sizes), then leaves are materialized as
    seeded small-normal values ON the compute device — uploading host
    arrays instead costs 25 s of tunnel bandwidth for the ~280 MB flagship
    tree (r3 phase breakdown). Benchmark timing depends on shapes, not
    values."""
    from mrijax.kernels.dispatch import disable_pallas

    with disable_pallas():
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), *example_args)
        )

    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    # One flat normal + static slices: a per-leaf fold_in/normal emits ~700
    # independent threefry streams and the worker spends tens of seconds
    # compiling them (uncached on the tunnel — see the cache policy above);
    # this version is one RNG kernel + free reshapes.
    sizes = [int(np.prod(sd.shape)) if sd.shape else 1 for sd in leaves]
    total = sum(sizes)

    @jax.jit
    def materialize(key):
        flat = 0.02 * jax.random.normal(key, (total,), jnp.float32)
        out, off = [], 0
        for sd, n in zip(leaves, sizes):
            out.append(flat[off:off + n].reshape(sd.shape).astype(sd.dtype))
            off += n
        return out

    vals = materialize(jax.random.PRNGKey(0))
    return jax.device_put(
        jax.tree_util.tree_unflatten(treedef, vals), jax.devices()[0]
    )


def _source_fingerprint() -> str:
    """Content hash of everything that shapes the sampling pipeline's HLO:
    the compute-path sources, the bench constants, and the jax version.
    Keys the serialized jax.export artifact below — a stale blob can only
    be loaded when nothing that could change the program has changed."""
    import hashlib
    from pathlib import Path

    h = hashlib.sha256()
    # backend matters: an exported program is platform-bound, and the
    # platform check fires at call time, outside the deserialize fallback
    h.update(f"v1|{jax.__version__}|{jax.default_backend()}|{T_STEPS}|"
             f"{BATCH}|{DECODE_CHUNK}|{LATENT_SHAPE}|{VOLUME_SHAPE}".encode())
    # this file defines the pipeline being exported — hash it too, so any
    # bench edit (schedule, decode strategy, kwargs) invalidates the blob
    h.update(Path(__file__).read_bytes())
    root = Path(__file__).parent / "mrijax"
    for sub in ("models", "kernels", "diffusion", "ops"):
        for p in sorted((root / sub).glob("*.py")):
            h.update(p.name.encode())
            h.update(p.read_bytes())
    return h.hexdigest()


def _export_cached(tag: str, jitted, *example_args):
    """AOT-export cache: the dominant setup cost through the axon tunnel is
    not compilation (the persistent cache loads the executable in ~1 s with
    the stabilized key) but TRACING — lowering the 400-step scan over the
    136M-param UNet costs 150-210 s of 1-core host Python/MLIR per process
    (r3 phase breakdown). ``jax.export`` serializes the lowered StableHLO;
    deserializing skips the trace entirely, and the embedded module's XLA
    compile still rides the persistent cache. Falls back to a normal
    export when the blob is missing/stale (source fingerprint) or fails to
    load."""
    from pathlib import Path

    blob = Path(__file__).parent / ".jax_cache" / (
        f"bench_{tag}_{_source_fingerprint()[:16]}.jaxexport"
    )
    if blob.exists():
        try:
            exp = jax.export.deserialize(blob.read_bytes())
            # the platform check otherwise fires at call time, outside
            # this fallback (and the fingerprint includes the backend,
            # so this is a second line of defense)
            if jax.default_backend() not in exp.platforms:
                raise ValueError(
                    f"blob exported for {exp.platforms}, backend is "
                    f"{jax.default_backend()}"
                )
            _phase(f"{tag}: export blob deserialize")
            return exp.call
        except Exception as e:
            print(f"# export blob load failed ({e}); re-tracing", file=sys.stderr)
    exp = jax.export.export(jitted)(*example_args)
    _phase(f"{tag}: trace+lower (no blob)")
    try:
        blob.parent.mkdir(exist_ok=True)
        # drop stale same-tag blobs first: .gitignore un-ignores these by
        # pattern, so leftovers from old fingerprints would show up as
        # untracked quarter-MB binaries on every source edit
        for old in blob.parent.glob(f"bench_{tag}_*.jaxexport"):
            if old != blob:
                old.unlink(missing_ok=True)
        blob.write_bytes(exp.serialize())
    except Exception as e:  # cache write must never break the bench
        print(f"# export blob save failed ({e})", file=sys.stderr)
    return exp.call


def build_pipeline():
    from mrijax.diffusion import GaussianDiffusion, cosine_beta_schedule, make_schedule
    from mrijax.models import UNet3D, VAE3D

    on_tpu = jax.default_backend() == "tpu"
    unet_kw = dict(
        in_channels=16, base_channels=128, channel_mults=(1, 2, 4),
        use_attention=True, num_heads=4, dtype=jnp.bfloat16,
    )
    unet = UNet3D(use_flash_attention=on_tpu, **unet_kw)
    unet_init = UNet3D(use_flash_attention=False, **unet_kw)
    vae = VAE3D(
        in_channels=4, base_channels=32, num_down=3, latent_channels=16,
        dtype=jnp.bfloat16,
    )
    sched = make_schedule(cosine_beta_schedule(T_STEPS))
    diffusion = GaussianDiffusion(sched)

    _phase("imports+model build")
    unet_params = _init_on_cpu(
        unet_init, jnp.zeros((1, 8, 8, 8, 16), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
    )
    vae_params = _init_on_cpu(
        vae, jnp.zeros((1, 16, 16, 16, 4), jnp.bfloat16), jax.random.PRNGKey(1)
    )
    _phase("param init + device_put")

    # Params are explicit jit ARGUMENTS: closing over them would embed
    # ~280 MB of weights as HLO constants — the remote-compile tunnel
    # rejects the payload (HTTP 413) and local compiles slow to a crawl.
    def sample_volume(unet_params, vae_params, rng):
        def model_fn(x, t):
            return unet.apply(unet_params, x, t)

        z = diffusion.ddim_sample(model_fn, LATENT_SHAPE, rng, num_steps=T_STEPS)
        # Denoising at batch B is light (latents are small); the full-res
        # decode is the memory peak (batch 8 would exceed HBM by ~0.4 GB),
        # so decode sequentially in chunks of DECODE_CHUNK via lax.map.
        zc = z.reshape(BATCH // DECODE_CHUNK, DECODE_CHUNK, *z.shape[1:])
        vols = jax.lax.map(
            lambda zz: vae.apply(vae_params, zz, method="decode_from_latent"), zc
        )
        return vols.reshape(BATCH, *vols.shape[2:])

    # FLOPs for MFU: the 400-step denoise scan body and the per-chunk decode
    # are analyzed standalone (cost analysis counts loop bodies once) and
    # scaled by their trip counts; the DDIM update math itself is negligible
    # (~1e-5 of one UNet forward).
    unet_flops = _flops_of(
        lambda p, x, t: unet_init.apply(p, x, t),
        unet_params, jnp.zeros(LATENT_SHAPE, jnp.bfloat16),
        jnp.zeros((BATCH,), jnp.int32),
    )
    decode_flops = _flops_of(
        lambda p, z: vae.apply(p, z, method="decode_from_latent"),
        vae_params, jnp.zeros((DECODE_CHUNK, *LATENT_SHAPE[1:]), jnp.bfloat16),
    )
    total_flops = (
        T_STEPS * unet_flops + (BATCH // DECODE_CHUNK) * decode_flops
        if unet_flops and decode_flops else None
    )
    _phase("host-side FLOPs analysis")

    call = _export_cached(
        "sample", jax.jit(sample_volume),
        unet_params, vae_params, jax.random.PRNGKey(0),
    )
    return (lambda rng: call(unet_params, vae_params, rng)), total_flops


def bench_train_step():
    """Secondary benchmark (``--train``): flagship LDM train-step time —
    frozen-VAE encode of a (1, 128, 160, 160, 4) volume → min-SNR loss →
    grad → Adam update, one compiled program (the reference's per-step
    hot loop, `ddpm_3d_ldm/train.py:368-433`)."""
    import numpy as np

    from mrijax.diffusion import GaussianDiffusion, cosine_beta_schedule, make_schedule
    from mrijax.models import UNet3D, VAE3D
    from mrijax.train import create_train_state
    from mrijax.train.steps import make_latent_diffusion_train_step

    on_tpu = jax.default_backend() == "tpu"
    unet_kw = dict(
        in_channels=16, base_channels=128, channel_mults=(1, 2, 4),
        use_attention=True, num_heads=4, dtype=jnp.bfloat16,
    )
    unet = UNet3D(use_flash_attention=on_tpu, **unet_kw)
    unet_init = UNet3D(use_flash_attention=False, **unet_kw)
    vae = VAE3D(in_channels=4, base_channels=32, num_down=3,
                latent_channels=16, dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(
        make_schedule(cosine_beta_schedule(T_STEPS)), loss_type="min_snr"
    )
    unet_params = _init_on_cpu(
        unet_init, jnp.zeros((1, 8, 8, 8, 16), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
    )
    vae_params = _init_on_cpu(
        vae, jnp.zeros((1, 16, 16, 16, 4), jnp.bfloat16), jax.random.PRNGKey(1)
    )
    state = jax.device_put(
        create_train_state(unet_params, 1e-4), jax.devices()[0]
    )
    step = make_latent_diffusion_train_step(unet, vae, diffusion, donate=False)
    batch = {
        "volume": jax.device_put(
            np.random.default_rng(0)
            .normal(size=(1, *VOLUME_SHAPE, 4))
            .astype(np.float32)
            .astype(jnp.bfloat16)
        )
    }
    key = jax.random.PRNGKey(0)

    # FLOPs of the full compiled step (fwd + bwd incl. any remat recompute +
    # Adam), via a math-identical non-flash twin lowered on CPU.
    step_analysis = make_latent_diffusion_train_step(
        unet_init, vae, diffusion, donate=False
    )
    step_flops = _flops_of(
        lambda s, vp, b, k: step_analysis(s, vp, b, k, 1.0),
        state, vae_params, batch, key,
    )

    state, loss = step(state, vae_params, batch, key, 1.0)
    _ = float(loss)  # sync
    n = 4
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step(state, vae_params, batch, jax.random.fold_in(key, i), 1.0)
        _ = float(loss)
    dt = (time.perf_counter() - t0) / n
    _emit({
        "metric": "3d_ldm_train_step_time",
        "value": round(dt, 4),
        "unit": "sec/step (bs=1 volume 128x160x160x4, frozen-VAE encode + min-SNR + Adam)",
        "vs_baseline": None,
        "steps_per_s": round(1.0 / dt, 3),
        "step_tflops": round(step_flops / 1e12, 2) if step_flops else None,
        "mfu": _mfu(step_flops, dt),
    })


def bench_train_step_cached(batch: int = 32, remat: bool = False,
                            remat_levels=(0,)):
    """Tuned training path (``--train-cached``): the stage-2 LDM step on
    PRECOMPUTED frozen-VAE latents (``pack_latents``) at TPU-native batch
    with SELECTIVE rematerialization — only the full-resolution (level-0)
    res blocks recompute in the backward pass. Level-0 activations are the
    HBM hog (16× the per-tensor bytes of the bottleneck: spatial 64× /
    channels ×4) while level-0
    convs are only ~57% of the FLOPs, so ``remat_levels=(0,)`` keeps the
    memory win of full remat for roughly half the recompute: measured
    same-session ladder (PERF.md) — batch 32 full remat 3.79 s/step vs
    remat_levels=(0,) 1.10 s/step (3.45×), batch 16 selective matches it
    per-volume (28.9 vs 29.1 vols/s), batch 48 fails in the worker's
    remote-compile helper. With any remat the reported ``step_tflops``/
    ``mfu`` count the recompute (hardware FLOPs, not model FLOPs)."""
    import numpy as np

    from mrijax.diffusion import GaussianDiffusion, cosine_beta_schedule, make_schedule
    from mrijax.models import UNet3D
    from mrijax.train import create_train_state
    from mrijax.train.steps import make_cached_latent_train_step

    on_tpu = jax.default_backend() == "tpu"
    unet_kw = dict(
        in_channels=16, base_channels=128, channel_mults=(1, 2, 4),
        use_attention=True, num_heads=4, dtype=jnp.bfloat16, remat=remat,
        remat_levels=remat_levels,
    )
    unet = UNet3D(use_flash_attention=on_tpu, **unet_kw)
    unet_init = UNet3D(use_flash_attention=False, **unet_kw)
    diffusion = GaussianDiffusion(
        make_schedule(cosine_beta_schedule(T_STEPS)), loss_type="min_snr"
    )
    unet_params = _init_on_cpu(
        unet_init, jnp.zeros((1, 8, 8, 8, 16), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
    )
    state = jax.device_put(
        create_train_state(unet_params, 1e-4), jax.devices()[0]
    )
    step = make_cached_latent_train_step(unet, diffusion, donate=False)
    batch_d = {
        "latent": jax.device_put(
            np.random.default_rng(0)
            .normal(size=(batch, *LATENT_SHAPE[1:]))
            .astype(np.float32)
        )
    }
    key = jax.random.PRNGKey(0)

    step_analysis = make_cached_latent_train_step(
        unet_init, diffusion, donate=False
    )
    step_flops = _flops_of(
        lambda s, b, k: step_analysis(s, b, k, 1.0), state, batch_d, key
    )

    state, loss = step(state, batch_d, key, 1.0)
    _ = float(loss)
    n = 4
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step(state, batch_d, jax.random.fold_in(key, i), 1.0)
        _ = float(loss)
    dt = (time.perf_counter() - t0) / n
    remat_tag = (
        f", remat levels {remat_levels}" if remat_levels is not None
        else (", remat" if remat else "")
    )
    _emit({
        "metric": "3d_ldm_cached_train_throughput",
        "value": round(batch / dt, 3),
        "unit": (
            f"volumes/sec trained (batch {batch} cached latents "
            f"32x40x40x16, min-SNR + Adam{remat_tag})"
        ),
        "vs_baseline": None,
        "sec_per_step": round(dt, 4),
        "step_tflops": round(step_flops / 1e12, 2) if step_flops else None,
        "mfu": _mfu(step_flops, dt),
    })


def bench_train_cached_sweep():
    """Same-session A/B ladder of the cached-latent train step
    (``--train-cached-sweep``): batch × remat strategy measured in ONE
    process (immune to the ~2.5× tunnel-session variance). Risky (possibly
    OOM) configs run last and are reported as failed lines instead of
    killing the sweep."""
    configs = [
        (32, True, None),      # r2 recipe: full remat (control row)
        (32, False, (0,)),     # selective: recompute only level-0 blocks
        (16, False, (0,)),
        (48, False, (0,)),     # possible OOM
        (48, True, None),      # possible OOM
    ]
    for batch, remat, levels in configs:
        try:
            bench_train_step_cached(batch=batch, remat=remat,
                                    remat_levels=levels)
        except Exception as e:
            _emit({
                "metric": "3d_ldm_cached_train_throughput",
                "batch": batch, "remat": remat,
                "remat_levels": list(levels) if levels else None,
                "value": None, "error": str(e)[:200],
            })
        _phase(f"cached sweep b{batch} remat={remat} levels={levels}")


def bench_train_vae(batch: int = 1, remat: bool = True, grad_accum: int = 1):
    """Stage-1 VAE train step (``--train-vae``): L1 + 1e-4·KL on full-res
    (128×160×160×4) volumes → grad → Adam, one compiled program — the
    reference's stage-1 hot loop (`ddpm_3d_ldm/train.py:258-348`, bs=1 per
    GPU). ``remat=True`` is the shipped (and only viable) flagship-size
    mode: the un-rematerialized fwd+bwd program crashes the TPU compiler
    at 128×160×160 (worker compile-helper exit 1; it compiles fine at
    96×128×128 and below — PERF.md). ``grad_accum=k`` scans k microbatches
    of ``batch/k`` volumes inside the step (one optimizer update on the
    averaged gradient) — the only route past the compiler's batch-≥2
    ceiling, since the scan body is traced at microbatch size.
    ``--train-vae-sweep`` ladders batch/accum configs in one session."""
    import numpy as np

    from mrijax.models import VAE3D
    from mrijax.train import create_train_state
    from mrijax.train.steps import make_vae_train_step

    vae = VAE3D(in_channels=4, base_channels=32, num_down=3,
                latent_channels=16, dtype=jnp.bfloat16, remat=remat)
    vae_params = _init_on_cpu(
        vae, jnp.zeros((1, 16, 16, 16, 4), jnp.bfloat16), jax.random.PRNGKey(1)
    )
    state = jax.device_put(
        create_train_state(vae_params, 1e-4), jax.devices()[0]
    )
    # donate=True (the trainer's real mode) is REQUIRED here: the remat
    # step's execution peak sits close enough to the 16 GB HBM limit that
    # keeping a second (non-donated) train state alive OOMs the second
    # invocation (localized r3: first step + readback fine, second step
    # RESOURCE_EXHAUSTED)
    step = make_vae_train_step(vae, donate=True, grad_accum=grad_accum)
    batch_d = {
        "volume": jax.device_put(
            np.random.default_rng(0)
            .normal(size=(batch, *VOLUME_SHAPE, 4))
            .astype(np.float32)
            .astype(jnp.bfloat16)
        )
    }
    key = jax.random.PRNGKey(0)

    # same module, donation off (CPU lowering for analysis only); return
    # the FULL (state, metrics) so XLA cannot dead-code-eliminate the
    # gradient/Adam part out of the cost analysis. NOTE: cost analysis
    # counts the accumulation scan body ONCE — scale by grad_accum and add
    # nothing for the update (Adam is noise next to the conv fwd+bwd).
    step_analysis = make_vae_train_step(vae, donate=False)
    # host zeros: _flops_of only reads shapes/dtypes, and a live device
    # buffer here eats HBM margin the remat step needs (the execution peak
    # sits close to the 16 GB limit — CLAUDE.md HBM-cliff rule)
    micro_d = {"volume": np.zeros(
        (batch // grad_accum, *VOLUME_SHAPE, 4), dtype=jnp.bfloat16)}
    micro_flops = _flops_of(step_analysis, state, micro_d, key)
    step_flops = micro_flops * grad_accum if micro_flops else None

    state, metrics = step(state, batch_d, key)
    _ = float(metrics["loss"])
    n = 4
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = step(state, batch_d, jax.random.fold_in(key, i))
        _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n
    _emit({
        "metric": "vae3d_train_throughput",
        "value": round(batch / dt, 3),
        "unit": (
            f"volumes/sec trained (batch {batch} full-res 128x160x160x4, "
            f"L1+KL + Adam{', remat' if remat else ''}"
            + (f", grad_accum {grad_accum}" if grad_accum > 1 else "") + ")"
        ),
        "vs_baseline": None,
        "sec_per_step": round(dt, 4),
        "step_tflops": round(step_flops / 1e12, 2) if step_flops else None,
        "mfu": _mfu(step_flops, dt),
    })


def bench_train_vae_sweep():
    """Same-session ladder of the stage-1 VAE step
    (``--train-vae-sweep``). Measured reality at the flagship patch size
    (PERF.md): batch 1 + remat is the ONLY monolithic config the TPU
    compiler accepts — batch ≥2 (with or without remat) and batch 1
    without remat all crash the worker compile helper. The grad_accum rows
    raise EFFECTIVE batch through a lax.scan whose body stays at the
    compiling bs=1 shape (r3 verdict item #2); the two crash probes stay
    as documentation."""
    configs = [
        # (batch, remat, grad_accum)
        (1, True, 1),     # shipped r3 config
        (4, True, 4),     # effective batch 4, bs=1 microbatches
        (8, True, 8),     # effective batch 8
        (8, True, 4),     # bs=2 microbatches — does the compiler take the
                          # scan body at bs=2 even though monolithic bs=2
                          # crashes? (graph size, not tensor size, is the
                          # suspected killer)
        (2, True, 1),     # crash probe: monolithic bs=2
        (1, False, 1),    # crash probe: no remat
    ]
    for batch, remat, accum in configs:
        try:
            bench_train_vae(batch=batch, remat=remat, grad_accum=accum)
        except Exception as e:
            _emit({
                "metric": "vae3d_train_throughput", "batch": batch,
                "remat": remat, "grad_accum": accum, "value": None,
                "error": str(e)[:200],
            })
        _phase(f"vae sweep b{batch} remat={remat} accum={accum}")


def bench_train_2d(context: bool = False):
    """2D / 2.5D family train-step benchmark (``--train-2d`` /
    ``--train-25d``) at the reference configs — 2D: bs 64, 128², 1 channel
    (`slice_cond_2d_ddpm/model.py:27-34`); 2.5D: bs 64, 20 in / 4 out
    channels, radius-2 context (`ddpm_25d_all_modalities/model.py:32-43`).
    Same JSON schema as the 3D rows so the driver's BENCH history can
    track a 2D regression."""
    import numpy as np

    from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule
    from mrijax.models import UNet2D
    from mrijax.train import create_train_state
    from mrijax.train.steps import make_diffusion_train_step

    bs, size = 64, 128
    x_ch = 4 if context else 1
    ctx_ch = 16 if context else 0
    model = UNet2D(
        in_channels=x_ch + ctx_ch, out_channels=x_ch, base_channels=64,
        channel_mults=(1, 2, 4, 8), dtype=jnp.bfloat16,
    )
    diffusion = GaussianDiffusion(
        make_schedule(linear_beta_schedule(1000)), loss_type="mse"
    )
    init_args = [
        jnp.zeros((1, 16, 16, x_ch), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
    ]
    if context:
        init_args.append(jnp.zeros((1, 16, 16, ctx_ch), jnp.bfloat16))
    params = _init_on_cpu(model, *init_args)
    state = jax.device_put(create_train_state(params, 2e-4), jax.devices()[0])
    step = make_diffusion_train_step(model, diffusion, donate=False)

    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            rng.normal(size=(bs, size, size, x_ch)).astype(np.float32)
        ),
        "z_pos": jax.device_put(rng.uniform(size=(bs,)).astype(np.float32)),
    }
    if context:
        batch["context"] = jax.device_put(
            rng.normal(size=(bs, size, size, ctx_ch)).astype(np.float32)
        )
    key = jax.random.PRNGKey(0)

    step_flops = _flops_of(lambda s, b, k: step(s, b, k), state, batch, key)

    state, loss = step(state, batch, key)
    _ = float(loss)  # compile + sync
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step(state, batch, jax.random.fold_in(key, i))
        _ = float(loss)
    dt = (time.perf_counter() - t0) / n
    fam = "ddpm_25d" if context else "slice_cond_2d"
    _emit({
        "metric": f"{fam}_train_step_time",
        "value": round(dt, 4),
        "unit": (
            f"sec/step (bs={bs} {size}x{size}x{x_ch}"
            f"{f' + {ctx_ch}ch context' if context else ''}, "
            "T=1000 linear, MSE + Adam)"
        ),
        "vs_baseline": None,
        "images_per_s": round(bs / dt, 1),
        "step_tflops": round(step_flops / 1e12, 2) if step_flops else None,
        "mfu": _mfu(step_flops, dt),
    })


def bench_train_2d_profile():
    """Attribution of the 2D train step's MFU (``--train-2d-profile``,
    r3 verdict item #4: 18.8% MFU with no breakdown). One session, one
    JSON row per measurement:

    - ``per_step_readback``: the historical --train-2d protocol (a
      float(loss) sync every step — includes one ~50-100 ms tunnel round
      trip per step, which a real training loop does NOT pay);
    - ``chained``: 20 steps enqueued, ONE readback — the honest per-chip
      number a logging-every-N training loop sees;
    - ``fwd_only`` / ``fwd_bwd``: the loss forward alone and
      value_and_grad alone (no optimizer), chained — the residual vs
      ``chained`` is Adam + dispatch;
    - ``chained_b128``: double batch (MXU-fill lever);
    - ``chained_pallas_off``: Pallas kernels disabled end-to-end — with the
      r3 dispatch-on-differentiation fix the train path already runs XLA
      GN under grad, so this row should EQUAL ``chained`` (the A/B the r3
      verdict item #3 asked for).
    """
    import numpy as np

    from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule
    from mrijax.kernels.dispatch import disable_pallas
    from mrijax.models import UNet2D
    from mrijax.train import create_train_state
    from mrijax.train.steps import make_diffusion_train_step

    size = 128
    model = UNet2D(in_channels=1, out_channels=1, base_channels=64,
                   channel_mults=(1, 2, 4, 8), dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(
        make_schedule(linear_beta_schedule(1000)), loss_type="mse"
    )
    params = _init_on_cpu(
        model, jnp.zeros((1, 16, 16, 1), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
    )
    state = jax.device_put(create_train_state(params, 2e-4), jax.devices()[0])
    step = make_diffusion_train_step(model, diffusion, donate=False)

    def make_batch(bs):
        rng = np.random.default_rng(0)
        return {
            "image": jax.device_put(
                rng.normal(size=(bs, size, size, 1)).astype(np.float32)),
            "z_pos": jax.device_put(
                rng.uniform(size=(bs,)).astype(np.float32)),
        }

    key = jax.random.PRNGKey(0)

    def emit(name, dt, flops, bs, extra=None):
        _emit({
            "metric": "slice_cond_2d_train_profile", "measurement": name,
            "value": round(dt, 4), "unit": f"sec/step (bs={bs}, 128x128x1)",
            "vs_baseline": None,
            "images_per_s": round(bs / dt, 1),
            "step_tflops": round(flops / 1e12, 2) if flops else None,
            "mfu": _mfu(flops, dt), **(extra or {}),
        })

    def chained(fn, carry_state, batch, n=20):
        """Enqueue n dependent steps, one readback at the end."""
        s = carry_state
        s, loss = fn(s, batch, key)
        _ = float(loss)  # compile + warmup
        t0 = time.perf_counter()
        for i in range(n):
            s, loss = fn(s, batch, jax.random.fold_in(key, i))
        _ = float(loss)
        return (time.perf_counter() - t0) / n

    # ---- bs=64 protocol rows
    bs = 64
    batch = make_batch(bs)
    step_flops = _flops_of(lambda s, b, k: step(s, b, k), state, batch, key)

    state2, loss = step(state, batch, key)
    _ = float(loss)
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        state2, loss = step(state2, batch, jax.random.fold_in(key, i))
        _ = float(loss)
    emit("per_step_readback", (time.perf_counter() - t0) / n, step_flops, bs)
    _phase("profile: per-step readback")

    emit("chained", chained(step, state, batch), step_flops, bs)
    _phase("profile: chained")

    # forward loss only (same RNG plumbing, no grad)
    from mrijax.train.steps import sample_timesteps

    @jax.jit
    def fwd_only(params, batch, k):
        tkey, nkey = jax.random.split(k)
        b = batch["image"].shape[0]
        t = sample_timesteps(tkey, b, diffusion.timesteps, 0)
        noise = jax.random.normal(nkey, batch["image"].shape, jnp.float32)

        def model_fn(x, tt):
            return model.apply(params, x, tt, batch["z_pos"])

        return diffusion.p_losses(model_fn, batch["image"], t, noise)

    fwd_flops = _flops_of(fwd_only, state.params, batch, key)
    _ = float(fwd_only(state.params, batch, key))
    t0 = time.perf_counter()
    for i in range(20):
        loss = fwd_only(state.params, batch, jax.random.fold_in(key, i))
    _ = float(loss)
    emit("fwd_only", (time.perf_counter() - t0) / 20, fwd_flops, bs)
    _phase("profile: fwd only")

    @jax.jit
    def fwd_bwd(params, batch, k):
        def loss_fn(p):
            tkey, nkey = jax.random.split(k)
            b = batch["image"].shape[0]
            t = sample_timesteps(tkey, b, diffusion.timesteps, 0)
            noise = jax.random.normal(nkey, batch["image"].shape, jnp.float32)

            def model_fn(x, tt):
                return model.apply(p, x, tt, batch["z_pos"])

            return diffusion.p_losses(model_fn, batch["image"], t, noise)

        return jax.value_and_grad(loss_fn)(params)

    vag_flops = _flops_of(fwd_bwd, state.params, batch, key)
    loss, grads = fwd_bwd(state.params, batch, key)
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(20):
        loss, grads = fwd_bwd(state.params, batch, jax.random.fold_in(key, i))
    _ = float(loss)
    emit("fwd_bwd", (time.perf_counter() - t0) / 20, vag_flops, bs)
    _phase("profile: fwd+bwd")

    # ---- levers
    b128 = make_batch(128)
    flops128 = _flops_of(lambda s, b, k: step(s, b, k), state, b128, key)
    emit("chained_b128", chained(step, state, b128), flops128, 128)
    _phase("profile: chained b128")

    # fresh step fn: the dispatch flag is consulted at TRACE time and the
    # cached bs-64 executable above was traced with Pallas enabled — a new
    # make_* call gives a new jit cache, traced inside the disable window
    step_off = make_diffusion_train_step(model, diffusion, donate=False)
    with disable_pallas():
        emit("chained_pallas_off", chained(step_off, state, batch),
             step_flops, bs)
    _phase("profile: chained pallas off")


def bench_sample_2d(steps: int = None, sampler: str = "ddim"):
    """2D slice sampling throughput (``--sample-2d``): batch-64 generation
    at 128², one compiled scan — the loop that dominates the reference's
    eval cost (`slice_cond_2d_ddpm/metrics.py:347-389` samples matched
    fakes with the full T=1000 ancestral loop; ~10⁶ UNet forwards per
    eval run). Default measures the reference protocol (T=1000 ancestral),
    executed as RNG-identical segments (``p_sample_loop_auto``) —
    a single ~85 s execution crashes the remote tunnel worker (measured:
    251-step/21 s scans run, 999-step scans kill the worker; PERF.md);
    ``--steps N`` measures the strided fast path instead."""
    import numpy as np

    from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule
    from mrijax.models import UNet2D

    bs, size, T = 64, 128, 1000
    model = UNet2D(in_channels=1, out_channels=1, base_channels=64,
                   channel_mults=(1, 2, 4, 8), dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(make_schedule(linear_beta_schedule(T)))
    params = _init_on_cpu(
        model, jnp.zeros((1, 16, 16, 1), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
    )
    z_pos = jax.device_put(
        np.random.default_rng(0).uniform(size=(bs,)).astype(np.float32)
    )

    def sample(params, z_pos, key):
        def model_fn(x, t):
            return model.apply(params, x, t, z_pos)

        if steps is None:
            # NOT under an outer jit: the segments must stay separate
            # device executions to dodge the tunnel's per-execution cap
            return diffusion.p_sample_loop_auto(
                model_fn, (bs, size, size, 1), key
            )
        return diffusion.fast_sample(
            model_fn, (bs, size, size, 1), key, num_steps=steps, sampler=sampler
        )

    n_evals = steps if steps is not None else T
    fwd_flops = _flops_of(
        lambda p, z, x, t: model.apply(p, x, t, z),
        params, z_pos, jnp.zeros((bs, size, size, 1), jnp.bfloat16),
        jnp.zeros((bs,), jnp.int32),
    )
    total_flops = n_evals * fwd_flops if fwd_flops else None

    # fast path: one fused program; protocol path: keep segments un-jitted
    fn = jax.jit(sample) if steps is not None else sample
    key = jax.random.PRNGKey(42)
    out = fn(params, z_pos, key)
    _ = float(jnp.asarray(out, jnp.float32).mean())
    _phase("sample-2d compile+warmup")
    n = 2
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(params, z_pos, jax.random.fold_in(key, i))
        _ = float(jnp.asarray(out, jnp.float32).mean())
    dt = (time.perf_counter() - t0) / n
    mode = (f"{sampler}-{steps}" if steps is not None
            else f"ancestral T={T} (reference protocol)")
    _emit({
        "metric": "slice_cond_2d_sampling_throughput",
        "value": round(bs / dt, 2),
        "unit": f"slices/sec/chip (batch {bs} @ {size}², {mode})",
        "vs_baseline": None,
        "secs_per_batch": round(dt, 3),
        "pipeline_tflops": round(total_flops / 1e12, 1) if total_flops else None,
        "mfu": _mfu(total_flops, dt),
    })


def bench_sample_2d_ladder():
    """Batch ladder for the eval-dominating 2D sampling loop
    (``--sample-2d-sweep``): batch 64/128/256 × {ancestral reference
    protocol, DDIM-50, DPM-Solver++(2M)-20}, one session so rungs are
    comparable despite the ~2.5× tunnel variance. The reference protocol
    generates fakes at batch 64 (`slice_cond_2d_ddpm/metrics.py:347-389`
    — sized for the A100 MIG slice); the eval harness's generation batch
    is a free parameter here, and r4 proved the TRAIN step gains ~1.5×
    MFU at batch 128 — this rung ladder answers the same question for
    sampling. Ancestral rungs are timed once (≈100 s/run at batch 64);
    fast paths twice. Segments scale with batch to hold per-execution
    device time under the tunnel's ~1-min cap."""
    import numpy as np

    from mrijax.diffusion import (
        GaussianDiffusion,
        ancestral_segments_for_backend,
        linear_beta_schedule,
        make_schedule,
    )
    from mrijax.models import UNet2D

    size, T = 128, 1000
    model = UNet2D(in_channels=1, out_channels=1, base_channels=64,
                   channel_mults=(1, 2, 4, 8), dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(make_schedule(linear_beta_schedule(T)))
    params = _init_on_cpu(
        model, jnp.zeros((1, 16, 16, 1), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
    )
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(42)

    fwd_flops_by_batch = {}

    def fwd_flops(bs):
        if bs not in fwd_flops_by_batch:
            fwd_flops_by_batch[bs] = _flops_of(
                lambda p, z, x, t: model.apply(p, x, t, z),
                params, jnp.zeros((bs,)),
                jnp.zeros((bs, size, size, 1), jnp.bfloat16),
                jnp.zeros((bs,), jnp.int32),
            )
        return fwd_flops_by_batch[bs]

    def make_fn(bs, steps, sampler):
        z_pos = jax.device_put(rng.uniform(size=(bs,)).astype(np.float32))

        def sample(params, key):
            def model_fn(x, t):
                return model.apply(params, x, t, z_pos)

            if steps is None:
                # eager segments (NOT under jit) dodge the per-execution
                # cap; the library policy scales the count with the batch
                # so per-execution time stays at the batch-64 level
                return diffusion.p_sample_loop_segmented(
                    model_fn, (bs, size, size, 1), key,
                    segments=ancestral_segments_for_backend(batch_size=bs),
                )
            return diffusion.fast_sample(
                model_fn, (bs, size, size, 1), key,
                num_steps=steps, sampler=sampler,
            )

        return sample if steps is None else jax.jit(sample)

    for bs in (64, 128, 256):
        for sampler, steps in (("ancestral", None), ("ddim", 50), ("dpm", 20)):
            fn = make_fn(bs, steps, sampler)
            out = fn(params, key)
            _ = float(jnp.asarray(out, jnp.float32).mean())
            _phase(f"ladder b{bs} {sampler}{steps or T}: compile+warmup")
            n = 1 if steps is None else 2
            t0 = time.perf_counter()
            for i in range(n):
                out = fn(params, jax.random.fold_in(key, i))
                _ = float(jnp.asarray(out, jnp.float32).mean())
            dt = (time.perf_counter() - t0) / n
            n_evals = steps if steps is not None else T
            total = n_evals * fwd_flops(bs) if fwd_flops(bs) else None
            _emit({
                "metric": "slice_cond_2d_sampling_ladder",
                "batch": bs,
                "sampler": (f"{sampler}-{steps}" if steps is not None
                            else f"ancestral-T{T}"),
                "value": round(bs / dt, 2),
                "unit": f"slices/sec/chip ({size}²)",
                "secs_per_batch": round(dt, 3),
                "mfu": _mfu(total, dt),
                "timed_runs": n,
            })


def bench_input_pipeline():
    """Host input pipeline vs the chip (``--input-pipeline``): every other
    train row times DEVICE-RESIDENT batches, so its MFU is compute-only.
    This mode measures, in ONE session at the 2D bs-64 protocol
    (`slice_cond_2d_ddpm/model.py:27-34,84-98` — the reference feeds it
    with `DataLoader(num_workers=4, pin_memory=True)`):

    - ``device_resident``  — compute-only steps/s (the A-side),
    - ``packed_loader``    — steps/s fed by `BatchLoader` over packed npz
      shards (prefetch thread on) — the shipped production path,
    - ``live_loader``      — steps/s fed by NIfTI decode + resize with the
      LRU-4 volume cache (the reference's live path),
    - ``*_host_only``      — the loader iterated WITHOUT stepping: the
      host's production ceiling in images/s (attribution: if host_only
      beats the consumed rate, the gap is H2D/dispatch, not decode).

    Data: synthetic BraTS volumes at (128,128,80) — big enough that decode
    and resize cost what real volumes cost at the protocol's 128² size.
    """
    import tempfile

    import numpy as np

    from mrijax.data import BatchLoader, SliceDataset2D
    from mrijax.data.packing import PackedSliceDataset, pack_dataset
    from mrijax.data.synthetic import write_synthetic_brats
    from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule
    from mrijax.models import UNet2D
    from mrijax.train import create_train_state
    from mrijax.train.steps import make_diffusion_train_step

    bs, size = 64, 128
    tmp = tempfile.mkdtemp(prefix="mrijax_inpipe_")
    t0 = time.perf_counter()
    root = write_synthetic_brats(tmp + "/brats", num_subjects=6,
                                 shape=(128, 128, 80), seed=0)
    _phase("input-pipeline: synthetic volumes")
    # packing on host CPU (use_device=False): the TPU path would pay a
    # worker compile for a one-off preprocessing batch
    pack_dataset(root, tmp + "/packed", image_size=size, use_device=False)
    _phase("input-pipeline: pack shards")

    model = UNet2D(in_channels=1, out_channels=1, base_channels=64,
                   channel_mults=(1, 2, 4, 8), dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(
        make_schedule(linear_beta_schedule(1000)), loss_type="mse"
    )
    params = _init_on_cpu(
        model, jnp.zeros((1, 16, 16, 1), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
    )
    state = jax.device_put(create_train_state(params, 2e-4), jax.devices()[0])
    step = make_diffusion_train_step(model, diffusion, donate=False)
    key = jax.random.PRNGKey(0)

    rng = np.random.default_rng(0)
    resident = {
        "image": jax.device_put(
            rng.normal(size=(bs, size, size, 1)).astype(np.float32)),
        "z_pos": jax.device_put(rng.uniform(size=(bs,)).astype(np.float32)),
    }
    # compile once (shared by every variant: same shapes)
    state, loss = step(state, resident, key)
    _ = float(loss)
    _phase("input-pipeline: train-step compile")

    def timed_steps(batch_iter, n_steps):
        """Consume n_steps batches through the train step; value readback
        ONCE at the end (per-step readbacks are ~50-100 ms of tunnel
        roundtrip each and would mask the pipeline difference)."""
        nonlocal state
        import itertools

        t0 = time.perf_counter()
        got = 0
        last = None
        # islice, NOT enumerate+break: breaking on index N pulls batch N
        # from the iterator first, so the loader variants would pay one
        # extra decode/stack (+H2D) inside the timed window that the
        # device-resident variant never pays — a systematic bias in the
        # exact A/B this mode exists to make
        for i, batch in enumerate(itertools.islice(batch_iter, n_steps)):
            state, last = step(state, batch,
                               jax.random.fold_in(key, i))
            got += 1
        _ = float(last)
        return got, time.perf_counter() - t0

    def repeat(batch):
        while True:
            yield batch

    def loop(loader):
        while True:
            for b in loader:
                yield b

    def emit(tag, got, dt, extra=None):
        _emit({
            "metric": "input_pipeline_2d",
            "variant": tag,
            "value": round(got * bs / dt, 1),
            "unit": f"images/sec (bs={bs} @ {size}², steps={got})",
            "secs_per_step": round(dt / max(got, 1), 4),
            **(extra or {}),
        })

    N = 24
    got, dt = timed_steps(repeat(resident), N)
    emit("device_resident", got, dt)

    packed = PackedSliceDataset(tmp + "/packed")
    live = SliceDataset2D(root, size)
    for tag, ds in (("packed_loader", packed), ("live_loader", live)):
        loader = BatchLoader(ds, bs, shuffle=True, drop_last=True,
                             seed=0, prefetch=2)
        # host-only production ceiling: device_put=False keeps the rung
        # honest — the placed-loader variant above would enqueue an H2D
        # transfer per "host-only" batch, folding transfer dispatch into
        # the decode/stack ceiling and letting in-flight transfers bleed
        # into the timed_steps window that follows
        host_loader = BatchLoader(ds, bs, shuffle=True, drop_last=True,
                                  seed=0, prefetch=2, device_put=False)
        import itertools

        t0 = time.perf_counter()
        n_host = 0
        for b in itertools.islice(loop(host_loader), N):
            n_host += 1
        host_dt = time.perf_counter() - t0
        _emit({
            "metric": "input_pipeline_2d",
            "variant": f"{tag}_host_only",
            "value": round(n_host * bs / host_dt, 1),
            "unit": f"images/sec produced (bs={bs}, no device work)",
        })
        got, dt = timed_steps(loop(loader), N)
        emit(tag, got, dt)


def bench_eval_2d():
    """Generative-eval throughput on the chip (``--eval-2d``): the
    reference's single most expensive accelerator workload is its eval run
    (`slice_cond_2d_ddpm/metrics.py:232-523` — matched-z fakes via the
    full-T ancestral loop + Inception features, ~10⁶ UNet forwards).
    This drives the REAL `evals.harness.evaluate_conditional_2d` streaming
    loop (FID/KID accumulators, per-bin, diversity, memorization) on the
    chip with the real Inception-v3 trunk (seeded random init — converted
    ImageNet weights only change the constants, not the compute) and
    synthetic real batches, at eval scale small enough for one session:

    - fast mode: DPM-Solver++(2M)-20 fakes (the documented non-protocol
      `cli eval --ddim-steps 20 --sampler dpm` path),
    - protocol mode: full-T ancestral segmented fakes, one batch's worth
      (enough to time it; the per-sample cost is flat in num_samples).
    """
    import numpy as np

    from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule
    from mrijax.evals import InceptionFeatureExtractor, evaluate_conditional_2d
    from mrijax.models import UNet2D

    bs, size, T = 64, 128, 1000
    model = UNet2D(in_channels=1, out_channels=1, base_channels=64,
                   channel_mults=(1, 2, 4, 8), dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(make_schedule(linear_beta_schedule(T)))
    params = _init_on_cpu(
        model, jnp.zeros((1, 16, 16, 1), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
    )
    fe = InceptionFeatureExtractor()  # random init on host; real trunk
    _phase("eval-2d: inception init")

    rng = np.random.default_rng(7)

    def real_batches(n_batches):
        for _ in range(n_batches):
            yield {
                "image": np.clip(rng.normal(
                    size=(bs, size, size, 1)), -1, 1).astype(np.float32),
                "z_pos": rng.uniform(size=(bs,)).astype(np.float32),
            }

    def make_sample_fn(steps):
        def sample_fn(batch, k):
            z = jnp.asarray(batch["z_pos"])

            def model_fn(x, t):
                return model.apply(params, x, t, z)

            shape = (z.shape[0], size, size, 1)
            if steps is None:
                return diffusion.p_sample_loop_auto(model_fn, shape, k)
            return diffusion.fast_sample(
                model_fn, shape, k, num_steps=steps, sampler="dpm"
            )

        return sample_fn

    for tag, steps, n_samples, div_pairs in (
        ("dpm-20 (fast mode)", 20, 256, 32),
        (f"ancestral-T{T} (reference protocol)", None, 64, 0),
    ):
        t0 = time.perf_counter()
        report = evaluate_conditional_2d(
            make_sample_fn(steps),
            real_batches(-(-n_samples // bs)),
            feature_extractor=fe,
            num_samples=n_samples,
            num_diversity_pairs=div_pairs,
            seed=0,
            metadata={"sampler": tag},
        )
        dt = time.perf_counter() - t0
        _emit({
            "metric": "eval_2d_throughput",
            "sampler": tag,
            "value": round(n_samples / dt, 3),
            "unit": f"eval samples/sec (batch {bs} @ {size}², sampling + "
                    "2x inception features + streaming FID/KID)",
            "num_samples": n_samples,
            "eval_seconds": round(dt, 1),
            "fid_rand": round(float(report["fid_rand"]), 3),
            "kid_rand_mean": round(float(report["kid_rand_mean"]), 6),
        })


def bench_sweep():
    """Same-session A/B sweep of the sampling pipeline (``--sweep``):
    batch × decode-chunk × DDIM steps measured in ONE process so the
    numbers are comparable despite the ~2.5× tunnel-session variance
    (PERF.md "Cold-setup anatomy"). Prints one JSON line per config."""
    import numpy as np

    from mrijax.diffusion import GaussianDiffusion, cosine_beta_schedule, make_schedule
    from mrijax.models import UNet3D, VAE3D

    unet_kw = dict(
        in_channels=16, base_channels=128, channel_mults=(1, 2, 4),
        use_attention=True, num_heads=4, dtype=jnp.bfloat16,
    )
    unet = UNet3D(use_flash_attention=jax.default_backend() == "tpu", **unet_kw)
    unet_init = UNet3D(use_flash_attention=False, **unet_kw)
    vae = VAE3D(in_channels=4, base_channels=32, num_down=3,
                latent_channels=16, dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(make_schedule(cosine_beta_schedule(T_STEPS)))
    unet_params = _init_on_cpu(
        unet_init, jnp.zeros((1, 8, 8, 8, 16), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
    )
    vae_params = _init_on_cpu(
        vae, jnp.zeros((1, 16, 16, 16, 4), jnp.bfloat16), jax.random.PRNGKey(1)
    )

    def make(batch, chunk, steps, sampler="ddim"):
        def sample_volume(up, vp, rng):
            def model_fn(x, t):
                return unet.apply(up, x, t)

            z = diffusion.fast_sample(
                model_fn, (batch, *LATENT_SHAPE[1:]), rng,
                num_steps=steps, sampler=sampler,
            )
            zc = z.reshape(batch // chunk, chunk, *z.shape[1:])
            vols = jax.lax.map(
                lambda zz: vae.apply(vp, zz, method="decode_from_latent"), zc
            )
            return vols.reshape(batch, *vols.shape[2:])

        return jax.jit(sample_volume)

    configs = [
        (8, 4, T_STEPS, "ddim"),   # shipped protocol config
        (16, 4, T_STEPS, "ddim"),  # bigger denoise batch
        (16, 2, T_STEPS, "ddim"),  # smaller decode chunk at batch 16
        (8, 4, 50, "ddim"),        # DDIM-50 production fast path
        (8, 4, 20, "dpm"),         # DPM-Solver++(2M)-20: 2nd-order solver,
                                   # ~DDIM-50 ODE accuracy at 2.5x fewer steps
        (8, 4, 50, "dpm"),         # DPM at the same budget as DDIM-50
    ]
    rng = jax.random.PRNGKey(42)
    for batch, chunk, steps, sampler in configs:
        fn = make(batch, chunk, steps, sampler)
        vol = fn(unet_params, vae_params, rng)
        _ = float(jnp.asarray(vol, jnp.float32).mean())
        _phase(f"sweep b{batch} c{chunk} s{steps} {sampler}: compile+warmup")
        n = 2
        t0 = time.perf_counter()
        for i in range(n):
            vol = fn(unet_params, vae_params, jax.random.fold_in(rng, i))
            _ = float(jnp.asarray(vol, jnp.float32).mean())
        dt = (time.perf_counter() - t0) / n
        _emit({
            "metric": "3d_ldm_sampling_sweep",
            "batch": batch, "decode_chunk": chunk, "ddim_steps": steps,
            "sampler": sampler,
            "value": round(batch / dt, 4),
            "unit": "volumes/sec/chip",
            "secs_per_volume": round(dt / batch, 3),
        })


def main():
    import sys

    # session speed reference FIRST: every JSON row (all modes) carries
    # session_tflops so captures are normalizable across the ~2.5× tunnel
    # session variance (PERF.md). Runs before t_setup, so the headline's
    # setup_secs keeps its historical meaning; the probe's own cost is
    # reported separately as calibration_secs.
    _calibrate_session()

    if "--sweep" in sys.argv:
        bench_sweep()
        return
    if "--train" in sys.argv:
        bench_train_step()
        return
    if "--train-cached-sweep" in sys.argv:
        bench_train_cached_sweep()
        return
    if "--train-vae-sweep" in sys.argv:
        bench_train_vae_sweep()
        return
    if "--train-vae" in sys.argv:
        bench_train_vae()
        return
    if "--train-cached" in sys.argv:
        bench_train_step_cached()
        return
    if "--sample-2d-sweep" in sys.argv:
        bench_sample_2d_ladder()
        return
    if "--input-pipeline" in sys.argv:
        bench_input_pipeline()
        return
    if "--eval-2d" in sys.argv:
        bench_eval_2d()
        return
    if "--sample-2d" in sys.argv:
        def _flag_value(flag):
            i = sys.argv.index(flag)
            if i + 1 >= len(sys.argv):
                raise SystemExit(f"{flag} needs a value")
            return sys.argv[i + 1]

        steps = int(_flag_value("--steps")) if "--steps" in sys.argv else None
        sampler = (_flag_value("--sampler") if "--sampler" in sys.argv
                   else "ddim")
        if steps is None and "--sampler" in sys.argv:
            raise SystemExit(
                "--sampler only applies to the strided fast path; add "
                "--steps N (the default mode is the T=1000 ancestral "
                "reference protocol)"
            )
        bench_sample_2d(steps=steps, sampler=sampler)
        return
    if "--train-2d-profile" in sys.argv:
        bench_train_2d_profile()
        return
    if "--train-2d" in sys.argv:
        bench_train_2d(context=False)
        return
    if "--train-25d" in sys.argv:
        bench_train_2d(context=True)
        return
    t_setup = time.perf_counter()
    sample, pipeline_flops = build_pipeline()
    rng = jax.random.PRNGKey(42)

    # compile + warmup; readback forces full synchronization (the axon
    # tunnel's block_until_ready does not reliably block)
    vol = sample(rng)
    _ = float(jnp.asarray(vol, jnp.float32).mean())
    _phase("warmup run")
    setup_s = time.perf_counter() - t_setup

    n_runs = 2
    t0 = time.perf_counter()
    for i in range(n_runs):
        vol = sample(jax.random.fold_in(rng, i))
        _ = float(jnp.asarray(vol, jnp.float32).mean())
    dt = (time.perf_counter() - t0) / n_runs

    vols_per_s = BATCH / dt
    # self-attributing setup (r3 verdict Weak #1): the warmup-run phase is
    # the worker-side XLA compile + first execution (46 s typical, 133-286 s
    # on a busy/rotated worker pool — not client-fixable); everything before
    # it is client-side work this repo owns. Splitting the two in the JSON
    # lets the driver's one recorded number distinguish a builder regression
    # from a busy worker pool.
    worker_s = _PHASES.get("warmup run", 0.0)
    _emit(
        {
            "metric": "3d_ldm_volume_sampling_throughput",
            "value": round(vols_per_s, 5),
            "unit": f"volumes/sec/chip (T=400 DDIM + VAE decode, batch {BATCH}, 128x160x160x4 out)",
            "vs_baseline": round(vols_per_s / BASELINE_VOL_PER_S, 3),
            "secs_per_volume": round(dt / BATCH, 3),
            "setup_secs": round(setup_s, 1),
            "setup_client_secs": round(setup_s - worker_s, 1),
            "setup_worker_secs": round(worker_s, 1),
            "pipeline_tflops": (
                round(pipeline_flops / 1e12, 1) if pipeline_flops else None
            ),
            "mfu": _mfu(pipeline_flops, dt),
        }
    )


if __name__ == "__main__":
    # the axon tunnel occasionally fails to initialize when another process
    # held it moments ago; retry before giving up
    for attempt in range(3):
        try:
            main()
            break
        except RuntimeError as e:
            if "axon" in str(e) and attempt < 2:
                print(f"# backend init failed ({e}); retrying in 30s",
                      file=__import__("sys").stderr)
                time.sleep(30)
                continue
            raise
