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
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_VOL_PER_S = 0.045  # estimated reference GPU pipeline (see docstring)
T_STEPS = 400
BATCH = 8  # volumes denoised together: throughput metric; the reference
           # samples one volume at a time (bs=1/GPU) — batching is the
           # TPU-native way to fill the MXU at these small spatial shapes
DECODE_CHUNK = 4  # volumes decoded at once (full-res decode sets the HBM peak)
LATENT_SHAPE = (BATCH, 32, 40, 40, 16)
VOLUME_SHAPE = (128, 160, 160)


def _init_on_cpu(model, *example_args):
    """flax init executes the forward — run it on host CPU at a tiny spatial
    size (params are spatial-size-agnostic) instead of eagerly through the
    device tunnel. Pallas kernels are disabled inside the CPU region."""
    from mrijax.kernels.dispatch import disable_pallas

    with jax.default_device(jax.devices("cpu")[0]), disable_pallas():
        params = model.init(jax.random.PRNGKey(0), *example_args)
    return jax.device_put(params, jax.devices()[0])


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

    unet_params = _init_on_cpu(
        unet_init, jnp.zeros((1, 8, 8, 8, 16), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
    )
    vae_params = _init_on_cpu(
        vae, jnp.zeros((1, 16, 16, 16, 4), jnp.bfloat16), jax.random.PRNGKey(1)
    )

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

    jitted = jax.jit(sample_volume)
    return lambda rng: jitted(unet_params, vae_params, rng)


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
    state, loss = step(state, vae_params, batch, key, 1.0)
    _ = float(loss)  # sync
    n = 4
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step(state, vae_params, batch, jax.random.fold_in(key, i), 1.0)
        _ = float(loss)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "3d_ldm_train_step_time",
        "value": round(dt, 4),
        "unit": "sec/step (bs=1 volume 128x160x160x4, frozen-VAE encode + min-SNR + Adam)",
        "vs_baseline": None,
        "steps_per_s": round(1.0 / dt, 3),
    }))


def main():
    import sys

    if "--train" in sys.argv:
        bench_train_step()
        return
    t_setup = time.perf_counter()
    sample = build_pipeline()
    rng = jax.random.PRNGKey(42)

    # compile + warmup; readback forces full synchronization (the axon
    # tunnel's block_until_ready does not reliably block)
    vol = sample(rng)
    _ = float(jnp.asarray(vol, jnp.float32).mean())
    setup_s = time.perf_counter() - t_setup

    n_runs = 2
    t0 = time.perf_counter()
    for i in range(n_runs):
        vol = sample(jax.random.fold_in(rng, i))
        _ = float(jnp.asarray(vol, jnp.float32).mean())
    dt = (time.perf_counter() - t0) / n_runs

    vols_per_s = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "3d_ldm_volume_sampling_throughput",
                "value": round(vols_per_s, 5),
                "unit": f"volumes/sec/chip (T=400 DDIM + VAE decode, batch {BATCH}, 128x160x160x4 out)",
                "vs_baseline": round(vols_per_s / BASELINE_VOL_PER_S, 3),
                "secs_per_volume": round(dt / BATCH, 3),
                "setup_secs": round(setup_s, 1),
            }
        )
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
