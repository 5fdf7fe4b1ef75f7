"""Ahead-of-time exported sampling programs — the production serving path.

Everything hot in mrijax is one compiled program, but the cost of GETTING
there per process is (a) tracing + lowering the T-step sampling scan —
minutes of single-core Python/MLIR at flagship scale (PERF.md "Cold-setup
anatomy") — and (b) the XLA compile. (b) rides the persistent compile
cache (``mrijax.compile_cache``); this module removes (a) for serving
fleets: ``jax.export`` serializes the lowered StableHLO once, and every
serving process deserializes it in milliseconds instead of re-tracing.

The reference (eager PyTorch, `ddpm_3d_ldm/show_model.py:249-259` is its
generation protocol) has no tracing step and therefore no analog — this is
a TPU-native deployment affordance, not a port.

Design rules:

* **Params stay arguments.** The blob holds the program only (~250 KB for
  the flagship pipeline); weights travel separately via checkpoints or
  ``cli export`` npz. Baking weights in would bloat the artifact to
  hundreds of MB and pin it to one checkpoint.
* **Platform-bound.** An export is lowered for the platform(s) it was
  built on; ``load_exported`` fails fast with a clear message when the
  serving backend differs (the default jax error fires at call time, far
  from the cause).
* **One program, one execution.** An exported sampler is a single device
  execution by construction — the segmented full-T workaround for
  remote-tunnel execution caps (PERF.md "2D sampling") cannot apply
  inside a blob. For serving THROUGH a tunnel, export the strided fast
  path (``ddim_steps``/``sampler="dpm"``, the intended serving mode);
  full-T ancestral exports are for local/direct-attached accelerators.

CLI: ``mrijax export-aot --run-dir RUN --out prog.jaxexport`` builds the
run's volume sampler; a serving process then does::

    from mrijax.aot import load_exported
    sample = load_exported("prog.jaxexport")   # milliseconds, no trace
    volumes = sample(unet_params, vae_params, key)
"""

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "export_callable",
    "save_exported",
    "deserialize_exported",
    "load_exported",
    "build_volume_sampler",
    "build_slice_sampler",
]


def export_callable(
    fn, example_args, *, platforms: Optional[Sequence[str]] = None
) -> "jax.export.Exported":
    """Trace + lower ``jax.jit(fn)`` at ``example_args``'s shapes/dtypes
    and return the Exported object. Lowers for the CURRENT backend by
    default; pass ``platforms=["tpu"]`` to build a TPU artifact from a CPU
    box. ``fn`` must be jit-traceable with params as explicit arguments
    (see module rules)."""
    specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        tuple(example_args),
    )
    kw = {"platforms": list(platforms)} if platforms else {}
    return jax.export.export(jax.jit(fn), **kw)(*specs)


def save_exported(path, fn, example_args, *, platforms=None) -> Path:
    """Export ``fn`` and write the serialized blob to ``path``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(
        export_callable(fn, example_args, platforms=platforms).serialize()
    )
    return path


def deserialize_exported(path) -> "jax.export.Exported":
    """Deserialize an exported program (platform-checked).

    Raises ``ValueError`` immediately when the blob was lowered for a
    different platform than the current backend — jax's own check only
    fires at call time, three frames from the cause. Returns the full
    ``Exported`` object so callers can introspect ``in_avals``/
    ``out_avals`` (e.g. ``cli serve`` derives the baked batch size and the
    conditioning vector's shape from them)."""
    exp = jax.export.deserialize(Path(path).read_bytes())
    backend = jax.default_backend()
    if backend not in exp.platforms:
        raise ValueError(
            f"{path}: exported for platform(s) {tuple(exp.platforms)} but "
            f"the current backend is {backend!r} — re-export on this "
            "platform (mrijax export-aot)"
        )
    return exp


def load_exported(path):
    """Deserialize an exported program and return its callable."""
    return deserialize_exported(path).call


# -------------------------------------------------- run-dir sampler builders


def build_volume_sampler(
    cfg,
    latent_scale: float,
    *,
    num_volumes: int = 8,
    ddim_steps: Optional[int] = None,
    sampler: str = "ddim",
    use_flash: Optional[bool] = None,
):
    """3D-LDM family: ``(fn, param_templates)`` where
    ``fn(unet_params, vae_params, key) -> (N, D, H, W, C)`` volumes —
    the full latent DDIM/ancestral scan + unscale + VAE decode as ONE
    exportable program (the pipeline of ``generate.generate_3d_volumes``).

    ``param_templates`` are CPU-initialized trees with the right
    structure/shapes/dtypes for ``export_callable``'s specs; real weights
    are supplied at call time.
    """
    from mrijax.kernels.dispatch import host_init
    from mrijax.train.experiments import (
        build_diffusion, build_unet3d, build_vae3d,
    )

    vae = build_vae3d(cfg.vae)
    unet = build_unet3d(cfg.unet, use_flash=use_flash)
    unet_init = build_unet3d(cfg.unet, use_flash=False)
    diffusion = build_diffusion(cfg.diffusion)

    f = vae.spatial_downsample
    latent_spatial = tuple(p // f for p in cfg.data.patch_size)
    latent_channels = cfg.vae.latent_channels
    shape = (num_volumes, *latent_spatial, latent_channels)

    with host_init():
        unet_t = unet_init.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, 8, latent_channels)),
            jnp.zeros((1,), jnp.int32),
        )
        vae_t = vae.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 16, 16, cfg.vae.in_channels)),
            jax.random.PRNGKey(1),
        )

    def fn(unet_params, vae_params, key):
        def model_fn(x, t):
            return unet.apply(unet_params, x, t)

        if ddim_steps is not None:
            z = diffusion.fast_sample(
                model_fn, shape, key, num_steps=ddim_steps, sampler=sampler
            )
        else:
            z = diffusion.p_sample_loop(model_fn, shape, key)
        return vae.apply(
            vae_params, z / latent_scale, method="decode_from_latent"
        )

    return fn, (unet_t, vae_t, jax.random.PRNGKey(0))


def build_slice_sampler(
    cfg,
    *,
    num_samples: int = 16,
    ddim_steps: Optional[int] = None,
    sampler: str = "ddim",
):
    """2D/2.5D family: ``(fn, param_templates)`` where
    ``fn(params, key, z_pos) -> (N, H, W, C)`` slices conditioned on the
    per-sample ``z_pos`` vector (shape ``(N,)``, the slice-position
    conditioning of ``slice_cond_2d_ddpm/unet.py``). Unconditional-context
    2.5D serving should sample via ``generate`` instead (it needs real
    context slices, which are data, not params)."""
    from mrijax.train.experiments import build_diffusion, build_unet2d

    if cfg.unet.in_channels != cfg.unet.out_channels:
        raise ValueError(
            "build_slice_sampler covers the unconditional-context 2D "
            f"sampler; this config expects {cfg.unet.in_channels - cfg.unet.out_channels} "
            "context channels (2.5D) — serve it via generate.* instead"
        )
    model = build_unet2d(cfg.unet)
    diffusion = build_diffusion(cfg.diffusion)
    s = cfg.data.image_size
    ch = cfg.unet.out_channels
    shape = (num_samples, s, s, ch)

    from mrijax.kernels.dispatch import host_init

    with host_init():
        params_t = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, ch)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
        )

    def fn(params, key, z_pos):
        def model_fn(x, t):
            return model.apply(params, x, t, z_pos)

        if ddim_steps is not None:
            return diffusion.fast_sample(
                model_fn, shape, key, num_steps=ddim_steps, sampler=sampler
            )
        return diffusion.p_sample_loop(model_fn, shape, key)

    return fn, (
        params_t, jax.random.PRNGKey(0), jnp.zeros((num_samples,), jnp.float32)
    )
