"""Mesh-sharded batched sampling — data-parallel inference.

The reference has no distributed inference: its samplers and its FID
protocol stream through exactly one GPU (`slice_cond_2d_ddpm/
show_model.py`, `metrics.py:347-389` — the eval's dominant cost is ~10^6
sequential UNet forwards). Sampling is embarrassingly parallel over the
batch, so the TPU-native form is a ``shard_map`` of the whole sampler over
the mesh's data axis: every device denoises its local shard with a
per-shard folded key, there are **zero collectives**, and throughput
scales linearly with chips over ICI.

Determinism contract (pinned by tests/test_sharded_sampling.py): the
global result equals concatenating the ``n_dev`` independent single-device
runs ``sample_fn(params, fold_in(key, i), ...)`` — so a sample archive is
reproducible from (key, mesh size) regardless of the physical device
count used to produce it.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.8 top-level; older jax only has the experimental path
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_sample(
    mesh: Mesh,
    sample_fn: Callable[..., Any],
    params,
    key,
    num_samples: int,
    *,
    cond: Optional[Any] = None,
    axis: str = "data",
):
    """Run a batched sampler data-parallel over ``mesh[axis]``.

    sample_fn:
      * without ``cond``: ``sample_fn(params, key, local_batch: int)`` —
        must be batch-size polymorphic (the local size is a static int).
      * with ``cond`` (a pytree of arrays whose leading dim is
        ``num_samples`` — e.g. the matched z positions of the 2D eval
        protocol, or the context stacks of the 2.5D sampler):
        ``sample_fn(params, key, cond_local)`` where ``cond_local`` is the
        device's shard of ``cond``.

    Returns the global batch (a pytree of arrays with leading dim
    ``num_samples``), sharded over ``axis``.
    """
    n_dev = mesh.shape[axis]
    if num_samples % n_dev:
        raise ValueError(
            f"num_samples {num_samples} is not divisible by mesh axis "
            f"'{axis}' of size {n_dev}; round up to a multiple of {n_dev} "
            f"(or build a smaller mesh: make_mesh(devices=jax.devices()[:k]))"
        )
    local = num_samples // n_dev
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_dev))

    # params may arrive committed to a single device (e.g. a checkpoint
    # restore) — lay them out replicated over the mesh explicitly, and the
    # per-device keys / cond shards along the data axis
    params = jax.device_put(params, NamedSharding(mesh, P()))
    keys = jax.device_put(keys, NamedSharding(mesh, P(axis)))
    if cond is not None:
        cond = jax.device_put(cond, NamedSharding(mesh, P(axis)))

    if cond is None:

        def body(params, keys):
            return sample_fn(params, keys[0], local)

        in_specs = (P(), P(axis))
        args = (params, keys)
    else:

        def body(params, keys, cond_local):
            return sample_fn(params, keys[0], cond_local)

        in_specs = (P(), P(axis), P(axis))
        args = (params, keys, cond)

    fn = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=P(axis))
    with mesh:
        return fn(*args)
