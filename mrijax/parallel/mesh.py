"""Device mesh construction and sharding helpers.

This module is the TPU-native replacement for the reference's entire
distributed layer (`ddpm_3d_ldm/train.py:76-144`): instead of torchrun
process groups, NCCL all-reduce inside DDP backward, explicit
``dist.broadcast`` of scalars, and barriers, we build a
``jax.sharding.Mesh`` over all devices and express parallelism as sharding
annotations — XLA inserts the collectives (psum over ICI for gradients) and
SPMD keeps "ranks" structurally in lockstep, so the reference's
``ddp_reduce_mean`` / ``ddp_broadcast_bool`` / ``dist.barrier`` calls have
no equivalent code at all.

Axes:
* ``data``  — batch (data parallelism; the reference's only strategy).
* ``model`` — optional tensor/sequence axis for sharding the latent-bottleneck
  attention and large convs at scale (the reference has no analog).

Multi-host: call ``jax.distributed.initialize()`` (DCN rendezvous) before
``make_mesh``; ``jax.devices()`` then spans all hosts and the same code runs
unchanged.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    With ``shape=None`` all devices go to the first axis and the remaining
    axes get size 1 — i.e. pure data parallelism, the SPMD subsumption of
    both the reference's single-process DataParallel and multi-process DDP.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_put(x, sharding):
    """``device_put`` onto a (possibly multi-host) sharding.

    Single-process this IS ``jax.device_put``. Multi-controller JAX forbids
    device_put from a host-local array onto a sharding spanning other hosts
    ("input and target sharding should have the same set of devices" — a
    real-process failure the mocked round-3 tests never executed; pinned by
    tests/test_multiprocess_dcn.py). Contract: every process holds the
    IDENTICAL full host value (true for deterministic PRNG init, schedule
    constants, restored checkpoints); each process then contributes exactly
    its addressable shards, no cross-host transfer needed. This replaces the
    reference's rank-0 ``dist.broadcast`` of initial params inside DDP
    (torch DistributedDataParallel's _sync_params, train.py:231-233) —
    determinism makes the broadcast unnecessary.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)

    def put(leaf, s):
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])

    if isinstance(sharding, jax.sharding.Sharding):
        return jax.tree.map(lambda leaf: put(leaf, sharding), x)
    # pytree of shardings matching x (the FSDP layout case)
    return jax.tree.map(put, x, sharding)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a (possibly host-local numpy) batch pytree onto the mesh with the
    batch dim sharded over ``axis``.

    Single-host: a plain device_put with a sharded layout. Multi-host: each
    process passes its local shard and we assemble the global array — the
    analog of ``DistributedSampler`` feeding per-rank loaders
    (train.py:169-177).
    """
    n_axis = mesh.shape[axis]

    def put(x):
        if np.ndim(x) == 0:
            return global_put(x, replicated_sharding(mesh))
        # Multi-process: x is this process's LOCAL shard; the divisibility
        # contract is on the GLOBAL batch (local rows × process count).
        # Checking the local dim against the global axis size rejected every
        # valid multi-process batch — a real-process bug the mocked tests
        # never executed; pinned by tests/test_multiprocess_dcn.py.
        pc = jax.process_count()
        global_rows = np.shape(x)[0] * pc
        if global_rows % n_axis != 0:
            raise ValueError(
                f"global batch dim {global_rows} "
                f"({np.shape(x)[0]} local rows x {pc} processes) is not "
                f"divisible by mesh axis '{axis}' of size {n_axis}; pick a "
                f"batch size that is a multiple of {n_axis}, or build a "
                f"smaller mesh (make_mesh(devices=jax.devices()[:k]))"
            )
        sharding = data_sharding(mesh, np.ndim(x), axis)
        if pc > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
