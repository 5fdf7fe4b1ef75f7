"""Fully-sharded (ZeRO-style) parameter + optimizer-state layout.

↗ Capability the reference lacks entirely: its largest model must fit —
params, Adam moments, and gradients — in ONE GPU's memory, because DDP
replicates everything (`ddpm_3d_ldm/train.py:139-144` wraps the UNet in
``DistributedDataParallel`` with full replicas per rank). On TPU the
idiomatic alternative is a *layout*, not an algorithm: assign every large
leaf of the train state a ``NamedSharding`` that splits its largest
divisible dimension across the mesh's data axis, place the state once, and
run the SAME jitted train step — XLA's SPMD partitioner inserts the
all-gathers before each use and the reduce-scatters after the backward.
Per-chip state memory drops by ~the mesh size; the math is unchanged
(equivalence is pinned by ``tests/test_fsdp.py``).

No gather/scatter code exists here on purpose — "pick a mesh, annotate
shardings, let XLA insert collectives" is the whole design. The train-step
factories in ``mrijax.train.steps`` need no changes: sharding propagates
from the input layout, and ``fsdp_step`` (below) re-pins the *output*
layout so the state cannot silently decay to replicated between steps.
"""

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_spec", "fsdp_shardings", "shard_train_state", "fsdp_step"]


def fsdp_spec(
    shape, n: int, axis: str = "data", min_leaf_elems: int = 2 ** 15
) -> P:
    """PartitionSpec splitting ``shape``'s largest ``n``-divisible dim.

    Small leaves (norm scales, biases, time-embedding tables — anything
    under ``min_leaf_elems`` elements) stay replicated: sharding them saves
    nothing and costs a collective each. Returns a fully-replicated spec
    when no dimension is divisible by ``n``.
    """
    if n <= 1 or int(np.prod(shape or (1,))) < min_leaf_elems:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % n == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_shardings(
    mesh: Mesh,
    tree: Any,
    axis: str = "data",
    min_leaf_elems: int = 2 ** 15,
):
    """Per-leaf ``NamedSharding`` tree for ``tree`` (arrays OR
    ShapeDtypeStructs). Adam moments share their parameter's shape, so
    applying this to a whole ``TrainState`` gives params, ``ema_params``,
    and ``opt_state`` moments one consistent layout; scalars (step, the
    injected learning rate) come out replicated.
    """
    n = mesh.shape[axis]

    def leaf_sharding(x):
        return NamedSharding(
            mesh, fsdp_spec(np.shape(x), n, axis, min_leaf_elems)
        )

    return jax.tree.map(leaf_sharding, tree)


def shard_train_state(
    mesh: Mesh,
    state,
    axis: str = "data",
    min_leaf_elems: int = 2 ** 15,
):
    """Place a train state on ``mesh`` with the fully-sharded layout.

    Returns ``(state, shardings)``; pass ``shardings`` to ``fsdp_step`` to
    keep the layout stable across steps, and reuse it as the orbax restore
    template layout when resuming.
    """
    shardings = fsdp_shardings(mesh, state, axis, min_leaf_elems)
    from mrijax.parallel.mesh import global_put

    return global_put(state, shardings), shardings


def fsdp_step(step_fn, state_shardings, donate: bool = True):
    """Wrap a train step so the updated state KEEPS the sharded layout.

    Input-driven propagation alone usually preserves it, but nothing forces
    the compiler to — and a silent decay to replicated would only show up
    as an OOM at scale. ``out_shardings`` makes the layout a contract.
    ``step_fn`` is ``(state, *rest) -> (state, aux)``; the wrapper inlines
    a jitted ``step_fn`` (jit-of-jit composes; donation happens here).
    """

    wrapped = jax.jit(
        lambda state, *rest: step_fn(state, *rest),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,) if donate else (),
    )
    return wrapped
