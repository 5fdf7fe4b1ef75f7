"""Multi-host initialization and host-scalar utilities.

Replaces the reference's torchrun/NCCL rendezvous (`ddpm_3d_ldm/
train.py:76-105`, `training_job_DDP.sh:71-91`): on TPU pods,
``jax.distributed.initialize()`` discovers the coordinator from the TPU
runtime environment (no env-var plumbing); on other clusters the standard
JAX coordinator variables apply. After init, ``jax.devices()`` spans all
hosts and the same SPMD code runs unchanged.

The reference's explicit host-scalar collectives (val-loss broadcast,
stop-flag broadcast, `train.py:127-132,509-512`) mostly vanish under SPMD —
these helpers cover the residual cases (e.g. aborting on a host-local
signal that other hosts must agree on).
"""

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               required: bool = False) -> None:
    """Idempotent ``jax.distributed.initialize`` (no-op when single-process
    and no coordinator is configured).

    ``required=True`` makes ANY init failure loud even when all rendezvous
    args are None — the caller detected a multi-process job from the
    environment (``MRIJAX_MULTIHOST=1``, ``SLURM_NTASKS>1``), so silently
    degrading would leave every rank believing it is process 0 and
    clobbering the shared run dir. The reference fails loudly the same way
    whenever RANK/WORLD_SIZE are set (`ddpm_3d_ldm/train.py:76-105`).

    The idempotence probe MUST NOT touch the XLA backend: calling
    ``jax.process_count()`` here would initialize the backend and make the
    subsequent ``jax.distributed.initialize`` raise ("must be called before
    any JAX calls") — a real-process bug the mocked round-3 tests never
    saw; caught (and now pinned) by ``tests/test_multiprocess_dcn.py``.
    """
    if jax.distributed.is_initialized():
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # Swallow ONLY the pure auto-discovery miss (no rendezvous arg was
        # given, the caller did not detect a cluster, and no cluster env
        # exists — a plain single-host run) or an explicit num_processes=1.
        # If the caller named a coordinator, a rank, >1 processes, or
        # detected a multi-process environment (required=True), a failed
        # rendezvous must be loud: silently degrading to single-process
        # means every host trains the full dataset independently and
        # clobbers the shared run dir.
        explicit = (required or coordinator_address is not None
                    or process_id is not None
                    or num_processes not in (None, 1))
        if explicit:
            raise
        print(f"[multihost] single-process mode ({e})")


def broadcast_from_host0(value: float) -> float:
    """Agree on a host-0 scalar across processes (the reference's
    ``dist.broadcast`` of val-loss / latent-scale)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return float(value)
    # Full float64 precision on the wire: the single-process path compares
    # at Python float precision, and a float32 round-trip here would make
    # the two topologies take different best-checkpoint branches on
    # sub-epsilon improvements (checkpoint.py best.json comparison). jax
    # silently downcasts float64 leaves when x64 is off, so ship the raw
    # bits as a uint32 pair instead.
    bits = multihost_utils.broadcast_one_to_all(
        np.asarray(value, np.float64).reshape(1).view(np.uint32))
    return float(np.asarray(bits, np.uint32).view(np.float64)[0])


def all_processes_agree(flag: bool) -> bool:
    """True only if EVERY process raised the flag (early-stop / preemption
    consensus — the reference's stop-flag broadcast, but symmetric)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return bool(flag)
    votes = multihost_utils.process_allgather(np.asarray([bool(flag)]))
    return bool(np.all(votes))


def any_process_flagged(flag: bool) -> bool:
    """True if ANY process raised the flag (e.g. SIGUSR1 delivered to one
    host must stop all hosts)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return bool(flag)
    votes = multihost_utils.process_allgather(np.asarray([bool(flag)]))
    return bool(np.any(votes))
