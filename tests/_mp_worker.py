"""Shared workload for the REAL multi-process (DCN-analog) test.

Run as a script, this is one process of a 2-process `jax.distributed`
job (4 virtual CPU devices each → 8 global devices, Gloo collectives
between processes — the CPU stand-in for DCN). Imported as a module by
`test_multiprocess_dcn.py`, the same functions produce the single-process
8-device baseline, so the equality assertion compares literally the same
code under the two process topologies.

The workload is the flagship cached-latent stage-2 path
(`make_cached_latent_train_step` — the TPU-native replacement for the
reference's DDP stage-2 loop, `ddpm_3d_ldm/train.py:368-433`) fed by a
`BatchLoader` whose per-process row sharding stands in for
`DistributedSampler(num_replicas, rank)` (`train.py:169-177`).

Usage (script): python tests/_mp_worker.py <proc_id> <num_procs> <port> <out_dir>
"""

import numpy as np

N_ITEMS = 16
BATCH = 8
STEPS = 3
LATENT_SHAPE = (8, 8, 8, 4)
LATENT_SCALE = 1.37
SEED = 3


class LatentDataset:
    """Deterministic in-memory stand-in for PackedLatentDataset: every
    process constructs the identical global dataset, the loader decides
    which rows this process materializes."""

    def __init__(self):
        rng = np.random.default_rng(42)
        self.latents = rng.normal(
            size=(N_ITEMS, *LATENT_SHAPE)).astype(np.float32)
        self.materialized = []  # row indices this process actually touched

    def __len__(self):
        return N_ITEMS

    def __getitem__(self, i):
        self.materialized.append(int(i))
        return {"latent": self.latents[i]}


def build_model_and_state():
    import jax
    import jax.numpy as jnp
    import optax

    from mrijax.models import UNet3D
    from mrijax.train.state import TrainState

    unet = UNet3D(
        in_channels=LATENT_SHAPE[-1], base_channels=8, channel_mults=(1, 2),
        time_emb_dim=16, use_attention=False, dtype=jnp.float32,
    )
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *LATENT_SHAPE)), jnp.zeros((1,), jnp.int32),
    )
    # SGD, not the production Adam, ON PURPOSE: the equality assertion is
    # the point of this workload, and Adam's m/sqrt(v) normalization turns
    # any near-zero-gradient element into a ±lr coin flip under different
    # all-reduce association orders (Gloo cross-process vs XLA fused) —
    # measured 0.45% of params off by ~lr with Adam, which is the same
    # magnitude a REAL missing-all-reduce bug would produce, so Adam can't
    # discriminate. SGD is linear in the gradient: reassociation noise
    # stays at float epsilon while a sharding bug shows up at full scale.
    # Everything under test (loader, shard_batch, train step, collectives)
    # is identical to the production path.
    state = TrainState.create(
        apply_fn=None, params=params, tx=optax.sgd(1e-3), ema_params=None)
    return unet, state


def run_workload(mesh):
    """STEPS optimizer steps of the cached-latent path over ``mesh``.
    Returns (losses, final params pytree as host numpy, dataset)."""
    import jax

    from mrijax.data import BatchLoader
    from mrijax.diffusion import (
        GaussianDiffusion,
        cosine_beta_schedule,
        make_schedule,
    )
    from mrijax.parallel import global_put, replicated_sharding
    from mrijax.train import make_cached_latent_train_step

    ds = LatentDataset()
    loader = BatchLoader(ds, batch_size=BATCH, mesh=mesh, seed=SEED,
                         prefetch=0)
    unet, state = build_model_and_state()
    state = global_put(state, replicated_sharding(mesh))
    diffusion = GaussianDiffusion(make_schedule(cosine_beta_schedule(20)))
    step = make_cached_latent_train_step(unet, diffusion, donate=False)

    key = jax.random.PRNGKey(7)
    losses = []
    it = iter(loader)
    for i in range(STEPS):
        try:
            batch = next(it)
        except StopIteration:
            loader.set_epoch(loader.epoch + 1)
            it = iter(loader)
            batch = next(it)
        state, loss = step(state, batch, jax.random.fold_in(key, i),
                           LATENT_SCALE)
        losses.append(float(loss))
    params_host = jax.tree.map(np.asarray, state.params)
    return losses, params_host, ds


def flatten_params(params):
    import jax

    leaves = jax.tree.leaves(params)
    return np.concatenate([np.ravel(np.asarray(l)) for l in leaves])


def main(proc_id: int, num_procs: int, port: int, out_dir: str):
    import os

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    # the wrapper under test, with a REAL coordinator rendezvous
    from mrijax.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * num_procs

    from mrijax.parallel import make_mesh

    mesh = make_mesh(("data",))
    losses, params_host, ds = run_workload(mesh)

    # per-process data sharding for real: this process must have touched
    # ONLY its half of every global batch (rows [p*B/P, (p+1)*B/P))
    per = BATCH // num_procs
    from mrijax.data.loader import epoch_permutation

    expected = []
    perm = epoch_permutation(N_ITEMS, 0, SEED)
    for b in range(STEPS):  # 2 batches per epoch; epoch rolls over at b=2
        if b * BATCH >= N_ITEMS:
            perm = epoch_permutation(N_ITEMS, 1, SEED)
        chunk = perm[(b * BATCH) % N_ITEMS: (b * BATCH) % N_ITEMS + BATCH]
        expected.extend(chunk[proc_id * per: (proc_id + 1) * per].tolist())
    assert ds.materialized == expected, (ds.materialized, expected)

    # host-scalar helpers across REAL process boundaries
    v = multihost.broadcast_from_host0(1.5 if proc_id == 0 else 99.0)
    assert v == 1.5, v
    assert multihost.all_processes_agree(True) is True
    assert multihost.all_processes_agree(proc_id == 0) is False
    assert multihost.any_process_flagged(proc_id == 0) is True
    assert multihost.any_process_flagged(False) is False

    if proc_id == 0:
        np.savez(
            os.path.join(out_dir, "result_p0.npz"),
            losses=np.asarray(losses, np.float64),
            params=flatten_params(params_host),
        )
    # every process writes a sentinel so the parent can assert both finished
    with open(os.path.join(out_dir, f"done_p{proc_id}"), "w") as f:
        f.write("ok")
    jax.distributed.shutdown()


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
