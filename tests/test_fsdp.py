"""Fully-sharded (ZeRO-style) train-state layout: math equivalence +
memory layout.

The reference's DDP replicates params/Adam moments per rank
(`ddpm_3d_ldm/train.py:139-144`); FSDP here is a pure layout change, so
training under it must be bit-for-tolerance identical to the replicated
run — the same guarantee `tests/test_multidevice_equivalence.py` pins for
data parallelism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule
from mrijax.models import UNet2D
from mrijax.parallel import (
    fsdp_shardings,
    fsdp_step,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_train_state,
)
from mrijax.parallel.fsdp import fsdp_spec
from mrijax.train import create_train_state, make_diffusion_train_step

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
    ),
    # heavyweight tier: run with the full suite, excluded by -m 'not slow'
    pytest.mark.slow,
]


def _tiny_setup(ema=False):
    model = UNet2D(in_channels=1, out_channels=1, base_channels=8,
                   channel_mults=(1, 2), time_emb_dim=16)
    diffusion = GaussianDiffusion(make_schedule(linear_beta_schedule(10)))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
    )
    state = create_train_state(params, 1e-3, ema=ema)
    return model, diffusion, state


def _batch(rng, n=8):
    return {
        "image": rng.normal(size=(n, 16, 16, 1)).astype(np.float32),
        "z_pos": rng.uniform(size=(n,)).astype(np.float32),
    }


def test_fsdp_spec_picks_largest_divisible_dim():
    assert fsdp_spec((3, 3, 64, 128), 8) == jax.sharding.PartitionSpec(
        None, None, None, "data"
    )
    # 128 is the largest divisible dim even when not last
    assert fsdp_spec((128, 5, 64), 8) == jax.sharding.PartitionSpec(
        "data", None, None
    )
    # nothing divisible -> replicated
    assert fsdp_spec((3, 5, 7), 8, min_leaf_elems=1) == jax.sharding.PartitionSpec()
    # small leaves stay replicated regardless of divisibility
    assert fsdp_spec((8,), 8) == jax.sharding.PartitionSpec()


def test_fsdp_equals_replicated_training():
    """3 optimizer steps under the fully-sharded layout produce the same
    losses and parameters as the replicated run (propagating through Adam
    moments), and large leaves actually live sharded on device."""
    mesh = make_mesh(("data",))
    model, diffusion, state = _tiny_setup()

    step = make_diffusion_train_step(model, diffusion, donate=False)

    # replicated run
    rs = jax.device_put(state, replicated_sharding(mesh))
    # fsdp run
    fs, shardings = shard_train_state(mesh, state, min_leaf_elems=256)
    fstep = fsdp_step(step, shardings, donate=False)

    # the big conv kernels must actually be sharded
    sharded_leaves = [
        x for x in jax.tree.leaves(fs.params)
        if not x.sharding.is_fully_replicated
    ]
    assert sharded_leaves, "no parameter leaf ended up sharded"
    big = max(jax.tree.leaves(fs.params), key=lambda x: x.size)
    assert not big.sharding.is_fully_replicated
    local = big.addressable_shards[0].data.size
    assert local * len(jax.devices()) == big.size  # 1/8 per chip

    rng = np.random.default_rng(0)
    rl = fl = None
    with mesh:
        for i in range(3):
            batch = shard_batch(mesh, _batch(rng))
            key = jax.random.PRNGKey(10 + i)
            rs, rl = step(rs, batch, key)
            fs, fl = fstep(fs, batch, key)
            np.testing.assert_allclose(
                float(rl), float(fl), rtol=0, atol=1e-6,
                err_msg=f"loss diverged at step {i}",
            )
            # the layout contract: updated state is STILL sharded
            assert not max(
                jax.tree.leaves(fs.params), key=lambda x: x.size
            ).sharding.is_fully_replicated

    # parameter trees agree after 3 Adam steps
    num = den = 0.0
    for a, b in zip(jax.tree.leaves(fs.params), jax.tree.leaves(rs.params)):
        a, b = np.asarray(a), np.asarray(b)
        num += float(np.sum((a - b) ** 2))
        den += float(np.sum(b ** 2))
    rel = (num / max(den, 1e-30)) ** 0.5
    # Not bitwise: reduce-scatter vs all-reduce reassociates the fp32
    # gradient sums (~1e-7 rel), and Adam's m̂/(√v̂+eps) amplifies that on
    # near-zero-gradient leaves where eps dominates (observed 7.7e-5 after
    # 3 steps; real divergence grows multiplicatively and blows straight
    # past this bound — same argument as __graft_entry__.dryrun_multichip).
    assert rel < 5e-4, f"fsdp vs replicated param rel-L2 {rel:.2e}"

    # Adam moments (somewhere inside the inject_hyperparams wrapper's
    # state) keep the same sharded layout as their parameter
    mu_leaves = [
        x for x in jax.tree.leaves(fs.opt_state)
        if hasattr(x, "sharding") and not x.sharding.is_fully_replicated
    ]
    assert mu_leaves, "no optimizer-moment leaf is sharded"


def test_fsdp_trainer_end_to_end(tmp_path):
    """`train.fsdp=true` drives a full experiment (train → val → checkpoint
    → resume) with the sharded layout; the checkpointed run resumes."""
    from mrijax.config import preset_slice_cond_2d
    from mrijax.data.synthetic import write_synthetic_brats
    from mrijax.obs import reset_termination
    from mrijax.train.experiments import run_experiment

    reset_termination()
    root = write_synthetic_brats(
        tmp_path / "brats", num_subjects=3, shape=(40, 40, 24), seed=7
    )
    cfg = preset_slice_cond_2d(
        str(root),
        **{
            "name": "fsdp2d",
            "data.image_size": 16,
            "data.batch_size": 8,
            "data.subsample_fraction": None,
            "unet.base_channels": 8,
            "unet.channel_mults": (1, 2),
            "unet.time_emb_dim": 16,
            "unet.compute_dtype": "float32",
            "diffusion.timesteps": 20,
            "train.epochs": 2,
            "train.checkpoint_dir": str(tmp_path / "ckpt"),
            "train.debug_fast": True,
            "train.debug_max_steps": 2,
            "train.fsdp": True,
            # the tiny test model's largest leaf is 4096 elems; the
            # production default (2**15) would correctly replicate it all
            "train.fsdp_min_leaf_elems": 256,
        },
    )
    res = run_experiment(cfg)
    assert res.epochs_run == 2
    assert np.isfinite(res.best_val_loss)
    # the result state still carries the sharded layout
    big = max(jax.tree.leaves(res.state.params), key=lambda x: x.size)
    assert not big.sharding.is_fully_replicated

    # resume restores into the sharded template without complaint
    res2 = run_experiment(cfg)
    assert res2.epochs_run == 0


def test_fsdp_3d_two_stage(tmp_path):
    """The 3D driver's FSDP wiring is different (the raw LDM step is
    wrapped BEFORE the vae_params-closing convenience closure — wrapping
    the closure would bake the frozen VAE into the jit as constants), so
    it gets its own smoke: both stages run sharded and finish finite."""
    from mrijax.config import preset_ddpm_3d_ldm
    from mrijax.data.synthetic import write_synthetic_brats
    from mrijax.obs import reset_termination
    from mrijax.train.experiments import train_ddpm_3d_ldm

    reset_termination()
    root = write_synthetic_brats(
        tmp_path / "brats", num_subjects=3, shape=(40, 40, 24), seed=5
    )
    cfg = preset_ddpm_3d_ldm(
        str(root),
        **{
            "name": "fsdp3d",
            "data.batch_size": 2,
            "data.patch_size": (16, 16, 16),
            "data.val_fraction": 0.34,
            "vae.base_channels": 8,
            "vae.num_down": 2,
            "vae.latent_channels": 4,
            "vae.compute_dtype": "float32",
            "unet.in_channels": 4,
            "unet.out_channels": 4,
            "unet.base_channels": 8,
            "unet.channel_mults": (1, 2),
            "unet.time_emb_dim": 16,
            "unet.num_heads": 2,
            "unet.compute_dtype": "float32",
            "diffusion.timesteps": 10,
            "train.epochs": 1,
            "train.checkpoint_dir": str(tmp_path / "ckpt3d"),
            "train.debug_fast": True,
            "train.debug_max_steps": 2,
            "train.fsdp": True,
            "train.fsdp_min_leaf_elems": 256,
            "vae_train.epochs": 1,
            "vae_train.checkpoint_dir": str(tmp_path / "ckpt3d"),
            "vae_train.debug_fast": True,
            "vae_train.debug_max_steps": 2,
            "vae_train.fsdp": True,
            "vae_train.fsdp_min_leaf_elems": 256,
        },
    )
    mesh = make_mesh(("data",), devices=jax.devices()[:2])
    vae_res, ldm_res, scale = train_ddpm_3d_ldm(cfg, mesh=mesh)
    assert np.isfinite(vae_res.best_val_loss)
    assert np.isfinite(ldm_res.best_val_loss)
    assert scale > 0
    big = max(jax.tree.leaves(ldm_res.state.params), key=lambda x: x.size)
    assert not big.sharding.is_fully_replicated


def test_fsdp_with_ema_shadow():
    """The EMA shadow tree shards with the same layout and stays correct."""
    mesh = make_mesh(("data",))
    model, diffusion, state = _tiny_setup(ema=True)
    step = make_diffusion_train_step(model, diffusion, donate=False,
                                     ema_decay=0.9)
    rs = jax.device_put(state, replicated_sharding(mesh))
    fs, shardings = shard_train_state(mesh, state, min_leaf_elems=256)
    fstep = fsdp_step(step, shardings, donate=False)

    big_ema = max(jax.tree.leaves(fs.ema_params), key=lambda x: x.size)
    assert not big_ema.sharding.is_fully_replicated

    rng = np.random.default_rng(1)
    with mesh:
        batch = shard_batch(mesh, _batch(rng))
        key = jax.random.PRNGKey(3)
        rs, rl = step(rs, batch, key)
        fs, fl = fstep(fs, batch, key)
    np.testing.assert_allclose(float(rl), float(fl), rtol=0, atol=1e-6)
    # tree-level agreement; per-element atol would trip over Adam's
    # eps-amplified reduction noise on zero-init bias leaves (see above)
    num = den = 0.0
    for a, b in zip(jax.tree.leaves(fs.ema_params),
                    jax.tree.leaves(rs.ema_params)):
        a, b = np.asarray(a), np.asarray(b)
        num += float(np.sum((a - b) ** 2))
        den += float(np.sum(b ** 2))
    rel = (num / max(den, 1e-30)) ** 0.5
    assert rel < 5e-4, f"fsdp vs replicated EMA rel-L2 {rel:.2e}"
