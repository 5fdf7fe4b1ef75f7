"""Multi-device training equivalence: SPMD data parallelism must reproduce
the single-device large-batch run — the property DDP provides in the
reference (gradient all-reduce ≡ one big batch,
`ddpm_3d_ldm/train.py:139-144,231-233`), here guaranteed by the SPMD
partitioner and *proven*: per-step losses and gradients match to float
epsilon, and params stay equal over multiple optimizer steps (SGD — linear
in the gradients, so psum reassociation noise cannot be amplified the way
Adam's sign normalization amplifies it for near-zero gradients; that
amplification is a property of Adam shared with torch DDP, not of the
parallelism), across dp, dp×sp, and a checkpoint/resume cycle under a mesh.
"""

import optax

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'

import jax
import jax.numpy as jnp

from mrijax.diffusion import GaussianDiffusion, cosine_beta_schedule, linear_beta_schedule, make_schedule
from mrijax.io import CheckpointManager
from mrijax.models import UNet2D, UNet3D, VAE3D
from mrijax.parallel import make_mesh, replicated_sharding, shard_batch
from mrijax.train import (
    make_diffusion_train_step,
    make_latent_diffusion_train_step,
)
from mrijax.train.state import TrainState


def _sgd_state(params, lr=1e-2):
    return TrainState.create(apply_fn=None, params=params, tx=optax.sgd(lr))

BATCH = 8
STEPS = 3


def _model2d():
    return UNet2D(in_channels=1, out_channels=1, base_channels=8,
                  channel_mults=(1, 2), time_emb_dim=16, dtype=jnp.float32)


def _init2d():
    model = _model2d()
    with jax.default_device(jax.devices("cpu")[0]):
        return model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,)),
        )


def _batches2d(n=STEPS):
    rng = np.random.default_rng(7)
    return [
        {
            "image": rng.normal(size=(BATCH, 16, 16, 1)).astype(np.float32),
            "z_pos": rng.uniform(size=(BATCH,)).astype(np.float32),
        }
        for _ in range(n)
    ]


def _run_2d(mesh, params, batches, lr=1e-2, state=None, start_key=0):
    model = _model2d()
    diffusion = GaussianDiffusion(make_schedule(linear_beta_schedule(20)))
    step = make_diffusion_train_step(model, diffusion, donate=False)
    if state is None:
        state = jax.device_put(
            _sgd_state(params, lr), replicated_sharding(mesh)
        )
    losses = []
    with mesh:
        for i, b in enumerate(batches, start=start_key):
            sharded = shard_batch(mesh, b)
            state, loss = step(state, sharded, jax.random.PRNGKey(100 + i))
            losses.append(float(loss))
    return state, losses


def _assert_tree_close(a, b, atol=3e-5):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves(b)
    for (path, la), lb in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=atol, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_data_parallel_equals_single_device():
    """8-way data-parallel steps produce the same params and losses as the
    single-device large-batch run (3 Adam steps)."""
    params = _init2d()
    batches = _batches2d()
    mesh1 = make_mesh(("data",), devices=jax.devices()[:1])
    mesh8 = make_mesh(("data",), devices=jax.devices()[:8])

    s1, l1 = _run_2d(mesh1, params, batches)
    s8, l8 = _run_2d(mesh8, params, batches)
    np.testing.assert_allclose(l1, l8, atol=1e-5, rtol=1e-5)
    _assert_tree_close(s1.params, s8.params)


def test_dp_sp_mesh_equals_single_device():
    """The dp×sp (data × sequence-parallel attention) 3D LDM train step
    matches pure single-device execution over 3 steps."""
    vae = VAE3D(in_channels=2, base_channels=8, num_down=2, latent_channels=4)
    with jax.default_device(jax.devices("cpu")[0]):
        vae_params = vae.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 8, 2)), jax.random.PRNGKey(4)
        )

    def unet_for(mesh, sp):
        return UNet3D(
            in_channels=4, base_channels=8, channel_mults=(1, 2),
            use_attention=True, use_flash_attention=False, num_heads=2,
            time_emb_dim=16, dtype=jnp.float32,
            sp_axis="model" if sp > 1 else None, mesh=mesh if sp > 1 else None,
        )

    with jax.default_device(jax.devices("cpu")[0]):
        unet_params = unet_for(None, 1).init(
            jax.random.PRNGKey(5),
            jnp.zeros((1, 4, 4, 4, 4)), jnp.zeros((1,), jnp.int32),
        )

    rng = np.random.default_rng(9)
    batches = [
        {"volume": rng.normal(size=(4, 8, 8, 8, 2)).astype(np.float32)}
        for _ in range(STEPS)
    ]
    diffusion = GaussianDiffusion(
        make_schedule(cosine_beta_schedule(10)), loss_type="min_snr"
    )

    results = {}
    for name, (dp, sp) in {"single": (1, 1), "dp4xsp2": (4, 2)}.items():
        mesh = make_mesh(("data", "model"), shape=(dp, sp),
                         devices=jax.devices()[: dp * sp])
        unet = unet_for(mesh, sp)
        step = make_latent_diffusion_train_step(unet, vae, diffusion, donate=False)
        state = jax.device_put(
            _sgd_state(unet_params), replicated_sharding(mesh)
        )
        vp = jax.device_put(vae_params, replicated_sharding(mesh))
        losses = []
        with mesh:
            for i, b in enumerate(batches):
                sharded = shard_batch(mesh, b)
                state, loss = step(state, vp, sharded, jax.random.PRNGKey(50 + i), 1.0)
                losses.append(float(loss))
        results[name] = (state, losses)

    np.testing.assert_allclose(
        results["single"][1], results["dp4xsp2"][1], atol=1e-5, rtol=1e-5
    )
    _assert_tree_close(results["single"][0].params, results["dp4xsp2"][0].params)


def test_checkpoint_resume_under_mesh(tmp_path):
    """Save mid-training on an 8-device mesh, restore onto a DIFFERENT
    (4-device) mesh, continue — final params match the uninterrupted
    single-device run."""
    params = _init2d()
    batches = _batches2d()

    mesh1 = make_mesh(("data",), devices=jax.devices()[:1])
    ref_state, _ = _run_2d(mesh1, params, batches)

    mesh8 = make_mesh(("data",), devices=jax.devices()[:8])
    state2, _ = _run_2d(mesh8, params, batches[:2])
    mgr = CheckpointManager(tmp_path / "ck", best_key=None)
    mgr.save(2, state2, extra={"epoch": 1})
    mgr.wait()

    mesh4 = make_mesh(("data",), devices=jax.devices()[:4])
    template = jax.device_put(
        _sgd_state(params), replicated_sharding(mesh4)
    )
    restored, _ = mgr.restore(jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        template,
    ))
    final, _ = _run_2d(mesh4, None, batches[2:], state=restored, start_key=2)
    _assert_tree_close(ref_state.params, final.params)
    mgr.close()


def test_gradients_match_across_meshes():
    """One-step gradients are identical (float-epsilon) between 1-device and
    8-device data-parallel execution — the literal DDP all-reduce property."""
    from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule

    params = _init2d()
    batch = _batches2d(1)[0]
    model = _model2d()
    diffusion = GaussianDiffusion(make_schedule(linear_beta_schedule(20)))

    def loss_fn(p, b, key):
        tkey, nkey = jax.random.split(key)
        t = jax.random.randint(tkey, (b["image"].shape[0],), 0, 20)
        noise = jax.random.normal(nkey, b["image"].shape, jnp.float32)

        def model_fn(x, tt):
            return model.apply(p, x, tt, b["z_pos"], None)

        return diffusion.p_losses(model_fn, b["image"], t, noise)

    grad_fn = jax.jit(jax.grad(loss_fn))
    grads = {}
    for name, k in (("single", 1), ("dp8", 8)):
        mesh = make_mesh(("data",), devices=jax.devices()[:k])
        with mesh:
            p = jax.device_put(params, replicated_sharding(mesh))
            b = shard_batch(mesh, batch)
            grads[name] = jax.device_get(grad_fn(p, b, jax.random.PRNGKey(0)))
    _assert_tree_close(grads["single"], grads["dp8"], atol=1e-6)
