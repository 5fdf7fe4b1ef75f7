"""EMA shadow parameters (↗ capability the reference lacks).

Pins: closed-form EMA tracking inside the jitted step, checkpoint
round-trip of the shadow tree, inference_params preference, and the
end-to-end 2D trainer + CLI sampling path with ema_decay set.
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'

import jax
import jax.numpy as jnp

from mrijax.diffusion import GaussianDiffusion, linear_beta_schedule, make_schedule
from mrijax.models import UNet2D
from mrijax.train import (
    create_train_state,
    ema_update,
    inference_params,
    make_diffusion_train_step,
)


def _tiny_model_state(ema):
    model = UNet2D(in_channels=1, out_channels=1, base_channels=8,
                   channel_mults=(1, 2), time_emb_dim=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1,)))
    return model, create_train_state(params, 1e-3, ema=ema)


def test_ema_update_closed_form():
    state = create_train_state(
        {"w": jnp.asarray([1.0, 2.0])}, 1e-3, ema=True
    )
    # shadow starts equal to params
    np.testing.assert_array_equal(
        np.asarray(state.ema_params["w"]), [1.0, 2.0]
    )
    state = state.replace(params={"w": jnp.asarray([3.0, 4.0])})
    state = ema_update(state, 0.9)
    np.testing.assert_allclose(
        np.asarray(state.ema_params["w"]),
        [0.9 * 1.0 + 0.1 * 3.0, 0.9 * 2.0 + 0.1 * 4.0], rtol=1e-6,
    )
    # no-op without a shadow tree
    s2 = create_train_state({"w": jnp.ones(2)}, 1e-3)
    assert ema_update(s2, 0.9).ema_params is None
    assert inference_params(s2) is s2.params
    assert inference_params(state) is state.ema_params


def test_ema_tracks_inside_train_step():
    model, state = _tiny_model_state(ema=True)
    diffusion = GaussianDiffusion(make_schedule(linear_beta_schedule(20)))
    step = make_diffusion_train_step(model, diffusion, donate=False,
                                     ema_decay=0.5)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(4, 16, 16, 1)), jnp.float32),
        "z_pos": jnp.asarray(rng.uniform(size=(4,)), jnp.float32),
    }
    p0 = state.params
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    # shadow differs from both the initial and the current params, and
    # lies between them (decay 0.5 after 3 steps ⇒ 1/8 weight on p0)
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])  # noqa: E731
    assert not np.allclose(leaf(state.ema_params), leaf(state.params))
    assert not np.allclose(leaf(state.ema_params), leaf(p0))
    # EMA must be closer to current params than p0 is (it has been chasing)
    d_ema = np.abs(leaf(state.ema_params) - leaf(state.params)).mean()
    d_p0 = np.abs(leaf(p0) - leaf(state.params)).mean()
    assert d_ema < d_p0


def test_ema_checkpoint_roundtrip(tmp_path):
    from mrijax.io import CheckpointManager

    _, state = _tiny_model_state(ema=True)
    state = state.replace(
        ema_params=jax.tree.map(lambda a: a + 1.0, state.ema_params)
    )
    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(0, state, {}, metrics={"val_loss": 1.0})
    mgr.wait()
    mgr.close()

    _, template = _tiny_model_state(ema=True)
    mgr2 = CheckpointManager(tmp_path / "ck")
    restored, _ = mgr2.restore(template)
    mgr2.close()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.ema_params, state.ema_params,
    )


def test_cli_train_sample_with_ema(tmp_path, capsys):
    """End-to-end: train tiny 2D with ema_decay, then sample — the CLI
    restores the shadow tree (template structure matches) and samples."""
    from mrijax.cli import main
    from mrijax.data.synthetic import write_synthetic_brats
    from mrijax.obs import reset_termination

    reset_termination()
    root = write_synthetic_brats(tmp_path / "brats", num_subjects=2,
                                 shape=(24, 24, 12), seed=1)
    ckpt = str(tmp_path / "ck")
    rc = main([
        "train", "--preset", "slice_cond_2d", "--root-dir", str(root),
        "--name", "ema2d", "--set",
        "data.image_size=16", "data.batch_size=8",
        "data.subsample_fraction=null",
        "unet.base_channels=8", "unet.channel_mults=[1,2]",
        "unet.time_emb_dim=16", "unet.compute_dtype=\"float32\"",
        "diffusion.timesteps=10",
        "train.epochs=1", "train.debug_fast=true", "train.debug_max_steps=2",
        "train.ema_decay=0.9",
        f"train.checkpoint_dir={json.dumps(ckpt)}",
    ])
    assert rc == 0
    run_dir = tmp_path / "ck" / "slice_cond_2d" / "ema2d"
    rc = main([
        "sample", "--run-dir", str(run_dir), "--mode", "grid",
        "--num-samples", "2", "--ddim-steps", "3",
        "--out-dir", str(tmp_path / "s"),
    ])
    assert rc == 0
    assert (tmp_path / "s" / "grid.png").exists()
