"""Trainer runtime tests: end-to-end experiment drivers on synthetic data,
checkpoint/resume, early stopping, preemption, config round-trip."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'

import jax

from mrijax.config import (
    ExperimentConfig,
    preset_ddpm_3d_ldm,
    preset_ddpm_25d,
    preset_slice_cond_2d,
)
from mrijax.data.synthetic import write_synthetic_brats
from mrijax.io import CheckpointManager, load_params_npz, save_params_npz
from mrijax.obs import reset_termination
from mrijax.parallel import make_mesh
from mrijax.train.experiments import run_experiment, train_ddpm_3d_ldm


@pytest.fixture(scope="module")
def brats_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats")
    return write_synthetic_brats(root, num_subjects=3, shape=(40, 40, 24), seed=11)


def _tiny_2d_cfg(root, tmp_path, **over):
    cfg = preset_slice_cond_2d(
        str(root),
        **{
            "name": "t2d",
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
            **over,
        },
    )
    return cfg


def test_config_json_roundtrip(tmp_path):
    cfg = preset_ddpm_3d_ldm("/data")
    p = tmp_path / "cfg.json"
    cfg.to_json(p)
    back = ExperimentConfig.from_json(p)
    assert back.to_dict() == cfg.to_dict()
    with pytest.raises(KeyError):
        preset_slice_cond_2d("/data", **{"train.nonexistent": 1})


def test_train_2d_and_resume(brats_root, tmp_path):
    reset_termination()
    cfg = _tiny_2d_cfg(brats_root, tmp_path)
    res = run_experiment(cfg)
    assert res.epochs_run == 2
    assert np.isfinite(res.best_val_loss)

    # resume: same config continues from epoch 2 and does nothing (epochs=2)
    res2 = run_experiment(cfg)
    assert res2.epochs_run == 0

    # extend epochs: continues from checkpoint
    cfg.train.epochs = 3
    res3 = run_experiment(cfg)
    assert res3.epochs_run == 1


def test_train_25d_smoke(brats_root, tmp_path):
    reset_termination()
    cfg = preset_ddpm_25d(
        str(brats_root),
        **{
            "name": "t25",
            "data.image_size": 16,
            "data.batch_size": 8,
            "data.subsample_fraction": None,
            "data.slice_radius": 1,
            "unet.in_channels": 4 + 4 * 2,
            "unet.out_channels": 4,
            "unet.base_channels": 8,
            "unet.channel_mults": (1, 2),
            "unet.time_emb_dim": 16,
            "unet.compute_dtype": "float32",
            "diffusion.timesteps": 20,
            "train.epochs": 1,
            "train.checkpoint_dir": str(tmp_path / "ckpt25"),
            "train.debug_fast": True,
            "train.debug_max_steps": 2,
        },
    )
    res = run_experiment(cfg)
    assert res.epochs_run == 1
    assert np.isfinite(res.best_val_loss)


def test_train_3d_two_stage(brats_root, tmp_path):
    reset_termination()
    cfg = preset_ddpm_3d_ldm(
        str(brats_root),
        **{
            "name": "t3d",
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
            "vae_train.epochs": 1,
            "vae_train.checkpoint_dir": str(tmp_path / "ckpt3d"),
            "vae_train.debug_fast": True,
            "vae_train.debug_max_steps": 2,
        },
    )
    mesh = make_mesh(("data",), devices=jax.devices()[:2])
    vae_res, ldm_res, scale = train_ddpm_3d_ldm(cfg, mesh=mesh)
    assert np.isfinite(vae_res.best_val_loss)
    assert np.isfinite(ldm_res.best_val_loss)
    assert scale > 0


def test_checkpoint_manager_best_policy(tmp_path):
    import jax.numpy as jnp
    from mrijax.train import create_train_state

    state = create_train_state({"w": jnp.ones((4,))}, 1e-3)
    mgr = CheckpointManager(tmp_path / "cm", max_to_keep=2)
    for step, vl in [(1, 5.0), (2, 2.0), (3, 7.0)]:
        mgr.save(step, state, {"epoch": step}, metrics={"val_loss": vl})
    mgr.wait()
    assert mgr.latest_step == 3
    assert mgr.best_step == 2
    restored, extra = mgr.restore(state, best=True)
    assert extra["epoch"] == 2
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.ones(4))
    mgr.close()


def test_params_npz_roundtrip(tmp_path):
    import jax.numpy as jnp

    params = {"params": {"Dense_0": {"kernel": jnp.arange(6.0).reshape(2, 3),
                                     "bias": jnp.zeros((3,))}}}
    p = tmp_path / "w.npz"
    save_params_npz(p, params, meta={"family": "x"})
    back, meta = load_params_npz(p)
    assert meta["family"] == "x"
    np.testing.assert_array_equal(
        back["params"]["Dense_0"]["kernel"],
        np.arange(6.0).reshape(2, 3),
    )


def test_training_is_seed_deterministic(brats_root, tmp_path):
    """Same config + seed -> bit-identical loss trajectory."""
    reset_termination()
    losses = []
    for run in range(2):
        cfg = _tiny_2d_cfg(
            brats_root, tmp_path,
            **{"name": f"det{run}",
               "train.checkpoint_dir": str(tmp_path / f"det{run}")},
        )
        cfg.train.resume = False
        res = run_experiment(cfg)
        losses.append(res.best_val_loss)
    assert losses[0] == losses[1]
