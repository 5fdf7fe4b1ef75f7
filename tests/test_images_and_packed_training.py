"""Image writers and the packed-shard training path."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'

from mrijax.io import (
    make_grid,
    percentile_window,
    save_grid_png,
    save_png,
    to_uint8,
    volume_midslice_panel,
)


def test_to_uint8_range():
    img = np.asarray([[-1.0, 0.0, 1.0]])
    u = to_uint8(img)
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(u, [[0, 128, 255]])


def test_make_grid_layout():
    imgs = np.zeros((5, 8, 8), np.float32)
    imgs[2] = 1.0
    grid = make_grid(imgs, nrow=3, padding=1)
    # 2 rows x 3 cols of 8px tiles with 1px padding
    assert grid.shape == (2 * 9 + 1, 3 * 9 + 1)
    # third tile (row 0, col 2) is white
    assert grid[1:9, 1 + 2 * 9 : 9 + 2 * 9].min() == 255


def test_percentile_window_clips():
    img = np.linspace(0, 100, 1000).reshape(10, 100)
    w = percentile_window(img, 10, 90)
    assert w.min() == 0.0 and w.max() == 1.0


def test_volume_midslice_panel_shape():
    vol = np.random.default_rng(0).normal(size=(8, 10, 12, 4)).astype(np.float32)
    panel = volume_midslice_panel(vol)
    assert panel.dtype == np.uint8
    # 4 modality rows of (max(h,d)=10) and 3 views of (max(w,h)=12) wide
    assert panel.shape == (4 * 10, 3 * 12)


def test_save_png_roundtrip(tmp_path):
    from PIL import Image

    img = np.random.default_rng(1).uniform(-1, 1, (16, 16)).astype(np.float32)
    save_png(tmp_path / "a.png", img)
    save_grid_png(tmp_path / "g.png", img[None], nrow=1)
    assert np.asarray(Image.open(tmp_path / "a.png")).shape == (16, 16)


def test_training_from_packed_shards(tmp_path):
    """The 2D driver trains from a packed npz directory (data.packed_dir)."""
    from mrijax.config import preset_slice_cond_2d
    from mrijax.data import pack_dataset
    from mrijax.data.synthetic import write_synthetic_brats
    from mrijax.obs import reset_termination
    from mrijax.train.experiments import run_experiment

    reset_termination()
    root = write_synthetic_brats(tmp_path / "brats", num_subjects=2,
                                 shape=(24, 24, 16), seed=4)
    packed = tmp_path / "packed"
    pack_dataset(root, packed, image_size=16, use_device=False)

    cfg = preset_slice_cond_2d("", **{
        "name": "packed_run",
        "data.packed_dir": str(packed),
        "data.image_size": 16, "data.batch_size": 8,
        "data.subsample_fraction": None,
        "unet.base_channels": 8, "unet.channel_mults": (1, 2),
        "unet.time_emb_dim": 16, "unet.compute_dtype": "float32",
        "diffusion.timesteps": 10,
        "train.epochs": 1, "train.checkpoint_dir": str(tmp_path / "ck"),
        "train.debug_fast": True, "train.debug_max_steps": 2,
    })
    res = run_experiment(cfg)
    assert res.epochs_run == 1
    assert np.isfinite(res.best_val_loss)


def test_training_3d_from_packed_volumes(tmp_path):
    """The two-stage 3D driver trains from a pack_volumes directory."""
    from mrijax.config import preset_ddpm_3d_ldm
    from mrijax.data import pack_volumes
    from mrijax.data.synthetic import write_synthetic_brats
    from mrijax.obs import reset_termination
    from mrijax.train.experiments import train_ddpm_3d_ldm

    reset_termination()
    root = write_synthetic_brats(tmp_path / "brats", num_subjects=3,
                                 shape=(24, 24, 16), seed=5)
    packed = tmp_path / "packed3d"
    pack_volumes(root, packed)

    cfg = preset_ddpm_3d_ldm("", **{
        "name": "packed3d_run",
        "data.packed_dir": str(packed),
        "data.batch_size": 2, "data.patch_size": (16, 16, 16),
        "data.val_fraction": 0.34,
        "vae.base_channels": 8, "vae.num_down": 2, "vae.latent_channels": 4,
        "vae.compute_dtype": "float32",
        "unet.in_channels": 4, "unet.out_channels": 4,
        "unet.base_channels": 8, "unet.channel_mults": (1, 2),
        "unet.time_emb_dim": 16, "unet.num_heads": 2,
        "unet.compute_dtype": "float32",
        "diffusion.timesteps": 10,
        "train.epochs": 1, "train.checkpoint_dir": str(tmp_path / "ck3d"),
        "train.debug_fast": True, "train.debug_max_steps": 2,
        "vae_train.epochs": 1, "vae_train.checkpoint_dir": str(tmp_path / "ck3d"),
        "vae_train.debug_fast": True, "vae_train.debug_max_steps": 2,
    })
    import jax
    from mrijax.parallel import make_mesh

    mesh = make_mesh(("data",), devices=jax.devices()[:2])
    vae_res, ldm_res, scale = train_ddpm_3d_ldm(cfg, mesh=mesh)
    assert np.isfinite(vae_res.best_val_loss)
    assert np.isfinite(ldm_res.best_val_loss)
    assert scale > 0


def test_training_25d_from_packed_stacks(tmp_path):
    """The 2.5D driver trains from a pack_multimodal_slices directory."""
    from mrijax.config import preset_ddpm_25d
    from mrijax.data import pack_multimodal_slices
    from mrijax.data.synthetic import write_synthetic_brats
    from mrijax.obs import reset_termination
    from mrijax.train.experiments import run_experiment

    reset_termination()
    root = write_synthetic_brats(tmp_path / "brats", num_subjects=2,
                                 shape=(24, 24, 16), seed=6)
    packed = tmp_path / "packed25d"
    pack_multimodal_slices(root, packed, image_size=16, use_device=False)

    cfg = preset_ddpm_25d("", **{
        "name": "packed25d_run",
        "data.packed_dir": str(packed),
        "data.image_size": 16, "data.batch_size": 8,
        "data.subsample_fraction": None, "data.slice_radius": 1,
        "unet.in_channels": 4 + 4 * 2, "unet.out_channels": 4,
        "unet.base_channels": 8, "unet.channel_mults": (1, 2),
        "unet.time_emb_dim": 16, "unet.compute_dtype": "float32",
        "diffusion.timesteps": 10,
        "train.epochs": 1, "train.checkpoint_dir": str(tmp_path / "ck25"),
        "train.debug_fast": True, "train.debug_max_steps": 2,
    })
    res = run_experiment(cfg)
    assert res.epochs_run == 1
    assert np.isfinite(res.best_val_loss)
