"""CLI tests: train → info → sample round-trips on synthetic data."""

import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'

from mrijax.cli import main
from mrijax.data.synthetic import write_synthetic_brats
from mrijax.obs import reset_termination


@pytest.fixture(scope="module")
def brats_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats_cli")
    return write_synthetic_brats(root, num_subjects=3, shape=(40, 40, 24), seed=5)


TINY_2D = [
    "--set",
    "data.image_size=16", "data.batch_size=8", "data.subsample_fraction=null",
    "unet.base_channels=8", "unet.channel_mults=[1,2]", "unet.time_emb_dim=16",
    "unet.compute_dtype=\"float32\"",
    "diffusion.timesteps=20",
    "train.epochs=1", "train.debug_fast=true", "train.debug_max_steps=2",
]


def test_cli_train_info_sample_2d(brats_root, tmp_path, capsys):
    reset_termination()
    ckpt = str(tmp_path / "ck")
    rc = main([
        "train", "--preset", "slice_cond_2d", "--root-dir", str(brats_root),
        "--name", "c2d",
    ] + TINY_2D + [f"train.checkpoint_dir={json.dumps(ckpt)}"])
    assert rc == 0
    run_dir = Path(ckpt) / "slice_cond_2d" / "c2d"
    assert (run_dir / "config.json").exists()

    rc = main(["info", "--run-dir", str(run_dir)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "slice_cond_2d" in out and "latest=" in out

    rc = main([
        "sample", "--run-dir", str(run_dir), "--mode", "grid",
        "--num-samples", "4", "--ddim-steps", "5",
        "--out-dir", str(tmp_path / "samples"),
    ])
    assert rc == 0
    assert (tmp_path / "samples" / "grid.png").exists()

    rc = main([
        "sample", "--run-dir", str(run_dir), "--mode", "sweep",
        "--num-slices", "8", "--ddim-steps", "5",
        "--out-dir", str(tmp_path / "sweep"),
    ])
    assert rc == 0
    assert (tmp_path / "sweep" / "sweep.nii.gz").exists()

    # mesh-sharded sampling: 8 samples over the 8 virtual devices
    rc = main([
        "sample", "--run-dir", str(run_dir), "--mode", "grid",
        "--num-samples", "8", "--ddim-steps", "5", "--data-parallel",
        "--out-dir", str(tmp_path / "samples_dp"),
    ])
    assert rc == 0
    assert (tmp_path / "samples_dp" / "grid.png").exists()

    # eval round-trip (matched-z protocol, sharded sampling)
    out = tmp_path / "metrics.json"
    rc = main([
        "eval", "--run-dir", str(run_dir), "--num-samples", "8",
        "--batch-size", "8", "--ddim-steps", "4", "--split", "all",
        "--diversity-pairs", "2", "--data-parallel", "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["num_samples"] == 8
    assert np.isfinite(report["fid_rand"])
    assert "diversity_ssim_mean" in report
    # fast mode labels itself: --ddim-steps is NOT the reference protocol
    assert report["sampler"] == "ddim-4"
    assert report["sampler_is_reference_protocol"] is False

    # split smaller than batch-size: single-device eval keeps the ragged
    # tail instead of dying on zero batches (r2 weak #6) ...
    out2 = tmp_path / "metrics_small.json"
    rc = main([
        "eval", "--run-dir", str(run_dir), "--num-samples", "8",
        "--batch-size", "512", "--ddim-steps", "2", "--split", "all",
        "--diversity-pairs", "2", "--out", str(out2),
    ])
    assert rc == 0
    assert np.isfinite(json.loads(out2.read_text())["fid_rand"])
    # ... while sharded eval (whole batches required) fails loud and early
    with pytest.raises(SystemExit, match="slices < batch-size"):
        main([
            "eval", "--run-dir", str(run_dir), "--num-samples", "8",
            "--batch-size", "512", "--ddim-steps", "2", "--split", "all",
            "--data-parallel", "--out", str(tmp_path / "x.json"),
        ])


def test_cli_preprocess_and_split(brats_root, tmp_path, capsys):
    rc = main([
        "preprocess", "--root-dir", str(brats_root),
        "--output-dir", str(tmp_path / "packed"), "--image-size", "16",
    ])
    assert rc == 0
    assert (tmp_path / "packed" / "index.json").exists()

    src = tmp_path / "subjects"
    for i in range(6):
        (src / f"s{i}").mkdir(parents=True)
    rc = main([
        "split", "--src", str(src), "--out-root", str(tmp_path / "splits"),
        "--mode", "symlink",
    ])
    assert rc == 0
    assert (tmp_path / "splits" / "splits" / "train.txt").exists()


def test_cli_bad_inputs(tmp_path):
    with pytest.raises(SystemExit):
        main(["train", "--preset", "nope", "--root-dir", "/x"])
    with pytest.raises(SystemExit):
        main(["train", "--preset", "slice_cond_2d", "--set", "badformat"])
    with pytest.raises(FileNotFoundError):
        main(["info", "--run-dir", str(tmp_path / "missing")])


def test_cli_eval_seg(tmp_path):
    """Dice/HD95 CLI over synthetic label maps: identical maps score 1.0
    dice / 0.0 hd95; disjoint label scores 0 dice."""
    import numpy as np

    from mrijax.cli import main
    from mrijax.data import nifti

    rng = np.random.default_rng(0)
    target = (rng.uniform(size=(12, 12, 8)) < 0.3).astype(np.float32)
    target[2:5, 2:5, 2:5] = 2.0
    pred = target.copy()
    pred_dir, targ_dir = tmp_path / "pred", tmp_path / "targ"
    for d in (pred_dir, targ_dir):
        d.mkdir()
    nifti.save(targ_dir / "case1.nii.gz", target)
    nifti.save(pred_dir / "case1.nii.gz", pred)
    out = tmp_path / "seg.json"
    rc = main(["eval-seg", "--pred", str(pred_dir), "--target", str(targ_dir),
               "--labels", "1", "2", "--out", str(out)])
    assert rc == 0
    import json as _json

    rep = _json.loads(out.read_text())
    assert rep["num_cases"] == 1
    assert rep["mean_dice"]["1"] == 1.0 and rep["mean_dice"]["2"] == 1.0
    assert rep["mean_hd95"]["1"] == 0.0

    # perturbed prediction: dice drops below 1
    pred2 = target.copy()
    pred2[target == 2.0] = 1.0  # label 2 entirely missing
    nifti.save(pred_dir / "case1.nii.gz", pred2)
    rc = main(["eval-seg", "--pred", str(pred_dir), "--target", str(targ_dir),
               "--labels", "2"])
    assert rc == 0


def test_cli_import_torch_3d(tmp_path):
    """`import-torch --preset ddpm_3d_ldm` converts the reference (VAE, LDM)
    checkpoint pair — incl. {"state_dict": ...} wrapping
    (`ddpm_3d_ldm/show_model.py:43-52`) — into a run dir that
    `sample --mode volume3d` consumes."""
    import torch

    from test_torch_parity_3d import TUNet3D, TVAE3D

    torch.manual_seed(0)
    tvae = TVAE3D(cin=4, base=16, num_down=2, latent=4)
    tunet = TUNet3D(cin=4, base=16, mults=(1, 2), tdim=32, heads=2)
    vae_pt = tmp_path / "vae3d_final.pt"
    ldm_pt = tmp_path / "3d_ldm_diffusion_best.pt"
    # the reference saves the VAE raw and the LDM possibly wrapped
    torch.save(tvae.state_dict(), vae_pt)
    torch.save({"state_dict": tunet.state_dict()}, ldm_pt)

    run_dir = tmp_path / "imported3d"
    tiny = [
        "--set",
        "data.patch_size=[8,8,8]",
        "vae.base_channels=16", "vae.num_down=2", "vae.latent_channels=4",
        "vae.compute_dtype=\"float32\"",
        "unet.in_channels=4", "unet.out_channels=4", "unet.base_channels=16",
        "unet.channel_mults=[1,2]", "unet.time_emb_dim=32",
        "unet.num_heads=2", "unet.compute_dtype=\"float32\"",
        "diffusion.timesteps=8",
    ]
    rc = main([
        "import-torch", "--preset", "ddpm_3d_ldm",
        "--checkpoint", str(ldm_pt), "--vae-checkpoint", str(vae_pt),
        "--latent-scale", "1.7", "--out", str(run_dir),
    ] + tiny)
    assert rc == 0
    assert (run_dir / "config.json").exists()

    # the imported run dir feeds volume sampling end-to-end
    out_dir = tmp_path / "vols"
    rc = main([
        "sample", "--run-dir", str(run_dir), "--num-samples", "1",
        "--ddim-steps", "4", "--out-dir", str(out_dir),
    ])
    assert rc == 0
    assert (out_dir / "volume0.nii.gz").exists()

    # latent_scale round-tripped through the ldm checkpoint's extra
    from mrijax.cli import _restore_params
    from mrijax.config import ExperimentConfig
    from mrijax.train.experiments import build_unet3d
    from mrijax.train.state import create_train_state

    import jax
    import jax.numpy as jnp

    cfg = ExperimentConfig.from_json(run_dir / "config.json")
    unet = build_unet3d(cfg.unet, use_flash=False)
    template = create_train_state(
        unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 4)),
                  jnp.zeros((1,), jnp.int32)),
        cfg.train.learning_rate,
    )
    _, extra = _restore_params(run_dir / "ldm", template)
    assert extra["latent_scale"] == pytest.approx(1.7)

    # missing --vae-checkpoint is a clear error, not a crash
    with pytest.raises(SystemExit, match="vae-checkpoint"):
        main([
            "import-torch", "--preset", "ddpm_3d_ldm",
            "--checkpoint", str(ldm_pt), "--out", str(tmp_path / "x"),
        ] + tiny)


def test_cli_eval_multi(tmp_path):
    """eval-multi: JSON config list -> summary.json with per-run results
    (errors recorded per model, batch not fatal)."""
    cfg = [{"run_dir": str(tmp_path / "missing"), "name": "gone"}]
    cfg_path = tmp_path / "runs.json"
    cfg_path.write_text(json.dumps(cfg))
    rc = main(["eval-multi", "--config", str(cfg_path),
               "--out-dir", str(tmp_path / "out")])
    assert rc == 1  # every run failed
    summary = json.loads((tmp_path / "out" / "summary.json").read_text())
    assert "error" in summary["gone"]

    with pytest.raises(SystemExit, match="JSON list"):
        cfg_path.write_text(json.dumps({"not": "a list"}))
        main(["eval-multi", "--config", str(cfg_path),
              "--out-dir", str(tmp_path / "out2")])


def test_cli_eval_multi_happy_path(brats_root, tmp_path):
    """Train a tiny run, then eval-multi over it: per-model metrics.json,
    summary.json with finite fid_rand, progress breadcrumb left behind."""
    reset_termination()
    ckpt = str(tmp_path / "ck")
    rc = main([
        "train", "--preset", "slice_cond_2d", "--root-dir", str(brats_root),
        "--name", "m2d",
    ] + TINY_2D + [f"train.checkpoint_dir={json.dumps(ckpt)}"])
    assert rc == 0
    run_dir = Path(ckpt) / "slice_cond_2d" / "m2d"
    cfg = [{"run_dir": str(run_dir), "name": "m2d", "num_samples": 8,
            "batch_size": 8, "ddim_steps": 3, "split": "all",
            "diversity_pairs": 2}]
    cfg_path = tmp_path / "runs.json"
    cfg_path.write_text(json.dumps({"runs": cfg}))
    out_dir = tmp_path / "evalout"
    rc = main(["eval-multi", "--config", str(cfg_path),
               "--out-dir", str(out_dir)])
    assert rc == 0
    summary = json.loads((out_dir / "summary.json").read_text())
    assert np.isfinite(summary["m2d"]["fid_rand"])
    assert (out_dir / "m2d.metrics.json").exists()
    assert "8/8 samples" in (out_dir / "m2d_progress.txt").read_text()
    assert not (out_dir / "m2d_RUNNING.txt").exists()


def test_cli_doctor(capsys):
    """doctor prints environment diagnostics and is read-only."""
    from mrijax.cli import main

    assert main(["doctor"]) == 0
    out = capsys.readouterr().out
    assert "backend=" in out
    assert "native NIfTI decoder" in out
    assert "compile cache" in out
