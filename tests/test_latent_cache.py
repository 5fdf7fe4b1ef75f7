"""Latent-cache training path (TPU-native stage-2 optimization).

The frozen-VAE encode is a pure function of the data, so
``pack_latents`` encodes each full volume once and the LDM stage trains
from latent crops (``make_cached_latent_train_step``) — removing the
per-step encode the reference repeats forever
(`ddpm_3d_ldm/train.py:391-400`). These tests pin:

* packed latents ≡ encode(padded full volume);
* cached train/eval steps ≡ the encode-per-step path when the crop is the
  identity (same RNG key → same loss AND same updated params);
* per-(seed, epoch, index) latent-crop reproducibility + center-crop mode;
* the end-to-end two-stage driver with cache_latents=True (incl. cache
  reuse on resume and the VAE-fingerprint mismatch repack).
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'

import jax
import jax.numpy as jnp

from mrijax.config import preset_ddpm_3d_ldm
from mrijax.data import PackedLatentDataset, pack_latents, pack_volumes
from mrijax.data.packing import (
    latent_cache_is_stale,
    latent_source_files,
    params_fingerprint,
)
from mrijax.data.preprocess import pad_volume_to_min
from mrijax.data.synthetic import write_synthetic_brats
from mrijax.diffusion import GaussianDiffusion, cosine_beta_schedule, make_schedule
from mrijax.models import VAE3D, UNet3D
from mrijax.obs import reset_termination
from mrijax.parallel import make_mesh
from mrijax.train.experiments import train_ddpm_3d_ldm
from mrijax.train.steps import (
    estimate_latent_scale_from_latents,
    make_cached_latent_eval_step,
    make_cached_latent_train_step,
    make_latent_diffusion_eval_step,
    make_latent_diffusion_train_step,
)


@pytest.fixture(scope="module")
def brats_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats")
    return write_synthetic_brats(root, num_subjects=3, shape=(20, 22, 10), seed=3)


def _tiny_vae():
    return VAE3D(in_channels=4, base_channels=8, num_down=2, latent_channels=4,
                 dtype=jnp.float32)


def _vae_params(vae, seed=0):
    return vae.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 8, 8, 8, 4)), jax.random.PRNGKey(1)
    )


def test_pack_latents_matches_full_volume_encode(brats_root, tmp_path):
    vae = _tiny_vae()
    params = _vae_params(vae)
    vol_dir, lat_dir = tmp_path / "vols", tmp_path / "lats"
    pack_volumes(brats_root, vol_dir)
    index = pack_latents(vol_dir, lat_dir, vae, params)
    # VAE3D(num_down=2) downsamples only on the first num_down-1 levels,
    # so the true spatial factor is 2 (vae.spatial_downsample), not 4
    assert index["kind"] == "latents3d" and index["downsample"] == 2
    assert index["downsample"] == vae.spatial_downsample
    assert len(index["files"]) == 3

    # first case: recompute by hand from the packed volume
    vol_index = json.loads((vol_dir / "index.json").read_text())
    with np.load(vol_dir / vol_index["files"][0]["path"]) as z:
        vol = z["volume"]  # (C, D, H, W)
    tgt = [int(-(-s // 2)) * 2 for s in vol.shape[1:]]
    x = np.moveaxis(pad_volume_to_min(vol, tgt), 0, -1)[None]
    want = np.asarray(
        vae.apply(params, jnp.asarray(x), method="encode_to_latent"), np.float32
    )[0]
    with np.load(lat_dir / index["files"][0]["path"]) as z:
        got = np.moveaxis(z["latent"], 0, -1)
    # jit-vs-eager fusion differences only (same math)
    np.testing.assert_allclose(got, want, atol=1e-4)

    # raw-root input (no pack_volumes dir) must produce identical latents
    lat_dir2 = tmp_path / "lats_raw"
    pack_latents(brats_root, lat_dir2, vae, params)
    index2 = json.loads((lat_dir2 / "index.json").read_text())
    with np.load(lat_dir2 / index2["files"][0]["path"]) as z:
        got2 = z["latent"]
    with np.load(lat_dir / index["files"][0]["path"]) as z:
        got1 = z["latent"]
    np.testing.assert_array_equal(got1, got2)


def test_latent_cache_staleness(brats_root, tmp_path):
    """Repack triggers on: missing index, different VAE params, or changed
    source data (ADVICE r2: data changes must not silently reuse a cache)."""
    vae = _tiny_vae()
    params = _vae_params(vae)
    lat_dir = tmp_path / "lats"
    index = pack_latents(brats_root, lat_dir, vae, params)
    fp = params_fingerprint(params)
    src = latent_source_files(brats_root)
    assert index["source_files"] == src and len(src) == 3
    idx_path = lat_dir / "index.json"
    assert not latent_cache_is_stale(idx_path, fp, src)
    assert latent_cache_is_stale(idx_path, fp + 1.0, src)       # other VAE
    assert latent_cache_is_stale(idx_path, fp, src[:-1])        # case removed
    assert latent_cache_is_stale(idx_path, fp, src + ["x.npz"])  # case added
    assert latent_cache_is_stale(tmp_path / "missing.json", fp, src)


def test_latent_dataset_crops(brats_root, tmp_path):
    vae = _tiny_vae()
    params = _vae_params(vae)
    lat_dir = tmp_path / "lats"
    pack_latents(brats_root, lat_dir, vae, params)

    ds = PackedLatentDataset(lat_dir, (2, 3, 2), random_crop=True, seed=5)
    ds.set_epoch(2)
    a = ds[1]["latent"]
    assert a.shape == (2, 3, 2, 4)
    b = PackedLatentDataset(lat_dir, (2, 3, 2), random_crop=True, seed=5)
    b.set_epoch(2)
    np.testing.assert_array_equal(a, b[1]["latent"])  # (seed, epoch, idx) pinned
    b.set_epoch(3)
    assert not np.array_equal(a, b[1]["latent"])

    # center crop == direct slicing
    c = PackedLatentDataset(lat_dir, (2, 3, 2), random_crop=False)[0]["latent"]
    with np.load(lat_dir / json.loads((lat_dir / "index.json").read_text())["files"][0]["path"]) as z:
        full = np.moveaxis(z["latent"], 0, -1)
    d0, h0, w0 = [(s - t) // 2 for s, t in zip(full.shape[:3], (2, 3, 2))]
    np.testing.assert_array_equal(c, full[d0:d0+2, h0:h0+3, w0:w0+2])


def test_cached_step_equals_encode_per_step(brats_root):
    """With an identity crop, the cached step must reproduce the
    encode-per-step path exactly: same loss, same updated params."""
    vae = _tiny_vae()
    vae_params = _vae_params(vae)
    unet = UNet3D(in_channels=4, base_channels=8, channel_mults=(1, 2),
                  time_emb_dim=16, num_heads=2, use_attention=False,
                  dtype=jnp.float32)
    diffusion = GaussianDiffusion(
        make_schedule(cosine_beta_schedule(10)), loss_type="min_snr"
    )
    rng = np.random.default_rng(0)
    volume = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 4)), jnp.float32)
    z = vae.apply(vae_params, volume, method="encode_to_latent")

    unet_params = unet.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 2, 2, 2, 4)), jnp.zeros((1,), jnp.int32)
    )
    key = jax.random.PRNGKey(7)
    scale = 1.7

    import optax

    from mrijax.train.state import TrainState

    def _sgd_state():
        # SGD is linear in the gradients, so the only difference between the
        # two paths is jit-vs-eager encode noise (~1e-6 in z) — Adam's
        # sign-normalization would amplify that for near-zero grads.
        return TrainState.create(apply_fn=None, params=unet_params,
                                 tx=optax.sgd(1e-2))

    full_step = make_latent_diffusion_train_step(unet, vae, diffusion, donate=False)
    cached_step = make_cached_latent_train_step(unet, diffusion, donate=False)
    s1, loss1 = full_step(
        _sgd_state(), vae_params, {"volume": volume}, key, scale,
    )
    s2, loss2 = cached_step(
        _sgd_state(), {"latent": z.astype(jnp.float32)}, key, scale,
    )
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        s1.params, s2.params,
    )

    full_eval = make_latent_diffusion_eval_step(unet, vae, diffusion)
    cached_eval = make_cached_latent_eval_step(unet, diffusion)
    e1 = full_eval(unet_params, vae_params, {"volume": volume}, key, scale, 3)
    e2 = cached_eval(unet_params, {"latent": z.astype(jnp.float32)}, key, scale, 3)
    assert float(e1) == pytest.approx(float(e2), rel=1e-4)


def test_estimate_latent_scale_from_latents():
    rng = np.random.default_rng(0)
    zs = [rng.normal(scale=2.0, size=(4, 8)) for _ in range(3)]
    got = estimate_latent_scale_from_latents(iter(zs))
    want = 1.0 / np.sqrt(np.mean([z.var() for z in zs]))
    assert got == pytest.approx(want, rel=1e-5)


def test_train_3d_two_stage_cached(brats_root, tmp_path):
    reset_termination()
    cfg = preset_ddpm_3d_ldm(
        str(brats_root),
        **{
            "name": "t3dc",
            "data.batch_size": 2,
            # stage 2 batches latents independently of the VAE stage (tiny
            # dataset: 2 train latents, mesh of 2 -> batch 2 is the max)
            "data.latent_batch_size": 2,
            "data.patch_size": (8, 16, 16),
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
            # the shipped tuned recipe: selective remat of the level-0
            # res blocks only (PERF.md "Cached-latent training")
            "unet.remat_levels": (0,),
            "diffusion.timesteps": 10,
            "train.epochs": 1,
            "train.checkpoint_dir": str(tmp_path / "ckpt"),
            "train.debug_fast": True,
            "train.debug_max_steps": 2,
            "train.cache_latents": True,
            "vae_train.epochs": 1,
            "vae_train.checkpoint_dir": str(tmp_path / "ckpt"),
            "vae_train.debug_fast": True,
            "vae_train.debug_max_steps": 2,
        },
    )
    mesh = make_mesh(("data",), devices=jax.devices()[:2])
    vae_res, ldm_res, scale = train_ddpm_3d_ldm(cfg, mesh=mesh)
    assert np.isfinite(vae_res.best_val_loss)
    assert np.isfinite(ldm_res.best_val_loss)
    assert scale > 0
    cache_dir = tmp_path / "ckpt" / "ddpm_3d_ldm" / "t3dc" / "latent_cache"
    index = json.loads((cache_dir / "index.json").read_text())
    assert index["kind"] == "latents3d"
    # fingerprint in the index matches the trained VAE
    assert index["params_fingerprint"] == pytest.approx(
        params_fingerprint(vae_res.state.params), rel=1e-6
    )


def test_cache_latents_rejects_indivisible_patch(brats_root, tmp_path):
    cfg = preset_ddpm_3d_ldm(
        str(brats_root),
        **{
            "name": "t3dbad",
            "data.patch_size": (9, 16, 16),  # 9 % 2 != 0 (spatial_downsample)
            "vae.base_channels": 8,
            "vae.num_down": 2,
            "vae.compute_dtype": "float32",
            "train.cache_latents": True,
            "train.checkpoint_dir": str(tmp_path / "ckpt"),
            "train.debug_fast": True,
            "train.debug_max_steps": 1,
            "train.epochs": 1,
            "vae_train.epochs": 1,
            "vae_train.checkpoint_dir": str(tmp_path / "ckpt"),
            "vae_train.debug_fast": True,
            "vae_train.debug_max_steps": 1,
        },
    )
    reset_termination()
    mesh = make_mesh(("data",), devices=jax.devices()[:1])
    with pytest.raises(ValueError, match="divisible"):
        train_ddpm_3d_ldm(cfg, mesh=mesh)
