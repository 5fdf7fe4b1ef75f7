"""Data layer tests: NIfTI round-trip, normalization parity with the
reference formulas, dataset indexing, packing, loader sharding."""

import numpy as np
import pytest

import jax

from mrijax.data import (
    BatchLoader,
    MultiModalSliceDataset25D,
    PackedSliceDataset,
    SliceDataset2D,
    VolumeDataset3D,
    apply_split,
    central_slice_range,
    epoch_permutation,
    nifti,
    pack_dataset,
    split_subjects,
    volume_split_indices,
    zscore_nonzero,
)
from mrijax.data.datasets import _zscore_nonzero_np, _resize_bilinear_np
from mrijax.data.synthetic import make_brain_volume, write_synthetic_brats


@pytest.fixture(scope="module")
def brats_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats")
    return write_synthetic_brats(root, num_subjects=3, shape=(40, 44, 24), seed=7)


def reference_normalize_slice(slice_2d):
    """Literal transcription of the reference's per-slice math
    (`slice_cond_2d_ddpm/dataset.py:73-95`, in [-1,1] terms)."""
    s = slice_2d.astype(np.float32).copy()
    mask = s != 0
    if np.any(mask):
        mean = s[mask].mean()
        std = s[mask].std()
        std = std if std > 0 else 1.0
        s[mask] = (s[mask] - mean) / std
    s = np.clip(s, -5, 5)
    s = (s + 5) / 10.0
    return s * 2.0 - 1.0


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = make_brain_volume(rng, (17, 19, 11))
    for name in ("v.nii", "v.nii.gz"):
        p = tmp_path / name
        nifti.save(p, vol)
        back = nifti.load(p)
        np.testing.assert_array_equal(back, vol)
        hdr = nifti.load_header(p)
        assert hdr.shape == vol.shape


def test_zscore_nonzero_matches_reference_math():
    rng = np.random.default_rng(1)
    sl = make_brain_volume(rng, (32, 32, 3))[:, :, 1]
    ours_np = _zscore_nonzero_np(sl)
    ours_jax = np.asarray(zscore_nonzero(sl))
    ref = reference_normalize_slice(sl)
    np.testing.assert_allclose(ours_np, ref, atol=1e-5)
    np.testing.assert_allclose(ours_jax, ref, atol=1e-5)
    # background stays exactly 0 on the numpy path, ~0 on device
    assert ours_np[sl == 0].max(initial=0.0) == 0.0
    np.testing.assert_allclose(ours_jax[sl == 0], 0.0, atol=1e-6)


def test_zscore_degenerate_std_branch_per_family():
    """0 < std < 1e-6: the 2D branch (eps=None) divides by the true tiny
    std (`slice_cond_2d_ddpm/dataset.py:78` replaces only std == 0 → the
    two voxels normalize to ±1σ → ±0.2 after /5), while the 3D branch
    replaces it with 1.0 (`ddpm_3d_ldm/dataset.py:23-24` → values stay
    ~1e-8)."""
    sl = np.zeros((8, 8), np.float32)
    sl[2, 2], sl[3, 3] = 1e-7, 2e-7  # nonzero mask with std = 5e-8
    for f in (lambda a: np.asarray(_zscore_nonzero_np(a, eps=None)),
              lambda a: np.asarray(zscore_nonzero(a, eps=None))):
        z2 = f(sl)
        assert z2[3, 3] == pytest.approx(0.2, abs=1e-5)   # (+1σ)/5
        assert z2[2, 2] == pytest.approx(-0.2, abs=1e-5)  # (−1σ)/5
    for f in (lambda a: np.asarray(_zscore_nonzero_np(a)),
              lambda a: np.asarray(zscore_nonzero(a))):
        z3 = f(sl)
        assert abs(z3[3, 3]) < 1e-6  # std replaced by 1.0


def test_zscore_allzero_fallback():
    z = np.asarray(zscore_nonzero(np.zeros((8, 8), np.float32)))
    assert np.all(np.isfinite(z))
    np.testing.assert_allclose(z, 0.0, atol=1e-6)


def test_resize_bilinear_np_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    img = rng.normal(size=(37, 45)).astype(np.float32)
    ours = _resize_bilinear_np(img, (128, 128))
    theirs = (
        F.interpolate(
            torch.from_numpy(img)[None, None],
            size=(128, 128), mode="bilinear", align_corners=False,
        )[0, 0].numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_slice_dataset_2d(brats_root):
    ds = SliceDataset2D(brats_root, image_size=64)
    depth = 24
    zs = list(central_slice_range(depth))
    assert len(ds) == 3 * len(zs)
    s = ds[0]
    assert s["image"].shape == (64, 64, 1)
    assert s["image"].dtype == np.float32
    assert -1.0 <= s["image"].min() and s["image"].max() <= 1.0
    np.testing.assert_allclose(s["z_pos"], zs[0] / (depth - 1))


def test_multimodal_dataset_25d(brats_root):
    r = 2
    ds = MultiModalSliceDataset25D(brats_root, image_size=32, slice_radius=r)
    depth = 24
    zs = list(central_slice_range(depth, radius=r))
    assert len(ds) == 3 * len(zs)
    s = ds[0]
    assert s["image"].shape == (32, 32, 4)
    assert s["context"].shape == (32, 32, 4 * 2 * r)
    # context ordering: dz-major, modality-minor — channel 0 is t1 at dz=-r
    flair_path, z = ds.slice_tuples[0]
    t1 = nifti.load(str(flair_path).replace("_flair.nii.gz", "_t1.nii.gz"))
    from mrijax.data.datasets import preprocess_slice_np

    expected = preprocess_slice_np(t1[:, :, z - r], 32)
    np.testing.assert_allclose(s["context"][:, :, 0], expected, atol=1e-6)


def test_volume_dataset_3d(brats_root):
    ds = VolumeDataset3D(brats_root, patch_size=(32, 48, 48), random_crop=False)
    assert len(ds) == 3
    v = ds[0]["volume"]
    assert v.shape == (32, 48, 48, 4)
    assert np.isfinite(v).all()
    assert v.min() >= -1.0 and v.max() <= 1.0


def test_pack_and_packed_dataset(brats_root, tmp_path):
    out = tmp_path / "packed"
    index = pack_dataset(brats_root, out, image_size=48, use_device=False)
    assert len(index["files"]) == 3
    packed = PackedSliceDataset(out)
    raw = SliceDataset2D(brats_root, image_size=48)
    assert len(packed) == len(raw)
    a, b = packed[5], raw[5]
    np.testing.assert_allclose(a["image"], b["image"], atol=1e-5)
    np.testing.assert_allclose(a["z_pos"], b["z_pos"])


def test_device_and_host_preprocess_agree(brats_root, tmp_path):
    out_d = tmp_path / "packed_dev"
    out_h = tmp_path / "packed_host"
    pack_dataset(brats_root, out_d, image_size=48, use_device=True)
    pack_dataset(brats_root, out_h, image_size=48, use_device=False)
    a, b = PackedSliceDataset(out_d)[3], PackedSliceDataset(out_h)[3]
    np.testing.assert_allclose(a["image"], b["image"], atol=2e-5)


def test_batch_loader_shards_over_mesh(brats_root):
    from mrijax.parallel import make_mesh

    mesh = make_mesh(("data",))
    ds = SliceDataset2D(brats_root, image_size=32)
    loader = BatchLoader(ds, batch_size=8, mesh=mesh, seed=3)
    batches = list(loader)
    assert len(batches) == len(ds) // 8
    b = batches[0]
    assert b["image"].shape == (8, 32, 32, 1)
    assert len(b["image"].sharding.device_set) == jax.device_count()
    # epoch permutation changes order but not multiset
    loader.set_epoch(1)
    b1 = next(iter(loader))
    assert not np.allclose(np.asarray(b["image"]), np.asarray(b1["image"]))


def test_epoch_permutation_deterministic():
    np.testing.assert_array_equal(epoch_permutation(100, 3, 0), epoch_permutation(100, 3, 0))
    assert not np.array_equal(epoch_permutation(100, 3, 0), epoch_permutation(100, 4, 0))


def test_split_subjects_and_apply(tmp_path):
    src = tmp_path / "all"
    for i in range(10):
        (src / f"sub{i:02d}").mkdir(parents=True)
    splits = split_subjects([p for p in src.iterdir()], seed=42)
    assert len(splits["train"]) == 8 and len(splits["val"]) == 1 and len(splits["test"]) == 1
    out = tmp_path / "out"
    apply_split(src, out, seed=42, mode="symlink")
    assert (out / "splits" / "train.txt").read_text().count("\n") == 8
    assert len(list((out / "train").iterdir())) == 8
    with pytest.raises(ValueError):
        apply_split(src, src / "bad", seed=42)


def test_volume_split_indices_no_overlap():
    train, val, test = volume_split_indices(50, seed=42)
    assert len(set(train) | set(val) | set(test)) == 50
    assert not (set(train) & set(val)) and not (set(val) & set(test))


def test_cnifti_native_parity(brats_root):
    """Native C++ decoder is bit-identical to the numpy reader (skipped when
    the shared library isn't built: `make -C csrc`)."""
    from mrijax.data import cnifti

    if not cnifti.available():
        pytest.skip("libmrijax_io.so not built")
    paths = sorted(brats_root.rglob("*.nii.gz"))[:4]
    for p in paths:
        np.testing.assert_array_equal(cnifti.load(p), nifti.load(p))
    shape, hdr = cnifti.probe(paths[0])
    assert shape == nifti.load_header(paths[0]).shape
    batch = cnifti.load_batch(paths, num_threads=2)
    for b, p in zip(batch, paths):
        np.testing.assert_array_equal(b, nifti.load(p))
    with pytest.raises(IOError):
        cnifti.load(str(paths[0]) + ".missing")


def test_cnifti_rejects_corrupt_headers(tmp_path, brats_root):
    """Corrupt/adversarial NIfTI headers must come back as clean IOErrors
    from the native decoder — never an overread or a wild pointer (the
    payload-size check must bound the region by the DATATYPE's width and
    validate vox_offset; a ctypes crash would take down the whole serving
    process)."""
    import struct

    from mrijax.data import cnifti

    if not cnifti.available():
        pytest.skip("libmrijax_io.so not built")

    src = sorted(brats_root.rglob("*.nii.gz"))[0]
    base = bytearray(__import__("gzip").decompress(src.read_bytes()))

    def corrupt(name, mutate):
        buf = bytearray(base)
        mutate(buf)
        p = tmp_path / f"{name}.nii"
        p.write_bytes(bytes(buf))
        with pytest.raises(IOError):
            cnifti.load(p)

    # bad magic
    corrupt("magic", lambda b: struct.pack_into("<2s", b, 344, b"xx"))
    # negative spatial extent
    corrupt("negdim", lambda b: struct.pack_into("<h", b, 42, -5))
    # element-count overflow: 7 dims of 32767
    corrupt("overflow", lambda b: struct.pack_into(
        "<8h", b, 40, 7, *([32767] * 7)))
    # bitpix lies small while datatype stays float32 (4 bytes): the decode
    # must bound the payload by the datatype width, not bitpix
    corrupt("bitpix", lambda b: (
        struct.pack_into("<h", b, 72, 8),
        b.__setitem__(slice(352, len(b)), b[352:352 + (len(b) - 352) // 4]),
    ))
    # vox_offset far past the payload
    corrupt("voxoff", lambda b: struct.pack_into("<f", b, 108, 1e12))
    # unsupported datatype (128 = RGB24)
    corrupt("dtype", lambda b: struct.pack_into("<h", b, 70, 128))
    # truncated gzip stream
    gz = __import__("gzip").compress(bytes(base))
    p = tmp_path / "trunc.nii.gz"
    p.write_bytes(gz[: len(gz) // 2])
    with pytest.raises(IOError):
        cnifti.load(p)


def test_loader_propagates_producer_errors(brats_root):
    """Prefetch-thread exceptions must surface in the consumer."""
    ds = SliceDataset2D(brats_root, image_size=16)

    class _Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 0:
                raise RuntimeError("decode exploded")

    loader = BatchLoader(_Bad(), 4, prefetch=2)
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(loader)


def test_loader_drop_last_false_keeps_tail(brats_root):
    ds = SliceDataset2D(brats_root, image_size=16)
    n = len(ds)
    bs = 7
    loader = BatchLoader(ds, bs, drop_last=False, shuffle=False, prefetch=0)
    batches = list(loader)
    assert sum(b["image"].shape[0] for b in batches) == n
    assert batches[-1]["image"].shape[0] == n % bs or n % bs == 0


def test_loader_device_put_false_yields_host_numpy(brats_root):
    """device_put=False keeps batches as host numpy (no placement, no mesh
    sharding) — for host-side consumers and for measuring the host
    pipeline's production ceiling without enqueuing H2D transfers
    (bench.py --input-pipeline *_host_only). Values must match the placed
    loader's exactly (same permutation, same decode)."""
    import numpy as np

    ds = SliceDataset2D(brats_root, image_size=16)
    host = list(BatchLoader(ds, 4, shuffle=True, seed=5, prefetch=0,
                            device_put=False))
    placed = list(BatchLoader(ds, 4, shuffle=True, seed=5, prefetch=0))
    assert host and len(host) == len(placed)
    for hb, pb in zip(host, placed):
        for k in hb:
            assert isinstance(hb[k], np.ndarray)
            assert not isinstance(hb[k], jax.Array)
            assert isinstance(pb[k], jax.Array)
            np.testing.assert_array_equal(hb[k], np.asarray(pb[k]))


def test_take_subset_deterministic(brats_root):
    from mrijax.data import take_subset

    ds = SliceDataset2D(brats_root, image_size=16)
    a = take_subset(ds, fraction=0.5, seed=7)
    b = take_subset(ds, fraction=0.5, seed=7)
    assert len(a) == len(ds) // 2
    np.testing.assert_array_equal(a.indices, b.indices)


def test_volume_crop_seeded_per_epoch_and_index(brats_root):
    """Crops must be a pure function of (seed, epoch, index): reproducible
    across dataset instances (resume) and independent of decode order
    (multi-host)."""
    kw = dict(patch_size=(16, 16, 16), random_crop=True, seed=3)
    a = VolumeDataset3D(brats_root, **kw)
    b = VolumeDataset3D(brats_root, **kw)
    # same (epoch=0, idx) -> identical crop, regardless of access order
    _ = b[1]
    np.testing.assert_array_equal(a[0]["volume"], b[0]["volume"])
    # a different epoch draws a different crop (volume is larger than patch)
    a.set_epoch(1)
    assert not np.array_equal(a[0]["volume"], b[0]["volume"])
    # a fresh instance at the same epoch reproduces it
    b.set_epoch(1)
    np.testing.assert_array_equal(a[0]["volume"], b[0]["volume"])


def test_loader_propagates_set_epoch_through_views(brats_root):
    from mrijax.data import split_dataset

    ds = VolumeDataset3D(brats_root, patch_size=(16, 16, 16), random_crop=True)
    train, _ = split_dataset(ds, val_fraction=0.34, seed=0)
    loader = BatchLoader(train, 1, shuffle=False, drop_last=False, prefetch=0)
    loader.set_epoch(5)
    assert ds.epoch == 5


def test_loader_rejects_indivisible_multihost_batch(brats_root, monkeypatch):
    ds = SliceDataset2D(brats_root, image_size=16)
    # full batch indivisible by process count: refused at construction
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="not divisible by"):
        BatchLoader(ds, 8, shuffle=False, drop_last=True, prefetch=0)
    # ...and at iteration time if process_count changed post-construction
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    loader = BatchLoader(ds, 8, shuffle=False, drop_last=True, prefetch=0)
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    with pytest.raises(ValueError, match="not divisible by"):
        next(iter(loader))


def test_loader_trims_ragged_tail_multihost(brats_root, monkeypatch):
    """drop_last=False with a ragged final batch: every process owns the
    same number of rows (tail trimmed to a multiple of process_count, not a
    crash — the full batches are validated at construction instead)."""
    ds = SliceDataset2D(brats_root, image_size=16)
    n = len(ds)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    bs = 8
    loader = BatchLoader(ds, bs, shuffle=False, drop_last=False, prefetch=0)
    sizes = [b["image"].shape[0] for b in loader]
    # local rows per full batch = bs / 2; the tail is trimmed to a multiple
    tail = n % bs
    expected_full = n // bs
    assert sizes[:expected_full] == [bs // 2] * expected_full
    if tail >= 2:
        assert sizes[expected_full] == tail // 2
    else:
        assert len(sizes) == expected_full


def test_pack_volumes_bit_identical(brats_root, tmp_path):
    from mrijax.data import PackedVolumeDataset, pack_volumes

    out = tmp_path / "packed3d"
    index = pack_volumes(brats_root, out)
    assert index["kind"] == "volumes3d" and index["files"]

    direct = VolumeDataset3D(brats_root, patch_size=(16, 16, 16),
                             random_crop=True, seed=5)
    packed = PackedVolumeDataset(out, patch_size=(16, 16, 16),
                                 random_crop=True, seed=5)
    assert len(direct) == len(packed)
    for epoch in (0, 3):
        direct.set_epoch(epoch)
        packed.set_epoch(epoch)
        for i in range(len(direct)):
            np.testing.assert_array_equal(
                direct[i]["volume"], packed[i]["volume"]
            )
    # center-crop (val) path too
    d2 = VolumeDataset3D(brats_root, patch_size=(16, 16, 16), random_crop=False)
    p2 = PackedVolumeDataset(out, patch_size=(16, 16, 16), random_crop=False)
    np.testing.assert_array_equal(d2[0]["volume"], p2[0]["volume"])


def test_pack_multimodal_bit_identical(brats_root, tmp_path):
    from mrijax.data import PackedMultiModalDataset25D, pack_multimodal_slices

    out = tmp_path / "packed25d"
    index = pack_multimodal_slices(brats_root, out, image_size=16,
                                   use_device=False)
    assert index["kind"] == "multimodal25d"

    direct = MultiModalSliceDataset25D(brats_root, 16, slice_radius=1)
    packed = PackedMultiModalDataset25D(out, slice_radius=1)
    assert len(direct) == len(packed)
    assert packed.context_channels == direct.context_channels
    for i in (0, len(direct) // 2, len(direct) - 1):
        a, b = direct[i], packed[i]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["context"], b["context"])
        assert a["z_pos"] == b["z_pos"]


def test_pack_multimodal_device_host_agree(brats_root, tmp_path):
    from mrijax.data import pack_multimodal_slices

    a = pack_multimodal_slices(brats_root, tmp_path / "dev", image_size=16,
                               use_device=True)
    pack_multimodal_slices(brats_root, tmp_path / "host", image_size=16,
                           use_device=False)
    for f in a["files"]:
        with np.load(tmp_path / "dev" / f["path"]) as zd, \
             np.load(tmp_path / "host" / f["path"]) as zh:
            # same tolerance as the 2D device/host agreement test (fp32
            # reassociation in the jitted resize)
            np.testing.assert_allclose(zd["slices"], zh["slices"], atol=2e-5)
