"""Offline preprocessing into packed numpy shards (+ packed dataset).

The reference's offline path (`slice_cond_2d_ddpm/preprocess_data.py:10-136`)
saves one torch ``.pt`` per volume with ``{"slices": (N,1,S,S),
"z_pos": (N,)}``; its reader re-opens every file at init just to count
slices (`preprocessed_dataset.py:9-75`). Here:

* ``preprocess_volume_to_arrays`` — identical math (per-slice nonzero
  z-score → clip → bilinear resize → [-1,1]); the whole volume's slices are
  normalized and resized in one jitted, vmapped device call
  (``preprocess_slice_batch``) instead of a Python per-slice loop.
* ``pack_dataset`` — mirrors the source tree as ``.npz`` files and writes a
  single ``index.json`` (per-file slice counts), so dataset init is one
  JSON read instead of N file opens.
* ``PackedSliceDataset`` — map-style reader over the packed shards with an
  LRU of open arrays; yields the same sample dict as ``SliceDataset2D``.
"""

import json
from collections import OrderedDict
from pathlib import Path
from typing import Optional

import numpy as np

from mrijax.data import nifti
from mrijax.data.datasets import central_slice_range


def preprocess_volume_to_arrays(
    path, image_size: int = 128, *, use_device: bool = True
):
    """One volume → (slices (N, S, S) float32 in [-1,1], z_pos (N,))."""
    vol = nifti.load(path)  # (H, W, D)
    if vol.ndim != 3:
        raise ValueError(f"expected 3D volume, got {vol.shape} for {path}")
    depth = vol.shape[-1]
    zs = np.asarray(list(central_slice_range(depth)), dtype=np.int64)
    raw = np.moveaxis(vol[:, :, zs], -1, 0)  # (N, H, W)
    if use_device:
        from mrijax.data.preprocess import preprocess_slice_batch

        slices = np.asarray(preprocess_slice_batch(raw, image_size))
    else:
        from mrijax.data.datasets import preprocess_slice_np

        slices = np.stack([preprocess_slice_np(s, image_size) for s in raw])
    z_pos = (zs / (depth - 1)).astype(np.float32)
    return slices.astype(np.float32), z_pos


def pack_dataset(
    root_dir,
    output_dir,
    *,
    image_size: int = 128,
    modality_suffix: str = "_flair.nii.gz",
    use_device: bool = True,
) -> dict:
    """Preprocess every ``*{modality_suffix}`` under ``root_dir`` into
    mirrored ``.npz`` shards + ``index.json``. Returns the index."""
    root_dir, output_dir = Path(root_dir), Path(output_dir)
    paths = sorted(root_dir.rglob(f"*{modality_suffix}"))
    if not paths:
        raise RuntimeError(f"no volumes (*{modality_suffix}) under {root_dir}")
    index = {"image_size": image_size, "files": []}
    for p in paths:
        slices, z_pos = preprocess_volume_to_arrays(
            p, image_size, use_device=use_device
        )
        rel = p.relative_to(root_dir)
        out_path = (output_dir / rel).with_suffix("").with_suffix(".npz")
        out_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(out_path, slices=slices, z_pos=z_pos)
        index["files"].append(
            {"path": str(out_path.relative_to(output_dir)), "num_slices": int(len(z_pos))}
        )
    (output_dir / "index.json").write_text(json.dumps(index, indent=1))
    return index


class PackedSliceDataset:
    """Reader over ``pack_dataset`` output; same samples as ``SliceDataset2D``."""

    def __init__(self, packed_dir, cache_size: int = 4):
        self.packed_dir = Path(packed_dir)
        index_path = self.packed_dir / "index.json"
        if index_path.exists():
            index = json.loads(index_path.read_text())
            self.image_size = index.get("image_size")
            files = [(f["path"], f["num_slices"]) for f in index["files"]]
        else:  # fall back to scanning (reference reader behavior)
            files = []
            self.image_size = None
            for p in sorted(self.packed_dir.rglob("*.npz")):
                with np.load(p) as z:
                    files.append((str(p.relative_to(self.packed_dir)), len(z["z_pos"])))
        self.files = files
        self.index_tuples = [
            (fi, si) for fi, (_, n) in enumerate(files) for si in range(n)
        ]
        self._cache: "OrderedDict[int, dict]" = OrderedDict()
        self._cache_size = cache_size

    def __len__(self):
        return len(self.index_tuples)

    def _load(self, file_idx: int) -> dict:
        if file_idx in self._cache:
            self._cache.move_to_end(file_idx)
            return self._cache[file_idx]
        path = self.packed_dir / self.files[file_idx][0]
        with np.load(path) as z:
            data = {"slices": z["slices"], "z_pos": z["z_pos"]}
        self._cache[file_idx] = data
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return data

    def __getitem__(self, idx: int):
        file_idx, slice_idx = self.index_tuples[idx]
        data = self._load(file_idx)
        return {
            "image": data["slices"][slice_idx][:, :, None],
            "z_pos": np.float32(data["z_pos"][slice_idx]),
        }
