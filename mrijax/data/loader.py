"""Batching, epoch shuffling, and device prefetch (torch-DataLoader-free).

Replaces the reference's ``DataLoader(num_workers=4, pin_memory=True)`` +
``DistributedSampler`` stack (`slice_cond_2d_ddpm/model.py:84-98`,
`ddpm_3d_ldm/train.py:169-177`) with a TPU-native path:

* a seeded global permutation per epoch (``set_epoch`` semantics match
  ``DistributedSampler.set_epoch`` — same data order on every host);
* multi-host sharding: each process materializes only its slice of the
  global batch and ``shard_batch`` assembles the global device array
  (`jax.make_array_from_process_local_data`);
* a background prefetch thread keeps ``prefetch`` batches ahead, with
  device placement (the H2D copy) overlapped with the train step — the
  role pin_memory + workers play in torch;
* worker-side decode/preprocess is plain numpy in the thread; the heavy
  normalization math can instead run jitted on device via
  ``mrijax.data.preprocess`` when using packed shards.
"""

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np

from mrijax.parallel.mesh import shard_batch


def epoch_permutation(n: int, epoch: int, seed: int = 0) -> np.ndarray:
    """Deterministic per-epoch shuffle shared by all hosts
    (``DistributedSampler`` parity: generator seeded with seed+epoch)."""
    return np.random.default_rng(seed + epoch).permutation(n)


def _stack_batch(samples):
    out = {}
    for key in samples[0]:
        out[key] = np.stack([s[key] for s in samples], axis=0)
    return out


class BatchLoader:
    """Iterates a map-style dataset in global batches.

    Yields pytrees of device arrays. With a ``mesh``, batches are sharded on
    the leading axis over the mesh's ``data`` axis; without one, plain
    ``device_put``. Multi-host: only indices belonging to this process are
    decoded (process p takes rows [p·B/P, (p+1)·B/P) of each global batch).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        mesh=None,
        prefetch: int = 2,
        transform=None,
        device_put: bool = True,
    ):
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        pc = jax.process_count()
        if pc > 1 and batch_size % pc:
            raise ValueError(
                f"batch_size {batch_size} is not divisible by "
                f"process_count={pc}; every process must own the same "
                "number of rows of each global batch"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.mesh = mesh
        self.prefetch = prefetch
        self.transform = transform
        # device_put=False yields host numpy batches (no mesh sharding, no
        # placement) — for host-side consumers and for measuring the host
        # pipeline's production ceiling without enqueuing H2D transfers
        # (bench.py --input-pipeline's *_host_only rungs)
        self.device_put = device_put
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        # propagate to datasets with per-epoch state (e.g. VolumeDataset3D
        # crop seeding) — including through subset/split views
        ds = self.dataset
        seen = set()
        while ds is not None and id(ds) not in seen:
            seen.add(id(ds))
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)
            ds = getattr(ds, "dataset", None)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        full, tail = divmod(n, self.batch_size)
        pc = jax.process_count()
        if pc > 1:
            tail = (tail // pc) * pc  # the ragged tail is trimmed per-host
        return full + (1 if tail else 0)

    def _global_batches(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        idx = (
            epoch_permutation(n, self.epoch, self.seed)
            if self.shuffle
            else np.arange(n)
        )
        nb = len(self)
        pc = jax.process_count()
        for b in range(nb):
            chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if pc > 1 and len(chunk) % pc:
                if len(chunk) == self.batch_size:
                    # defense-in-depth: a FULL batch can only be indivisible
                    # if process_count changed after construction
                    raise ValueError(
                        f"global batch of {len(chunk)} rows is not divisible "
                        f"by process_count={pc}; pick a batch size that is a "
                        "multiple of the process count (rows would otherwise "
                        "be dropped silently)"
                    )
                # ragged FINAL batch (drop_last=False): trim to a multiple of
                # the process count so every host owns equal rows
                dropped = len(chunk) % pc
                chunk = chunk[: len(chunk) - dropped]
                if dropped and jax.process_index() == 0:
                    print(
                        f"[loader] multi-host: dropping {dropped} tail row(s) "
                        f"of the final ragged batch (not divisible by "
                        f"process_count={pc})"
                    )
            if len(chunk) == 0:
                break
            yield chunk

    def _local_rows(self, chunk: np.ndarray) -> np.ndarray:
        pc, pi = jax.process_count(), jax.process_index()
        if pc == 1:
            return chunk
        per = len(chunk) // pc  # always exact (see _global_batches)
        return chunk[pi * per : (pi + 1) * per]

    def _materialize(self, chunk: np.ndarray):
        samples = [self.dataset[int(i)] for i in self._local_rows(chunk)]
        batch = _stack_batch(samples)
        if self.transform is not None:
            batch = self.transform(batch)
        if not self.device_put:
            return batch
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return jax.tree.map(jax.device_put, batch)

    def __iter__(self):
        if self.prefetch <= 0:
            for chunk in self._global_batches():
                yield self._materialize(chunk)
            return

        # Bounded prefetch with a clean-shutdown contract: the consumer may
        # abandon iteration at any point (debug_max_steps, preemption, an
        # exception in train_step) — the generator's finally block then sets
        # the stop event and DRAINS the queue so the producer's blocked
        # q.put wakes up, sees the event, and exits instead of leaking a
        # thread that pins `prefetch` materialized device batches forever.
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        error = []

        def producer():
            try:
                for chunk in self._global_batches():
                    item = self._materialize(chunk)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surfaced in the consumer
                error.append(e)
            finally:
                while not stop.is_set():  # consumer stops on event otherwise
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
            t.join()
            if error:
                raise error[0]
        finally:
            stop.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            try:
                t.join(timeout=5.0)
            except TypeError:
                # generator finalized during interpreter shutdown:
                # threading internals are already torn down and join()'s
                # machinery is gone; the daemon thread dies with the process
                pass


class _IndexView:
    """Read-only view of a dataset through an index array (shared by
    ``take_subset`` and ``split_dataset``; ``BatchLoader.set_epoch``
    propagates through the ``dataset`` attribute)."""

    def __init__(self, ds, indices):
        self.dataset = ds
        self.indices = indices

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[int(self.indices[i])]


def take_subset(dataset, fraction: Optional[float] = None, max_items: Optional[int] = None, seed: int = 42):
    """Deterministic random subset view (the reference trains on ⅓ / ¼ of all
    slices via ``torch.utils.data.Subset`` — `slice_cond_2d_ddpm/model.py:74-77`)."""

    n = len(dataset)
    k = n
    if fraction is not None:
        k = int(n * fraction)
    if max_items is not None:
        k = min(k, max_items)
    idx = np.random.default_rng(seed).permutation(n)[:k]
    return _IndexView(dataset, idx)


def split_dataset(dataset, val_fraction: float = 0.1, seed: int = 0):
    """Random train/val split of a map-style dataset
    (reference ``random_split`` with fixed generator, model.py:79-82)."""
    n = len(dataset)
    idx = np.random.default_rng(seed).permutation(n)
    n_val = int(n * val_fraction)
    val_idx, train_idx = idx[:n_val], idx[n_val:]
    return _IndexView(dataset, train_idx), _IndexView(dataset, val_idx)
