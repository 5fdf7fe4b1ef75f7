"""Orbax checkpointing with full train-state resume.

The reference only ever saves bare ``state_dict`` weights — no optimizer
state, epoch counter, or RNG — so "resume" does not exist there (training
always restarts from scratch; SURVEY.md §5). Here a checkpoint is the full
training snapshot:

* ``state``    — params + optimizer state + step (flax TrainState pytree),
* ``extra``    — host-side scalars (epoch, best val loss, early-stop /
  plateau counters, latent scale, RNG key), so a preempted run continues
  exactly where it stopped — the missing half of the reference's SIGUSR1
  graceful-shutdown story (`helpers/signals.py` + SLURM ``--signal``).

Policies: keep last N + always keep the best-by-val checkpoint (the
reference's best-val-only policy, `slice_cond_2d_ddpm/model.py:264-278`,
plus history). Under SPMD every process calls save with the same global
arrays; orbax handles the multi-host coordination.

``save_params_npz`` / ``load_params_npz`` provide a torch-free portable
single-file export (the ``.pt`` analog) for shipping weights to inference.
"""

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """(state, extra) checkpoints with two retention policies at once:

    * ``<dir>/``      — the last ``max_to_keep`` steps (for resume),
    * ``<dir>/best/`` — the single best-by-``best_key`` step (for
      inference/eval), tracked in ``<dir>/best.json``.

    Orbax's own best_fn retention keeps the best-N and *drops the latest*,
    which breaks resume — hence the split.
    """

    def __init__(
        self,
        directory,
        *,
        max_to_keep: int = 3,
        best_key: Optional[str] = "val_loss",
    ):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.best_key = best_key
        # The two managers save the SAME step number (a new best is also the
        # latest), and orbax derives its cross-process async-commit barrier
        # key from the step alone — without distinct prefixes the best-save
        # races the still-committing latest-save on multi-process runs and
        # dies with "Barrier _async_write_complete.N is already ongoing"
        # (found by tests/test_preemption_drill.py's real 2-process runs).
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    barrier_sync_key_prefix="latest"),
            ),
        )
        self._best_mgr = None
        if best_key:
            self._best_mgr = ocp.CheckpointManager(
                self.directory / "best",
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1,
                    multiprocessing_options=ocp.options.MultiprocessingOptions(
                        barrier_sync_key_prefix="best"),
                ),
            )

    def _best_record(self) -> dict:
        p = self.directory / "best.json"
        if p.exists():
            try:
                return json.loads(p.read_text())
            except json.JSONDecodeError:
                # a pre-atomic-write crash may have left a truncated file;
                # treat as "no record" rather than poisoning every
                # subsequent save/restore
                return {}
        return {}

    def save(self, step: int, state, extra: Optional[dict] = None, metrics: Optional[dict] = None):
        # extra is always saved (possibly empty) so restore() can always
        # request it — a checkpoint without the item would make the
        # Composite restore raise instead of returning None
        args = {
            "state": ocp.args.StandardSave(state),
            "extra": ocp.args.JsonSave(_jsonify(extra or {})),
        }
        self._mgr.save(step, args=ocp.args.Composite(**args))
        metrics = metrics or {}
        if self._best_mgr and self.best_key in metrics:
            val = float(metrics[self.best_key])
            rec = self._best_record()
            # best.json is host 0's file, rewritten AFTER the collective
            # best-save completes — a faster non-zero rank can read a stale
            # copy at the next epoch and take a different branch into the
            # collective save (deadlock). Broadcast host 0's view so every
            # process makes the identical decision.
            from mrijax.parallel.multihost import broadcast_from_host0

            prev = broadcast_from_host0(
                rec["value"] if rec else float("inf"))
            if val < prev:
                # the orbax save is a collective — every process enters it;
                # the tracking file is host 0's alone, written atomically
                # (tmp + rename) so a preemption kill mid-write cannot
                # leave truncated JSON
                self._best_mgr.save(step, args=ocp.args.Composite(**args))
                self._best_mgr.wait_until_finished()
                if jax.process_index() == 0:
                    p = self.directory / "best.json"
                    tmp = p.with_suffix(".json.tmp")
                    tmp.write_text(json.dumps({"step": step, "value": val}))
                    os.replace(tmp, p)

    def wait(self):
        self._mgr.wait_until_finished()
        if self._best_mgr:
            self._best_mgr.wait_until_finished()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    @property
    def best_step(self) -> Optional[int]:
        rec = self._best_record()
        return rec.get("step")

    def restore(self, state_template, step: Optional[int] = None, *, best: bool = False):
        """Restore (state, extra). ``state_template`` is an abstract or
        concrete pytree with the target structure/shardings. ``best=True``
        loads the best-by-val checkpoint instead of the latest."""
        mgr = self._best_mgr if best else self._mgr
        if best and mgr is None:
            raise ValueError("no best-checkpoint tracking configured")
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                extra=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored.get("extra")

    def restore_host(self, step: Optional[int] = None, *, best: bool = False):
        """Topology-agnostic restore: (state, extra) with every array leaf
        as a host ``numpy`` array, regardless of the process/device mesh the
        checkpoint was saved under.

        ``restore(None)`` reuses the *saved* shardings, so a checkpoint
        written by an N-process run cannot be opened by an M-process tool —
        orbax refuses with "available devices are different". This is the
        ``torch.load(map_location='cpu')`` analog the reference relies on
        everywhere (e.g. `evaluate_models.py` loading cluster-trained
        ``.pt`` files on a single eval GPU): read the checkpoint's own
        shape/dtype metadata, build a single-device target template, and
        let orbax re-shard into it. Use for inspection, eval, and
        cross-topology migration; same-topology resume should keep using
        :meth:`restore` with a properly sharded template.
        """
        base = self.directory / "best" if best else self.directory
        mgr = ocp.CheckpointManager(
            base,
            item_handlers={
                "state": ocp.StandardCheckpointHandler(),
                "extra": ocp.JsonCheckpointHandler(),
            },
        )
        try:
            step = mgr.latest_step() if step is None else step
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {base}")
            meta = mgr.item_metadata(step)["state"]
            sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
            template = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                               sharding=sharding),
                meta,
            )
            restored = mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(template),
                    extra=ocp.args.JsonRestore(),
                ),
            )
        finally:
            mgr.close()
        state = jax.tree.map(np.asarray, restored["state"])
        return state, restored.get("extra")

    def close(self):
        self._mgr.close()
        if self._best_mgr:
            self._best_mgr.close()


def _jsonify(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, (np.floating, np.integer)):
            v = v.item()
        elif isinstance(v, jax.Array):
            v = np.asarray(v).tolist()
        out[k] = v
    return out


def save_params_npz(path, params: Any, meta: Optional[dict] = None) -> None:
    """Portable single-file weight export: flattened pytree → npz, with the
    tree structure (and optional model config) in a JSON sidecar entry."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {}
    keys = []
    for i, (kpath, leaf) in enumerate(flat):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kpath)
        keys.append(name)
        arrays[f"arr_{i}"] = np.asarray(leaf)
    arrays["__keys__"] = np.asarray(json.dumps({"keys": keys, "meta": meta or {}}))
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **arrays)


def load_params_npz(path):
    """Returns (params_as_nested_dict, meta)."""
    with np.load(path, allow_pickle=False) as z:
        info = json.loads(str(z["__keys__"]))
        leaves = [z[f"arr_{i}"] for i in range(len(info["keys"]))]
    params: dict = {}
    for name, leaf in zip(info["keys"], leaves):
        node = params
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return params, info["meta"]
