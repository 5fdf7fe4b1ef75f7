"""Preemption: the trainer stops cleanly mid-epoch, checkpoints, skips the
validation pass, and resumes from the saved state."""

import numpy as np

import jax
import jax.numpy as jnp

from mrijax.io import CheckpointManager
from mrijax.obs import reset_termination
from mrijax.obs.signals import _handler
from mrijax.train import Trainer, create_train_state


class _ToyLoader:
    """8 batches of (B, 4) data; set_epoch tracked."""

    def __init__(self, n=8):
        self.n = n
        self.batch_size = 2
        self.epochs_seen = []

    def set_epoch(self, e):
        self.epochs_seen.append(e)

    def __len__(self):
        return self.n

    def __iter__(self):
        rng = np.random.default_rng(0)
        for _ in range(self.n):
            yield {"x": jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))}


def _steps():
    import flax.linen as nn

    model = nn.Dense(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

    def train_step(state, batch, key):
        def loss_fn(p):
            return jnp.mean(model.apply(p, batch["x"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    def eval_step(params, batch, key):
        return jnp.mean(model.apply(params, batch["x"]) ** 2)

    return params, train_step, eval_step


def test_preemption_checkpoints_and_skips_validation(tmp_path):
    reset_termination()
    params, train_step, eval_step = _steps()
    state = create_train_state(params, 1e-2)

    eval_calls = []

    def counting_eval(p, b, k):
        eval_calls.append(1)
        return eval_step(p, b, k)

    loader = _ToyLoader()

    class _PreemptingLoader(_ToyLoader):
        def __iter__(self):
            it = super().__iter__()
            for i, b in enumerate(it):
                if i == 3:
                    _handler(10, None)  # simulate SIGUSR1 delivery
                yield b

    mgr = CheckpointManager(tmp_path / "ck")
    trainer = Trainer(
        train_step=train_step, eval_step=counting_eval,
        train_loader=_PreemptingLoader(), val_loader=loader,
        checkpoint_manager=mgr, epochs=5, seed=0,
    )
    result = trainer.fit(state)
    assert result.preempted
    assert result.epochs_run == 1          # stopped in the first epoch
    assert eval_calls == []                # validation skipped
    assert mgr.latest_step is not None     # checkpoint written
    reset_termination()

    # resume RE-RUNS the interrupted epoch: its remaining batches were
    # never trained, so the epoch counter must not have advanced past it
    trainer2 = Trainer(
        train_step=train_step, eval_step=counting_eval,
        train_loader=_ToyLoader(), val_loader=_ToyLoader(),
        checkpoint_manager=CheckpointManager(tmp_path / "ck"),
        epochs=2, seed=0,
    )
    result2 = trainer2.fit(result.state)
    assert not result2.preempted
    assert trainer2.start_epoch == 0       # interrupted epoch repeats
    assert result2.epochs_run == 2         # both epochs fully trained
    mgr.close()


def test_preemption_does_not_pollute_best_checkpoint(tmp_path):
    """A preempted epoch skips validation; its train-loss fallback must not
    enter the best-by-val tracker (a low train loss would otherwise
    overwrite best/ with a never-validated state)."""
    reset_termination()
    params, train_step, eval_step = _steps()
    state = create_train_state(params, 1e-2)

    def high_eval(p, b, k):
        return jnp.asarray(1.0)  # real validation says "bad"

    def low_train(state, batch, key):
        new_state, _ = train_step(state, batch, key)
        return new_state, jnp.asarray(1e-4)  # train loss looks great

    mgr = CheckpointManager(tmp_path / "ck")
    t1 = Trainer(
        train_step=low_train, eval_step=high_eval,
        train_loader=_ToyLoader(), val_loader=_ToyLoader(),
        checkpoint_manager=mgr, epochs=1, seed=0,
    )
    r1 = t1.fit(state)
    best_before = mgr.best_step
    assert best_before is not None

    class _PreemptingLoader(_ToyLoader):
        def __iter__(self):
            for i, b in enumerate(super().__iter__()):
                if i == 2:
                    _handler(10, None)
                yield b

    t2 = Trainer(
        train_step=low_train, eval_step=high_eval,
        train_loader=_PreemptingLoader(), val_loader=_ToyLoader(),
        checkpoint_manager=CheckpointManager(tmp_path / "ck"), epochs=3, seed=0,
    )
    r2 = t2.fit(r1.state)
    assert r2.preempted
    assert mgr.best_step == best_before  # best/ untouched by the fallback
    mgr.close()
    reset_termination()


def test_eval_step_receives_per_epoch_batch_index(tmp_path):
    """eval_step(..., batch_index=i) gets the index within the epoch's val
    pass, restarting at 0 every epoch (fixed-timestep grid alignment,
    ddpm_3d_ldm/train.py:446-458)."""
    reset_termination()
    params, train_step, eval_step = _steps()
    state = create_train_state(params, 1e-2)
    seen = []

    def indexed_eval(p, b, k, batch_index=0):
        seen.append(batch_index)
        return eval_step(p, b, k)

    trainer = Trainer(
        train_step=train_step, eval_step=indexed_eval,
        train_loader=_ToyLoader(n=2), val_loader=_ToyLoader(n=3),
        epochs=2, seed=0,
    )
    trainer.fit(state)
    assert seen == [0, 1, 2, 0, 1, 2]


def test_epoch_boundary_resume_reproduces_uninterrupted_run(tmp_path):
    """Stop after epoch 1, resume to epoch 2: final params must equal the
    uninterrupted 3-epoch run. Pins the per-(seed, epoch, step) key
    derivation — sequential key splitting would replay epoch-0 draws after
    resume and diverge."""
    import flax.linen as nn

    reset_termination()
    model = nn.Dense(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

    def train_step(state, batch, key):
        noise = jax.random.normal(key, batch["x"].shape) * 0.1

        def loss_fn(p):
            return jnp.mean(model.apply(p, batch["x"] + noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    def eval_step(params, batch, key):
        return jnp.mean(model.apply(params, batch["x"]) ** 2)

    def sgd_state():
        return create_train_state(params, 1e-2)

    def fit(ckpt_dir, epochs, state):
        mgr = CheckpointManager(ckpt_dir)
        tr = Trainer(
            train_step=train_step, eval_step=eval_step,
            train_loader=_ToyLoader(), val_loader=_ToyLoader(2),
            checkpoint_manager=mgr, epochs=epochs, seed=7,
        )
        res = tr.fit(state)
        mgr.close()
        return res.state

    straight = fit(tmp_path / "a", 3, sgd_state())
    partial = fit(tmp_path / "b", 2, sgd_state())
    resumed = fit(tmp_path / "b", 3, partial)  # restores epoch 0-1, runs 2
    for a, b in zip(jax.tree.leaves(straight.params), jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_last_step_preemption_keeps_epoch_complete(tmp_path):
    """A flag that fires on the epoch's LAST training step leaves no
    untrained remainder: the epoch must checkpoint as complete (resume
    continues at epoch+1 — re-running it would double-apply every gradient
    step), and its validation must run so the scheduler/early-stop/best
    trajectory matches the uninterrupted run."""
    import flax.linen as nn

    reset_termination()
    model = nn.Dense(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

    def train_step(state, batch, key):
        noise = jax.random.normal(key, batch["x"].shape) * 0.1

        def loss_fn(p):
            return jnp.mean(model.apply(p, batch["x"] + noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    eval_calls = []

    def eval_step(params, batch, key):
        eval_calls.append(1)
        return jnp.mean(model.apply(params, batch["x"]) ** 2)

    class _LastStepPreempt(_ToyLoader):
        def __iter__(self):
            for i, b in enumerate(super().__iter__()):
                if i == self.n - 1:
                    _handler(10, None)  # lands during the final step
                yield b

    def fit(ckpt_dir, epochs, state, loader_cls=_ToyLoader):
        mgr = CheckpointManager(ckpt_dir)
        tr = Trainer(
            train_step=train_step, eval_step=eval_step,
            train_loader=loader_cls(4), val_loader=_ToyLoader(2),
            checkpoint_manager=mgr, epochs=epochs, seed=7,
        )
        res = tr.fit(state)
        mgr.close()
        return res

    def sgd_state():
        return create_train_state(params, 1e-2)

    straight = fit(tmp_path / "a", 2, sgd_state()).state

    res = fit(tmp_path / "b", 2, sgd_state(), _LastStepPreempt)
    assert res.preempted
    assert res.epochs_run == 1
    assert eval_calls, "full-epoch preemption must still validate"
    reset_termination()

    resumed = fit(tmp_path / "b", 2, res.state)
    # the interrupted epoch was fully trained: resume must NOT re-run it
    assert not resumed.preempted
    assert resumed.epochs_run == 1  # only epoch 1 remained
    for a, b in zip(jax.tree.leaves(straight.params),
                    jax.tree.leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_edge_preemption_validates_and_resume_matches(tmp_path):
    """A flag noticed at the epoch boundary (after every step ran) keeps
    the epoch complete AND runs its validation — skipping it would
    permanently drop that epoch's scheduler/best updates (resume starts at
    epoch+1) and diverge the LR/early-stop trajectory from the
    uninterrupted run."""
    import flax.linen as nn

    reset_termination()
    model = nn.Dense(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

    def train_step(state, batch, key):
        noise = jax.random.normal(key, batch["x"].shape) * 0.1

        def loss_fn(p):
            return jnp.mean(model.apply(p, batch["x"] + noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    def eval_step(params, batch, key):
        return jnp.mean(model.apply(params, batch["x"]) ** 2)

    class _EdgeLoader(_ToyLoader):
        def __iter__(self):
            yield from super().__iter__()
            _handler(10, None)  # lands after the last batch was consumed

    def fit(ckpt_dir, epochs, state, loader_cls=_ToyLoader):
        mgr = CheckpointManager(ckpt_dir)
        tr = Trainer(
            train_step=train_step, eval_step=eval_step,
            train_loader=loader_cls(4), val_loader=_ToyLoader(2),
            checkpoint_manager=mgr, epochs=epochs, seed=7,
            # tight patience: the preempted epoch's validation must feed the
            # schedulers for the resumed trajectory to match
            plateau_patience=1, early_stop_patience=3,
        )
        res = tr.fit(state)
        stop_state = (tr.stopper.best, tr.stopper.num_bad,
                      tr.scheduler.best, tr.scheduler.num_bad)
        mgr.close()
        return res, stop_state

    def sgd_state():
        return create_train_state(params, 1e-2)

    (straight, straight_sched) = fit(tmp_path / "a", 3, sgd_state())

    res, sched_after_preempt = fit(tmp_path / "b", 3, sgd_state(), _EdgeLoader)
    assert res.preempted
    # the epoch validated: scheduler/stopper saw exactly one val loss
    assert sched_after_preempt[0] != float("inf")
    reset_termination()

    resumed, resumed_sched = fit(tmp_path / "b", 3, res.state)
    assert not resumed.preempted
    assert resumed.epochs_run == 2  # epochs 1-2; epoch 0 not re-run
    assert resumed_sched == straight_sched
    for a, b in zip(jax.tree.leaves(straight.state.params),
                    jax.tree.leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_preemption_at_early_stop_boundary_persists_stop(tmp_path):
    """A preemption landing at the same epoch boundary where early stop
    triggered must not mask the stop decision: the result reports both,
    the checkpoint records stopped_early, and resume trains NOTHING — the
    uninterrupted run stopped there, so training any further epoch would
    advance latest/ past the stop point and break trajectory parity."""
    import flax.linen as nn

    reset_termination()
    model = nn.Dense(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

    def train_step(state, batch, key):
        def loss_fn(p):
            return jnp.mean(model.apply(p, batch["x"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    def eval_step(params, batch, key):
        return jnp.float32(1.0)  # never improves -> stop at epoch 1

    class _PreemptEpoch1Last(_ToyLoader):
        def __iter__(self):
            epoch = self.epochs_seen[-1]
            for i, b in enumerate(super().__iter__()):
                if epoch == 1 and i == self.n - 1:
                    _handler(10, None)
                yield b

    def fit(ckpt_dir, state, loader_cls=_ToyLoader):
        mgr = CheckpointManager(ckpt_dir)
        tr = Trainer(
            train_step=train_step, eval_step=eval_step,
            train_loader=loader_cls(4), val_loader=_ToyLoader(2),
            checkpoint_manager=mgr, epochs=4, seed=7,
            early_stop_patience=1,
        )
        res = tr.fit(state)
        mgr.close()
        return res

    def sgd_state():
        return create_train_state(params, 1e-2)

    straight = fit(tmp_path / "a", sgd_state())
    assert straight.stopped_early and straight.epochs_run == 2

    res = fit(tmp_path / "b", sgd_state(), _PreemptEpoch1Last)
    assert res.preempted
    assert res.stopped_early  # not masked by the preempted break
    assert res.epochs_run == 2
    reset_termination()

    resumed = fit(tmp_path / "b", res.state)
    assert resumed.stopped_early
    assert resumed.epochs_run == 0  # the run had already stopped
    for a, b in zip(jax.tree.leaves(straight.state.params),
                    jax.tree.leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_preempt_val_budget_abandons_validation(tmp_path):
    """The grace-window validation is wall-clock-capped: with a zero
    budget the val pass is abandoned before its first batch (the SIGKILL
    must never land before the checkpoint), the schedulers see no val
    signal, and the fully-trained epoch still checkpoints as complete —
    resume continues at epoch+1 without re-applying it."""
    import flax.linen as nn

    reset_termination()
    model = nn.Dense(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

    def train_step(state, batch, key):
        def loss_fn(p):
            return jnp.mean(model.apply(p, batch["x"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    eval_calls = []

    def eval_step(params, batch, key):
        eval_calls.append(1)
        return jnp.mean(model.apply(params, batch["x"]) ** 2)

    class _LastStepPreempt(_ToyLoader):
        def __iter__(self):
            for i, b in enumerate(super().__iter__()):
                if i == self.n - 1:
                    _handler(10, None)
                yield b

    def fit(ckpt_dir, epochs, state, loader_cls=_ToyLoader, budget=0.0):
        mgr = CheckpointManager(ckpt_dir)
        tr = Trainer(
            train_step=train_step, eval_step=eval_step,
            train_loader=loader_cls(4), val_loader=_ToyLoader(2),
            checkpoint_manager=mgr, epochs=epochs, seed=7,
            preempt_val_budget_s=budget,
        )
        res = tr.fit(state)
        mgr.close()
        return res

    def sgd_state():
        return create_train_state(params, 1e-2)

    straight = fit(tmp_path / "a", 2, sgd_state()).state
    eval_calls.clear()

    res = fit(tmp_path / "b", 2, sgd_state(), _LastStepPreempt)
    assert res.preempted
    assert res.epochs_run == 1
    assert not eval_calls, "zero budget must abandon val before batch 0"
    assert res.best_val_loss == float("inf")  # stopper saw nothing
    reset_termination()

    resumed = fit(tmp_path / "b", 2, res.state)
    assert not resumed.preempted
    assert resumed.epochs_run == 1  # epoch 0 complete; only epoch 1 ran
    for a, b in zip(jax.tree.leaves(straight.params),
                    jax.tree.leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
