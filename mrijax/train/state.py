"""Train state, plateau LR scheduling, early stopping.

The reference pairs Adam with ``ReduceLROnPlateau(factor=0.5, patience=3)``
and early stopping on validation loss with patience 4
(`slice_cond_2d_ddpm/model.py:126-132,237-265`). Here the optimizer is optax
Adam wrapped in ``inject_hyperparams`` so the learning rate is a leaf of the
optimizer state — the host-side ``PlateauScheduler`` updates it between
epochs without recompiling the train step.

bf16 note: compute dtype is bf16 inside the models; master params, optimizer
state, and losses are fp32, so no GradScaler machinery is needed (the
reference's 3D trainer already made the same choice with bf16 autocast,
`ddpm_3d_ldm/train.py:275`).
"""

from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState (params, tx, opt_state, step) + optional EMA
    shadow parameters.

    ↗ capability the reference lacks: an exponential moving average of the
    UNet weights, the standard variance-reduction trick for diffusion
    sample quality. When enabled (``TrainConfig.ema_decay``), the jitted
    train step updates the shadow tree in the same XLA program and
    checkpoints carry it; sampling/eval prefer it via
    ``inference_params``."""

    ema_params: Any = None


def make_adam(learning_rate: float) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def create_train_state(
    params, learning_rate: float, apply_fn=None, *, ema: bool = False
) -> TrainState:
    import jax

    # the shadow starts equal to params but must be a DISTINCT buffer:
    # donated train steps would otherwise donate the same buffer twice
    shadow = jax.tree.map(lambda a: jnp.array(a, copy=True), params) if ema else None
    return TrainState.create(
        apply_fn=apply_fn, params=params, tx=make_adam(learning_rate),
        ema_params=shadow,
    )


def ema_update(state: TrainState, decay: float) -> TrainState:
    """shadow ← decay·shadow + (1−decay)·params, inside jit (a pure
    tree_map — fuses into the train step's program)."""
    import jax

    if state.ema_params is None:
        return state
    new_ema = jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype),
        state.ema_params, state.params,
    )
    return state.replace(ema_params=new_ema)


def inference_params(state: TrainState):
    """The parameters to sample/evaluate with: the EMA shadow when
    tracked, else the raw params."""
    return state.params if state.ema_params is None else state.ema_params


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    hyper = dict(state.opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    opt_state = state.opt_state._replace(hyperparams=hyper)
    return state.replace(opt_state=opt_state)


@dataclass
class PlateauScheduler:
    """Host-side ReduceLROnPlateau (mode=min), reference parity:
    factor 0.5, patience 3."""

    factor: float = 0.5
    patience: int = 3
    min_lr: float = 0.0
    best: float = float("inf")
    num_bad: int = 0

    def update(self, val_loss: float, lr: float) -> float:
        if val_loss < self.best:
            self.best = val_loss
            self.num_bad = 0
            return lr
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr


@dataclass
class EarlyStopper:
    """Early stopping on val loss (reference patience 4,
    `slice_cond_2d_ddpm/model.py:36,237-251`)."""

    patience: int = 4
    best: float = float("inf")
    num_bad: int = 0
    improved: bool = False

    def update(self, val_loss: float) -> bool:
        """Returns True when training should stop."""
        self.improved = val_loss < self.best
        if self.improved:
            self.best = val_loss
            self.num_bad = 0
            return False
        self.num_bad += 1
        return self.num_bad >= self.patience
