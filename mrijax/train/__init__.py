"""Training runtime: state, jitted SPMD steps, schedules, early stopping."""

from mrijax.train.state import (
    TrainState,
    create_train_state,
    ema_update,
    inference_params,
    PlateauScheduler,
    EarlyStopper,
    get_learning_rate,
    set_learning_rate,
)
from mrijax.train.trainer import Trainer, TrainerResult
from mrijax.train.steps import (
    make_diffusion_train_step,
    make_diffusion_eval_step,
    make_vae_train_step,
    make_vae_eval_step,
    make_latent_diffusion_train_step,
    make_latent_diffusion_eval_step,
    make_cached_latent_train_step,
    make_cached_latent_eval_step,
    sample_timesteps,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "ema_update",
    "inference_params",
    "PlateauScheduler",
    "EarlyStopper",
    "get_learning_rate",
    "set_learning_rate",
    "make_diffusion_train_step",
    "make_diffusion_eval_step",
    "make_vae_train_step",
    "make_vae_eval_step",
    "make_latent_diffusion_train_step",
    "make_latent_diffusion_eval_step",
    "make_cached_latent_train_step",
    "make_cached_latent_eval_step",
    "sample_timesteps",
    "Trainer",
    "TrainerResult",
]
