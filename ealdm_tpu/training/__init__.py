"""Training layer: pjit train loop, EMA, LR schedules, checkpointing."""

from .ema import EmaState, ema_init, ema_update
from .lr_scheduler import (
    build_scheduler,
    warmup_cosine,
    warmup_cosine_cyclic,
    warmup_linear_cyclic,
)
from .trainer import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from .vae_trainer import (
    VAETrainState,
    init_vae_train_state,
    make_vae_eval_step,
    make_vae_train_step,
)

__all__ = [
    "EmaState",
    "ema_init",
    "ema_update",
    "build_scheduler",
    "warmup_cosine",
    "warmup_cosine_cyclic",
    "warmup_linear_cyclic",
    "TrainState",
    "init_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "VAETrainState",
    "init_vae_train_state",
    "make_vae_eval_step",
    "make_vae_train_step",
]
