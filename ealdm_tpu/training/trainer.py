"""pjit training loop for LatentDiffusion (data-parallel over the mesh).

TPU-native replacement for the reference's Lightning orchestration
(`/root/reference/main.py` + `ddpm.py` configure_optimizers/training_step):
  * AdamW over UNet (+ cond tower when trainable, + logvar when learned)
    (`ddpm.py:1409-1431`), with the frozen first stage masked out of the
    optimizer (the reference freezes via requires_grad, `ddpm.py:507-512`).
  * EMA update fused into the jitted step (`ddpm.py:370-372` equivalent).
  * LR schedule as an optax multiplier schedule (`ldm/lr_scheduler.py`).
  * Gradient all-reduce emitted by the compiler from batch sharding — the
    NCCL layer of the reference does not exist here.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ddpm import LatentDiffusion
from .ema import EmaState, ema_init, ema_update


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema: Optional[EmaState]

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state, self.ema), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def _trainable_mask(params: Any, frozen_prefixes: Tuple[str, ...]) -> Any:
    """Label tree: 'train' everywhere except subtrees rooted at frozen names."""

    def walk(tree, path):
        if isinstance(tree, (dict, FrozenDict)):
            return {
                k: walk(v, path + (k,)) for k, v in tree.items()
            }
        frozen = path and path[0] in frozen_prefixes
        return "frozen" if frozen else "train"

    return walk(params, ())


def make_optimizer(
    learning_rate: float,
    params: Any,
    schedule_fn: Optional[Callable] = None,
    frozen_prefixes: Tuple[str, ...] = ("first_stage_model",),
    weight_decay: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
    accumulate_grad_batches: int = 1,
) -> optax.GradientTransformation:
    if schedule_fn is not None:
        lr = lambda step: learning_rate * schedule_fn(step)
    else:
        lr = learning_rate
    adamw = optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay)
    labels = _trainable_mask(params, frozen_prefixes)
    opt = optax.multi_transform(
        {"train": adamw, "frozen": optax.set_to_zero()}, labels
    )
    if accumulate_grad_batches > 1:
        # Lightning accumulate_grad_batches semantics: apply every k steps
        opt = optax.MultiSteps(opt, every_k_schedule=accumulate_grad_batches)
    return opt


def init_train_state(
    model: LatentDiffusion,
    rng: jax.Array,
    example_batch: Dict[str, Any],
    optimizer: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-6,
    use_ema: bool = True,
    ema_decay: float = 0.9999,
) -> Tuple[TrainState, optax.GradientTransformation]:
    init_rng, loss_rng = jax.random.split(rng)
    init_method = getattr(model, "full_init", None)

    # jit the whole init: one compiled program instead of op-by-op dispatch
    # (critical on tunnelled-TPU hosts where per-op latency dominates).
    @jax.jit
    def _init(init_rng, loss_rng):
        return model.init(
            {"params": init_rng, "dropout": loss_rng},
            example_batch,
            loss_rng,
            method=init_method,
        )

    variables = _init(init_rng, loss_rng)
    params = variables["params"]
    if optimizer is None:
        optimizer = make_optimizer(learning_rate, params)
    opt_state = optimizer.init(params)
    ema = ema_init(params, decay=ema_decay) if use_ema else None
    return (
        TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state, ema=ema),
        optimizer,
    )


def _donation_supported() -> bool:
    """Buffer donation is required to fit the 478M-param train state twice
    (in+out) in HBM; it works on current axon relays (validated round 2 —
    an earlier relay rejected it with INVALID_ARGUMENT). EALDM_NO_DONATION=1
    is the escape hatch for backends where it still fails."""
    import os

    return os.environ.get("EALDM_NO_DONATION", "0") != "1"


def make_train_step(
    model: LatentDiffusion,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    remat: str = "dots",
):
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    With a mesh, the batch is sharded on `data` and params replicated (or
    TP-sharded via parallel.sharding); the grad psum is compiler-emitted.

    remat: rematerialisation policy for the backward — the TPU-native
    replacement for the reference's per-module `use_checkpoint` torch
    checkpoint wrappers (reference openaimodel.py:197-203).
      "dots"  (default) keep matmul/attention outputs, recompute the conv
              and elementwise chains (HBM-bound parts trade for MXU FLOPs);
      "full"  recompute everything (minimum memory);
      "none"  store all residuals.
    """
    assert remat in ("none", "dots", "full")
    donate = donate and _donation_supported()

    def loss_fn(params, batch, rng):
        loss, metrics = model.apply(
            {"params": params},
            batch,
            rng,
            train=True,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
        )
        return loss, metrics

    if remat == "dots":
        loss_fn = jax.checkpoint(
            loss_fn, policy=jax.checkpoint_policies.dots_saveable
        )
    elif remat == "full":
        loss_fn = jax.checkpoint(
            loss_fn, policy=jax.checkpoint_policies.nothing_saveable
        )

    def step_fn(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params) if state.ema is not None else None
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema
        )
        return new_state, metrics

    # Single-device: plain jit (the axon tunnelled-TPU backend rejects SPMD
    # executables; there is nothing to partition anyway). Multi-device: pin
    # the batch to the data axis; state sharding is carried by the input
    # arrays (parallel.shard_state) and propagated by GSPMD.
    if mesh is not None and mesh.size > 1:
        batch_spec = NamedSharding(mesh, P("data"))
        return jax.jit(
            step_fn,
            in_shardings=(None, batch_spec, NamedSharding(mesh, P())),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model: LatentDiffusion):
    """Validation loss with current AND EMA params (reference validation_step
    logs both, `ddpm.py:361-368`)."""

    def eval_fn(params, ema_params, batch, rng):
        _, m = model.apply({"params": params}, batch, rng, train=False)
        out = {k: v for k, v in m.items()}
        if ema_params is not None:
            _, m_ema = model.apply({"params": ema_params}, batch, rng, train=False)
            out.update({f"{k}_ema": v for k, v in m_ema.items()})
        return out

    return jax.jit(eval_fn)
