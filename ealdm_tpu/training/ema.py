"""Pytree EMA of model parameters.

Parity target: `LitEma` (`/root/reference/ldm/modules/ema.py`): shadow
params with warm-up decay min(decay, (1+n)/(10+n)), store/copy/restore for
eval swaps. In JAX the "swap" is trivial — the EMA tree IS a value; samplers
just take whichever param tree they are given. The update is a fused
tree_map that the trainer donates buffers into (no extra HBM copies).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    decay: float
    num_updates: jnp.ndarray  # int32 scalar; -1 disables warm-up
    shadow: Any  # pytree matching params


def ema_init(params: Any, decay: float = 0.9999, use_num_updates: bool = True) -> EmaState:
    return EmaState(
        decay=decay,
        num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32),
        # explicit copy: the shadow must NOT alias the param buffers, or a
        # donating train step would donate the same buffer twice.
        shadow=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
    )


def ema_update(state: EmaState, params: Any) -> EmaState:
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1, state.num_updates)
    decay = jnp.where(
        n >= 0,
        jnp.minimum(state.decay, (1.0 + n) / (10.0 + n)),
        state.decay,
    ).astype(jnp.float32)
    one_minus = 1.0 - decay
    shadow = jax.tree_util.tree_map(
        lambda s, p: s - one_minus * (s - p.astype(s.dtype)), state.shadow, params
    )
    return EmaState(decay=state.decay, num_updates=n, shadow=shadow)
