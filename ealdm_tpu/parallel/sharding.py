"""Sharding rules: params over the `model` axis, batches over `data`.

Tensor-parallel rules target where UNet/VAE FLOPs live:
  * conv kernels  [kh, kw, cin, cout]  -> shard cout on `model`
  * dense kernels [cin, cout]          -> shard cout on `model`
  * attention qkv/out follow the dense rule (heads live in cout)
Biases / norm scales stay replicated; XLA inserts the (all-gather /
reduce-scatter) collectives implied by the annotations.

For the EALDM model sizes a pure-DP mesh (model=1) is the speed-of-light
configuration; the TP rules exist for larger-than-chip variants and are
exercised by the multichip dry-run.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for any batch pytree leaf."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    if mesh.size == 1:  # single device: no SPMD placement needed
        return jax.tree_util.tree_map(jax.device_put, batch)
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def _leaf_spec(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    name = names[-1] if names else ""
    if leaf.ndim >= 2 and name in ("kernel", "weight"):
        # shard the output-feature (last) axis across `model`
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    if leaf.ndim >= 2 and name == "embedding":
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()  # replicate biases, scales, scalars


def param_sharding_rules(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for a flax param tree under the given mesh."""
    if mesh.shape.get("model", 1) == 1:
        return jax.tree_util.tree_map(lambda _: P(), params)
    return jax.tree_util.tree_map_with_path(_leaf_spec, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    specs = param_sharding_rules(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def _shape_based_spec(leaf, tp: int) -> P:
    """Generic TP rule by shape: shard the last (output-feature) axis when it
    divides the model-axis size. Applies uniformly to params, Adam moments
    and EMA shadows (same shapes), so the whole TrainState stays consistent."""
    if getattr(leaf, "ndim", 0) >= 2 and leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= 2 * tp:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def state_sharding_rules(state: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a full TrainState under the given mesh."""
    tp = mesh.shape.get("model", 1)
    if tp == 1:
        return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), state)
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _shape_based_spec(leaf, tp)), state
    )


def shard_state(state: Any, mesh: Mesh) -> Any:
    if mesh.size == 1:
        return state
    shardings = state_sharding_rules(state, mesh)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
