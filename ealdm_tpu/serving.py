"""Production serving: AOT export of jitted programs + a minimal server.

The reference stack serves by loading torch checkpoints into Python and
running eager modules (`scripts/sample_diffusion.py:228-242 load_model`).
The TPU-native production path is ahead-of-time export: trace + lower the
FULL sampling program once (cond encode -> DDIM scan -> first-stage
decode), serialize the StableHLO artifact, and serve it from any process —
including one WITHOUT the model code — via jax.export.deserialize. This
kills per-process retracing, pins the served computation (auditable,
version-stable), and lets a CPU host prepare artifacts for TPU serving
(`platforms=("tpu",)`).

Components:
  * export_fn / save_exported / load_exported — generic artifact plumbing
  * export_sampler — the flagship conditional-sampling program of a
    LatentDiffusion (CFG pair encode + stream-split DDIM + decode)
  * SamplerService — steady-state serving loop: pads/batches requests to
    the exported static shape and round-robins rng
"""
from __future__ import annotations

import json
import os
import struct
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Container magic for artifacts that carry a metadata header next to the
# StableHLO payload (raw jax.export payloads without it still load).
_MAGIC = b"EALDMEXP1\n"


def export_fn(fn: Callable, *example_args, platforms: Optional[Sequence[str]] = None):
    """Trace+lower `fn` at the example args' shapes/dtypes and return the
    jax.export.Exported artifact. `platforms` (e.g. ("tpu",)) lets a CPU
    host build artifacts for TPU serving."""
    specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        example_args,
    )
    exp = jax.export.export(jax.jit(fn), platforms=platforms)(*specs)
    return exp


def save_exported(exported, path: str, meta: Optional[dict] = None) -> str:
    """Serialize an Exported to `path`, with a JSON metadata header
    (framework version, target platforms, and any caller-supplied config)
    so served artifacts are auditable without deserializing the program."""
    from . import __version__ as pkg_version

    header = {
        "format": "ealdm-exported-v1",
        "framework_version": pkg_version,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "fn_name": exported.fun_name,
    }
    if meta:
        header["config"] = meta
    blob = json.dumps(header, sort_keys=True).encode()
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(blob)))
        f.write(blob)
        f.write(data)
    return path


def read_artifact(path: str) -> Tuple[dict, bytes]:
    """Split an artifact file into (metadata header, payload bytes).
    Raw headerless payloads return an empty header."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw.startswith(_MAGIC):
        off = len(_MAGIC)
        (n,) = struct.unpack_from("<Q", raw, off)
        off += 8
        header = json.loads(raw[off:off + n].decode())
        return header, raw[off + n:]
    return {}, raw


def load_exported(path: str, *, with_meta: bool = False):
    """Load a serialized artifact and return its callable (optionally with
    its metadata header). Needs only jax — no ealdm_tpu model code — in
    the serving process."""
    header, payload = read_artifact(path)
    exp = jax.export.deserialize(payload)
    fn = jax.jit(exp.call)
    return (fn, header) if with_meta else fn


def export_sampler(
    model,
    variables,
    batch_size: int,
    latent_shape,
    steps: int = 50,
    eta: float = 1.0,
    guidance_scale: float = 2.0,
    streams: int = 1,
    image_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the flagship conditional-sampling program: mixed-cond CFG
    pair encode -> DDIM scan (optionally stream-split) -> first-stage
    decode. Params ride as an input (checkpoints swap without re-export).

    Returns (exported, example_args) where example_args[0] is `variables`.
    """
    from .inference import split_streams
    from .ops.schedules import DDIMSchedule, DiffusionSchedule
    from .samplers import DDIMConfig, ddim_sample

    sched = DiffusionSchedule.create(
        timesteps=model.timesteps,
        beta_schedule=model.beta_schedule,
        linear_start=model.linear_start,
        linear_end=model.linear_end,
        cosine_s=model.cosine_s,
    )
    ddim = DDIMSchedule.create(sched, steps, eta=eta)
    cfg = DDIMConfig(
        num_steps=steps, eta=eta, unconditional_guidance_scale=guidance_scale,
        parameterization=model.parameterization,
    )
    shape = (batch_size,) + tuple(latent_shape)

    def program(variables, mixed, rng):
        c_neg, c_pos = model.apply(
            variables, mixed, method=model.get_learned_conditioning_pair
        )

        def eps_fn(x, t, ctx):
            return model.apply(variables, x, t, ctx, method=model.apply_model)

        z = ddim_sample(
            split_streams(eps_fn, streams), rng, shape, ddim, cfg,
            cond=c_pos, uncond=c_neg,
        )
        return model.apply(variables, z, method=model.decode_first_stage)

    # example mixed batch at the export shapes (f8 latents by default)
    h = w = image_size if image_size is not None else latent_shape[0] * 8
    mixed = {
        "img": jnp.zeros((batch_size, h, w, 3), jnp.float32),
        "img_random": jnp.zeros((batch_size, h, w, 3), jnp.float32),
        "flow": jnp.zeros((batch_size, 1, 1), jnp.float32),
        "weather": jnp.zeros((batch_size, 1, 16), jnp.float32),
        "time": jnp.zeros((batch_size, 1), jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    exported = export_fn(program, variables, mixed, rng, platforms=platforms)
    return exported, (variables, mixed, rng)


class SamplerService:
    """Minimal steady-state server over an exported (or jitted) sampler.

    The exported program has a STATIC batch size; submit() accumulates
    requests, serve_pending() pads the tail batch, runs the program, and
    returns per-request outputs. rng advances per served batch.
    """

    def __init__(self, program: Callable, variables, batch_size: int,
                 seed: int = 0):
        self._program = program
        self._variables = variables
        self._batch = batch_size
        self._rng = jax.random.PRNGKey(seed)
        self._queue = []

    def submit(self, mixed: dict) -> int:
        """Queue one request (dict of per-sample arrays, no batch dim).
        Returns a request id."""
        self._queue.append(mixed)
        return len(self._queue) - 1

    def pending(self) -> int:
        return len(self._queue)

    def serve_pending(self):
        """Run as many batches as needed to drain the queue; the final
        partial batch is padded by repeating the last request. Returns a
        list of outputs aligned with submission order."""
        out = []
        q = self._queue
        self._queue = []
        for start in range(0, len(q), self._batch):
            chunk = q[start:start + self._batch]
            n_real = len(chunk)
            while len(chunk) < self._batch:
                chunk.append(chunk[-1])
            batch = {
                k: jnp.stack([jnp.asarray(r[k]) for r in chunk])
                for k in chunk[0]
            }
            self._rng, use = jax.random.split(self._rng)
            imgs = self._program(self._variables, batch, use)
            out.extend(np.asarray(imgs[:n_real]))
        return out


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed from the standard env (JAX_COORDINATOR /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) for multi-host meshes; silent no-op
    single-host. The reference's equivalent is Lightning's DDP bring-up
    (reference main.py:577)."""
    coord = os.environ.get("JAX_COORDINATOR")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )
    return True
