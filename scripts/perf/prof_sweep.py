"""Batch sweep + bf16-param variant of the UNet step (the bench hot loop)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ealdm_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import ealdm_tpu

ealdm_tpu.enable_inference_optimizations()

from ealdm_tpu.models.ddpm import DiffusionWrapper

unet = dict(
    image_size=32, in_channels=4, out_channels=4, model_channels=256,
    attention_resolutions=[4, 2, 1], num_res_blocks=2,
    channel_mult=[1, 2, 4], num_head_channels=32,
    use_spatial_transformer=True, transformer_depth=1, context_dim=512,
)
model = DiffusionWrapper(unet, "crossattn", dtype=jnp.bfloat16)
x0 = jnp.zeros((2, 32, 32, 4), jnp.float32)
t0_ = jnp.zeros((2,), jnp.int32)
c0 = jnp.zeros((2, 4, 512), jnp.float32)
shapes = jax.eval_shape(lambda r: model.init(r, x0, t0_, c_crossattn=[c0]), jax.random.PRNGKey(0))
params32 = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
params16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params32
)

def bench(params, B, tag):
    x = jnp.zeros((B, 32, 32, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 4, 512), jnp.float32)
    fn = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c_crossattn=[c]))
    out = fn(params, x, t, ctx)
    _ = float(jnp.sum(out[0, 0, 0]))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x, t, ctx)
    _ = float(jnp.sum(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:14s} B={B:3d}: {dt*1e3:7.2f} ms  {dt/B*1e3:6.3f} ms/img")

for B in (16, 32, 48, 64):
    bench(params32, B, "fp32 params")
for B in (16, 32, 64):
    bench(params16, B, "bf16 params")
