"""Measure: (1) chip matmul speed-of-light, (2) UNet fwd FLOPs via XLA cost
analysis -> MFU, (3) xplane top ops for one UNet forward."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ealdm_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import ealdm_tpu

ealdm_tpu.enable_inference_optimizations()

# ---------------- 1. speed of light: big bf16 matmul
N = 8192
a = jnp.ones((N, N), jnp.bfloat16)
b = jnp.ones((N, N), jnp.bfloat16)
mm = jax.jit(lambda a, b: a @ b)
out = mm(a, b)
_ = float(jnp.sum(out[0, :8]))
t0 = time.perf_counter()
iters = 20
for _ in range(iters):
    out = mm(a, out)
_ = float(jnp.sum(out[0, :8]))
dt = (time.perf_counter() - t0) / iters
peak = 2 * N**3 / dt
print(f"matmul {N}^3 bf16: {dt*1e3:.2f} ms -> {peak/1e12:.1f} TFLOP/s")

# ---------------- 2. UNet fwd cost analysis + timing
from ealdm_tpu.models.ddpm import DiffusionWrapper

unet = dict(
    image_size=32, in_channels=4, out_channels=4, model_channels=256,
    attention_resolutions=[4, 2, 1], num_res_blocks=2,
    channel_mult=[1, 2, 4], num_head_channels=32,
    use_spatial_transformer=True, transformer_depth=1, context_dim=512,
)
model = DiffusionWrapper(unet, "crossattn", dtype=jnp.bfloat16)
B = 16
x = jnp.zeros((B, 32, 32, 4), jnp.float32)
t = jnp.zeros((B,), jnp.int32)
ctx = jnp.zeros((B, 4, 512), jnp.float32)
shapes = jax.eval_shape(lambda r: model.init(r, x, t, c_crossattn=[ctx]), jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

fn = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c_crossattn=[c]))
lowered = fn.lower(params, x, t, ctx)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
flops = ca.get("flops", float("nan"))
bytes_ = ca.get("bytes accessed", float("nan"))
print(f"UNet fwd batch{B}: XLA flops={flops/1e12:.3f} TF  bytes={bytes_/1e9:.2f} GB")

out = fn(params, x, t, ctx)
_ = float(jnp.sum(out[0, 0, 0]))
t0 = time.perf_counter()
iters = 20
for _ in range(iters):
    out = fn(params, x, t, ctx)
_ = float(jnp.sum(out[0, 0, 0]))
dt = (time.perf_counter() - t0) / iters
print(f"UNet fwd: {dt*1e3:.2f} ms -> {flops/dt/1e12:.1f} TFLOP/s achieved, "
      f"MFU vs measured peak = {flops/dt/peak*100:.1f}%  "
      f"HBM BW used = {bytes_/dt/1e9:.0f} GB/s")
