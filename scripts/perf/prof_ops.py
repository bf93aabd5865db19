"""Capture an xplane trace of the UNet forward and print top ops by time."""
import glob
import os
import sys
import time
from collections import defaultdict

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
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
x = jnp.zeros((B, 32, 32, 4), jnp.float32)
t = jnp.zeros((B,), jnp.int32)
ctx = jnp.zeros((B, 4, 512), jnp.float32)
shapes = jax.eval_shape(lambda r: model.init(r, x, t, c_crossattn=[ctx]), jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
fn = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c_crossattn=[c]))
out = fn(params, x, t, ctx)
_ = float(jnp.sum(out[0, 0, 0]))

logdir = "/tmp/prof_ops"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
for _ in range(3):
    out = fn(params, x, t, ctx)
_ = float(jnp.sum(out[0, 0, 0]))
jax.profiler.stop_trace()

# ---- parse xplane
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

files = glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb")
assert files, "no xplane"
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(files[0], "rb").read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    agg = defaultdict(float)
    total = 0.0
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Ops" != line.name:
            continue
        for ev in line.events:
            dur = ev.duration_ps / 1e6  # us
            name = ev_meta.get(ev.metadata_id, "?")
            agg[name] += dur
            total += dur
    if not agg:
        continue
    print(f"=== plane {plane.name}: total {total/1e3/3:.2f} ms/iter over XLA-op line")
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    for name, us in items[:35]:
        print(f"{us/3/1e3:8.3f} ms  {100*us/total:5.1f}%  {name[:110]}")
    break
else:
    print("planes:", [p.name for p in xs.planes])
