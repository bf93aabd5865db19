"""Component timing breakdown of the bench pipeline on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ealdm_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import ealdm_tpu

ealdm_tpu.enable_inference_optimizations()

from ealdm_tpu.models.ddpm import LatentDiffusion
from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
from ealdm_tpu.samplers import DDIMConfig, ddim_sample

import argparse

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=8)
p.add_argument("--steps", type=int, default=50)
p.add_argument("--what", default="all")  # all|unet|decode|cond|full
args = p.parse_args()

res, zres, ch, nembed = 256, 32, 128, 16384
unet = dict(
    image_size=32, in_channels=4, out_channels=4, model_channels=256,
    attention_resolutions=[4, 2, 1], num_res_blocks=2,
    channel_mult=[1, 2, 4], num_head_channels=32,
    use_spatial_transformer=True, transformer_depth=1, context_dim=512,
)
first_stage = {
    "target": "ldm.models.autoencoder.VQModelInterface",
    "params": {
        "embed_dim": 4, "n_embed": nembed,
        "ddconfig": dict(
            double_z=False, z_channels=4, resolution=res, in_channels=3,
            out_ch=3, ch=ch, ch_mult=[1, 2, 2, 4], num_res_blocks=2,
            attn_resolutions=[zres], dropout=0.0,
        ),
    },
}
cond = {
    "target": "STDiff.models.UnetCond",
    "params": {
        "mid_dim": 4, "emb_dim": 128, "out_dim": 512, "w_dim": 16,
        "f_dim": 1, "hidden_dim": 1024,
        "cond_args": {
            "type": "fourier", "dims": 6, "lr": 1, "lin_lr": 0.01,
            "f_manual": [1.8398, 672], "include_lin": True,
            "noise": 0, "noise_f": [263.2, 7.79, 0], "noise_f_int": [],
        },
    },
}
model = LatentDiffusion(
    unet_config=unet, first_stage_config=first_stage, cond_stage_config=cond,
    timesteps=1000, linear_start=0.0015, linear_end=0.0195,
    conditioning_key="crossattn", cond_stage_key="mixed",
    cond_stage_trainable=True, unconditional_guidance_scale=2.0,
    dtype=jnp.bfloat16,
)

rng = np.random.RandomState(0)
b = args.batch
mixed = {
    "img": jnp.asarray(rng.randn(b, res, res, 3), jnp.float32),
    "img_random": jnp.asarray(rng.randn(b, res, res, 3), jnp.float32),
    "flow": jnp.asarray(rng.randn(b, 1, 1), jnp.float32),
    "weather": jnp.asarray(rng.randn(b, 1, 16), jnp.float32),
    "time": jnp.asarray(rng.rand(b, 1), jnp.float32),
}
init_rng = jax.random.PRNGKey(0)
shapes = jax.eval_shape(
    lambda r: model.init({"params": r, "dropout": r}, {"img": mixed["img"], "mixed": mixed}, r, method=model.full_init),
    init_rng,
)
variables = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes)

sched = DiffusionSchedule.create(timesteps=1000, linear_start=0.0015, linear_end=0.0195)
ddim = DDIMSchedule.create(sched, args.steps, eta=1.0)
dcfg = DDIMConfig(num_steps=args.steps, eta=1.0, unconditional_guidance_scale=2.0)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(name, fn, *a, iters=3):
    t0 = time.perf_counter()
    out = fn(*a)
    sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.1f} ms   (compile {compile_s:.1f}s)")
    return dt


ctx = jnp.zeros((b, 4, 512), jnp.float32)
z = jnp.zeros((b, zres, zres, 4), jnp.float32)
t_vec = jnp.zeros((2 * b,), jnp.int32)
x2 = jnp.concatenate([z, z], 0)
c2 = jnp.concatenate([ctx, ctx], 0)

what = args.what

if what in ("all", "cond"):
    f_cond = jax.jit(lambda v, m: model.apply(v, m, True, method=model.get_learned_conditioning))
    timeit("cond tower (1x)", f_cond, variables, mixed)

if what in ("all", "unet"):
    f_unet = jax.jit(lambda v, x, t, c: model.apply(v, x, t, c, method=model.apply_model))
    dt = timeit("UNet fwd (2N CFG batched, 1 step)", f_unet, variables, x2, t_vec, c2, iters=10)
    print(f"  -> x{args.steps} steps = {dt*args.steps*1e3:.0f} ms")

if what in ("all", "scan"):
    def scan_only(v, rng):
        def eps_fn(x, t, c):
            return model.apply(v, x, t, c, method=model.apply_model)
        return ddim_sample(eps_fn, rng, (b, zres, zres, 4), ddim, dcfg, cond=ctx, uncond=ctx)
    f_scan = jax.jit(scan_only)
    timeit(f"DDIM scan x{args.steps} (no decode)", f_scan, variables, jax.random.PRNGKey(1))

if what in ("all", "decode"):
    f_dec = jax.jit(lambda v, z: model.apply(v, z, method=model.decode_first_stage))
    timeit("VQ decode 32->256 (1x)", f_dec, variables, z, iters=5)

print("done")
