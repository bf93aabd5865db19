#!/usr/bin/env python
"""TPU throughput rows for the remaining BASELINE.json benchmark configs.

`bench.py` covers the flagship stdiff_cin-ldm-vq-f8 pipeline (+ --train).
This script measures the other four BASELINE.json configs on the real chip,
one BENCH-style JSON line each, same MFU accounting:

  vae      autoencoder_kl_64x64x3 (kl-f4): 256^2 encode->decode round-trip
           img/s, plus bf16-vs-fp32 recon PSNR (the numeric-parity row —
           recon-vs-input PSNR is meaningless at random init).
  uncond   uncond_cin-ldm-vq-f8: unconditional DDIM-50 eta=1.0 + VQ decode
           (the scripts/sample_diffusion.py canonical benchmark,
           reference sample_diffusion.py:104-105,162-217).
  txt2img  txt2img-1p4B-eval: BERT cond -> DDIM-50 CFG scale 5.0 -> KL-f8
           decode (reference txt2img.py:52-103 defaults).
  inpaint  the scripts/inpaint.py latent model: masked DDIM-50 (mask/x0
           re-noising) + VQ-f4 decode. knn2img's sampling leg has this same
           cost profile; its retrieval leg is host-side and measured by
           tests/test_metrics_retrieval.py semantics, not a chip row.

Models are built from the mirrored YAML configs (ealdm_tpu.config), so the
timed architectures are the reference-schema ones. Weights are eval_shape-
materialized constants (throughput does not depend on values).

Usage (real chip): timeout 580 python scripts/perf/bench_configs.py \
    [--config vae|uncond|txt2img|inpaint|all] [--batch N] [--steps 50]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

NOMINAL_PEAK = {"TPU v5 lite": 197e12}


def materialize(model, init_fn):
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    return jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes
    )


def _flops(f, *args):
    import jax

    try:
        ca = jax.jit(f).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def _sync(x):
    """Force a scalar readback (the axon relay's block_until_ready does not
    block; the device queue is FIFO so this fences prior programs too)."""
    import jax.numpy as jnp

    return float(jnp.sum(x[0, 0, 0]))


def _time(fn, args, iters=3):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters, compile_s


def _emit(name, b, dt, flops, extra=None):
    import jax

    kind = jax.devices()[0].device_kind
    peak = NOMINAL_PEAK.get(kind, 197e12)
    row = {
        "config": name,
        "value": round(b / dt, 3),
        "unit": "img/s",
        "step_ms": round(dt * 1e3, 2),
        "batch": b,
        "mfu_nominal": round(flops / dt / peak, 3) if flops == flops else None,
        "tflops_per_image": round(flops / b / 1e12, 3) if flops == flops else None,
        "device": kind,
    }
    row.update(extra or {})
    print(json.dumps(row), flush=True)
    return row


def _load_model(cfg_path, dtype):
    from ealdm_tpu.config import load_config, model_from_config

    cfg = load_config([cfg_path])
    model, _base_lr = model_from_config(cfg["model"], dtype=dtype)
    return model


def _load_vae(cfg_path, dtype):
    from ealdm_tpu.config import load_config
    from ealdm_tpu.models.vae import AutoencoderKL

    params = load_config([cfg_path])["model"]["params"]
    return AutoencoderKL(ddconfig=dict(params["ddconfig"]),
                         embed_dim=params["embed_dim"], dtype=dtype)


def bench_vae(b: int):
    """kl-f4 256^2 encode/decode round-trip + bf16-vs-fp32 recon PSNR."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = "configs/autoencoder/autoencoder_kl_64x64x3.yaml"
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, 256, 256, 3) * 2 - 1, jnp.float32)

    rows = {}
    for dtype in (jnp.bfloat16, jnp.float32):
        vae = _load_vae(cfg, dtype)
        variables = materialize(
            vae, lambda r: vae.init({"params": r}, x, r)
        )

        def roundtrip(v, x, r):
            rec, _post = vae.apply(v, x, r)
            return rec

        fn = jax.jit(roundtrip)
        args = (variables, x, jax.random.PRNGKey(1))
        dt, _ = _time(fn, args)
        rows[dtype] = (dt, np.asarray(fn(*args), np.float32))

    dt_bf16, rec_bf16 = rows[jnp.bfloat16]
    dt_f32, rec_f32 = rows[jnp.float32]
    mse = float(np.mean((rec_bf16 - rec_f32) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse > 0 else float("inf")
    vae_b = _load_vae(cfg, jnp.bfloat16)
    variables = materialize(vae_b, lambda r: vae_b.init({"params": r}, x, r))
    flops = _flops(
        lambda v, x, r: vae_b.apply(v, x, r)[0],
        variables, x, jax.random.PRNGKey(1),
    )
    _emit("autoencoder_kl_64x64x3 256^2 encode+decode roundtrip (bf16)",
          b, dt_bf16, flops,
          {"psnr_bf16_vs_fp32_db": round(float(psnr), 1),
           "fp32_img_per_s": round(b / dt_f32, 3)})


def bench_uncond(b: int, steps: int, streams: int):
    """uncond_cin-ldm-vq-f8: unconditional DDIM + VQ decode, one program."""
    import jax
    import jax.numpy as jnp

    import ealdm_tpu
    from ealdm_tpu.inference import split_streams
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample

    ealdm_tpu.enable_inference_optimizations()
    model = _load_model(
        "configs/latent-diffusion/uncond_cin-ldm-vq-f8.yaml", jnp.bfloat16
    )
    batch = {"img": jnp.zeros((b, 256, 256, 3), jnp.float32)}
    variables = materialize(
        model,
        lambda r: model.init({"params": r, "dropout": r}, batch, r,
                             method=model.full_init),
    )
    sched = DiffusionSchedule.create(
        timesteps=model.timesteps, linear_start=model.linear_start,
        linear_end=model.linear_end,
    )
    ddim = DDIMSchedule.create(sched, steps, eta=1.0)
    cfg = DDIMConfig(num_steps=steps, eta=1.0)

    def program(v, rng):
        def eps_fn(x, t, ctx):
            return model.apply(v, x, t, ctx, method=model.apply_model)

        z = ddim_sample(split_streams(eps_fn, streams), rng,
                        (b, 32, 32, 4), ddim, cfg)
        return model.apply(v, z, method=model.decode_first_stage)

    fn = jax.jit(program)
    args = (variables, jax.random.PRNGKey(1))
    dt, compile_s = _time(fn, args)
    x1 = jnp.zeros((b, 32, 32, 4), jnp.float32)
    t1 = jnp.zeros((b,), jnp.int32)
    unet = _flops(
        lambda v, x, t: model.apply(v, x, t, None, method=model.apply_model),
        variables, x1, t1,
    )
    dec = _flops(
        lambda v, z: model.apply(v, z, method=model.decode_first_stage),
        variables, x1,
    )
    _emit(f"uncond_cin-ldm-vq-f8 DDIM-{steps} eta1 + VQ decode",
          b, dt, steps * unet + dec, {"compile_s": round(compile_s, 1)})


def bench_txt2img(b: int, steps: int, streams: int, scale: float = 5.0):
    """txt2img-1p4B-eval: BERT cond -> CFG DDIM -> KL-f8 decode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ealdm_tpu
    from ealdm_tpu.inference import hoist_invariants, split_streams
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample

    ealdm_tpu.enable_inference_optimizations()
    model = _load_model(
        "configs/latent-diffusion/txt2img-1p4B-eval.yaml", jnp.bfloat16
    )
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, 1000, size=(b, 77)), jnp.int32)
    batch = {"image": jnp.zeros((b, 256, 256, 3), jnp.float32),
             "caption": tokens}
    variables = materialize(
        model,
        lambda r: model.init({"params": r, "dropout": r}, batch, r,
                             method=model.full_init),
    )
    empty = jnp.zeros_like(tokens)  # the CFG "" prompt token row

    sched = DiffusionSchedule.create(
        timesteps=model.timesteps, linear_start=model.linear_start,
        linear_end=model.linear_end,
    )
    ddim = DDIMSchedule.create(sched, steps, eta=0.0)
    cfg = DDIMConfig(num_steps=steps, eta=0.0,
                     unconditional_guidance_scale=scale)

    def program(v, tokens, empty, rng):
        c = model.apply(v, tokens, method=model.get_learned_conditioning)
        uc = model.apply(v, empty, method=model.get_learned_conditioning)
        eps_fn, c, uc, extra = hoist_invariants(model, v, ddim, c, uc)
        z = ddim_sample(split_streams(eps_fn, streams), rng,
                        (b, 32, 32, 4), ddim, cfg, cond=c, uncond=uc,
                        extra_tables=extra)
        return model.apply(v, z, method=model.decode_first_stage)

    fn = jax.jit(program)
    args = (variables, tokens, empty, jax.random.PRNGKey(1))
    dt, compile_s = _time(fn, args)
    x2 = jnp.zeros((2 * b, 32, 32, 4), jnp.float32)
    t2 = jnp.zeros((2 * b,), jnp.int32)
    ctx2 = jnp.zeros((2 * b, 77, 1280), jnp.float32)
    unet = _flops(
        lambda v, x, t, c: model.apply(v, x, t, c, method=model.apply_model),
        variables, x2, t2, ctx2,
    )
    enc = _flops(
        lambda v, tk: model.apply(v, tk, method=model.get_learned_conditioning),
        variables, tokens,
    )
    dec = _flops(
        lambda v, z: model.apply(v, z, method=model.decode_first_stage),
        variables, jnp.zeros((b, 32, 32, 4), jnp.float32),
    )
    _emit(f"txt2img-1p4B-eval DDIM-{steps} CFG {scale} + KL-f8 decode",
          b, dt, steps * unet + 2 * enc + dec,
          {"compile_s": round(compile_s, 1)})


def bench_inpaint(b: int, steps: int, streams: int):
    """scripts/inpaint.py model: masked DDIM (mask/x0 re-noising) + decode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ealdm_tpu
    from ealdm_tpu.inference import split_streams
    from ealdm_tpu.models.ddpm import LatentDiffusion
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample

    ealdm_tpu.enable_inference_optimizations()
    # the scripts/inpaint.py non-tiny latent-inpainting model (vq-f4)
    unet = dict(
        image_size=64, in_channels=3, out_channels=3, model_channels=128,
        attention_resolutions=[8, 4, 2], num_res_blocks=2,
        channel_mult=[1, 2, 3, 4], num_heads=8,
    )
    ddconfig = dict(
        double_z=False, z_channels=3, resolution=256, in_channels=3,
        out_ch=3, ch=128, ch_mult=[1, 2, 4], num_res_blocks=2,
        attn_resolutions=[], dropout=0.0,
    )
    model = LatentDiffusion(
        unet_config=unet,
        first_stage_config={
            "target": "ldm.models.autoencoder.VQModelInterface",
            "params": {"embed_dim": 3, "n_embed": 8192, "ddconfig": ddconfig},
        },
        cond_stage_config="__is_unconditional__",
        timesteps=1000, linear_start=0.0015, linear_end=0.0205,
        dtype=jnp.bfloat16,
    )
    batch = {"img": jnp.zeros((b, 256, 256, 3), jnp.float32)}
    variables = materialize(
        model,
        lambda r: model.init({"params": r, "dropout": r}, batch, r,
                             method=model.full_init),
    )
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(b, 64, 64, 3), jnp.float32)
    mask = jnp.ones((b, 64, 64, 1), jnp.float32).at[:, 16:48, 16:48].set(0.0)

    sched = DiffusionSchedule.create(
        timesteps=model.timesteps, linear_start=model.linear_start,
        linear_end=model.linear_end,
    )
    ddim = DDIMSchedule.create(sched, steps, eta=0.0)
    cfg = DDIMConfig(num_steps=steps, eta=0.0)

    def program(v, x0, mask, rng):
        def eps_fn(x, t, ctx):
            return model.apply(v, x, t, ctx, method=model.apply_model)

        z = ddim_sample(split_streams(eps_fn, streams), rng,
                        (b, 64, 64, 3), ddim, cfg, mask=mask, x0=x0,
                        schedule=sched)
        return model.apply(v, z, method=model.decode_first_stage)

    fn = jax.jit(program)
    args = (variables, x0, mask, jax.random.PRNGKey(1))
    dt, compile_s = _time(fn, args)
    x1 = jnp.zeros((b, 64, 64, 3), jnp.float32)
    t1 = jnp.zeros((b,), jnp.int32)
    unet_f = _flops(
        lambda v, x, t: model.apply(v, x, t, None, method=model.apply_model),
        variables, x1, t1,
    )
    dec = _flops(
        lambda v, z: model.apply(v, z, method=model.decode_first_stage),
        variables, x1,
    )
    _emit(f"inpaint (vq-f4 latent model) masked DDIM-{steps} + decode",
          b, dt, steps * unet_f + dec, {"compile_s": round(compile_s, 1)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="all",
                    choices=["vae", "uncond", "txt2img", "inpaint", "all"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--streams", type=int, default=3)
    a = ap.parse_args()

    os.chdir(os.path.join(os.path.dirname(__file__), "..", ".."))
    from ealdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if a.config in ("vae", "all"):
        bench_vae(a.batch or 16)
    if a.config in ("uncond", "all"):
        bench_uncond(a.batch or 24, a.steps, a.streams)
    if a.config in ("txt2img", "all"):
        bench_txt2img(a.batch or 8, a.steps, a.streams)
    if a.config in ("inpaint", "all"):
        bench_inpaint(a.batch or 16, a.steps, a.streams)


if __name__ == "__main__":
    main()
