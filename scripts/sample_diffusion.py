#!/usr/bin/env python
"""Batched (un)conditional sampling CLI.

Parity target: `/root/reference/scripts/sample_diffusion.py` — load config +
checkpoint, run batched DDIM (or full ancestral) sampling, save PNGs + an
ADM-style .npz dump, print per-batch throughput.

TPU-native: the whole sampler (+VAE decode) is one jitted scan program; the
batch loop reuses the compiled executable.
"""
from __future__ import annotations

import argparse
import datetime
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-r", "--resume", type=str, required=True,
                   help="logdir or checkpoint dir")
    p.add_argument("-n", "--n_samples", type=int, default=50)
    p.add_argument("-e", "--eta", type=float, default=1.0)
    p.add_argument("-v", "--vanilla_sample", action="store_true",
                   help="full-T ancestral sampling instead of DDIM")
    p.add_argument("-l", "--logdir", type=str, default="none")
    p.add_argument("-c", "--custom_steps", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=10)
    return p


def load_run(resume: str):
    """Resolve (config, checkpoint dir) from a logdir/checkpoint path."""
    import yaml

    if os.path.isfile(resume):
        resume = os.path.dirname(resume)
    logdir = resume.rstrip("/")
    if logdir.endswith("checkpoints"):
        logdir = os.path.dirname(logdir)
    cfgs = sorted(glob.glob(os.path.join(logdir, "configs", "*.yaml")))
    assert cfgs, f"no configs under {logdir}/configs"
    with open(cfgs[-1]) as f:
        config = yaml.safe_load(f)
    return config, os.path.join(logdir, "checkpoints"), logdir


def main():
    opt = get_parser().parse_args()
    import jax
    import jax.numpy as jnp

    import ealdm_tpu

    ealdm_tpu.enable_inference_optimizations()
    from ealdm_tpu.config import model_from_config
    from ealdm_tpu.inference import make_eps_fn
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig, ancestral_sample, ddim_sample
    from ealdm_tpu.training import init_train_state
    from ealdm_tpu.training.checkpoint import CheckpointManager

    config, ckpt_dir, logdir = load_run(opt.resume)
    model, _ = model_from_config(config["model"])

    # rebuild state template from a synthetic batch, then restore
    mp = config["model"]["params"]
    res = mp["first_stage_config"]["params"]["ddconfig"]["resolution"]
    zres = mp["unet_config"]["params"]["image_size"]
    zch = mp["unet_config"]["params"]["in_channels"]
    b = opt.batch_size
    rng0 = np.random.RandomState(0)
    batch = {"img": jnp.asarray(rng0.randn(b, res, res, 3), jnp.float32)}
    if mp.get("cond_stage_key") == "mixed":
        batch["mixed"] = {
            "img": batch["img"],
            "img_random": batch["img"],
            "flow": jnp.zeros((b, 1, 1)),
            "weather": jnp.zeros((b, 1, 16)),
            "time": jnp.zeros((b, 1)),
        }
    state, _ = init_train_state(model, jax.random.PRNGKey(0), batch, use_ema=True)
    mgr = CheckpointManager(ckpt_dir, monitor=None)
    state = mgr.restore_last(jax.device_get(state))
    # sample with EMA weights (reference ema_scope convention)
    params = state.ema.shadow if state.ema is not None else state.params
    variables = {"params": params}

    sched = DiffusionSchedule.create(
        timesteps=model.timesteps, beta_schedule=model.beta_schedule,
        linear_start=model.linear_start, linear_end=model.linear_end,
    )
    eps_fn = make_eps_fn(model, variables)
    shape = (b, zres, zres, zch)

    # conditional models still need a context for the denoiser: use the
    # neutral (zeros-mixed, env-fusion-off) conditioning, CFG disabled —
    # the unconditional-benchmark analogue for the EALDM model family.
    cond_ctx = None
    if model.conditioning_key is not None and "mixed" in batch:
        cond_ctx = model.apply(
            variables, batch["mixed"], False,
            method=model.get_learned_conditioning,
        )
        _inner_eps = eps_fn
        eps_fn = lambda x, t, ctx: _inner_eps(x, t, cond_ctx)

    if opt.vanilla_sample:
        def sample_fn(rng):
            z = ancestral_sample(eps_fn, rng, shape, sched)
            return model.apply(variables, z, method=model.decode_first_stage)
    else:
        ddim = DDIMSchedule.create(sched, opt.custom_steps, eta=opt.eta)
        cfg = DDIMConfig(num_steps=opt.custom_steps, eta=opt.eta,
                         parameterization=model.parameterization)

        def sample_fn(rng):
            z = ddim_sample(eps_fn, rng, shape, ddim, cfg)
            return model.apply(variables, z, method=model.decode_first_stage)

    sample_fn = jax.jit(sample_fn)

    outdir = (
        opt.logdir
        if opt.logdir != "none"
        else os.path.join(
            logdir, "samples",
            datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S"),
        )
    )
    imgdir = os.path.join(outdir, "img")
    os.makedirs(imgdir, exist_ok=True)
    print(f"Writing samples to {outdir}")

    all_images = []
    rng = jax.random.PRNGKey(42)
    n_saved = 0
    while n_saved < opt.n_samples:
        rng, r = jax.random.split(rng)
        t0 = time.time()
        imgs = np.asarray(sample_fn(r))
        dt = time.time() - t0
        print(f"Throughput for this batch: {imgs.shape[0] / dt:.2f} img/s")
        imgs_u8 = ((np.clip(imgs, -1, 1) + 1) * 127.5).astype(np.uint8)
        from PIL import Image

        for im in imgs_u8:
            if n_saved >= opt.n_samples:
                break
            Image.fromarray(im).save(os.path.join(imgdir, f"{n_saved:06d}.png"))
            n_saved += 1
        all_images.append(imgs_u8)

    arr = np.concatenate(all_images)[: opt.n_samples]
    np.savez(os.path.join(outdir, f"{arr.shape[0]}_samples.npz"), arr)
    with open(os.path.join(outdir, "sampling_config.json"), "w") as f:
        json.dump(vars(opt), f)
    print(f"Saved {n_saved} samples.")


if __name__ == "__main__":
    main()
