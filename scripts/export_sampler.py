#!/usr/bin/env python
"""Export a trained run's conditional sampling program as an AOT artifact.

Production-serving counterpart of `scripts/sample_diffusion.py`: instead of
loading the model into Python for each serving process, trace + lower the
whole program once (cond encode -> DDIM -> decode), serialize it, and serve
from any jax-only process via `ealdm_tpu.serving.load_exported` — see
`ealdm_tpu/serving.py`. The reference has no equivalent (its serving story
is `load_model` + eager torch, `sample_diffusion.py:228-242`).

    python scripts/export_sampler.py -r logs/<run>/ -o sampler.stablehlo \
        --batch_size 8 --steps 50 [--platform tpu]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-r", "--resume", required=True,
                   help="logdir or checkpoint dir of a trained run")
    p.add_argument("-o", "--out", required=True, help="artifact output path")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--scale", type=float, default=2.0,
                   help="classifier-free guidance scale")
    p.add_argument("--streams", type=int, default=1,
                   help="independent denoiser chains per step")
    p.add_argument("--platform", default=None,
                   help="lowering platform (e.g. tpu) when exporting from a "
                        "different host type")
    return p


def main():
    opt = get_parser().parse_args()
    import jax
    import jax.numpy as jnp

    import ealdm_tpu

    ealdm_tpu.enable_inference_optimizations()
    from ealdm_tpu.config import model_from_config
    from ealdm_tpu.serving import export_sampler, save_exported
    from ealdm_tpu.training import init_train_state
    from ealdm_tpu.training.checkpoint import CheckpointManager
    from sample_diffusion import load_run

    config, ckpt_dir, _ = load_run(opt.resume)
    model, _ = model_from_config(config["model"])
    mp = config["model"]["params"]
    res = mp["first_stage_config"]["params"]["ddconfig"]["resolution"]
    zres = mp["unet_config"]["params"]["image_size"]
    zch = mp["unet_config"]["params"]["in_channels"]
    b = opt.batch_size

    rng0 = np.random.RandomState(0)
    batch = {"img": jnp.asarray(rng0.randn(b, res, res, 3), jnp.float32)}
    batch["mixed"] = {
        "img": batch["img"], "img_random": batch["img"],
        "flow": jnp.zeros((b, 1, 1)), "weather": jnp.zeros((b, 1, 16)),
        "time": jnp.zeros((b, 1)),
    }
    state, _ = init_train_state(model, jax.random.PRNGKey(0), batch, use_ema=True)
    mgr = CheckpointManager(ckpt_dir, monitor=None)
    state = mgr.restore_last(jax.device_get(state))
    params = state.ema.shadow if state.ema is not None else state.params

    exported, _ = export_sampler(
        model, {"params": params}, batch_size=b,
        latent_shape=(zres, zres, zch), steps=opt.steps, eta=opt.eta,
        guidance_scale=opt.scale, streams=opt.streams, image_size=res,
        platforms=(opt.platform,) if opt.platform else None,
    )
    save_exported(exported, opt.out, meta={
        "steps": opt.steps, "eta": opt.eta, "guidance_scale": opt.scale,
        "streams": opt.streams, "batch_size": b, "resolution": res,
        "latent_shape": [zres, zres, zch],
    })
    size = os.path.getsize(opt.out)
    print(f"Exported {opt.steps}-step sampler (batch {b}, {res}^2) "
          f"-> {opt.out} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
