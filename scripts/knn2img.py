#!/usr/bin/env python
"""Retrieval-augmented sampling (RDM-style).

Parity target: `/root/reference/scripts/knn2img.py` — embed text/image
queries, retrieve k nearest patch embeddings from the database, stack query
+ neighbours as the cross-attention conditioning, sample with CFG.

TPU-native: exact matmul k-NN (ealdm_tpu/retrieval.py) instead of ScaNN;
embedders are the in-repo trunks with pretrained-weight import hooks.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", type=str, default="a river flowing through a forest")
    p.add_argument("--database", type=str, required=True,
                   help="searcher index .npz (from train_searcher.py)")
    p.add_argument("--outdir", type=str, default="outputs/knn2img-samples")
    p.add_argument("--knn", type=int, default=4)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--n_samples", type=int, default=2)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--H", type=int, default=256)
    p.add_argument("--W", type=int, default=256)
    return p


def main():
    opt = get_parser().parse_args()
    import jax
    import jax.numpy as jnp

    import ealdm_tpu

    ealdm_tpu.enable_inference_optimizations()
    from ealdm_tpu.inference import make_eps_fn
    from ealdm_tpu.models.ddpm import LatentDiffusion
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.retrieval import Searcher, _embed_texts_fn
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample

    searcher = Searcher.load(opt.database)
    embed_texts = _embed_texts_fn()
    q = np.asarray(embed_texts([opt.prompt] * opt.n_samples))
    nns = searcher.search(q, k=opt.knn)
    # conditioning = [query ; k neighbour embeddings] per sample
    ctx_dim = searcher.dim
    cond = np.concatenate([q[:, None, :], nns["nn_embeddings"]], axis=1)
    uncond = np.zeros_like(cond)

    model = LatentDiffusion(
        unet_config=dict(
            image_size=opt.H // 8, in_channels=16, out_channels=16,
            model_channels=192, attention_resolutions=[4, 2, 1],
            num_res_blocks=2, channel_mult=[1, 2, 4],
            num_head_channels=32, use_spatial_transformer=True,
            transformer_depth=1, context_dim=ctx_dim,
        ),
        first_stage_config={
            "target": "ldm.models.autoencoder.VQModelInterface",
            "params": {
                "embed_dim": 16, "n_embed": 16384,
                "ddconfig": dict(
                    double_z=False, z_channels=16, resolution=opt.H,
                    in_channels=3, out_ch=3, ch=128, ch_mult=[1, 1, 2, 2, 4],
                    num_res_blocks=2, attn_resolutions=[16], dropout=0.0,
                ),
            },
        },
        cond_stage_config="__is_unconditional__",
        conditioning_key="crossattn",
        timesteps=1000,
    )
    rng = jax.random.PRNGKey(0)
    batch = {"img": jnp.zeros((opt.n_samples, opt.H, opt.W, 3))}
    variables = jax.jit(
        lambda r: model.init({"params": r, "dropout": r}, batch, r,
                             method=model.full_init)
    )(rng)

    sched = DiffusionSchedule.create(timesteps=model.timesteps)
    ddim = DDIMSchedule.create(sched, opt.ddim_steps, eta=opt.ddim_eta)
    cfg = DDIMConfig(num_steps=opt.ddim_steps, eta=opt.ddim_eta,
                     unconditional_guidance_scale=opt.scale,
                     parameterization=model.parameterization)
    eps_fn = make_eps_fn(model, variables)
    zres = opt.H // 16

    @jax.jit
    def run(r):
        z = ddim_sample(
            eps_fn, r, (opt.n_samples, zres, zres, 16), ddim, cfg,
            cond=jnp.asarray(cond), uncond=jnp.asarray(uncond),
        )
        return model.apply(variables, z, method=model.decode_first_stage)

    imgs = np.asarray(run(jax.random.PRNGKey(1)))
    os.makedirs(opt.outdir, exist_ok=True)
    from PIL import Image

    for i, im in enumerate(((np.clip(imgs, -1, 1) + 1) * 127.5).astype(np.uint8)):
        Image.fromarray(im).save(os.path.join(opt.outdir, f"knn_{i:04d}.png"))
    print(f"Wrote {len(imgs)} retrieval-augmented samples to {opt.outdir}")


if __name__ == "__main__":
    main()
