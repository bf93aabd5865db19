#!/usr/bin/env python
"""Text-to-image sampling with classifier-free guidance.

Parity target: `/root/reference/scripts/txt2img.py` — prompt -> BERT-style
text conditioning -> DDIM/PLMS sampling with CFG scale -> VAE decode -> PNG
grid. The text encoder is the in-repo transformer (hash tokenizer; see
models/text_transformer.py) — swap in pretrained weights for strict parity.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", type=str, default="a painting of a river in a storm")
    p.add_argument("--outdir", type=str, default="outputs/txt2img-samples")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("--H", type=int, default=256)
    p.add_argument("--W", type=int, default=256)
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("-r", "--resume", type=str, default="",
                   help="trained run dir (optional; random init otherwise)")
    p.add_argument("--config", type=str, default="")
    return p


DEFAULT_TXT2IMG = {
    "model": {
        "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
        "params": {
            "linear_start": 0.00085, "linear_end": 0.012, "timesteps": 1000,
            "first_stage_key": "image", "cond_stage_key": "caption",
            "conditioning_key": "crossattn", "cond_stage_trainable": True,
            "image_size": 32, "channels": 4,
            "unet_config": {
                "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                "params": {
                    "image_size": 32, "in_channels": 4, "out_channels": 4,
                    "model_channels": 128, "attention_resolutions": [4, 2, 1],
                    "num_res_blocks": 2, "channel_mult": [1, 2, 4],
                    "num_heads": 8, "use_spatial_transformer": True,
                    "transformer_depth": 1, "context_dim": 512,
                },
            },
            "first_stage_config": {
                "target": "ldm.models.autoencoder.VQModelInterface",
                "params": {
                    "embed_dim": 4, "n_embed": 16384,
                    "ddconfig": {
                        "double_z": False, "z_channels": 4, "resolution": 256,
                        "in_channels": 3, "out_ch": 3, "ch": 128,
                        "ch_mult": [1, 2, 2, 4], "num_res_blocks": 2,
                        "attn_resolutions": [32], "dropout": 0.0,
                    },
                },
            },
            "cond_stage_config": {
                "target": "ldm.modules.encoders.modules.BERTEmbedder",
                "params": {"n_embed": 512, "n_layer": 8},
            },
        },
    }
}


def main():
    opt = get_parser().parse_args()
    import jax
    import jax.numpy as jnp
    import yaml

    import ealdm_tpu

    ealdm_tpu.enable_inference_optimizations()
    from ealdm_tpu.config import model_from_config
    from ealdm_tpu.inference import make_eps_fn
    from ealdm_tpu.models.text_transformer import SimpleTokenizer
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample, plms_sample

    if opt.config:
        with open(opt.config) as f:
            config = yaml.safe_load(f)
    else:
        config = DEFAULT_TXT2IMG
    model, _ = model_from_config(config["model"])

    mp = config["model"]["params"]
    zres = mp["unet_config"]["params"].get("image_size", opt.H // 8)
    zch = mp["unet_config"]["params"]["in_channels"]
    n = opt.n_samples

    csc = mp.get("cond_stage_config", {}).get("params", {})
    tokenizer = SimpleTokenizer(
        vocab_size=csc.get("vocab_size", 30522),
        max_len=csc.get("max_seq_len", 77),
    )
    tokens_c = tokenizer([opt.prompt] * n)
    tokens_uc = tokenizer([""] * n)

    rng = jax.random.PRNGKey(0)
    res = mp["first_stage_config"]["params"]["ddconfig"]["resolution"]
    batch = {"img": jnp.zeros((n, res, res, 3)), "caption": tokens_c}
    variables = jax.jit(
        lambda r: model.init(
            {"params": r, "dropout": r}, batch, r, method=model.full_init
        )
    )(rng)

    if opt.resume:
        from ealdm_tpu.training import init_train_state
        from ealdm_tpu.training.checkpoint import CheckpointManager

        state, _ = init_train_state(model, rng, batch)
        state = CheckpointManager(
            os.path.join(opt.resume, "checkpoints"), monitor=None
        ).restore_last(jax.device_get(state))
        variables = {"params": state.ema.shadow if state.ema else state.params}

    c = model.apply(variables, tokens_c, method=model.get_learned_conditioning)
    uc = model.apply(variables, tokens_uc, method=model.get_learned_conditioning)

    sched = DiffusionSchedule.create(
        timesteps=model.timesteps, linear_start=model.linear_start,
        linear_end=model.linear_end,
    )
    ddim = DDIMSchedule.create(sched, opt.ddim_steps,
                               eta=0.0 if opt.plms else opt.ddim_eta)
    cfg = DDIMConfig(
        num_steps=opt.ddim_steps, eta=0.0 if opt.plms else opt.ddim_eta,
        unconditional_guidance_scale=opt.scale,
        parameterization=model.parameterization,
    )
    eps_fn = make_eps_fn(model, variables)
    sampler = plms_sample if opt.plms else ddim_sample

    @jax.jit
    def run(r):
        z = sampler(eps_fn, r, (n, zres, zres, zch), ddim, cfg, cond=c, uncond=uc)
        return model.apply(variables, z, method=model.decode_first_stage)

    os.makedirs(opt.outdir, exist_ok=True)
    sample_dir = os.path.join(opt.outdir, "samples")
    os.makedirs(sample_dir, exist_ok=True)
    from PIL import Image

    base_count = len(os.listdir(sample_dir))
    all_rows = []
    for it in range(opt.n_iter):
        rng, r = jax.random.split(rng)
        imgs = np.asarray(run(r))
        imgs_u8 = ((np.clip(imgs, -1, 1) + 1) * 127.5).astype(np.uint8)
        for im in imgs_u8:
            Image.fromarray(im).save(
                os.path.join(sample_dir, f"{base_count:04d}.png")
            )
            base_count += 1
        all_rows.append(np.concatenate(list(imgs_u8), axis=1))
    grid = np.concatenate(all_rows, axis=0)
    Image.fromarray(grid).save(
        os.path.join(opt.outdir, f'{opt.prompt.replace(" ", "-")[:60]}.png')
    )
    print(f"Your samples are ready in {opt.outdir}")


if __name__ == "__main__":
    main()
