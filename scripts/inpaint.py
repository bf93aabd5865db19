#!/usr/bin/env python
"""Masked inpainting CLI.

Parity target: `/root/reference/scripts/inpaint.py` — (image, mask) pairs ->
mask-conditioned DDIM -> composite known region over the result. The
reference's concat-conditioned inpainting model is supported through the
`concat` conditioning key; without a trained checkpoint the latent-mask
renoising path (DDIM mask/x0) is used.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_batch(image_path: str, mask_path: str, size: int = 256):
    from PIL import Image

    img = np.asarray(
        Image.open(image_path).convert("RGB").resize((size, size))
    ).astype(np.float32) / 127.5 - 1.0
    mask = np.asarray(
        Image.open(mask_path).convert("L").resize((size, size))
    ).astype(np.float32) / 255.0
    mask = (mask > 0.5).astype(np.float32)[..., None]  # 1 = hole
    masked = img * (1.0 - mask)
    return {"image": img[None], "mask": mask[None], "masked_image": masked[None]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--indir", type=str,
                   default=os.path.join(os.path.dirname(__file__), "..",
                                        "data", "inpainting_examples"),
                   help="dir with *.png images and *_mask.png masks "
                        "(default: the committed data/inpainting_examples)")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--plms", action="store_true",
                   help="use the PLMS sampler (mask/x0 re-noising supported, "
                        "reference plms.py:147-150) instead of DDIM")
    p.add_argument("-r", "--resume", type=str, default="",
                   help="trained run dir (optional)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model/resolution (smoke testing)")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp

    import ealdm_tpu

    ealdm_tpu.enable_inference_optimizations()
    from ealdm_tpu.inference import make_eps_fn, sample_images
    from ealdm_tpu.models.ddpm import LatentDiffusion

    masks = sorted(glob.glob(os.path.join(opt.indir, "*_mask.png")))
    images = [m.replace("_mask.png", ".png") for m in masks]
    print(f"Found {len(masks)} inputs.")
    os.makedirs(opt.outdir, exist_ok=True)

    # latent-inpainting model (vq-f4-style first stage, uncond UNet)
    if opt.tiny:
        size = 32
        unet = dict(
            image_size=16, in_channels=3, out_channels=3, model_channels=16,
            attention_resolutions=[4], num_res_blocks=1, channel_mult=[1, 2],
            num_heads=2,
        )
        ddconfig = dict(
            double_z=False, z_channels=3, resolution=32, in_channels=3,
            out_ch=3, ch=16, ch_mult=[1, 2], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0,
        )
        n_embed = 64
    else:
        size = 256
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
        n_embed = 8192
    model = LatentDiffusion(
        unet_config=unet,
        first_stage_config={
            "target": "ldm.models.autoencoder.VQModelInterface",
            "params": {"embed_dim": 3, "n_embed": n_embed, "ddconfig": ddconfig},
        },
        cond_stage_config="__is_unconditional__",
        timesteps=1000,
        linear_start=0.0015,
        linear_end=0.0205,
    )
    rng = jax.random.PRNGKey(0)
    example = make_batch(images[0], masks[0], size=size) if images else None
    batch0 = {"img": jnp.asarray(example["image"])}
    variables = jax.jit(
        lambda r: model.init({"params": r, "dropout": r}, batch0, r,
                             method=model.full_init)
    )(rng)
    if opt.resume:
        from ealdm_tpu.training import init_train_state
        from ealdm_tpu.training.checkpoint import CheckpointManager

        state, _ = init_train_state(model, rng, batch0)
        state = CheckpointManager(
            os.path.join(opt.resume, "checkpoints"), monitor=None
        ).restore_last(jax.device_get(state))
        variables = {"params": state.ema.shadow if state.ema else state.params}

    from PIL import Image

    for image_path, mask_path in zip(images, masks):
        batch = make_batch(image_path, mask_path, size=size)
        x = jnp.asarray(batch["image"])
        mask_px = jnp.asarray(batch["mask"])  # 1 = hole
        rng, r1, r2 = jax.random.split(rng, 3)
        z = model.apply(variables, x, r1, method=model.encode_first_stage)
        z = model.scale_factor * z
        # latent-resolution keep-mask (1 = keep known region)
        zh, zw = z.shape[1], z.shape[2]
        keep = 1.0 - jax.image.resize(mask_px, (1, zh, zw, 1), "nearest")
        img, _ = sample_images(
            model, variables, r2, 1, z.shape[1:], steps=opt.steps, eta=0.0,
            mask=keep, x0=z, sampler="plms" if opt.plms else "ddim",
        )
        # composite: predicted content only inside the hole
        result = np.asarray(x * (1 - mask_px) + img * mask_px)[0]
        out = ((np.clip(result, -1, 1) + 1) * 127.5).astype(np.uint8)
        Image.fromarray(out).save(
            os.path.join(opt.outdir, os.path.basename(image_path))
        )
    print(f"Inpainted {len(images)} images -> {opt.outdir}")


if __name__ == "__main__":
    main()
