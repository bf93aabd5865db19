"""Notebook/Colab-style helpers.

Parity target: `/root/reference/notebook_helpers.py` — model zoo loading
(`get_model`), conditioning selection, and `run(...)` convolutional sampling
for superresolution / class-conditional modes. This environment is
zero-egress, so models load from local run dirs or default architectures
instead of URL downloads.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

MODEL_ZOO = {
    # mode -> (config path, latent downsample factor)
    "superresolution": ("configs/latent-diffusion/stdiff_cin-ldm-vq-f8.yaml", 8),
    "class_conditional": ("configs/latent-diffusion/stdiff_cin-ldm-vq-f8.yaml", 8),
    "stdiff": ("configs/latent-diffusion/stdiff_cin-ldm-vq-f8.yaml", 8),
}


def get_model(mode: str = "stdiff", run_dir: Optional[str] = None):
    """Build (model, variables). With run_dir, restore trained EMA weights."""
    import jax
    import jax.numpy as jnp

    from ealdm_tpu.config import load_config, model_from_config

    cfg_path, _ = MODEL_ZOO[mode]
    config = load_config([cfg_path])
    model, _ = model_from_config(config["model"])

    mp = config["model"]["params"]
    res = mp["first_stage_config"]["params"]["ddconfig"]["resolution"]
    rng = jax.random.PRNGKey(0)
    batch = {"img": jnp.zeros((1, res, res, 3))}
    if mp.get("cond_stage_key") == "mixed":
        batch["mixed"] = {
            "img": batch["img"], "img_random": batch["img"],
            "flow": jnp.zeros((1, 1, 1)), "weather": jnp.zeros((1, 1, 16)),
            "time": jnp.zeros((1, 1)),
        }
    if run_dir:
        from ealdm_tpu.training import init_train_state
        from ealdm_tpu.training.checkpoint import CheckpointManager

        state, _ = init_train_state(model, rng, batch)
        state = CheckpointManager(
            os.path.join(run_dir, "checkpoints"), monitor=None
        ).restore_last(jax.device_get(state))
        variables = {"params": state.ema.shadow if state.ema else state.params}
    else:
        variables = jax.jit(
            lambda r: model.init({"params": r, "dropout": r}, batch, r,
                                 method=model.full_init)
        )(rng)
    return model, variables


def run(model, variables, batch=None, custom_steps: int = 50, eta: float = 1.0,
        n: int = 1):
    """Sample n images (conditioned on `batch['mixed']` when provided)."""
    import jax

    from ealdm_tpu.inference import sample_images

    zres = model.unet_config["image_size"]
    zch = model.unet_config["in_channels"]
    mixed = None
    if batch is not None and "mixed" in batch:
        mixed = {k: v[:n] for k, v in batch["mixed"].items()}
    imgs, _ = sample_images(
        model, variables, jax.random.PRNGKey(0), n, (zres, zres, zch),
        steps=custom_steps, eta=eta, mixed=mixed,
    )
    return np.asarray(imgs)


def visualize(images: np.ndarray, path: str = "notebook_sample.png"):
    from ealdm_tpu.training.callbacks import save_png, to_uint8_grid

    save_png(path, to_uint8_grid(images))
    return path
