"""Notebook/Colab-style helpers.

Parity target: `/root/reference/notebook_helpers.py` — model selection
(`get_model`, ref `:52`), conditioning preparation (`get_cond` `:106-126`),
and the `run`/`make_convolutional_sample` convolutional-sampling workflow
(ref `:131-268`) for superresolution and class-conditional modes. This
environment is zero-egress, so models come from the in-repo architecture
zoo (weight-importable via utils/torch_import) or local run dirs instead of
URL downloads, and the Colab upload/widget plumbing is replaced by plain
paths/values.
"""
from __future__ import annotations

import os
import re
import time
from typing import Any, Dict, Optional

import numpy as np

# mode -> zoo entry (reference download_models / get_model, :20-56)
MODEL_ZOO = {
    "superresolution": "ldm/bsr_sr",
    "class_conditional": "ldm/cin256",
    "stdiff": None,  # flagship config below
}
_STDIFF_CFG = "configs/latent-diffusion/stdiff_cin-ldm-vq-f8.yaml"


def _full_init(model, batch):
    import jax

    return jax.jit(
        lambda r: model.init({"params": r, "dropout": r}, batch, r,
                             method=model.full_init)
    )(jax.random.PRNGKey(0))


def get_model(mode: str = "stdiff", run_dir: Optional[str] = None,
              zoo_name: Optional[str] = None):
    """Build (model, variables). With run_dir, restore trained EMA weights;
    otherwise fresh-initialized architecture (import torch weights via
    ealdm_tpu.utils.torch_import for value parity)."""
    import jax
    import jax.numpy as jnp

    from ealdm_tpu import zoo
    from ealdm_tpu.config import load_config, model_from_config

    if mode == "stdiff":
        config = load_config([_STDIFF_CFG])
        model, _ = model_from_config(config["model"])
        mp = config["model"]["params"]
        res = mp["first_stage_config"]["params"]["ddconfig"]["resolution"]
        batch = {"img": jnp.zeros((1, res, res, 3))}
        if mp.get("cond_stage_key") == "mixed":
            batch["mixed"] = {
                "img": batch["img"], "img_random": batch["img"],
                "flow": jnp.zeros((1, 1, 1)), "weather": jnp.zeros((1, 1, 16)),
                "time": jnp.zeros((1, 1)),
            }
    else:
        name = zoo_name or MODEL_ZOO[mode]
        model = zoo.build(name)
        res = 256
        batch = {"img": jnp.zeros((1, res, res, 3))}
        if model.cond_stage_key == "class_label":
            batch["class_label"] = jnp.zeros((1,), jnp.int32)
        elif model.cond_stage_key == "LR_image":
            batch["LR_image"] = jnp.zeros((1, res // 4, res // 4, 3))

    if run_dir:
        from ealdm_tpu.training import init_train_state
        from ealdm_tpu.training.checkpoint import CheckpointManager

        state, _ = init_train_state(model, jax.random.PRNGKey(0), batch)
        state = CheckpointManager(
            os.path.join(run_dir, "checkpoints"), monitor=None
        ).restore_last(jax.device_get(state))
        variables = {"params": state.ema.shadow if state.ema else state.params}
    else:
        variables = _full_init(model, batch)
    return model, variables


def get_cond(mode: str, selected_path_or_value) -> Dict[str, Any]:
    """Prepare the conditioning example (reference get_cond, :106-126).

    superresolution: image path -> {'LR_image': [-1,1] raw, 'image': [-1,1]
    4x-bilinear upsample}. (The reference leaves 'image' in [0,1] — an
    upstream wart; both tensors are normalized here.)
    class_conditional: int class id -> {'class_label': [1] int32}.
    """
    import jax
    import jax.numpy as jnp

    if mode == "superresolution":
        from PIL import Image

        up_f = 4
        img = Image.open(selected_path_or_value).convert("RGB")
        c = np.asarray(img, np.float32) / 255.0
        h, w, _ = c.shape
        c_up = np.asarray(
            jax.image.resize(jnp.asarray(c), (up_f * h, up_f * w, 3), "bilinear")
        )
        return {
            "LR_image": jnp.asarray(2.0 * c - 1.0)[None],
            "image": jnp.asarray(2.0 * c_up - 1.0)[None],
        }
    if mode == "class_conditional":
        return {"class_label": jnp.asarray([int(selected_path_or_value)], jnp.int32)}
    raise NotImplementedError(f"cond not implemented for mode {mode}")


def make_convolutional_sample(
    example: Dict[str, Any],
    model,
    variables,
    custom_steps: int = 50,
    eta: float = 1.0,
    quantize_x0: bool = False,
    custom_shape=None,
    temperature: float = 1.0,
    x_T=None,
    seed: int = 0,
    make_progrow: bool = True,
) -> Dict[str, Any]:
    """Reference make_convolutional_sample (:208-268): encode input, build
    conditioning, DDIM-sample at the input's latent shape, decode, and log
    {input, reconstruction, sample, sample_noquant?, time}."""
    import jax
    import jax.numpy as jnp

    from ealdm_tpu.models.vae import VQModel
    from ealdm_tpu.ops.schedules import DDIMSchedule
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample

    rng = jax.random.PRNGKey(seed)
    log: Dict[str, Any] = {}

    x = example.get("image", example.get("img"))
    if x is not None:
        z = model.apply(variables, x, rng, method=model.encode_first_stage)
        z = model.apply(variables, z, method=model.get_first_stage_encoding)
        xrec = model.apply(variables, z, method=model.decode_first_stage)
        log["input"] = np.asarray(x)
        log["reconstruction"] = np.asarray(xrec)
    else:
        # no input image (e.g. class-conditional): caller sets custom_shape
        assert custom_shape is not None, "need custom_shape without an image"
        z = jnp.zeros(custom_shape, jnp.float32)

    # conditioning
    c = None
    if model.conditioning_key is not None:
        xc = example[model.cond_stage_key]
        c = model.apply(variables, xc, method=model.get_learned_conditioning)
        log["original_conditioning"] = np.asarray(xc)

    if custom_shape is not None:
        z = jnp.zeros(custom_shape, z.dtype)

    sched = model.apply(variables, method=lambda m: m.schedule)
    ddim = DDIMSchedule.create(sched, custom_steps, eta=eta)
    cfg = DDIMConfig(num_steps=custom_steps, eta=eta, temperature=temperature,
                     quantize_x0=quantize_x0,
                     parameterization=model.parameterization)

    def eps_fn(xi, ti, ci):
        return model.apply(variables, xi, ti, ci, method=model.apply_model)

    t0 = time.time()
    sample = ddim_sample(
        eps_fn, rng, z.shape, ddim, cfg, cond=c, x_T=x_T,
        return_intermediates=make_progrow,
    )
    if make_progrow:
        sample, (x_inter, _) = sample
        log["progressive_row"] = np.asarray(x_inter[:: max(1, len(x_inter) // 4)])
    t1 = time.time()

    x_sample = model.apply(variables, sample, method=model.decode_first_stage)
    log["sample"] = np.asarray(x_sample)
    log["time"] = t1 - t0

    fs = model.first_stage_config or {}
    if isinstance(fs, dict) and "VQ" in fs.get("target", ""):
        # VQ first stage: also log the un-quantized decode + the difference
        x_nq = model.apply(variables, sample, True,
                           method=model.decode_first_stage)
        log["sample_noquant"] = np.asarray(x_nq)
        log["sample_diff"] = np.abs(log["sample_noquant"] - log["sample"])
    return log


def run(model, variables, selected_path_or_value, task: str = "superresolution",
        custom_steps: int = 50, resize_enabled: bool = False):
    """Reference run() (:131-184): build the conditioning example and draw a
    convolutional sample; inputs >=128px switch on split_input patched
    inference with the reference's 128/64 crop grid."""
    example = get_cond(task, selected_path_or_value)

    m = model
    x = example.get("image")
    custom_shape = None
    if x is not None and x.shape[1] >= 128 and x.shape[2] >= 128:
        m = model.clone(split_input_params={
            "ks": (128, 128), "stride": (64, 64), "vqf": 4,
            "patch_distributed_vq": True, "tie_braker": False,
            "clip_max_weight": 0.5, "clip_min_weight": 0.01,
            "clip_max_tie_weight": 0.5, "clip_min_tie_weight": 0.01,
        })
    if x is None:
        u = model.unet_config
        custom_shape = (1, u["image_size"], u["image_size"], u["in_channels"])
    return make_convolutional_sample(example, m, variables,
                                     custom_steps=custom_steps,
                                     custom_shape=custom_shape)


def visualize(images: np.ndarray, path: str = "notebook_sample.png"):
    from ealdm_tpu.training.callbacks import save_png, to_uint8_grid

    save_png(path, to_uint8_grid(images))
    return path


def get_cond_options(mode: str, root: str = "data/example_conditioning"):
    """List the bundled conditioning examples for a task (reference
    notebook_helpers.py:85-89)."""
    path = os.path.join(root, mode)
    return path, sorted(os.listdir(path))


def select_cond_path(mode: str, index: int = 0, name: str = None,
                     root: str = "data/example_conditioning"):
    """Pick a conditioning example by name or index (reference :92-104 uses
    an ipywidgets radio button; headless here)."""
    path, files = get_cond_options(mode, root)
    chosen = name if name is not None else files[index]
    assert chosen in files, (chosen, files)
    return os.path.join(path, chosen)


def get_custom_cond(mode: str, source_path_or_text,
                    root: str = "data/example_conditioning"):
    """Install a custom conditioning example (reference :59-82 uses Colab
    upload widgets; here: copy a local file / write the prompt text) and
    return its path."""
    dest = os.path.join(root, mode)
    os.makedirs(dest, exist_ok=True)
    if mode == "text_conditional":
        text = str(source_path_or_text)
        # slug must be path-safe: prompts can contain '/' etc.
        slug = re.sub(r"[^A-Za-z0-9_-]", "_", text[:20])
        out = os.path.join(dest, f"custom_{slug}.txt")
        with open(out, "w") as f:
            f.write(text)
        return out
    import shutil

    name = os.path.basename(str(source_path_or_text))
    out = os.path.join(dest, f"custom_{name}")
    shutil.copyfile(source_path_or_text, out)
    return out


def visualize_cond_img(path: str):
    """Load a conditioning image for display (reference :127-128 wraps
    IPython display; returns the PIL image here)."""
    from PIL import Image

    return Image.open(path)
