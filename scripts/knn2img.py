#!/usr/bin/env python
"""Retrieval-augmented sampling (RDM).

Parity target: `/root/reference/scripts/knn2img.py` — load the trained RDM
from config+checkpoint (`knn2img.py:41-56,309-310`), embed queries with a
frozen CLIP text tower (`:356`) or, for image-image retrieval, the frozen
CLIP image tower (`:124,135-161` load_retriever/search), retrieve the k
nearest patch embeddings, stack [query ; neighbours] as the cross-attention
conditioning (`:361`), sample with CFG via DDIM or PLMS (`:358-375`), and
save per-sample PNGs plus a grid (`:367-397`).

TPU-native: exact/partitioned MXU-matmul k-NN (ealdm_tpu/retrieval.py)
instead of ScaNN; one jitted sampling program with the step-invariant
conditioning work hoisted out of the scan. CLIP trunks are faithful
architectures with oracle-tested weight-import hooks; without a weights
file (zero-egress environments) they run random-init, which exercises the
full pipeline but not CLIP semantics.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", type=str,
                   default="a happy bear reading a newspaper, oil on canvas")
    p.add_argument("--from_file", type=str, default=None,
                   help="prompts file, one per line (reference --from-file)")
    p.add_argument("--query_image", type=str, default=None,
                   help="image-image retrieval: embed this image with the "
                        "frozen CLIP image tower instead of a text prompt "
                        "(reference load_retriever, knn2img.py:124,135-161)")
    p.add_argument("--config", type=str,
                   default="configs/retrieval-augmented-diffusion/768x768.yaml")
    p.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint dir/file for --config (random init if "
                        "absent: no pretrained RDM exists in a zero-egress "
                        "environment)")
    p.add_argument("-r", "--resume", type=str, default=None,
                   help="trained run logdir; resolves config + checkpoints "
                        "like sample_diffusion.py (overrides --config/--ckpt)")
    p.add_argument("--clip_type", type=str, default="ViT-L/14",
                   choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"])
    p.add_argument("--database", type=str, required=True,
                   help="searcher index .npz (train_searcher.py) or a raw "
                        "embedding database .npz (searcher fit on the fly, "
                        "like the reference for small databases)")
    p.add_argument("--use_neighbors", action="store_true",
                   help="append retrieved neighbours to the conditioning")
    p.add_argument("--knn", type=int, default=10)
    p.add_argument("--outdir", type=str, default="outputs/knn2img-samples")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--n_samples", type=int, default=2)
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("--n_rows", type=int, default=0)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--skip_grid", action="store_true")
    p.add_argument("--H", type=int, default=768)
    p.add_argument("--W", type=int, default=768)
    return p


def load_model(opt):
    """(model, variables) from -r logdir or --config [--ckpt]."""
    import jax
    import jax.numpy as jnp
    import yaml

    from ealdm_tpu.config import model_from_config
    from ealdm_tpu.training import init_train_state
    from ealdm_tpu.training.checkpoint import CheckpointManager

    if opt.resume:
        from sample_diffusion import load_run

        config, ckpt_dir, _ = load_run(opt.resume)
    else:
        with open(opt.config) as f:
            config = yaml.safe_load(f)
        ckpt_dir = opt.ckpt

    model, _ = model_from_config(config["model"])
    mp = config["model"]["params"]
    res = mp["first_stage_config"]["params"]["ddconfig"]["resolution"]
    ctx_dim = mp["unet_config"]["params"]["context_dim"]

    b = 1
    batch = {
        model.first_stage_key: jnp.zeros((b, res, res, 3), jnp.float32),
        model.cond_stage_key: jnp.zeros((b, 1, ctx_dim), jnp.float32),
    }
    state, _ = init_train_state(
        model, jax.random.PRNGKey(0), batch, use_ema=True
    )
    if ckpt_dir:
        template = jax.device_get(state)
        norm = os.path.normpath(ckpt_dir)
        base = os.path.basename(norm)
        if base == "state":
            # direct orbax state path (e.g. .../last/state)
            import orbax.checkpoint as ocp

            state = ocp.StandardCheckpointer().restore(norm, template)
        elif base == "last":
            import orbax.checkpoint as ocp

            state = ocp.StandardCheckpointer().restore(
                os.path.join(norm, "state"), template
            )
        elif base.isdigit():
            # a specific managed step dir (.../checkpoints/<step>) must load
            # THAT step, not whatever restore_last would pick
            state = CheckpointManager(
                os.path.dirname(norm), monitor=None
            ).restore(template, step=int(base))
        else:
            # checkpoints dir: latest managed step, else last/
            state = CheckpointManager(norm, monitor=None).restore(template)
        params = state.ema.shadow if state.ema is not None else state.params
    else:
        print("WARNING: sampling from RANDOM-INIT weights (no --ckpt/-r)")
        params = state.params
    return model, {"params": params}, config


def embed_queries(opt, n):
    """[n, D] L2-normalized CLIP query embeddings (text or image)."""
    import jax
    import jax.numpy as jnp

    from ealdm_tpu.models.encoders import (
        FrozenClipImageEmbedder,
        FrozenCLIPTextEmbedder,
    )

    if opt.query_image:
        from PIL import Image

        im = Image.open(opt.query_image).convert("RGB")
        x = jnp.asarray(np.asarray(im), jnp.float32)[None] / 127.5 - 1.0
        emb = FrozenClipImageEmbedder.from_version(opt.clip_type)
        variables = jax.jit(emb.init)(jax.random.PRNGKey(0), x)
        # one ViT pass; the n_samples copies share the query embedding
        q = np.repeat(np.asarray(jax.jit(emb.apply)(variables, x)), n, axis=0)
        return q, [f"<image:{os.path.basename(opt.query_image)}>"] * n

    if opt.from_file:
        with open(opt.from_file) as f:
            texts = [ln for ln in f.read().splitlines() if ln.strip()]
        if not texts:
            raise SystemExit(f"--from_file {opt.from_file}: no prompts found")
        texts = (texts * ((n + len(texts) - 1) // len(texts)))[:n]
    else:
        texts = [opt.prompt] * n
    emb = FrozenCLIPTextEmbedder.from_version(opt.clip_type)
    # tokenize outside jit, embed in one jitted call
    dummy = jnp.zeros((1, 77), jnp.int32)
    variables = jax.jit(emb.init)(jax.random.PRNGKey(0), dummy)
    toks = emb.bind(variables).tokenize(texts)
    z = jax.jit(emb.apply)(variables, jnp.asarray(toks))  # [n, 1, D]
    return np.asarray(z[:, 0, :]), texts


def main():
    opt = get_parser().parse_args()
    import jax
    import jax.numpy as jnp

    import ealdm_tpu

    ealdm_tpu.enable_inference_optimizations()
    from ealdm_tpu.inference import hoist_invariants
    from ealdm_tpu.ops.schedules import DDIMSchedule, DiffusionSchedule
    from ealdm_tpu.retrieval import Searcher
    from ealdm_tpu.samplers import DDIMConfig, ddim_sample, plms_sample

    model, variables, config = load_model(opt)
    mp = config["model"]["params"]
    ctx_dim = mp["unet_config"]["params"]["context_dim"]
    zch = mp["unet_config"]["params"]["in_channels"]
    f = 2 ** (
        len(mp["first_stage_config"]["params"]["ddconfig"]["ch_mult"]) - 1
    )

    # searcher: prebuilt index, or fit on the fly from a raw database
    # (reference trains ScaNN on the fly for <2e4 entries, knn2img.py:135)
    try:
        searcher = Searcher.load(opt.database)
    except (KeyError, ValueError):
        db = dict(np.load(opt.database))
        searcher = Searcher.from_database(db)
    assert searcher.dim == ctx_dim, (
        f"database dim {searcher.dim} != model context_dim {ctx_dim}; "
        f"pick a matching --clip_type/database"
    )

    q, texts = embed_queries(opt, opt.n_samples)
    print("sampling prompts:", texts[:2], "..." if len(texts) > 2 else "")
    c = q[:, None, :]  # [B, 1, D] query token
    if opt.use_neighbors:
        nns = searcher.search(q, k=opt.knn)
        c = np.concatenate([c, nns["nn_embeddings"]], axis=1)
    uc = np.zeros_like(c) if opt.scale != 1.0 else None

    sched = DiffusionSchedule.create(
        timesteps=model.timesteps, beta_schedule=model.beta_schedule,
        linear_start=model.linear_start, linear_end=model.linear_end,
    )
    ddim = DDIMSchedule.create(sched, opt.ddim_steps, eta=opt.ddim_eta)
    cfg = DDIMConfig(
        num_steps=opt.ddim_steps, eta=opt.ddim_eta,
        unconditional_guidance_scale=opt.scale,
        parameterization=model.parameterization,
    )
    shape = (opt.n_samples, opt.H // f, opt.W // f, zch)

    cond = jnp.asarray(c)
    uncond = None if uc is None else jnp.asarray(uc)
    eps_fn, cond, uncond, extra = hoist_invariants(
        model, variables, ddim, cond, uncond, want_emb_tables=not opt.plms
    )

    def run(rng):
        if opt.plms:
            z = plms_sample(eps_fn, rng, shape, ddim, cfg, cond=cond,
                            uncond=uncond)
        else:
            z = ddim_sample(eps_fn, rng, shape, ddim, cfg, cond=cond,
                            uncond=uncond, extra_tables=extra)
        return model.apply(variables, z, method=model.decode_first_stage)

    run = jax.jit(run)

    sample_path = os.path.join(opt.outdir, "samples")
    os.makedirs(sample_path, exist_ok=True)
    base_count = len(os.listdir(sample_path))
    grid_count = len([f_ for f_ in os.listdir(opt.outdir)
                      if f_.startswith("grid")])
    print(f"sampling scale for cfg is {opt.scale:.2f}")

    from PIL import Image

    all_samples = []
    for it in range(opt.n_iter):
        imgs = np.asarray(run(jax.random.PRNGKey(1 + it)))
        imgs8 = ((np.clip(imgs, -1, 1) + 1) * 127.5).astype(np.uint8)
        for im in imgs8:
            Image.fromarray(im).save(
                os.path.join(sample_path, f"{base_count:05}.png")
            )
            base_count += 1
        all_samples.append(imgs8)

    if not opt.skip_grid:
        stack = np.concatenate(all_samples, axis=0)
        n_rows = opt.n_rows if opt.n_rows > 0 else opt.n_samples
        rows = [
            np.concatenate(list(stack[i:i + n_rows]), axis=1)
            for i in range(0, len(stack), n_rows)
        ]
        w = max(r.shape[1] for r in rows)
        rows = [
            np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0))) for r in rows
        ]
        Image.fromarray(np.concatenate(rows, axis=0)).save(
            os.path.join(opt.outdir, f"grid-{grid_count:04}.png")
        )

    print(f"Your samples are ready and waiting for you here: \n{opt.outdir}")


if __name__ == "__main__":
    main()
